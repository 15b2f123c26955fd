"""Grotrian (energy-level / transition) diagrams.

Full counterpart of the reference's Grotrian widget
(/root/reference/tardis/visualization/widgets/grotrian.py): for one ion,
draw the energy-level ladder with

- **level merging**: near-degenerate levels within
  ``level_diff_threshold`` (relative energy) are merged into one bar, as
  the reference does to keep fine-structure ladders readable;
- **population-scaled level bars**: bar line width encodes the
  standardized log level population in the selected shell (or the
  shell-average), with a width-scale legend;
- **transition arrows**: last-interaction absorptions (up, blue side)
  and emissions (down, red side) between merged levels, arrow width a
  standardized log packet count, color mapped to the transition
  wavelength over a colorbar;
- **wavelength-range filtering**, **shell selection**, linear/log energy
  scale, and both matplotlib and plotly backends.

The ``plot_grotrian`` convenience wrapper keeps the earlier one-call API.
"""

from __future__ import annotations

import numpy as np

from tardis_tpu.utils.base import (
    species_string_to_tuple,
    species_tuple_to_string,
)

EV = 1.602176634e-12


def standardize(x, log=True, zero_undefined_offset=1e-3):
    """Map positive values to [0, 1] on a (log) scale — the reference's
    ``standardize`` (grotrian.py:44) used for widths."""
    x = np.asarray(x, np.float64)
    if len(x) == 0:
        return x
    if log:
        x = np.log10(np.maximum(x, zero_undefined_offset * np.nanmax(x)))
    lo, hi = np.nanmin(x), np.nanmax(x)
    if hi <= lo:
        return np.ones_like(x)
    return (x - lo) / (hi - lo)


class GrotrianPlot:
    """Energy-level diagram for one ion with transition traffic arrows."""

    def __init__(self, sim, atomic_number=None, ion_number=None):
        res = sim.last_transport_result
        if res is None or res.last_interaction is None:
            raise ValueError(
                "Grotrian plot needs a finished simulation with "
                "last-interaction tracking"
            )
        self.sim = sim
        self.atom = sim.atom_data
        self._max_levels = 10
        self._min_wavelength = None  # Angstrom
        self._max_wavelength = None
        self._level_diff_threshold = 0.01  # relative energy merge window
        self._shell = None
        self._y_scale = "linear"
        if atomic_number is None:
            atomic_number = int(self.atom.species_z[0])
            ion_number = int(self.atom.species_ion[0])
        self.set_ion(atomic_number, ion_number or 0)

    @classmethod
    def from_simulation(cls, sim, atomic_number=None, ion_number=None):
        return cls(sim, atomic_number, ion_number)

    # -- configuration (reference grotrian.py:278-405) -----------------
    def set_ion(self, atomic_number: int, ion_number: int):
        atom = self.atom
        rows = np.where(
            (atom.level_z == atomic_number) & (atom.level_ion == ion_number)
        )[0]
        if len(rows) == 0:
            raise ValueError(
                f"species Z={atomic_number} ion={ion_number} not in the "
                "atomic data"
            )
        self.atomic_number = int(atomic_number)
        self.ion_number = int(ion_number)
        self._level_rows = rows

    @property
    def atomic_symbol(self):
        from tardis_tpu.atomic.atom_data import ATOMIC_SYMBOLS

        return ATOMIC_SYMBOLS[self.atomic_number - 1]

    @property
    def max_levels(self):
        return self._max_levels

    @max_levels.setter
    def max_levels(self, value):
        if value < 2:
            raise ValueError("max_levels must be >= 2")
        self._max_levels = int(value)

    @property
    def level_diff_threshold(self):
        return self._level_diff_threshold

    @level_diff_threshold.setter
    def level_diff_threshold(self, value):
        if not 0 <= value < 1:
            raise ValueError("level_diff_threshold must be in [0, 1)")
        self._level_diff_threshold = float(value)

    @property
    def min_wavelength(self):
        return self._min_wavelength

    @min_wavelength.setter
    def min_wavelength(self, value):
        self._min_wavelength = value

    @property
    def max_wavelength(self):
        return self._max_wavelength

    @max_wavelength.setter
    def max_wavelength(self, value):
        self._max_wavelength = value

    @property
    def shell(self):
        return self._shell

    @shell.setter
    def shell(self, value):
        if value is not None and not (
            0 <= value < self.sim.state.no_of_shells
        ):
            raise ValueError("shell out of range")
        self._shell = value

    @property
    def y_scale(self):
        return self._y_scale

    @y_scale.setter
    def y_scale(self, value):
        if value not in ("linear", "log"):
            raise ValueError("y_scale must be 'linear' or 'log'")
        self._y_scale = value

    # -- data ----------------------------------------------------------
    def _compute_level_data(self):
        """Merged level ladder + standardized population widths."""
        rows = self._level_rows[: self.max_levels]
        e = self.atom.level_energy[rows] / EV
        # merge near-degenerate levels (reference level_mapping)
        merged_ids = np.zeros(len(rows), int)
        mid = 0
        for k in range(1, len(rows)):
            ref = max(e[merged_ids == mid].mean(), 1e-12)
            if (e[k] - ref) / max(ref, 1e-12) > self._level_diff_threshold:
                mid += 1
            merged_ids[k] = mid
        n_merged = mid + 1
        merged_e = np.array(
            [e[merged_ids == m].mean() for m in range(n_merged)]
        )
        pops = None
        ps = getattr(self.sim, "plasma_state", None)
        if ps is not None:
            lp = ps.level_number_density[rows]
            lp = (
                lp[:, self._shell] if self._shell is not None
                else lp.mean(axis=1)
            )
            pops = np.array(
                [lp[merged_ids == m].sum() for m in range(n_merged)]
            )
        self.level_mapping = {
            int(self.atom.level_number[r]): int(m)
            for r, m in zip(rows, merged_ids)
        }
        self.merged_energies = merged_e
        self.level_widths = (
            None if pops is None
            else 0.75 + 3.5 * standardize(pops)
        )
        self.level_populations = pops

    def _compute_transitions(self):
        """Excitation/de-excitation packet counts between merged levels
        (reference grotrian.py:407-530)."""
        li = self.sim.last_transport_result.last_interaction
        atom = self.atom
        mask = li["type"] == 2
        if self._shell is not None:
            mask = mask & (li["shell"] == self._shell)
        out = {}
        for key, name in (("in_line", "excite"), ("out_line", "deexcite")):
            lines = li[key][mask]
            lines = lines[(lines >= 0) & (lines < atom.n_lines)]
            sel = (
                (atom.line_z[lines] == self.atomic_number)
                & (atom.line_ion[lines] == self.ion_number)
            )
            lines = lines[sel]
            lam = 2.99792458e10 / atom.line_nu[lines] * 1e8  # Angstrom
            lo = atom.level_number[atom.line_lower_idx[lines]]
            hi = atom.level_number[atom.line_upper_idx[lines]]
            tr = {}
            for l_, h_, w_ in zip(lo, hi, lam):
                ml = self.level_mapping.get(int(l_))
                mh = self.level_mapping.get(int(h_))
                if ml is None or mh is None or ml == mh:
                    continue
                rec = tr.setdefault((ml, mh), [0, 0.0])
                rec[0] += 1
                rec[1] += w_
            out[name] = {
                k: (n, wsum / n) for k, (n, wsum) in tr.items()
            }
        # wavelength-range filter (defaults from the data)
        all_lam = [w for d in out.values() for (_, w) in d.values()]
        if all_lam:
            lo_w = (
                self._min_wavelength if self._min_wavelength is not None
                else min(all_lam)
            )
            hi_w = (
                self._max_wavelength if self._max_wavelength is not None
                else max(all_lam)
            )
            out = {
                name: {
                    k: v for k, v in d.items() if lo_w <= v[1] <= hi_w
                }
                for name, d in out.items()
            }
            self._wl_range = (lo_w, hi_w)
        else:
            self._wl_range = (0.0, 1.0)
        counts = [v[0] for d in out.values() for v in d.values()]
        widths = standardize(counts) if counts else np.array([])
        i = 0
        for d in out.values():
            for k in list(d):
                n, w = d[k]
                d[k] = (n, w, 0.5 + 3.5 * widths[i])
                i += 1
        self.excite_lines = out["excite"]
        self.deexcite_lines = out["deexcite"]

    # -- rendering -----------------------------------------------------
    def display(self, ax=None):
        """Matplotlib rendering; returns the axis."""
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        from matplotlib import cm, colors

        self._compute_level_data()
        self._compute_transitions()
        if ax is None:
            _, ax = plt.subplots(figsize=(8, 7))
        n = len(self.merged_energies)
        e_plot = self.merged_energies.copy()
        if self._y_scale == "log":
            e_plot = np.log10(np.maximum(e_plot, e_plot[e_plot > 0].min()
                                         if (e_plot > 0).any() else 1e-3))
        for m, e in enumerate(e_plot):
            lw = 3.0 if self.level_widths is None else self.level_widths[m]
            ax.hlines(e, 0.08, 0.92, lw=lw, color="k")
            ax.text(0.94, e, f"{m}", va="center", fontsize=8)
        cmap = plt.get_cmap("rainbow")
        lo_w, hi_w = self._wl_range
        norm = colors.Normalize(lo_w, max(hi_w, lo_w + 1e-6))
        for (src, d, sign, x0) in (
            ("excite", self.excite_lines, +1, 0.16),
            ("deexcite", self.deexcite_lines, -1, 0.56),
        ):
            for (ml, mh), (cnt, lam, width) in d.items():
                x = x0 + 0.3 * (ml + mh) / max(2 * n - 2, 1)
                y_from = e_plot[ml if sign > 0 else mh]
                y_to = e_plot[mh if sign > 0 else ml]
                ax.annotate(
                    "", xy=(x, y_to), xytext=(x, y_from),
                    arrowprops=dict(
                        arrowstyle="->", lw=width,
                        color=cmap(norm(lam)), alpha=0.85,
                    ),
                )
        sm = cm.ScalarMappable(norm=norm, cmap=cmap)
        plt.colorbar(sm, ax=ax, label="Wavelength [$\\AA$]", shrink=0.8)
        ax.set_xlim(0, 1)
        ax.set_xticks([])
        ax.set_ylabel(
            "Level energy [eV]" if self._y_scale == "linear"
            else "log10 level energy [eV]"
        )
        shell_tag = "" if self._shell is None else f" (shell {self._shell})"
        ax.set_title(
            "Grotrian diagram: "
            + species_tuple_to_string((self.atomic_number, self.ion_number))
            + shell_tag
        )
        return ax

    def display_ply(self):
        """Plotly rendering (requires plotly)."""
        import plotly.graph_objects as go

        self._compute_level_data()
        self._compute_transitions()
        fig = go.Figure()
        n = len(self.merged_energies)
        for m, e in enumerate(self.merged_energies):
            lw = 3.0 if self.level_widths is None else self.level_widths[m]
            fig.add_trace(
                go.Scatter(
                    x=[0.08, 0.92], y=[e, e], mode="lines",
                    line=dict(color="black", width=lw),
                    showlegend=False,
                    hovertemplate=f"level {m}: {e:.3f} eV<extra></extra>",
                )
            )
        for d, x0, color in (
            (self.excite_lines, 0.16, "#2E86AB"),
            (self.deexcite_lines, 0.56, "#C73E1D"),
        ):
            for (ml, mh), (cnt, lam, width) in d.items():
                x = x0 + 0.3 * (ml + mh) / max(2 * n - 2, 1)
                fig.add_annotation(
                    x=x, y=self.merged_energies[mh],
                    ax=x, ay=self.merged_energies[ml],
                    xref="x", yref="y", axref="x", ayref="y",
                    arrowwidth=width, arrowcolor=color,
                    showarrow=True, arrowhead=2,
                )
        fig.update_layout(
            title="Grotrian diagram: " + species_tuple_to_string(
                (self.atomic_number, self.ion_number)
            ),
            yaxis_title="Level energy [eV]",
            xaxis=dict(visible=False),
        )
        return fig


def plot_grotrian(
    sim,
    species: str,
    max_levels: int = 10,
    shell: int | None = None,
    ax=None,
):
    """One-call Grotrian diagram (compatibility wrapper over GrotrianPlot)."""
    z, ion = species_string_to_tuple(species)
    g = GrotrianPlot(sim, z, ion)
    g.max_levels = max_levels
    g.shell = shell
    return g.display(ax=ax)
