"""Spectral element DEComposition (SDEC) plot.

Counterpart of the reference's ``SDECPlotter``
(/root/reference/tardis/visualization/tools/sdec_plot.py:30, 1569 LoC):

- **emission decomposition**: emergent luminosity split by the species of
  each escaping packet's last line interaction, plus a no-interaction
  (photosphere) and an electron-scattering-only component;
- **absorption decomposition**: the luminosity each species removed from
  the field, binned at the *absorbed* frequency of escaping packets' last
  line absorptions (plotted downward, as in the reference);
- **packets_mode**: "real" (escaping r-packets + last-interaction tracker)
  or "virtual" (per-vpacket tracking, virt_packet_* arrays);
- **species filtering / top-N grouping**: ``species_list`` like
  ["Si II", "Ca", ...] or ``nelements`` keeps the strongest contributors
  and folds the rest into "other";
- **backends**: matplotlib (``generate_plot_mpl``) and plotly
  (``generate_plot_ply``);
- **flux mode**: ``distance`` converts luminosity density to observed flux
  (L / 4 pi d^2, reference lum_to_flux), ``observed_spectrum=(wl_A, flux)``
  overplots data, ``show_modeled_spectrum`` toggles the total line, and
  ``blackbody_photosphere`` overlays the t_inner blackbody
  (reference sdec_plot.py:707-746).
"""

from __future__ import annotations

import numpy as np

from tardis_tpu.atomic.atom_data import ATOMIC_SYMBOLS, SYMBOL_TO_Z
from tardis_tpu.constants import C


def _parse_species_list(species_list):
    """["Si II", "Ca", "S I-III"] -> set of (Z, ion) pairs (ion=None => all
    ions of the element), mirroring the reference's _parse_species_list."""
    if species_list is None:
        return None
    roman = {"I": 0, "II": 1, "III": 2, "IV": 3, "V": 4, "VI": 5,
             "VII": 6, "VIII": 7}
    out = set()
    for token in species_list:
        parts = token.replace("_", " ").split()
        z = SYMBOL_TO_Z[parts[0].capitalize()]
        if len(parts) == 1:
            out.add((z, None))
        elif "-" in parts[1]:
            a, b = parts[1].split("-")
            for i in range(roman[a], roman[b] + 1):
                out.add((z, i))
        else:
            ion = roman.get(parts[1])
            ion = int(parts[1]) - 1 if ion is None else ion
            out.add((z, ion))
    return out


class SDECPlotter:
    """Decompose a finished simulation's spectrum by interaction species."""

    def __init__(self, sim):
        res = sim.last_transport_result
        if res is None or res.last_interaction is None:
            raise ValueError("needs a finished simulation with tracking")
        self.sim = sim
        self.res = res
        self.atom = sim.atom_data

    # ------------------------------------------------------------------
    def _packet_arrays(self, packets_mode):
        """(nu_out, e_out, nu_in, li_type, in_line, out_line) for the chosen
        packet population."""
        res = self.res
        if packets_mode == "real":
            li = res.last_interaction
            m = res.output_status == 1
            return (
                res.output_nu[m],
                res.output_energy[m] / res.time_of_simulation,
                li["in_nu"][m],
                li["type"][m],
                li["in_line"][m],
                li["out_line"][m],
            )
        if packets_mode == "virtual":
            vp = res.vpackets
            if vp is None:
                raise ValueError(
                    "virtual packets_mode needs vpacket_tracking "
                    "(spectrum.virtual.virtual_packet_logging) enabled"
                )
            out_line = vp["virt_packet_last_line_interaction_out_id"]
            return (
                vp["virt_packet_nus"],
                vp["virt_packet_energies"] / res.time_of_simulation,
                vp["virt_packet_last_interaction_in_nu"],
                vp["virt_packet_last_interaction_type"],
                out_line,  # spawn records do not retain the absorbed line id
                out_line,
            )
        raise ValueError(f"unknown packets_mode {packets_mode!r}")

    # ------------------------------------------------------------------
    def _decompose(self, nu_edges, packets_mode="real", species_filter=None,
                   nelements=None):
        nu_out, e_out, nu_in, li_type, in_line, out_line = (
            self._packet_arrays(packets_mode)
        )
        d_nu = np.abs(np.diff(nu_edges))

        def hist(nu, w, mask):
            h, _ = np.histogram(nu[mask], bins=nu_edges, weights=w[mask])
            return h / d_nu

        # ---- emission side ----
        no_int = li_type <= 0
        escat = li_type == 1
        line_em = (li_type == 2) & (out_line >= 0)
        emission = {
            "photosphere": hist(nu_out, e_out, no_int),
            "e-scattering": hist(nu_out, e_out, escat),
        }
        out_z = np.where(out_line >= 0, self.atom.line_z[out_line], -1)
        out_ion = np.where(out_line >= 0, self.atom.line_ion[out_line], -1)

        # ---- absorption side (energy removed at the absorbed frequency) ----
        line_abs = (li_type == 2) & (in_line >= 0)
        in_z = np.where(in_line >= 0, self.atom.line_z[in_line], -1)
        in_ion = np.where(in_line >= 0, self.atom.line_ion[in_line], -1)
        absorption = {}

        if species_filter is not None:
            keys = set(species_filter)

            def allowed(z, ion):
                return (z, None) in keys or (z, ion) in keys

        else:

            def allowed(z, ion):
                return True

        for z in np.unique(out_z[line_em]):
            if z <= 0:
                continue
            for ion in np.unique(out_ion[line_em & (out_z == z)]):
                if not allowed(z, ion):
                    continue
                label = _species_label(z, ion, species_filter)
                m = line_em & (out_z == z) & (out_ion == ion)
                h = hist(nu_out, e_out, m)
                emission[label] = emission.get(label, 0.0) + h
        for z in np.unique(in_z[line_abs]):
            if z <= 0:
                continue
            for ion in np.unique(in_ion[line_abs & (in_z == z)]):
                if not allowed(z, ion):
                    continue
                label = _species_label(z, ion, species_filter)
                m = line_abs & (in_z == z) & (in_ion == ion)
                h = hist(nu_in, e_out, m)
                absorption[label] = absorption.get(label, 0.0) + h

        # ---- top-N grouping ----
        if nelements is not None:
            totals = {
                k: np.sum(v)
                for k, v in emission.items()
                if k not in ("photosphere", "e-scattering")
            }
            top = set(
                sorted(totals, key=totals.get, reverse=True)[:nelements]
            )
            emission = _fold_other(emission, top,
                                   keep=("photosphere", "e-scattering"))
            absorption = _fold_other(absorption, top, keep=())
        return emission, absorption

    # ------------------------------------------------------------------
    def _photosphere_luminosity_lambda(self, wl_angstrom):
        """Blackbody L_lambda of the photosphere [erg/s/AA]
        (reference _calculate_photosphere_luminosity,
        sdec_plot.py:707-730):  pi B_lambda(t_inner) * 4 pi r_inner^2."""
        from tardis_tpu.constants import H, K_B

        t = self.sim.state.t_inner
        r = self.sim.state.geometry.r_inner[0]
        lam_cm = np.asarray(wl_angstrom) * 1e-8
        x = H * C / (lam_cm * K_B * t)
        b_lam = 2.0 * H * C**2 / lam_cm**5 / np.expm1(np.clip(x, 1e-10,
                                                              500.0))
        return np.pi * b_lam * 4.0 * np.pi * r**2 * 1e-8  # per AA

    def generate_plot_mpl(
        self,
        packets_mode: str = "real",
        ax=None,
        species_list=None,
        nelements=None,
        wavelength_range_angstrom=None,
        save_path: str | None = None,
        distance=None,
        observed_spectrum=None,
        show_modeled_spectrum: bool = True,
        blackbody_photosphere: bool = True,
    ):
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        # flux mode: L / (4 pi d^2) with d in cm (reference lum_to_flux).
        # Validated unconditionally and BEFORE any data prep (ADVICE r4:
        # distance = 0 divided by zero when an observed spectrum was given)
        lum_to_flux = 1.0
        if distance is not None:
            if distance <= 0:
                raise ValueError("distance must be positive")
            lum_to_flux = 4.0 * np.pi * float(distance) ** 2
        elif observed_spectrum is not None:
            raise ValueError(
                "plotting an observed spectrum requires distance"
            )
        wl, em_stack, ab_stack, labels_e, labels_a, total = self._prep(
            packets_mode, species_list, nelements, wavelength_range_angstrom
        )

        def fl(y):
            return y / lum_to_flux

        if ax is None:
            fig, ax = plt.subplots(figsize=(11, 6))
        else:
            fig = ax.figure
        ax.stackplot(wl, [fl(e) for e in em_stack], labels=labels_e,
                     alpha=0.8)
        if len(ab_stack):
            ax.stackplot(
                wl, [-fl(a) for a in ab_stack], labels=[
                    f"{n} (abs)" for n in labels_a
                ], alpha=0.5,
            )
        if show_modeled_spectrum:
            ax.plot(wl, fl(total), color="k", lw=0.8, label="total")
        if blackbody_photosphere:
            ax.plot(
                wl, fl(self._photosphere_luminosity_lambda(wl)),
                "--", color="0.3", lw=0.9, label="blackbody photosphere",
            )
        if observed_spectrum is not None:
            obs_wl, obs_flux = observed_spectrum
            ax.plot(obs_wl, obs_flux, color="tab:red", lw=0.8,
                    label="observed")
        ax.axhline(0.0, color="k", lw=0.5)
        ax.set_xlabel("wavelength [$\\AA$]")
        ax.set_ylabel(
            "$F_\\lambda$ [erg/s/cm$^2$/$\\AA$]" if distance is not None
            else "$L_\\lambda$ [erg/s/$\\AA$]"
        )
        ax.set_title(f"SDEC ({packets_mode} packets)")
        ax.legend(fontsize=8, ncol=3)
        if wavelength_range_angstrom is not None:
            ax.set_xlim(*wavelength_range_angstrom)
        if save_path:
            fig.savefig(save_path, dpi=120)
        return fig

    def generate_plot_ply(
        self,
        packets_mode: str = "real",
        species_list=None,
        nelements=None,
        wavelength_range_angstrom=None,
        distance=None,
        observed_spectrum=None,
        show_modeled_spectrum: bool = True,
        blackbody_photosphere: bool = True,
    ):
        """Interactive plotly figure (reference generate_plot_ply,
        sdec_plot.py).  Requires plotly; raises ImportError otherwise."""
        import plotly.graph_objects as go

        lum_to_flux = 1.0
        if distance is not None:
            if distance <= 0:
                raise ValueError("distance must be positive")
            lum_to_flux = 4.0 * np.pi * float(distance) ** 2
        elif observed_spectrum is not None:
            raise ValueError(
                "plotting an observed spectrum requires distance"
            )
        wl, em_stack, ab_stack, labels_e, labels_a, total = self._prep(
            packets_mode, species_list, nelements, wavelength_range_angstrom
        )
        fig = go.Figure()
        for name, y in zip(labels_e, em_stack):
            fig.add_trace(
                go.Scatter(x=wl, y=y / lum_to_flux, stackgroup="emission",
                           name=name)
            )
        for name, y in zip(labels_a, ab_stack):
            fig.add_trace(
                go.Scatter(
                    x=wl, y=-y / lum_to_flux, stackgroup="absorption",
                    name=f"{name} (abs)",
                )
            )
        if show_modeled_spectrum:
            fig.add_trace(
                go.Scatter(x=wl, y=total / lum_to_flux, name="total",
                           line=dict(color="black", width=1))
            )
        if blackbody_photosphere:
            fig.add_trace(
                go.Scatter(
                    x=wl,
                    y=self._photosphere_luminosity_lambda(wl) / lum_to_flux,
                    name="blackbody photosphere",
                    line=dict(color="gray", width=1, dash="dash"),
                )
            )
        if observed_spectrum is not None:
            obs_wl, obs_flux = observed_spectrum
            fig.add_trace(
                go.Scatter(x=np.asarray(obs_wl), y=np.asarray(obs_flux),
                           name="observed",
                           line=dict(color="red", width=1))
            )
        fig.update_layout(
            xaxis_title="wavelength [Å]",
            yaxis_title="L_lambda [erg/s/Å]",
            title=f"SDEC ({packets_mode} packets)",
        )
        return fig

    # ------------------------------------------------------------------
    def _prep(self, packets_mode, species_list, nelements, wl_range):
        nu_edges = self.sim.spectrum_nu_edges
        species_filter = _parse_species_list(species_list)
        emission, absorption = self._decompose(
            nu_edges, packets_mode, species_filter, nelements
        )
        centers = 0.5 * (nu_edges[:-1] + nu_edges[1:])
        wl = C / centers * 1e8
        order = np.argsort(wl)
        to_lam = centers**2 / C / 1e8  # L_nu -> L_lambda per AA

        def conv(h):
            return (h * to_lam)[order]

        labels_e = list(emission.keys())
        em_stack = [conv(emission[k]) for k in labels_e]
        labels_a = list(absorption.keys())
        ab_stack = [conv(absorption[k]) for k in labels_a]
        total = np.sum(em_stack, axis=0) if em_stack else np.zeros_like(wl)
        return wl[order], em_stack, ab_stack, labels_e, labels_a, total


def _roman(ion):
    numerals = ["I", "II", "III", "IV", "V", "VI", "VII", "VIII", "IX", "X"]
    return numerals[ion] if 0 <= ion < len(numerals) else str(ion + 1)


def _species_label(z, ion, species_filter):
    sym = ATOMIC_SYMBOLS[z - 1]
    if species_filter is not None and (z, ion) in species_filter:
        return f"{sym} {_roman(ion)}"
    return sym


def _fold_other(components, top, keep):
    out = {}
    other = None
    for k, v in components.items():
        if k in keep or k in top:
            out[k] = v
        else:
            other = v if other is None else other + v
    if other is not None:
        out["other"] = other
    return out
