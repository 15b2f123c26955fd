"""Last-interaction-velocity (LIV) plot.

Full counterpart of the reference's ``LIVPlotter``
(/root/reference/tardis/visualization/tools/liv_plot.py): distribution of
the velocity at which escaping packets last interacted, split by species,
with

- **species filtering** like the SDEC plot: ions ("Si II"), elements
  ("Ca"), ion ranges ("S I-III"), or combinations (liv_plot.py:115-164);
- **nelements top-N selection** of the most line-interacting elements;
- **packet wavelength-range masks** (packet_wvl_range in Angstrom);
- **velocity re-binning** (num_bins over the shell velocity grid);
- **real and virtual packet modes** (from the per-vpacket tracker);
- matplotlib (``generate_plot_mpl``) and plotly (``generate_plot_ply``)
  backends sharing one step-plot data pipeline (liv_plot.py:364-377).
"""

from __future__ import annotations

import numpy as np

from tardis_tpu.atomic.atom_data import ATOMIC_SYMBOLS
from tardis_tpu.constants import C
from tardis_tpu.visualization.sdec import _parse_species_list, _roman


class LIVPlotter:
    """Velocity distribution of last line interactions, by species."""

    def __init__(self, sim):
        res = sim.last_transport_result
        if res is None or res.last_interaction is None:
            raise ValueError(
                "LIV plot needs a finished simulation with last-interaction "
                "tracking (montecarlo.tracking.track_last_interaction)"
            )
        self.sim = sim
        self.res = res
        self.atom = sim.atom_data

    @classmethod
    def from_simulation(cls, sim):
        return cls(sim)

    @classmethod
    def from_workflow(cls, workflow):
        return cls(workflow.sim)

    # ------------------------------------------------------------------
    def _interaction_arrays(self, packets_mode):
        """(velocity km/s, Z, ion, lab nu) of last line interactions."""
        t_exp = self.sim.state.time_explosion
        if packets_mode == "virtual":
            vp = self.res.vpackets
            if vp is None:
                raise ValueError(
                    "virtual packets_mode needs virtual-packet tracking "
                    "(montecarlo.tracking.track_vpacket)"
                )
            m = vp["virt_packet_last_interaction_type"] == 2
            out_line = vp["virt_packet_last_line_interaction_out_id"][m]
            r = vp["virt_packet_initial_rs"][m]
            nus = vp["virt_packet_nus"][m]
        else:
            li = self.res.last_interaction
            m = (self.res.output_status == 1) & (li["type"] == 2)
            out_line = li["out_line"][m]
            r = li["r"][m]
            nus = li["in_nu"][m]
        v = r / t_exp / 1e5  # km/s
        lid = np.clip(out_line, 0, self.atom.n_lines - 1)
        z = self.atom.line_z[lid]
        ion = self.atom.line_ion[lid]
        return v, z, ion, nus

    # ------------------------------------------------------------------
    def _prepare(self, packets_mode, packet_wvl_range, species_list,
                 nelements, num_bins, cmapname):
        v, z, ion, nus = self._interaction_arrays(packets_mode)
        if len(v) == 0:
            raise ValueError(
                "No line interactions found in the packet data. The LIV "
                "plot requires packets that underwent line interactions."
            )

        if packet_wvl_range is not None:
            lo_a, hi_a = packet_wvl_range  # Angstrom
            lam = C / nus * 1e8
            m = (lam >= lo_a) & (lam <= hi_a)
            v, z, ion = v[m], z[m], ion[m]

        if nelements is not None:
            zs, counts = np.unique(z, return_counts=True)
            top = zs[np.argsort(-counts)][:nelements]
            species_list = [ATOMIC_SYMBOLS[zz - 1] for zz in top]

        species_filter = _parse_species_list(species_list)

        # group: (Z, ion) when the filter names the ion, else by element
        groups = {}
        for i in range(len(v)):
            zi, ii = int(z[i]), int(ion[i])
            if species_filter is not None:
                if (zi, ii) in species_filter:
                    key = (zi, ii)
                elif (zi, None) in species_filter:
                    key = (zi, None)
                else:
                    continue
            else:
                key = (zi, None)
            groups.setdefault(key, []).append(v[i])
        if not groups:
            raise ValueError(
                f"No valid species found for plotting. Requested: "
                f"{species_list}"
            )

        def label(key):
            zz, ii = key
            sym = ATOMIC_SYMBOLS[zz - 1]
            return sym if ii is None else f"{sym} {_roman(ii)}"

        keys = sorted(groups, key=lambda k: (k[0], -1 if k[1] is None
                                             else k[1]))
        self.plot_data = [np.asarray(groups[k]) for k in keys]
        self._species_name = [label(k) for k in keys]

        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        cmap = plt.get_cmap(cmapname, len(keys))
        self.plot_colors = [cmap(i) for i in range(len(keys))]

        geo = self.sim.state.geometry
        bin_edges = np.concatenate(
            [[geo.v_inner[0]], geo.v_outer]
        ) / 1e5  # km/s shell grid
        if num_bins:
            if num_bins < 1:
                raise ValueError("Number of bins must be positive")
            num_bins = min(num_bins, len(bin_edges) - 1)
            bin_edges = np.linspace(
                bin_edges[0], bin_edges[-1], num_bins + 1
            )
        self.bin_edges = bin_edges

    @staticmethod
    def _step_data(data, bin_edges):
        """Histogram -> step-plot x/y (reference liv_plot.py:364-377)."""
        hist, _ = np.histogram(data, bins=bin_edges)
        x = np.repeat(bin_edges, 2)[1:-1]
        y = np.repeat(hist, 2)
        return x, y

    # ------------------------------------------------------------------
    def generate_plot_mpl(
        self,
        packets_mode: str = "real",
        packet_wvl_range=None,
        species_list=None,
        nelements=None,
        num_bins=None,
        log_scale: bool = False,
        cmapname: str = "jet",
        ax=None,
        save_path=None,
    ):
        """Matplotlib step plot (reference generate_plot_mpl)."""
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        self._prepare(packets_mode, packet_wvl_range, species_list,
                      nelements, num_bins, cmapname)
        if ax is None:
            _, ax = plt.subplots(figsize=(10, 5))
        for data, color, name in zip(
            self.plot_data, self.plot_colors, self._species_name
        ):
            x, y = self._step_data(data, self.bin_edges)
            ax.plot(x, y, color=color, label=name, drawstyle="default",
                    linewidth=1.5)
        if log_scale:
            ax.set_yscale("log")
        ax.set_xlabel("Last Interaction Velocity [km/s]")
        ax.set_ylabel("Packet Count")
        ax.legend(fontsize=9)
        ax.figure.tight_layout()
        if save_path:
            ax.figure.savefig(save_path, dpi=120)
        return ax

    def generate_plot_ply(
        self,
        packets_mode: str = "real",
        packet_wvl_range=None,
        species_list=None,
        nelements=None,
        num_bins=None,
        log_scale: bool = False,
        cmapname: str = "jet",
        fig=None,
    ):
        """Interactive plotly figure (reference generate_plot_ply).
        Requires plotly; raises ImportError otherwise."""
        import plotly.graph_objects as go
        from matplotlib.colors import to_hex

        self._prepare(packets_mode, packet_wvl_range, species_list,
                      nelements, num_bins, cmapname)
        if fig is None:
            fig = go.Figure()
        for data, color, name in zip(
            self.plot_data, self.plot_colors, self._species_name
        ):
            x, y = self._step_data(data, self.bin_edges)
            fig.add_trace(
                go.Scatter(
                    x=x, y=y, mode="lines", name=name,
                    line=dict(color=to_hex(color), width=1.5),
                )
            )
        fig.update_layout(
            xaxis_title="Last Interaction Velocity [km/s]",
            yaxis_title="Packet Count",
            yaxis_type="log" if log_scale else "linear",
            height=500,
        )
        return fig
