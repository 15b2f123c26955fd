"""Last-interaction-velocity (LIV) plot.

Counterpart of the reference's ``LIVPlotter``
(/root/reference/tardis/visualization/tools/liv_plot.py): distribution of
the velocity at which escaping packets last interacted, split by species.
"""

from __future__ import annotations

import numpy as np

from tardis_tpu.atomic.atom_data import ATOMIC_SYMBOLS
from tardis_tpu.constants import C


class LIVPlotter:
    def __init__(self, sim):
        res = sim.last_transport_result
        if res is None or res.last_interaction is None:
            raise ValueError("needs a finished simulation with tracking")
        self.sim = sim
        self.res = res
        self.atom = sim.atom_data

    def interaction_velocities(self):
        """km/s velocities of last line interactions of escaped packets,
        grouped by species Z."""
        li = self.res.last_interaction
        m = (self.res.output_status == 1) & (li["type"] == 2)
        v = li["r"][m] / self.sim.state.time_explosion / 1e5  # km/s
        z = self.atom.line_z[np.clip(li["out_line"][m], 0, None)]
        return v, z

    def generate_plot_mpl(self, bins: int = 40, save_path=None):
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        v, z = self.interaction_velocities()
        geo = self.sim.state.geometry
        edges = np.linspace(geo.v_inner[0] / 1e5, geo.v_outer[-1] / 1e5,
                            bins + 1)
        fig, ax = plt.subplots(figsize=(9, 5))
        for zz in np.unique(z):
            h, _ = np.histogram(v[z == zz], bins=edges)
            ax.step(edges[:-1], h, where="post",
                    label=ATOMIC_SYMBOLS[zz - 1])
        ax.set_xlabel("last interaction velocity [km/s]")
        ax.set_ylabel("packet count")
        ax.legend()
        if save_path:
            fig.savefig(save_path, dpi=120)
        return fig
