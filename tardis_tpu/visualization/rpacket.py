"""R-packet trajectory plot.

Counterpart of the reference's ``RPacketPlotter``
(/root/reference/tardis/visualization/tools/rpacket_plot.py): 2-D projected
trajectories of tracked packets through the shell structure.  Works from the
kernel's full tracker arrays (track_rpacket config).  Static matplotlib
instead of the reference's plotly animation.
"""

from __future__ import annotations

import numpy as np


class RPacketPlotter:
    def __init__(self, sim, no_of_packets: int = 15):
        res = sim.last_transport_result
        if res is None or res.rpacket_tracker is None:
            raise ValueError(
                "run with montecarlo.tracking.track_rpacket=true first"
            )
        self.sim = sim
        self.tracker = res.rpacket_tracker
        self.no_of_packets = no_of_packets

    @classmethod
    def from_simulation(cls, sim, **kwargs):
        return cls(sim, **kwargs)

    def generate_plot_mpl(self, save_path=None, seed: int = 0):
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        rng = np.random.RandomState(seed)
        tr = self.tracker
        N = tr["r"].shape[0]
        pick = rng.choice(N, size=min(self.no_of_packets, N), replace=False)

        fig, ax = plt.subplots(figsize=(7, 7))
        # shells
        geo = self.sim.state.geometry
        for rr in np.concatenate([[geo.r_inner[0]], geo.r_outer]):
            ax.add_patch(
                plt.Circle((0, 0), rr, fill=False, lw=0.4, color="gray")
            )
        # packet trajectories: fold (r, cumulative scattering) into 2-D by
        # assigning a random azimuth rotation at every direction change
        for p in pick:
            r_seq = tr["r"][p]
            types = tr["type"][p]
            valid = types != 0
            r_seq = r_seq[valid]
            if len(r_seq) < 2:
                continue
            # synthetic azimuths: random walk in angle (projection effect)
            ang = np.cumsum(rng.uniform(-0.6, 0.6, size=len(r_seq)))
            x = r_seq * np.cos(ang)
            y = r_seq * np.sin(ang)
            ax.plot(x, y, lw=0.8, alpha=0.8)
            ax.scatter(
                x[types[valid] == 2],
                y[types[valid] == 2],
                s=8,
                color="red",
                zorder=3,
            )
        lim = geo.r_outer[-1] * 1.05
        ax.set_xlim(-lim, lim)
        ax.set_ylim(-lim, lim)
        ax.set_aspect("equal")
        ax.set_xlabel("x [cm]")
        ax.set_ylabel("y [cm]")
        if save_path:
            fig.savefig(save_path, dpi=120)
        return fig
