"""Convergence diagnostics plotting.

Counterpart of the reference's live ``ConvergencePlots``
(/root/reference/tardis/visualization/tools/convergence_plot.py): static
matplotlib figures of t_rad(v), W(v), t_inner and luminosity per iteration.
Matplotlib is optional; functions raise a clear error if unavailable.
"""

from __future__ import annotations

import numpy as np


def plot_convergence(sim, save_path: str | None = None):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    hist = sim.history
    if not hist:
        raise ValueError("no iteration history to plot")
    v_mid = sim.state.geometry.v_middle / 1e5  # km/s

    fig, axes = plt.subplots(2, 2, figsize=(11, 7))
    for i, h in enumerate(hist):
        alpha = 0.3 + 0.7 * (i + 1) / len(hist)
        axes[0, 0].plot(v_mid, h.t_radiative, alpha=alpha, color="C0")
        axes[0, 1].plot(v_mid, h.dilution_factor, alpha=alpha, color="C1")
    axes[0, 0].set_xlabel("v [km/s]")
    axes[0, 0].set_ylabel("T_rad [K]")
    axes[0, 1].set_xlabel("v [km/s]")
    axes[0, 1].set_ylabel("W")

    iters = np.arange(len(hist))
    axes[1, 0].plot(iters, [h.t_inner for h in hist], "o-")
    axes[1, 0].set_xlabel("iteration")
    axes[1, 0].set_ylabel("t_inner [K]")
    axes[1, 1].plot(iters, [h.emitted_luminosity for h in hist], "o-",
                    label="emitted")
    axes[1, 1].axhline(sim.state.luminosity_requested, ls="--", color="k",
                       label="requested")
    axes[1, 1].set_xlabel("iteration")
    axes[1, 1].set_ylabel("L [erg/s]")
    axes[1, 1].legend()
    fig.tight_layout()
    if save_path:
        fig.savefig(save_path, dpi=120)
    return fig
