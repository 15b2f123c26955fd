"""Grotrian (energy-level / transition) diagrams.

Counterpart of the reference's Grotrian widget
(/root/reference/tardis/visualization/widgets/grotrian.py, plotly-based):
a matplotlib energy-level diagram for one ion, with transition arcs whose
widths encode the packet counts of last-interaction absorptions (up arrows)
and emissions (down arrows) in a chosen shell range, and level bars shaded
by the plasma level populations.
"""

from __future__ import annotations

import numpy as np

from tardis_tpu.utils.base import species_string_to_tuple, species_tuple_to_string


def plot_grotrian(
    sim,
    species: str,
    max_levels: int = 10,
    shell: int | None = None,
    ax=None,
):
    """Energy-level diagram with last-interaction transition arrows.

    Parameters
    ----------
    sim : Simulation (completed, with last-interaction tracking)
    species : 'Si II'-style string
    max_levels : number of lowest levels to draw
    shell : restrict packet counts to one shell (None = all)
    """
    import matplotlib.pyplot as plt

    atom = sim.atom_data
    z, ion = species_string_to_tuple(species)
    sp_idx = None
    for s, (sz, si) in enumerate(zip(atom.species_z, atom.species_ion)):
        if (sz, si) == (z, ion):
            sp_idx = s
            break
    if sp_idx is None:
        raise ValueError(f"species {species} not in the atomic data")
    rows = np.where(atom.level_species_id == sp_idx)[0][:max_levels]
    energies_ev = atom.level_energy[rows] / 1.602176634e-12

    result = sim.last_transport_result
    counts_up = np.zeros((len(rows), len(rows)))
    counts_down = np.zeros_like(counts_up)
    if result is not None and result.last_interaction is not None:
        li = result.last_interaction
        line_mask = li["type"] == 2
        if shell is not None:
            line_mask &= li["shell"] == shell
        row_pos = {int(r): k for k, r in enumerate(rows)}
        for key, counts in (("in_line", counts_up), ("out_line",
                                                     counts_down)):
            lines = li[key][line_mask]
            lines = lines[(lines >= 0) & (lines < atom.n_lines)]
            sel = (atom.line_z[lines] == z) & (atom.line_ion[lines] == ion)
            for lid in lines[sel]:
                lo = row_pos.get(int(atom.line_lower_idx[lid]))
                hi = row_pos.get(int(atom.line_upper_idx[lid]))
                if lo is not None and hi is not None:
                    counts[lo, hi] += 1

    pops = None
    if getattr(sim, "plasma_state", None) is not None:
        lp = sim.plasma_state.level_number_density[rows]
        pops = lp[:, shell] if shell is not None else lp.mean(axis=1)

    if ax is None:
        _, ax = plt.subplots(figsize=(7, 6))
    for k, e in enumerate(energies_ev):
        alpha = 1.0
        if pops is not None and pops.max() > 0:
            alpha = 0.25 + 0.75 * (
                np.log10(max(pops[k], 1e-30 * pops.max()))
                - np.log10(1e-30 * pops.max())
            ) / 30.0
        ax.hlines(e, 0.1, 0.9, lw=3, color="k", alpha=min(alpha, 1.0))
        ax.text(0.92, e, f"{k}", va="center", fontsize=8)

    c_max = max(counts_up.max(), counts_down.max(), 1.0)
    for lo in range(len(rows)):
        for hi in range(len(rows)):
            x_up = 0.3 + 0.4 * lo / max(len(rows) - 1, 1)
            if counts_up[lo, hi] > 0:
                ax.annotate(
                    "", xy=(x_up, energies_ev[hi]),
                    xytext=(x_up, energies_ev[lo]),
                    arrowprops=dict(
                        arrowstyle="->", color="tab:blue",
                        lw=0.5 + 3.0 * counts_up[lo, hi] / c_max,
                        alpha=0.7,
                    ),
                )
            if counts_down[lo, hi] > 0:
                ax.annotate(
                    "", xy=(x_up + 0.03, energies_ev[lo]),
                    xytext=(x_up + 0.03, energies_ev[hi]),
                    arrowprops=dict(
                        arrowstyle="->", color="tab:red",
                        lw=0.5 + 3.0 * counts_down[lo, hi] / c_max,
                        alpha=0.7,
                    ),
                )
    ax.set_xlim(0, 1)
    ax.set_xticks([])
    ax.set_ylabel("Level energy [eV]")
    ax.set_title(
        f"Grotrian diagram: {species_tuple_to_string((z, ion))}"
        + ("" if shell is None else f" (shell {shell})")
    )
    return ax
