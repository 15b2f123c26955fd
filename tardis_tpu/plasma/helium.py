"""Helium NLTE recombination approximation.

Counterpart of the reference's ``HeliumNLTE`` property and the helium-aware
electron-density fixpoint ``IonNumberDensityHeNLTE``
(/root/reference/tardis/plasma/properties/helium_nlte.py:20-117 and
ion_population.py:395-533): helium level populations are tied to the He II
ground state through detailed-balance recombination factors instead of the
Saha ladder, and the He ion populations (hence the free-electron budget) are
rebuilt from them inside the n_e iteration.

All quantities are flat batched arrays (levels x shells), no pandas.
"""

from __future__ import annotations

import numpy as np

from tardis_tpu.plasma import lte

ION_ZERO_THRESHOLD = 1e-20


def helium_relative_population(
    atom,
    bf: np.ndarray,  # (N_levels, S) level Boltzmann factors
    g_el: np.ndarray,  # (S,)
    beta_rad: np.ndarray,  # (S,)
    w: np.ndarray,  # (S,)
    t_rad: np.ndarray,  # (S,)
    t_electrons: np.ndarray,  # (S,)
    chi_he1: float,  # He I -> He II ionization energy [erg]
    chi_he2: float,  # He II -> He III
    zeta_he2: np.ndarray,  # (S,) zeta for (2, 2)
    delta_he2: np.ndarray,  # (S,) delta for (2, 2)
):
    """Per-level He populations relative to the He II ground state (=1).

    Returns (rows (n_he_levels,) flat level indices, rel_pop (n, S),
    he3_rel (S,), stage_of_row (n,)).
    (reference helium_nlte.py:41-117)
    """
    sp_idx = {}
    for i, (z, ion) in enumerate(zip(atom.species_z, atom.species_ion)):
        if z == 2:
            sp_idx[int(ion)] = i
    if 0 not in sp_idx or 1 not in sp_idx:
        raise ValueError(
            "helium recomb-NLTE requires He I and He II level data"
        )
    lvl_sp = atom.level_species_id
    rows_he1 = np.where(lvl_sp == sp_idx[0])[0]
    rows_he2 = np.where(lvl_sp == sp_idx[1])[0]
    g_he2_ground = float(atom.level_g[rows_he2[0]])
    g_he3_ground = 1.0
    if 2 in sp_idx:
        rows_he3 = np.where(lvl_sp == sp_idx[2])[0]
        if len(rows_he3):
            g_he3_ground = float(atom.level_g[rows_he3[0]])

    # He I excited states in recombination equilibrium with He II ground
    # (helium_nlte.py:77-91)
    he1 = (
        bf[rows_he1]
        / (2.0 * g_he2_ground)
        / g_el[None, :]
        / (w[None, :] ** 2)
        * np.exp(chi_he1 * beta_rad)[None, :]
    )
    he1[0] = 0.0  # He I ground state not populated in this approximation
    # He II states relative to its ground (helium_nlte.py:51-59)
    he2 = bf[rows_he2] / g_he2_ground
    he2[0] = 1.0
    # He III ground (helium_nlte.py:93-117)
    he3 = (
        2.0
        * (g_he3_ground / g_he2_ground)
        * g_el
        * np.exp(-chi_he2 * beta_rad)
        * w
        * (delta_he2 * zeta_he2 + w * (1.0 - zeta_he2))
        * np.sqrt(t_electrons / t_rad)
    )
    rows = np.concatenate([rows_he1, rows_he2])
    rel = np.concatenate([he1, he2], axis=0)
    stage = np.concatenate(
        [np.zeros(len(rows_he1), np.int64), np.ones(len(rows_he2), np.int64)]
    )
    return rows, rel, he3, stage


def _update_he_population(rel, he3_rel, stage, n_e, n_he):
    """Scale the relative populations by n_e and normalise to N_He
    (reference ion_population.py:429-448)."""
    pop = np.where(stage[:, None] == 0, rel * n_e[None, :], rel)
    he3 = he3_rel / n_e
    total = pop.sum(axis=0) + he3
    scale = n_he / np.maximum(total, 1e-300)
    return pop * scale[None, :], he3 * scale


def ion_number_density_he_nlte(
    phi: np.ndarray,
    element_block_start: np.ndarray,
    number_density: np.ndarray,
    he_element_index: int,
    rel: np.ndarray,
    he3_rel: np.ndarray,
    stage: np.ndarray,
    n_electron_init: np.ndarray | None = None,
    electron_densities: np.ndarray | None = None,
    n_e_convergence_threshold: float = 0.05,
    max_iterations: int = 200,
):
    """Saha ladder + n_e fixpoint with helium populations overridden by the
    recombination approximation (reference IonNumberDensityHeNLTE.calculate,
    ion_population.py:450-533).

    Returns (ion_density, n_electron, ion_block_start,
    (he_level_pop (n, S), he3_pop (S,))).
    """
    E, S = number_density.shape
    n_pairs = phi.shape[0]
    ion_block_start = element_block_start + np.arange(E + 1)
    n_he = number_density[he_element_index]
    o_he = ion_block_start[he_element_index]
    n_he_stages = (
        ion_block_start[he_element_index + 1] - o_he
    )

    def solve(n_e):
        phi_e = phi / n_e[None, :]
        ion_density = np.empty((n_pairs + E, S))
        for e in range(E):
            b0, b1 = element_block_start[e], element_block_start[e + 1]
            prod = np.cumprod(phi_e[b0:b1], axis=0)
            base = number_density[e] / (1.0 + prod.sum(axis=0))
            o0 = ion_block_start[e]
            ion_density[o0] = base
            ion_density[o0 + 1 : o0 + 1 + (b1 - b0)] = base[None, :] * prod
        # helium override
        pop, he3 = _update_he_population(rel, he3_rel, stage, n_e, n_he)
        ion_density[o_he] = pop[stage == 0].sum(axis=0)
        if n_he_stages > 1:
            ion_density[o_he + 1] = pop[stage == 1].sum(axis=0)
        if n_he_stages > 2:
            ion_density[o_he + 2] = he3
        ion_density[ion_density < ION_ZERO_THRESHOLD] = 0.0
        return ion_density, pop, he3

    charges = np.concatenate(
        [
            np.arange(
                ion_block_start[e + 1] - ion_block_start[e], dtype=np.float64
            )
            for e in range(E)
        ]
    )

    if electron_densities is not None:
        n_e = np.asarray(electron_densities, dtype=np.float64)
        ion_density, pop, he3 = solve(n_e)
        return ion_density, n_e, ion_block_start, (pop, he3)

    n_e = (
        number_density.sum(axis=0)
        if n_electron_init is None
        else np.array(n_electron_init, dtype=np.float64)
    )
    for _ in range(max_iterations):
        ion_density, pop, he3 = solve(n_e)
        n_e_new = (ion_density * charges[:, None]).sum(axis=0)
        if np.any(np.isnan(n_e_new)):
            raise RuntimeError("n_electron turned NaN in helium NLTE solve")
        if np.all(
            np.abs(n_e_new - n_e) / np.maximum(n_e, 1e-300)
            < n_e_convergence_threshold
        ):
            n_e = n_e_new
            break
        n_e = 0.5 * (n_e_new + n_e)
    ion_density, pop, he3 = solve(n_e)
    return ion_density, n_e, ion_block_start, (pop, he3)
