"""Helium NLTE treatments: recombination approximation + numerical solve.

Counterpart of the reference's ``HeliumNLTE`` property and the helium-aware
electron-density fixpoint ``IonNumberDensityHeNLTE``
(/root/reference/tardis/plasma/properties/helium_nlte.py:20-117 and
ion_population.py:395-533): helium level populations are tied to the He II
ground state through detailed-balance recombination factors instead of the
Saha ladder, and the He ion populations (hence the free-electron budget) are
rebuilt from them inside the n_e iteration.

``helium_numerical_nlte`` is the counterpart of the reference's
``HeliumNumericalNLTE`` (helium_nlte.py:120-280), which shells out to an
external, non-distributed NLTE solver binary via text files.  Here the
numerical solve is done in-framework instead: a full statistical-equilibrium
rate matrix over [He I levels | He II levels | He III ground] with
bound-bound radiative + collisional rates, hydrogenic photoionization,
Milne-relation recombination (spontaneous + stimulated), and Seaton
collisional ionization with three-body recombination by detailed balance.

All quantities are flat batched arrays (levels x shells), no pandas.
"""

from __future__ import annotations

import numpy as np

from tardis_tpu.constants import C, E_CHARGE, H, K_B, M_E
from tardis_tpu.plasma import lte

ION_ZERO_THRESHOLD = 1e-20
_CHI_H = 2.1798724e-11  # hydrogen ionization energy [erg]
_SIGMA_0 = 7.906e-18  # hydrogenic ground-state photoionization xsect [cm^2]
_A_COEF = 8.0 * np.pi**2 * E_CHARGE**2 / (M_E * C**3)
_B_COEF = 4.0 * np.pi**2 * E_CHARGE**2 / (M_E * H * C)
_VR_COEF = 5.465e-11
_SAHA_CONST = (H * H / (2.0 * np.pi * M_E * K_B)) ** 1.5  # cm^3 K^{3/2}


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


# ----------------------------------------------------------------------
# Numerical helium NLTE (reference HeliumNumericalNLTE, helium_nlte.py:120)
# ----------------------------------------------------------------------

def _species_rows(atom, ion):
    sp = None
    for i, (z, j) in enumerate(zip(atom.species_z, atom.species_ion)):
        if z == 2 and j == ion:
            sp = i
            break
    if sp is None:
        return np.empty(0, np.int64)
    return np.where(atom.level_species_id == sp)[0]


def _bb_rate_entries(atom, rows, local, j_blues, t_electrons, n_e, g):
    """Bound-bound radiative + van Regemorter collisional rate entries for
    the lines internal to the level set ``rows`` (flat indices).

    Returns (lo, up, rate_up (nl, S), rate_down (nl, S)) with local
    indices into ``rows`` (formulas shared with plasma/nlte.py:108-203).
    """
    inset = np.zeros(len(atom.level_energy), dtype=bool)
    inset[rows] = True
    lmask = inset[atom.line_lower_idx] & inset[atom.line_upper_idx]
    lids = np.nonzero(lmask)[0]
    S = len(t_electrons)
    if len(lids) == 0:
        e = np.empty(0, np.int64)
        return e, e, np.zeros((0, S)), np.zeros((0, S))
    lo = np.array([local[int(i)] for i in atom.line_lower_idx[lids]])
    up = np.array([local[int(i)] for i in atom.line_upper_idx[lids]])
    nu = atom.line_nu[lids]
    f_lu = atom.line_f_lu[lids]
    g_l, g_u = g[lo], g[up]
    a_ul = _A_COEF * nu**2 * (g_l / g_u) * f_lu
    b_lu = _B_COEF / nu * f_lu
    b_ul = b_lu * (g_l / g_u)
    jb = j_blues[lids]
    r_down = a_ul[:, None] + b_ul[:, None] * jb
    r_up = b_lu[:, None] * jb
    # van Regemorter collisions: per-line gbar from the LOWER level's ion
    # (0.2 neutral, 0.7 ions — convention shared with plasma/nlte.py:183);
    # the concatenated He I + He II rows must not all inherit row 0's ion
    de = H * nu
    u0 = np.minimum(de[:, None] / (K_B * t_electrons)[None, :], 500.0)
    g_bar = np.where(
        atom.level_ion[atom.line_lower_idx[lids]] == 0, 0.2, 0.7
    )
    q_lu = (
        _VR_COEF * np.sqrt(t_electrons)[None, :] * 14.5 * f_lu[:, None]
        * (_CHI_H / de[:, None]) ** 2 * u0 * np.exp(-u0) * g_bar[:, None]
    )
    c_lu = q_lu * n_e[None, :]
    c_ul = c_lu * (g_l / g_u)[:, None] * np.exp(u0)

    # tabulated collision strengths where available override van Regemorter
    # (same preference order as plasma/nlte.py:127-200; reference YgData
    # combine_first, plasma/properties/atomic.py:688-696)
    coll = getattr(atom, "collision", None)
    if coll is not None and len(coll) > 0:
        in_sp = inset[coll.lower_flat] & inset[coll.upper_flat]
        if in_sp.any():
            from dataclasses import replace as _dc_replace

            from tardis_tpu.plasma.nlte import BETA_COLL, interp_yg

            lo_f = coll.lower_flat[in_sp]
            up_f = coll.upper_flat[in_sp]
            sub = _dc_replace(
                coll, lower_flat=lo_f, upper_flat=up_f, yg=coll.yg[in_sp]
            )
            yg_T = interp_yg(sub, t_electrons)  # (Nc, S)
            tab_lo = np.array([local[int(i)] for i in lo_f])
            tab_up = np.array([local[int(i)] for i in up_f])
            d_e = atom.level_energy[up_f] - atom.level_energy[lo_f]
            u0_t = np.minimum(
                d_e[:, None] / (K_B * t_electrons)[None, :], 500.0
            )
            pref = BETA_COLL / np.sqrt(t_electrons)[None, :]
            tc_lu = pref * yg_T * np.exp(-u0_t) * n_e[None, :]
            tc_ul = (
                pref * yg_T * (g[tab_lo] / g[tab_up])[:, None] * n_e[None, :]
            )
            # zero the approximation on covered (lo, up) pairs, then add the
            # tabulated pair entries onto matching line rows
            K_loc = len(g)
            tab_keys = {
                int(a) * K_loc + int(b): k
                for k, (a, b) in enumerate(zip(tab_lo, tab_up))
            }
            pair_key = lo * K_loc + up
            cov_pos = np.array(
                [tab_keys.get(int(p), -1) for p in pair_key]
            )
            covered = cov_pos >= 0
            c_lu = np.where(covered[:, None], 0.0, c_lu)
            c_ul = np.where(covered[:, None], 0.0, c_ul)
            pos = np.maximum(cov_pos, 0)
            c_lu = c_lu + np.where(covered[:, None], tc_lu[pos], 0.0)
            c_ul = c_ul + np.where(covered[:, None], tc_ul[pos], 0.0)
    return lo, up, r_up + c_lu, r_down + c_ul


def _ionization_rates(chi_lvl, g_lvl, g_ion, z_core, t_rad, w, t_electrons,
                      n_e, n_nu=48):
    """Per-level ionization/recombination rates to the next ion's ground.

    Hydrogenic Kramers cross-section sigma(nu) = sigma_0 n_eff / z^2
    (nu_th/nu)^3 from each level threshold chi_lvl; photoionization under
    the dilute radiation field J_nu = W B_nu(T_rad), recombination
    (spontaneous + stimulated) by the Milne relation at T_e, collisional
    ionization by Seaton's semi-empirical formula with three-body
    recombination from detailed balance (Saha at T_e).

    Returns (R_ion (K, S), R_rec (K, S)) [1/s] per level; R_rec already
    includes the n_e factor (rate per upper-ion ground-state particle).
    """
    K = len(chi_lvl)
    S = len(t_rad)
    chi = np.maximum(chi_lvl, 1e-13)
    nu_th = chi / H  # (K,)
    n_eff = z_core * np.sqrt(_CHI_H / chi)
    sigma_th = _SIGMA_0 * np.maximum(n_eff, 0.1) / z_core**2  # (K,)
    # log-nu grid per level: nu_th .. 40 nu_th
    x = np.logspace(0.0, np.log10(40.0), n_nu)  # (n,)
    nu = nu_th[:, None] * x[None, :]  # (K, n)
    sig = sigma_th[:, None] * x[None, :] ** -3
    # J_nu = W B_nu(T_rad): (K, n, S)
    hk = H / K_B
    with np.errstate(over="ignore"):
        b_rad = (2.0 * H * nu**3 / C**2)[:, :, None] / np.expm1(
            np.minimum(hk * nu[:, :, None] / t_rad[None, None, :], 600.0)
        )
    j_nu = w[None, None, :] * b_rad
    wgt = np.gradient(nu, axis=1)[:, :, None]  # d nu
    pref = 4.0 * np.pi * sig[:, :, None] / (H * nu)[:, :, None]
    # photoionization rate per lower-level particle
    r_pi = (pref * j_nu * wgt).sum(axis=1)  # (K, S)
    # Milne: recombination per (N_+ n_e); LTE ratio at T_e
    with np.errstate(over="ignore"):
        boltz_e = np.exp(
            -np.minimum(hk * nu[:, :, None] / t_electrons[None, None, :],
                        600.0)
        )
        b_el = (2.0 * H * nu**3 / C**2)[:, :, None] / np.expm1(
            np.minimum(hk * nu[:, :, None] / t_electrons[None, None, :],
                       600.0)
        )
    saha = (
        (g_lvl / (2.0 * g_ion))[:, None]
        * _SAHA_CONST / t_electrons[None, :] ** 1.5
        * np.exp(np.minimum(chi[:, None] / (K_B * t_electrons)[None, :],
                            600.0))
    )  # (K, S): (n_l / n_+ n_e)_LTE
    r_rec_sp = saha * (pref * b_el * boltz_e * wgt).sum(axis=1)
    r_rec_st = saha * (pref * j_nu * boltz_e * wgt).sum(axis=1)
    # Seaton collisional ionization: C_I = 1.55e13 T_e^-1/2 gbar sigma_th
    # e^-u / u  * n_e,  u = chi/kT_e; gbar = 0.1 z_core (Seaton's
    # conventional ~0.1 for neutrals, ~0.2 for singly-charged ions)
    u = chi[:, None] / (K_B * t_electrons)[None, :]
    g_bar = 0.1 * z_core
    q_ci = (
        1.55e13 / np.sqrt(t_electrons)[None, :] * g_bar * sigma_th[:, None]
        * np.exp(-np.minimum(u, 600.0)) / np.maximum(u, 1e-10)
    )
    r_ci = q_ci * n_e[None, :]
    # three-body recombination from detailed balance
    r_3b = saha * q_ci * n_e[None, :]
    r_ion = r_pi + r_ci
    r_rec = (r_rec_sp + r_rec_st + r_3b) * n_e[None, :]
    return r_ion, r_rec


def helium_numerical_nlte(
    atom,
    t_rad: np.ndarray,  # (S,)
    w: np.ndarray,  # (S,)
    t_electrons: np.ndarray,  # (S,)
    n_e: np.ndarray,  # (S,)
    j_blues: np.ndarray,  # (L, S)
    n_he: np.ndarray,  # (S,) total helium number density
    heating_rate_data: np.ndarray | None = None,
):
    """Numerical helium NLTE level + ion populations.

    In-framework replacement for the reference's HeliumNumericalNLTE
    (helium_nlte.py:120-280), which forwards shell conditions to an
    external, non-distributed solver executable; populations here come
    from a statistical-equilibrium matrix over
    [He I levels | He II levels | He III ground] per shell, normalized to
    the total helium number density (reference :275-279).

    ``heating_rate_data`` is accepted for API parity (the reference streams
    it to the external module); the in-framework solve uses t_electrons
    directly and does not need it.

    Returns (rows (flat He I+II level indices), pops (n_rows, S),
    he3_pop (S,), ion_pops (3, S)).
    """
    rows1 = _species_rows(atom, 0)
    rows2 = _species_rows(atom, 1)
    if len(rows1) == 0 or len(rows2) == 0:
        raise ValueError("numerical helium NLTE requires He I and He II")
    K1, K2 = len(rows1), len(rows2)
    S = len(t_rad)
    n = K1 + K2 + 1
    rows = np.concatenate([rows1, rows2])
    local = {int(f): k for k, f in enumerate(rows)}
    g = atom.level_g[rows].astype(np.float64)

    # bound-bound entries within He I and He II
    lo, up, rate_up, rate_dn = _bb_rate_entries(
        atom, rows, local, j_blues, t_electrons, n_e, g
    )

    # ionization channels: He I levels -> He II ground (state K1),
    # He II levels -> He III ground (state K1+K2)
    chi_lookup = {
        (int(z), int(j)): chi
        for z, j, chi in zip(
            atom.ionization_z, atom.ionization_ion, atom.ionization_energy
        )
    }
    chi1 = chi_lookup[(2, 1)] - atom.level_energy[rows1]
    chi2 = chi_lookup[(2, 2)] - atom.level_energy[rows2]
    ion1, rec1 = _ionization_rates(
        chi1, g[:K1], g[K1], 1.0, t_rad, w, t_electrons, n_e
    )
    ion2, rec2 = _ionization_rates(
        chi2, g[K1 : K1 + K2], 1.0, 2.0, t_rad, w, t_electrons, n_e
    )

    pops = np.empty((n, S))
    for s in range(S):
        M = np.zeros((n, n))
        if len(lo):
            np.add.at(M, (up, lo), rate_up[:, s])
            np.add.at(M, (lo, up), rate_dn[:, s])
        # He I <-> He II ground
        M[K1, :K1] += ion1[:, s]
        M[:K1, K1] += rec1[:, s]
        # He II <-> He III ground
        M[K1 + K2, K1 : K1 + K2] += ion2[:, s]
        M[K1 : K1 + K2, K1 + K2] += rec2[:, s]
        M[np.diag_indices(n)] -= M.sum(axis=0)
        M[-1, :] = 1.0
        rhs = np.zeros(n)
        rhs[-1] = 1.0
        try:
            x = np.linalg.solve(M, rhs)
        except np.linalg.LinAlgError:
            x = np.full(n, 1.0 / n)
        pops[:, s] = np.clip(x, 0.0, None)

    # normalize to the helium number density (reference :275-279)
    total = pops.sum(axis=0)
    pops *= n_he[None, :] / np.maximum(total, 1e-300)
    level_pops = pops[: K1 + K2]
    he3 = pops[K1 + K2]
    ion_pops = np.stack(
        [pops[:K1].sum(axis=0), pops[K1 : K1 + K2].sum(axis=0), he3]
    )
    return rows, level_pops, he3, ion_pops
