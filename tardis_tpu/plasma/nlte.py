"""NLTE level populations via statistical-equilibrium rate matrices.

Counterpart of the reference's ``LevelBoltzmannFactorNLTE``
(/root/reference/tardis/plasma/properties/partition_function.py:133-330):
for each NLTE-treated species, build the radiative (+ approximate
collisional) rate matrix per shell from Einstein coefficients and the line
mean intensities, and solve the singular balance system with a particle-
conservation closure.

Radiative rates (Einstein relations from f_lu):
    A_ul = (8 pi^2 e^2 nu^2 / m_e c^3) (g_l/g_u) f_lu
    B_lu = (4 pi^2 e^2 / m_e h nu c) f_lu          [J_nu convention]
    B_ul = (g_l/g_u) B_lu

Modes (reference flags, plasma/properties/partition_function.py:133):
- default: stimulated/absorption rates use the line j_blues
- coronal_approximation: j_blues = 0 (pure radiative decay + collisions)
- classical_nebular: j_blues = W * B_nu(T_rad)

Collisional rates use the van Regemorter (1962) approximation built from
f_lu when no tabulated collision strengths exist (the synthetic dataset and
kurucz without chianti have none).
"""

from __future__ import annotations

import numpy as np

from tardis_tpu.constants import C, E_CHARGE, H, K_B, M_E
from tardis_tpu.plasma.lte import intensity_black_body

_A_COEF = 8.0 * np.pi**2 * E_CHARGE**2 / (M_E * C**3)
_B_COEF = 4.0 * np.pi**2 * E_CHARGE**2 / (M_E * H * C)
# van Regemorter: C_lu ~ 20.6 * lambda^3 ... use the standard form with
# effective Gaunt factor 0.2 (neutral) / 0.7 (ions)
_VR_COEF = 5.465e-11  # cm^3 s^-1 sqrt(K) prefactor for rate coefficient
# BETA_COLL = (h^4 / (8 k_B m_e^3 pi^3))^1/2 — the tabulated-strength rate
# prefactor (reference equilibrium/rates/collision_strengths.py:62;
# Przybilla & Butler 2004 eq. A2)
BETA_COLL = float(
    np.sqrt(H**4 / (8.0 * K_B * M_E**3 * np.pi**3))
)


def interp_yg(collision, t_electrons: np.ndarray) -> np.ndarray:
    """yg = Upsilon/g_l linearly interpolated in T_e -> (Nc, S)
    (reference YgData + UpsilonCMFGENSolver interpolation,
    plasma/properties/atomic.py:646,
    equilibrium/rates/collision_strengths.py:75-95)."""
    temps = collision.temperatures
    t = np.clip(t_electrons, temps[0], temps[-1])
    pos = np.clip(np.searchsorted(temps, t), 1, len(temps) - 1)
    f = (t - temps[pos - 1]) / (temps[pos] - temps[pos - 1])
    return collision.yg[:, pos - 1] * (1.0 - f) + collision.yg[:, pos] * f


def parse_species(spec: str) -> tuple[int, int]:
    """'Si 2' / 'Si II'-style strings -> (Z, ion) with ion 0-based
    (reference util species_string_to_tuple)."""
    from tardis_tpu.atomic.atom_data import SYMBOL_TO_Z

    parts = spec.replace("_", " ").split()
    z = SYMBOL_TO_Z[parts[0].capitalize()]
    ion_str = parts[1]
    roman = {"I": 1, "II": 2, "III": 3, "IV": 4, "V": 5, "VI": 6}
    ion = roman[ion_str] - 1 if ion_str in roman else int(ion_str) - 1
    return z, ion


def nlte_level_boltzmann_factor(
    atom_data,
    species: tuple[int, int],
    t_rad: np.ndarray,  # (S,)
    w: np.ndarray,  # (S,)
    j_blues: np.ndarray,  # (L, S) line mean intensities
    electron_densities: np.ndarray | None = None,  # (S,) for collisions
    t_electrons: np.ndarray | None = None,
    coronal_approximation: bool = False,
    classical_nebular: bool = False,
) -> tuple[np.ndarray, np.ndarray]:
    """Solve level populations for one species.

    Returns (level_indices_flat, boltzmann_factor (K, S)): the NLTE
    replacement rows for the species' general_level_boltzmann_factor,
    normalized so the ground level matches the LTE convention
    (bf_0 = g_0, cf. reference :252-258).
    """
    z, ion = species
    sel = (atom_data.level_z == z) & (atom_data.level_ion == ion)
    level_idx = np.nonzero(sel)[0]
    K = len(level_idx)
    S = len(t_rad)
    if K == 0:
        return level_idx, np.zeros((0, S))

    g = atom_data.level_g[level_idx]

    # lines within the species
    lmask = (atom_data.line_z == z) & (atom_data.line_ion == ion)
    line_ids = np.nonzero(lmask)[0]
    # map flat level index -> local index
    local = {int(f): k for k, f in enumerate(level_idx)}
    lo = np.array(
        [local[int(i)] for i in atom_data.line_lower_idx[line_ids]]
    )
    up = np.array(
        [local[int(i)] for i in atom_data.line_upper_idx[line_ids]]
    )
    nu = atom_data.line_nu[line_ids]
    f_lu = atom_data.line_f_lu[line_ids]
    g_l, g_u = g[lo], g[up]

    a_ul = _A_COEF * nu**2 * (g_l / g_u) * f_lu  # (nl,)
    b_lu = _B_COEF / nu * f_lu
    b_ul = b_lu * (g_l / g_u)

    if coronal_approximation:
        jb = np.zeros((len(line_ids), S))
    elif classical_nebular:
        jb = w[None, :] * intensity_black_body(nu[:, None], t_rad[None, :])
    else:
        jb = j_blues[line_ids]

    r_down = a_ul[:, None] + b_ul[:, None] * jb  # u -> l  (nl, S)
    r_up = b_lu[:, None] * jb  # l -> u

    # tabulated collision strengths where available (reference YgData,
    # combine_first with the van Regemorter approximation for uncovered
    # transitions, plasma/properties/atomic.py:688-696)
    tab_lo = tab_up = None
    tc_lu = tc_ul = None
    covered = np.zeros(len(line_ids), dtype=bool)
    coll = getattr(atom_data, "collision", None)
    if (
        coll is not None
        and len(coll) > 0
        and electron_densities is not None
        and t_electrons is not None
    ):
        in_sp = sel[coll.lower_flat] & sel[coll.upper_flat]
        if in_sp.any():
            lo_f = coll.lower_flat[in_sp]
            up_f = coll.upper_flat[in_sp]
            from dataclasses import replace as _dc_replace

            sub = _dc_replace(
                coll,
                lower_flat=lo_f,
                upper_flat=up_f,
                yg=coll.yg[in_sp],
            )
            yg_T = interp_yg(sub, t_electrons)  # (Nc, S)
            tab_lo = np.array([local[int(i)] for i in lo_f])
            tab_up = np.array([local[int(i)] for i in up_f])
            d_e_tab = (
                atom_data.level_energy[up_f] - atom_data.level_energy[lo_f]
            )
            u0_tab = np.minimum(
                d_e_tab[:, None] / (K_B * t_electrons)[None, :], 500.0
            )
            pref = BETA_COLL / np.sqrt(t_electrons)[None, :]
            q_lu_tab = pref * yg_T * np.exp(-u0_tab)
            q_ul_tab = pref * yg_T * (g[tab_lo] / g[tab_up])[:, None]
            tc_lu = q_lu_tab * electron_densities[None, :]
            tc_ul = q_ul_tab * electron_densities[None, :]
            # mark line transitions covered by tabulated data
            K_loc = K
            tab_keys = set(
                (int(a) * K_loc + int(b)) for a, b in zip(tab_lo, tab_up)
            )
            covered = np.array(
                [int(a) * K_loc + int(b) in tab_keys for a, b in zip(lo, up)]
            )

    # approximate collisional rates: van Regemorter (1962) from f_lu
    # q_lu = 5.465e-11 sqrt(T_e) 14.5 f_lu (I_H/dE)^2 u0 e^-u0 gbar [cm^3/s]
    if electron_densities is not None and t_electrons is not None:
        i_h = 2.1798724e-11  # hydrogen ionization energy [erg]
        de = H * nu  # (nl,)
        u0 = np.minimum(
            de[:, None] / (K_B * t_electrons)[None, :], 500.0
        )  # (nl, S)
        g_bar = 0.2 if ion == 0 else 0.7
        q_lu = (
            _VR_COEF
            * np.sqrt(t_electrons)[None, :]
            * 14.5
            * f_lu[:, None]
            * (i_h / de[:, None]) ** 2
            * u0
            * np.exp(-u0)
            * g_bar
        )
        c_lu = q_lu * electron_densities[None, :]
        # detailed balance: C_ul = C_lu (g_l/g_u) e^{u0}
        c_ul = c_lu * (g_l / g_u)[:, None] * np.exp(u0)
        # transitions with tabulated strengths: drop the approximation
        # (the tabulated pair supplies the collisional rate instead)
        c_lu = np.where(covered[:, None], 0.0, c_lu)
        c_ul = np.where(covered[:, None], 0.0, c_ul)
    else:
        c_lu = np.zeros((len(line_ids), S))
        c_ul = np.zeros((len(line_ids), S))

    # build and solve the rate matrix per shell
    bf = np.empty((K, S))
    for s in range(S):
        M = np.zeros((K, K))
        np.add.at(M, (lo, up), r_down[:, s] + c_ul[:, s])  # into l from u
        np.add.at(M, (up, lo), r_up[:, s] + c_lu[:, s])  # into u from l
        if tab_lo is not None:
            np.add.at(M, (tab_lo, tab_up), tc_ul[:, s])  # into l from u
            np.add.at(M, (tab_up, tab_lo), tc_lu[:, s])  # into u from l
        out_rate = -M.sum(axis=0)
        M[np.diag_indices(K)] += out_rate
        # particle conservation closure replaces the last row
        M[-1, :] = 1.0
        rhs = np.zeros(K)
        rhs[-1] = 1.0
        try:
            n = np.linalg.solve(M, rhs)
        except np.linalg.LinAlgError:
            n = np.full(K, 1.0 / K)
        n = np.clip(n, 1e-300, None)
        # normalize to the LTE boltzmann-factor convention: bf_0 = g_0
        bf[:, s] = n / n[0] * g[0]
    return level_idx, bf
