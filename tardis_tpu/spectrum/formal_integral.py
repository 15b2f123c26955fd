"""Formal-integral spectrum (Lucy 1999 formal solution).

Re-implements the reference's source-function solve
(/root/reference/tardis/spectrum/formal_integral/source_function.py:28-357)
and the per-(frequency, impact-parameter) ray integration
(formal_integral_numba.py:374-560) TPU-first: the host computes the small
(L x S) source-function tables in float64; the device integrates all
(nu, p) rays in lockstep inside a while_loop, one event (line resonance or
shell crossing) per step, with the same electron-scattering correction
(Lucy 1999 Eqs 26-28) as the reference.

Geometry in kernel units (length / ct): a ray with impact parameter p is
parameterized by z (projection toward the observer); the comoving frequency
is nu_cmf(z) = nu * (1 - z), so lines are crossed in line-list order and the
next resonance is a direct lookup rather than a search.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp
import scipy.sparse.linalg as splinalg

from tardis_tpu.atomic.atom_data import (
    MACRO_EMISSION,
    MacroAtomData,
)
from tardis_tpu.constants import C, SIGMA_THOMSON
from tardis_tpu.opacities.macro_atom_solver import (
    solve_transition_probabilities,
)
from tardis_tpu.plasma.lte import intensity_black_body
from tardis_tpu.spectrum.base import Spectrum
from tardis_tpu.transport.device_state import NU_UNIT
from tardis_tpu.utils.search import searchsorted_unrolled

F32 = jnp.float32
I32 = jnp.int32


# ---------------------------------------------------------------------------
# source function (host, float64)
# ---------------------------------------------------------------------------


@dataclass
class SourceFunctionState:
    att_S_ul: np.ndarray  # (L, S)
    Jred_lu: np.ndarray  # (L, S)
    Jblue_lu: np.ndarray  # (L, S)


def solve_source_function(
    macro: MacroAtomData,
    plasma_state,
    transport_result,
    sim_state,
    atom_data,
    line_interaction_type: str = "macroatom",
) -> SourceFunctionState:
    """Compute att_S_ul, Jred_lu, Jblue_lu from MC estimators.

    (reference source_function.py:28-357)
    """
    tau = plasma_state.tau_sobolev  # (L, S)
    dt = transport_result.time_of_simulation
    volume = sim_state.volume
    t_exp = sim_state.time_explosion
    L, S = tau.shape

    one_m_exptau = -np.expm1(-tau)
    e_dot_lu = (
        transport_result.edot_lu_estimator * one_m_exptau / (dt * volume)
    )

    # sum line absorption into upper macro levels
    n_macro = macro.n_macro_levels
    upper_macro = macro.line2macro_level_upper  # (L,)
    e_dot_u = np.zeros((n_macro, S))
    np.add.at(e_dot_u, upper_macro, e_dot_lu)

    probs = solve_transition_probabilities(
        macro,
        plasma_state.beta_sobolev,
        plasma_state.j_blues,
        plasma_state.stimulated_emission_factor,
    )  # (T, S) normalized

    if line_interaction_type == "macroatom":
        # redistribute through internal jumps: solve (I - Q^T) C = e_dot_u
        internal = macro.transition_type >= 0
        src = np.repeat(
            np.arange(n_macro), np.diff(macro.block_references)
        )[internal]
        dst = macro.destination_level_id[internal]
        p_int = probs[internal]  # (T_int, S)
        C_out = np.empty_like(e_dot_u)
        for s in range(S):
            Q = sp.coo_matrix(
                (p_int[:, s], (src, dst)), shape=(n_macro, n_macro)
            )
            A = (sp.identity(n_macro) - Q).T.tocsc()
            C_out[:, s] = splinalg.spsolve(A, e_dot_u[:, s])
        e_dot_u = C_out

    # attenuated source function per line: lambda * q_ul * e_dot_u * t/(4 pi)
    emission = macro.transition_type == MACRO_EMISSION
    em_line_ids = macro.transition_line_id[emission]
    em_src = np.repeat(
        np.arange(n_macro), np.diff(macro.block_references)
    )[emission]
    q_ul = probs[emission]  # (L_em, S)
    wave = (C / atom_data.line_nu)[em_line_ids][:, None]
    att_vals = wave * q_ul * e_dot_u[em_src] * t_exp / (4.0 * np.pi)
    att_S_ul = np.zeros((L, S))
    att_S_ul[em_line_ids] = att_vals

    jblue_norm = C * t_exp / (4.0 * np.pi * dt * volume)
    Jblue_lu = transport_result.j_blue_estimator * jblue_norm[None, :]
    Jred_lu = Jblue_lu * np.exp(-tau) + att_S_ul

    return SourceFunctionState(
        att_S_ul=att_S_ul, Jred_lu=Jred_lu, Jblue_lu=Jblue_lu
    )


# ---------------------------------------------------------------------------
# device ray integrator
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("n_shells", "n_lines", "n_p"))
def _integrate_rays(
    nu_grid,  # (F,) kernel units
    p_grid,  # (P,) kernel units (impact parameters, excluding p=0)
    r_inner,  # (S,)
    r_outer,  # (S,)
    chi_e,  # (S,) per unit kernel length
    neg_line_nu,  # (L,) ascending
    line_nu,  # (L,) descending
    exp_tau,  # (L*S,)
    att_S,  # (L*S,)
    j_red,  # (L*S,)
    j_blue,  # (L*S,)
    i_inner_nu,  # (F,) photospheric blackbody intensity at nu (physical)
    n_shells: int,
    n_lines: int,
    n_p: int,
):
    """Integrate I_nu(p) for all (nu, p) lanes; returns (F, P) intensities."""
    S, L = n_shells, n_lines
    F = nu_grid.shape[0]
    beta_inner = r_inner[0]
    r_max = r_outer[S - 1]

    nu = jnp.repeat(nu_grid, n_p)  # (F*P,)
    p = jnp.tile(p_grid, F)
    bb = jnp.repeat(i_inner_nu, n_p)

    p2 = p * p

    def zb(r_shell):
        return jnp.sqrt(jnp.maximum(r_shell * r_shell - p2, 0.0))

    photosphere = p < beta_inner
    z0 = jnp.where(photosphere, zb(beta_inner), -zb(r_max))
    shell0 = jnp.where(photosphere, 0, S - 1).astype(I32)
    # photospheric rays start with doppler-shifted blackbody intensity
    # (reference initialize_formal_integral_inputs)
    I0 = jnp.where(photosphere, bb, 0.0)

    nu_cmf0 = nu * (1.0 - z0)
    line0 = searchsorted_unrolled(neg_line_nu, -nu_cmf0, side="right")

    active0 = p < r_max

    def step(state):
        z, shell, line, I, z_seg, escat_acc, first, active = state
        shell_c = jnp.clip(shell, 0, S - 1)
        line_c = jnp.clip(line, 0, L - 1)
        chi = chi_e[shell_c]

        # next shell boundary along z
        r_in_s = r_inner[shell_c]
        heading_in = z < 0.0
        reaches_inner = heading_in & (p2 < r_in_s * r_in_s)
        z_bound = jnp.where(reaches_inner, -zb(r_in_s), zb(r_outer[shell_c]))
        delta = jnp.where(reaches_inner, -1, 1)

        # next line resonance along z
        zeta = 1.0 - line_nu[line_c] / nu
        has_line = line < L
        z_line = jnp.where(has_line, jnp.maximum(zeta, z), jnp.inf)

        line_event = active & has_line & (z_line <= z_bound)
        bound_event = active & ~line_event

        flat = line_c * S + shell_c
        jb = j_blue[flat]
        jr_prev = j_red[jnp.clip(line_c - 1, 0, L - 1) * S + shell_c]
        jbar_line = jnp.where(first, jb, 0.5 * (jr_prev + jb))
        # boundary segments always use the average (reference :532-541)
        jbar_bound = 0.5 * (jr_prev + jb)

        # line event: apply accumulated e-scatter source, attenuate, add S
        d_es_line = (z_line - z_seg) * chi * (jbar_line - I)
        I_line = (I + escat_acc + d_es_line) * exp_tau[flat] + att_S[flat]

        # boundary event: accumulate e-scatter only
        d_es_bound = (z_bound - z_seg) * chi * (jbar_bound - I)

        I = jnp.where(line_event, I_line, I)
        escat_acc = jnp.where(
            line_event, 0.0, jnp.where(bound_event, escat_acc + d_es_bound,
                                       escat_acc)
        )
        z_seg = jnp.where(line_event, z_line,
                          jnp.where(bound_event, z_bound, z_seg))
        z = jnp.where(line_event, z_line,
                      jnp.where(bound_event, z_bound, z))
        line = jnp.where(line_event, line + 1, line)
        shell = jnp.where(bound_event, shell + delta, shell)
        first = first & ~line_event
        active = active & (shell >= 0) & (shell < S)
        return z, shell, line, I, z_seg, escat_acc, first, active

    def cond(state):
        return jnp.any(state[-1])

    n_lanes = F * n_p
    state = (
        z0,
        shell0,
        line0,
        I0.astype(F32),
        z0,
        jnp.zeros(n_lanes, F32),
        jnp.ones(n_lanes, bool) & active0,
        active0,
    )
    state = jax.lax.while_loop(cond, step, state)
    I_final = state[3]
    return (I_final * p).reshape(F, n_p)


class IntegrationError(ValueError):
    """Formal integral cannot run under the current configuration."""


def check_formal_integral_requirements(
    line_interaction_type: str,
    continuum_enabled: bool = False,
    raises: bool = True,
) -> bool:
    """Reject configurations the formal integral does not support
    (reference check_formal_integral_requirements,
    formal_integral/base.py:25-83: only downbranch/macroatom line
    interaction; no continuum processes)."""
    import warnings

    def fail(msg):
        if raises:
            raise IntegrationError(msg)
        warnings.warn(msg)
        return False

    if line_interaction_type not in ("downbranch", "macroatom"):
        return fail(
            "the formal integral only works for line_interaction_type "
            "'downbranch' or 'macroatom' "
            f"(got {line_interaction_type!r})"
        )
    if continuum_enabled:
        return fail(
            "the formal integral does not work with continuum interactions"
        )
    return True


def _interp_shells(x_mid_old, x_mid_new, arr, kind="linear"):
    """Per-row 1-D interpolation of (rows, S_old) onto S_new midpoints
    (reference interpolate_integrator_quantities,
    formal_integral_solver.py:315-420: linear with extrapolation for the
    source-function arrays, nearest for electron densities; negatives from
    extrapolation clamped to 0)."""
    arr = np.atleast_2d(arr)
    if kind == "nearest":
        idx = np.abs(
            x_mid_new[None, :] - x_mid_old[:, None]
        ).argmin(axis=0)
        return arr[:, idx]
    out = np.empty((arr.shape[0], len(x_mid_new)))
    for k in range(arr.shape[0]):
        out[k] = np.interp(x_mid_new, x_mid_old, arr[k])
    # linear extrapolation at the edges
    lo_slope = (arr[:, 1] - arr[:, 0]) / (x_mid_old[1] - x_mid_old[0])
    hi_slope = (arr[:, -1] - arr[:, -2]) / (x_mid_old[-1] - x_mid_old[-2])
    left = x_mid_new < x_mid_old[0]
    right = x_mid_new > x_mid_old[-1]
    out[:, left] = (
        arr[:, :1] + lo_slope[:, None] * (x_mid_new[left] - x_mid_old[0])
    )
    out[:, right] = (
        arr[:, -1:] + hi_slope[:, None] * (x_mid_new[right] - x_mid_old[-1])
    )
    return np.clip(out, 0.0, None)


class FormalIntegralSolver:
    """Driver: source function + ray integration -> Spectrum.

    (reference formal_integral_solver.py:166-330; requirements check per
    formal_integral/base.py:25; optional shell refinement via
    ``interpolate_shells`` per interpolate_integrator_quantities)
    """

    def __init__(self, n_points: int = 1000, n_impact_parameters: int = 80,
                 interpolate_shells: int = 0):
        self.n_points = n_points
        self.n_p = n_impact_parameters
        self.interpolate_shells = interpolate_shells

    def solve(
        self,
        nu_edges: np.ndarray,  # (M+1,) Hz: target spectrum grid
        sim_state,
        plasma_state,
        transport_result,
        atom_data,
        line_interaction_type: str = "macroatom",
    ) -> Spectrum:
        check_formal_integral_requirements(
            line_interaction_type,
            continuum_enabled=(
                getattr(transport_result, "continuum", None) is not None
            ),
        )
        source = solve_source_function(
            atom_data.macro_atom
            if line_interaction_type == "macroatom"
            else atom_data.downbranch,
            plasma_state,
            transport_result,
            sim_state,
            atom_data,
            line_interaction_type,
        )

        ct = C * sim_state.time_explosion
        S = sim_state.no_of_shells
        L = atom_data.n_lines
        geometry = sim_state.geometry

        r_inner = geometry.r_inner
        r_outer = geometry.r_outer
        tau = plasma_state.tau_sobolev  # (L, S)
        n_e = plasma_state.electron_densities
        att_S_ul = source.att_S_ul
        Jred_lu = source.Jred_lu
        Jblue_lu = source.Jblue_lu

        if self.interpolate_shells and self.interpolate_shells > S:
            # refine the radial grid (reference interpolate_shells config,
            # spectrum schema `integrated.interpolate_shells`)
            Sn = int(self.interpolate_shells)
            mid_old = 0.5 * (r_inner + r_outer)
            r_in_new = np.linspace(r_inner[0], r_outer[-1], Sn + 1)[:-1]
            r_out_new = np.linspace(r_inner[0], r_outer[-1], Sn + 1)[1:]
            mid_new = 0.5 * (r_in_new + r_out_new)
            att_S_ul = _interp_shells(mid_old, mid_new, att_S_ul)
            Jred_lu = _interp_shells(mid_old, mid_new, Jred_lu)
            Jblue_lu = _interp_shells(mid_old, mid_new, Jblue_lu)
            tau = _interp_shells(mid_old, mid_new, tau)
            n_e = _interp_shells(mid_old, mid_new, n_e[None, :],
                                 kind="nearest")[0]
            r_inner, r_outer = r_in_new, r_out_new
            S = Sn

        # integration frequency grid (n_points), then interpolate onto edges
        nu_lo, nu_hi = nu_edges[0], nu_edges[-1]
        nu_grid = np.linspace(nu_lo, nu_hi, self.n_points)

        # photospheric temperature from t_inner
        t_inner = sim_state.t_inner
        i_bb = intensity_black_body(nu_grid, t_inner)

        p_grid = np.linspace(0.0, r_outer[-1], self.n_p + 1)[1:]

        exp_tau = np.exp(-tau).astype(np.float32).reshape(-1)

        I_nu_p = _integrate_rays(
            jnp.asarray(nu_grid / NU_UNIT, F32),
            jnp.asarray(p_grid / ct, F32),
            jnp.asarray(r_inner / ct, F32),
            jnp.asarray(r_outer / ct, F32),
            jnp.asarray(SIGMA_THOMSON * n_e * ct, F32),
            jnp.asarray(-(atom_data.line_nu / NU_UNIT), F32),
            jnp.asarray(atom_data.line_nu / NU_UNIT, F32),
            jnp.asarray(exp_tau),
            jnp.asarray(np.ascontiguousarray(att_S_ul).reshape(-1), F32),
            jnp.asarray(np.ascontiguousarray(Jred_lu).reshape(-1), F32),
            jnp.asarray(np.ascontiguousarray(Jblue_lu).reshape(-1), F32),
            jnp.asarray(i_bb, F32),
            n_shells=S,
            n_lines=L,
            n_p=self.n_p,
        )
        I_nu_p = np.asarray(I_nu_p, dtype=np.float64)  # (F, P), already * p'

        # L_nu = 8 pi^2 integral I p dp  (physical: multiply by ct^2)
        dp = (p_grid[1] - p_grid[0]) / ct
        lum_nu_grid = 8.0 * np.pi**2 * np.trapezoid(I_nu_p, dx=dp, axis=1)
        lum_nu_grid *= ct**2

        # interpolate onto the requested spectrum bin centers
        centers = 0.5 * (nu_edges[:-1] + nu_edges[1:])
        lum_nu = np.interp(centers, nu_grid, lum_nu_grid)
        return Spectrum(nu_edges=np.asarray(nu_edges), luminosity_nu=lum_nu)
