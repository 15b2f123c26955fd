"""Nonhomologous-flow Monte Carlo transport kernel (single device).

TPU-native redesign of the reference's nonhomologous mode
(/root/reference/tardis/transport/montecarlo/modes/nonhomologous/
 packet_propagation.py:53, rad_packet_transport.py:26, and the quartic
 distance solver transport/montecarlo/nonhomologous_grid.py:10 +
 transport/geometry/calculate_distances.py:116-195).

Physics: within shell ``i`` the velocity is piecewise linear,
``v(r) = v_in + m (r - r_in)``.  Along a chord parameterised by
``x = mu*r + s`` (s = travelled distance) the line-of-sight velocity is

    beta_los(x) = m~ x + q x / sqrt(p^2 + x^2),            (scaled units)

with per-shell constants ``m~ = (dv/dr) t_exp`` and
``q = beta_in - m~ r_in`` and impact parameter ``p^2 = r^2 (1 - mu^2)``.
The comoving frequency is ``nu_cmf = nu_lab (1 - beta_los)``.  Homologous
expansion is the special case m~=1, q=0 (beta_los = x), which reduces this
kernel exactly to the classic one — the basis of the equivalence test.

TPU-first redesign of the reference's per-line quartic walk
(rad_packet_transport.py:92-161: linear walk, one depressed-quartic solve
per candidate line):

1. The walk direction within a shell follows the *net* comoving shift over
   the remaining chord (the reference uses sign(dv/dr); evaluating
   beta_los at the boundary additionally captures the aberration-driven
   shift in zero/low-gradient shells).
2. The event line is found by the same tiled 128-ary predicate search as
   the classic kernel, over FORWARD (redshift) or REVERSED (blueshift)
   per-shell tau prefix sums.  The per-row predicate is *inverted*: rather
   than solving distance-to-resonance s(i) per probe (the quartic), we
   evaluate beta_los at the distance the remaining electron optical depth
   allows, x_req = x0 + (tau_event - dC(i+1))/chi, and compare against the
   line's resonance velocity n_i = 1 - nu_i/nu_lab:

       dC(i+1) + chi * s(i) > tau_event   <=>   s(i) > d_req
                                          <=>   n_i beyond beta_los(x_req)

   — O(1) per probe, no root solve in the search at all.
3. Only the single *event* line's distance is then solved, by a fixed
   30-step bisection of beta_los(x) = n_i on [x0, x_boundary] (monotone on
   the walked window), replacing the reference's quartic closed form and
   its threshold-patched cancellation issues (nonhomologous_grid.py:44-80).

Sobolev line opacity uses 1/|dv/dr| per shell instead of t_exp
(reference modes/nonhomologous/tau_sobolev.py:55-60; we take the absolute
value so receding-gradient shells keep a physical positive depth).

Supported feature set mirrors the reference mode: line-only + electron
scattering (no continuum), scatter/downbranch/macroatom interactions,
bulk + line estimators, trackers; full relativity is rejected exactly as
the reference does (packet_propagation.py:102-104).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from tardis_tpu.constants import C, SIGMA_THOMSON
from tardis_tpu.transport.device_state import (
    LINE_DOWNBRANCH,
    LINE_MACROATOM,
    LINE_SCATTER,
    NU_UNIT,
    TransportStaticConfig,
)
from tardis_tpu.transport.kernel import (
    COL_ALBEDO,
    COL_MU,
    COL_TAU,
    TransportCarry,
    _bsearch_first_true,  # noqa: F401 (re-exported for tests)
    _distance_boundary,
    _macro_walk,
    _step_uniforms,
    init_carry,
)
from tardis_tpu.transport.tiled_search import (
    TILE,
    PredicateTables,
    build_predicate_tables,
    build_tiled_table,
    tiled_searchsorted,
)
from tardis_tpu.utils.twofloat import df32_diff

F32 = jnp.float32
I32 = jnp.int32

# relative margin used to exclude the just-emitted resonance from the
# blueward walk window (the f32 analogue of the reference's
# CLOSE_LINE_THRESHOLD=1e-14 snap, calculate_distances.py:100)
CLOSE_LINE_MARGIN = 3e-7


class NonhomTables(NamedTuple):
    """Device tables for the nonhomologous kernel (lengths in c*t_exp units)."""

    r_inner: jnp.ndarray  # (S,) f32
    r_outer: jnp.ndarray  # (S,) f32
    beta_in: jnp.ndarray  # (S,) f32 = v_inner / c
    m_grad: jnp.ndarray  # (S,) f32 = (dv/dr) * t_exp (signed!)
    line_nu: jnp.ndarray  # (L,) f32 descending, NU_UNIT
    tau_cum_hi: jnp.ndarray  # (S, L+1) forward prefix sums (two-float)
    tau_cum_lo: jnp.ndarray
    rev_cum_hi: jnp.ndarray  # (S, L+1) reversed-order prefix sums
    rev_cum_lo: jnp.ndarray
    chi_e: jnp.ndarray  # (S,)
    # macro-atom / downbranch tables (same layout as TransportTables)
    macro_cum_prob: jnp.ndarray
    macro_block_start: jnp.ndarray
    macro_dest: jnp.ndarray
    macro_emit: jnp.ndarray
    macro_line: jnp.ndarray
    line2macro: jnp.ndarray
    neg_nu_tiled: object  # TiledTable over ascending -line_nu
    pred_fwd: object  # PredicateTables over forward order
    pred_bwd: object  # PredicateTables over reversed order


def _beta_los(m, q, p2, x):
    """Line-of-sight velocity (in c units) at chord coordinate x."""
    return m * x + q * x * lax.rsqrt(p2 + x * x)


def _nonhom_pred_search(
    pt: PredicateTables,
    shell,  # (B,) i32
    lo_dom,  # (B,) i32 inclusive start (walk-order index space)
    hi_dom,  # (B,) i32 exclusive end
    c0_hi,  # (B,) f32 prefix at domain start
    c0_lo,
    inv_chi,  # (B,)
    tau_event,  # (B,)
    x0,  # (B,) mu*r
    p2,  # (B,)
    m,  # (B,)
    q,  # (B,)
    nu_lab,  # (B,)
    forward: bool,
):
    """First walk-order index i in [lo_dom, hi_dom) whose event predicate
    holds; hi_dom if none.  Same 3-level 128-ary structure as
    tiled_search.predicate_search, with the inverted nonhomologous row
    predicate (see module docstring)."""

    def rows_pred(c_row, nu_row, idx, exact_lo=None):
        dC = c_row - c0_hi[:, None]
        if exact_lo is not None:
            dC = dC + (exact_lo - c0_lo[:, None])
        d_req = (tau_event[:, None] - dC) * inv_chi[:, None]
        # cap x_req so x^2 stays finite in f32 (inf would yield inf*0=NaN
        # in _beta_los); any x_req past the boundary gives pred=False anyway
        x_req = jnp.minimum(x0[:, None] + jnp.maximum(d_req, 0.0), 1e15)
        b_req = _beta_los(m[:, None], q[:, None], p2[:, None], x_req)
        n_row = 1.0 - nu_row / nu_lab[:, None]
        if forward:
            ahead = n_row > b_req
        else:
            ahead = n_row < b_req
        pred = (d_req < 0.0) | ahead
        in_dom = idx >= lo_dom[:, None]
        beyond = idx >= hi_dom[:, None]
        p = in_dom & (beyond | pred)
        return jnp.sum(jnp.logical_not(p), axis=1).astype(I32)

    T0, T1 = pt.t0, pt.t1

    # level 2
    idx2 = (jnp.arange(TILE, dtype=I32) * (TILE * TILE))[None, :]
    c2f = rows_pred(pt.c2_hi[shell], pt.nu2[None, :], idx2)
    w = jnp.clip(c2f - 1, 0, T1 - 1)

    # level 1
    idx1 = (w[:, None] * TILE + jnp.arange(TILE, dtype=I32)[None, :]) * TILE
    c1f = rows_pred(pt.c1_hi[shell * T1 + w], pt.nu1[w], idx1)
    t = jnp.clip(w * TILE + c1f - 1, 0, T0 - 1)

    # level 0 (exact two-float prefix)
    base0 = (t * TILE)[:, None] + jnp.arange(TILE, dtype=I32)[None, :]
    c0f = rows_pred(
        pt.c_hi[shell * T0 + t],
        pt.nu[t],
        base0,
        exact_lo=pt.c_lo[shell * T0 + t],
    )
    i_event = t * TILE + c0f
    return jnp.clip(i_event, lo_dom, hi_dom)


def make_nonhom_step(
    tables: NonhomTables,
    static: TransportStaticConfig,
    pool_mu,
    pool_nu_cmf,
    n_packets: int,
    base_key,
    pid_offset=0,
):
    """Build the per-event step function for lax.while_loop."""
    S = static.n_shells
    L = static.n_lines
    LP1 = L + 1
    tables = tables._replace(
        macro_cum_prob=tables.macro_cum_prob.reshape(-1),
        tau_cum_hi=tables.tau_cum_hi.reshape(-1),
        tau_cum_lo=tables.tau_cum_lo.reshape(-1),
        rev_cum_hi=tables.rev_cum_hi.reshape(-1),
        rev_cum_lo=tables.rev_cum_lo.reshape(-1),
    )
    r_birth = tables.r_inner[0]
    beta_birth = tables.beta_in[0]

    def count_strict(nu_thresh):
        """Number of lines with nu_i > nu_thresh."""
        return tiled_searchsorted(tables.neg_nu_tiled, -nu_thresh, side="left")

    def count_incl(nu_thresh):
        """Number of lines with nu_i >= nu_thresh."""
        return tiled_searchsorted(
            tables.neg_nu_tiled, -nu_thresh, side="right"
        )

    def step(carry: TransportCarry) -> TransportCarry:
        # ------------------------------------------------ 1. refill
        dead = ~carry.alive
        order = jnp.cumsum(dead.astype(I32))
        new_ids = carry.next_unborn + order - 1
        can_fill = dead & (new_ids < n_packets)
        ids_c = jnp.clip(new_ids, 0, n_packets - 1)
        b_mu = pool_mu[ids_c]
        b_nu_cmf = pool_nu_cmf[ids_c]
        inv_dop = 1.0 / (1.0 - b_mu * beta_birth)
        b_nu = b_nu_cmf * inv_dop
        b_energy = inv_dop

        r = jnp.where(can_fill, r_birth, carry.r)
        mu = jnp.where(can_fill, b_mu, carry.mu)
        nu = jnp.where(can_fill, b_nu, carry.nu)
        energy = jnp.where(can_fill, b_energy, carry.energy)
        shell = jnp.where(can_fill, 0, carry.shell)
        birth_line = count_incl(b_nu_cmf)
        next_line = jnp.where(can_fill, birth_line, carry.next_line)
        pkt_id = jnp.where(can_fill, new_ids, carry.pkt_id)
        event_idx = jnp.where(can_fill, 0, carry.event_idx)
        alive = carry.alive | can_fill
        next_unborn = carry.next_unborn + jnp.sum(can_fill.astype(I32))

        # ------------------------------------------------ 2. RNG
        U = _step_uniforms(base_key, pkt_id + pid_offset, event_idx)
        if static.line_interaction_mode != LINE_SCATTER:
            # legacy per-tag keys for the macro walk's jump draws
            def mk_key(pid, eidx):
                return jax.random.fold_in(
                    jax.random.fold_in(
                        base_key, (pid + pid_offset).astype(jnp.uint32)
                    ),
                    eidx.astype(jnp.uint32),
                )

            keys = jax.vmap(mk_key)(pkt_id, event_idx)

        # ------------------------------------------------ 3. trace
        shell_c = jnp.clip(shell, 0, S - 1)
        r_in = tables.r_inner[shell_c]
        r_out = tables.r_outer[shell_c]
        m = tables.m_grad[shell_c]
        b_in = tables.beta_in[shell_c]
        q = b_in - m * r_in
        beta_r = b_in + m * (r - r_in)
        dop = 1.0 - mu * beta_r
        nu_cmf = nu * dop
        chi = tables.chi_e[shell_c]
        inv_chi = 1.0 / chi

        d_b, delta_shell = _distance_boundary(r, mu, r_in, r_out)
        x0 = mu * r
        xb = x0 + d_b
        p2 = jnp.maximum(r * r * (1.0 - mu * mu), 0.0)
        nu_cmf_b = nu * (1.0 - _beta_los(m, q, p2, xb))
        fwd = nu_cmf_b <= nu_cmf

        tau_event = -jnp.log(U[:, COL_TAU])

        next_line_c = jnp.clip(next_line, 0, L)
        # forward (redshift) walk domain [lo_f, hi_f) in line-index space
        lo_f = next_line_c
        hi_f = jnp.where(
            fwd, jnp.clip(count_strict(nu_cmf_b), lo_f, L), lo_f
        )
        row0f = shell_c * LP1
        c0f_hi = tables.tau_cum_hi[row0f + lo_f]
        c0f_lo = tables.tau_cum_lo[row0f + lo_f]
        i_ev_f = _nonhom_pred_search(
            tables.pred_fwd, shell_c, lo_f, hi_f, c0f_hi, c0f_lo,
            inv_chi, tau_event, x0, p2, m, q, nu, forward=True,
        )

        # backward (blueshift) walk: reversed index space r = L-1-i.
        # Walk starts at the reddest line strictly (by a small margin)
        # above the current comoving frequency.
        cnt_m = count_strict(nu_cmf * (1.0 + CLOSE_LINE_MARGIN))
        j_end = jnp.clip(count_incl(nu_cmf_b), 0, cnt_m)
        lo_r = L - cnt_m
        hi_r = jnp.where(fwd, lo_r, L - j_end)
        c0r_hi = tables.rev_cum_hi[row0f + lo_r]
        c0r_lo = tables.rev_cum_lo[row0f + lo_r]
        i_ev_r = _nonhom_pred_search(
            tables.pred_bwd, shell_c, lo_r, hi_r, c0r_hi, c0r_lo,
            inv_chi, tau_event, x0, p2, m, q, nu, forward=False,
        )

        found = jnp.where(fwd, i_ev_f < hi_f, i_ev_r < hi_r)
        k_before = jnp.where(fwd, i_ev_f - lo_f, i_ev_r - lo_r)
        i_event = jnp.where(fwd, i_ev_f, L - 1 - i_ev_r)
        i_event = jnp.clip(i_event, 0, L - 1)

        def dCf(i):
            return df32_diff(
                tables.tau_cum_hi[row0f + i],
                tables.tau_cum_lo[row0f + i],
                c0f_hi, c0f_lo,
            )

        def dCr(i):
            return df32_diff(
                tables.rev_cum_hi[row0f + i],
                tables.rev_cum_lo[row0f + i],
                c0r_hi, c0r_lo,
            )

        tau_before = jnp.where(fwd, dCf(i_ev_f), dCr(i_ev_r))
        tau_total = jnp.where(fwd, dCf(hi_f), dCr(hi_r))

        # distance to the event line: fixed-trip bisection of
        # beta_los(x) = 1 - nu_i/nu on [x0, xb] (monotone over the window)
        n_ev = 1.0 - tables.line_nu[i_event] / nu
        s_sign = jnp.where(fwd, -1.0, 1.0)

        def bis_body(_, lh):
            lox, hix = lh
            mid = 0.5 * (lox + hix)
            f = _beta_los(m, q, p2, mid) - n_ev
            go_lo = f * s_sign > 0.0
            return (jnp.where(go_lo, mid, lox), jnp.where(go_lo, hix, mid))

        lox, hix = lax.fori_loop(0, 30, bis_body, (x0, xb))
        s_ev = jnp.maximum(0.5 * (lox + hix) - x0, 0.0)

        d_cont_f = jnp.maximum((tau_event - tau_before) * inv_chi, 0.0)
        escat_f = d_cont_f < s_ev
        if static.disable_line_scattering:
            escat_f = jnp.ones_like(escat_f)
        d_cont_nf = jnp.maximum((tau_event - tau_total) * inv_chi, 0.0)
        escat_nf = d_cont_nf < d_b

        EV_BOUNDARY, EV_LINE, EV_ESCAT = 0, 1, 2
        event = jnp.where(
            found,
            jnp.where(escat_f, EV_ESCAT, EV_LINE),
            jnp.where(escat_nf, EV_ESCAT, EV_BOUNDARY),
        )
        distance = jnp.where(
            found,
            jnp.where(escat_f, d_cont_f, s_ev),
            jnp.where(escat_nf, d_cont_nf, d_b),
        )
        k_crossed = jnp.where(
            found,
            jnp.where(escat_f, k_before, k_before + 1),
            jnp.where(fwd, hi_f - lo_f, hi_r - lo_r),
        )

        # ------------------------------------------------ 4. estimators
        live_f = alive.astype(F32)
        e_com = energy * dop
        w_j = live_f * e_com * distance
        onehot = (shell_c[:, None] == jnp.arange(S)[None, :]).astype(F32)
        est_j = carry.est_j + jnp.sum(w_j[:, None] * onehot, axis=0)
        est_nubar = carry.est_nubar + jnp.sum(
            (w_j * nu_cmf)[:, None] * onehot, axis=0
        )

        # crossed line-index range [idx_lo, idx_hi): the j_blue/e_dot
        # increments keep the homologous separable form because the doppler
        # factor at resonance is exactly nu_i/nu_lab in any velocity law
        w1 = live_f * energy / (nu * nu)
        w2 = live_f * energy / nu
        rng_lo = jnp.where(fwd, lo_f, cnt_m - k_crossed)
        rng_hi = jnp.where(fwd, lo_f + k_crossed, cnt_m)
        base_a = (rng_lo * S + shell_c) * 2
        base_b = (rng_hi * S + shell_c) * 2
        idx_cat = jnp.concatenate([base_a, base_a + 1, base_b, base_b + 1])
        vals_cat = jnp.concatenate([w1, w2, -w1, -w2])
        line_diff = carry.line_diff.at[idx_cat].add(vals_cat)

        # ------------------------------------------------ 5. move
        r_new = jnp.sqrt(
            jnp.maximum(
                r * r + distance * distance + 2.0 * r * distance * mu, 1e-20
            )
        )
        mu_new = (mu * r + distance) / r_new

        # ------------------------------------------------ 6. events
        is_boundary = alive & (event == EV_BOUNDARY)
        is_escat = alive & (event == EV_ESCAT)
        is_line = alive & (event == EV_LINE)

        new_shell = shell + jnp.where(is_boundary, delta_shell, 0)
        emitted = is_boundary & (new_shell >= S)
        hits_core = is_boundary & (new_shell < 0)
        if static.inner_boundary_albedo > 0.0:
            u_alb = U[:, COL_ALBEDO]
            reflected = hits_core & (u_alb < static.inner_boundary_albedo)
            reabsorbed = hits_core & ~reflected
        else:
            reflected = jnp.zeros_like(hits_core)
            reabsorbed = hits_core

        mu_draw = 2.0 * U[:, COL_MU] - 1.0
        beta_new = b_in + m * (r_new - r_in)  # interactions stay in-shell
        dop_old_pos = 1.0 - mu_new * beta_new
        inv_dop_new = 1.0 / (1.0 - mu_draw * beta_new)
        mu_emit = mu_draw

        nu_escat = nu * dop_old_pos * inv_dop_new
        e_escat = energy * dop_old_pos * inv_dop_new

        if static.line_interaction_mode == LINE_SCATTER:
            em_line = i_event
        else:
            level = tables.line2macro[jnp.clip(i_event, 0, L - 1)]
            em_line = _macro_walk(
                tables, static, level, i_event, shell_c, keys, is_line
            )
        nu_line_new = tables.line_nu[jnp.clip(em_line, 0, L - 1)] * inv_dop_new
        e_line = energy * dop_old_pos * inv_dop_new
        # consumed resonance excluded from the next redward walk; the
        # blueward walk start is recomputed from nu_cmf with the margin
        next_line_em = em_line + 1

        interacts = is_escat | is_line
        nu_pre_interaction = nu
        nu = jnp.where(
            is_escat, nu_escat, jnp.where(is_line, nu_line_new, nu)
        )
        energy = jnp.where(
            is_escat, e_escat, jnp.where(is_line, e_line, energy)
        )
        mu_after = jnp.where(interacts, mu_emit, mu_new)
        next_line = jnp.where(
            is_line,
            next_line_em,
            jnp.where(alive, jnp.where(fwd, rng_hi, rng_lo), next_line),
        )

        r = jnp.where(alive, r_new, r)
        mu = jnp.where(alive, jnp.where(reflected, -mu_after, mu_after), mu)
        shell = jnp.where(
            is_boundary & ~emitted & ~reabsorbed & ~reflected,
            new_shell, shell,
        )

        if static.track_rpacket_length > 0:
            K = static.track_rpacket_length
            slot_ok = alive & (event_idx < K)
            widx_t = jnp.where(
                slot_ok, pkt_id * K + jnp.minimum(event_idx, K - 1),
                n_packets * K + 1,
            )
            ev_code = jnp.where(is_line, 2.0, jnp.where(is_escat, 1.0, 3.0))
            rows_t = jnp.stack(
                [r, nu, energy, shell.astype(F32), ev_code,
                 jnp.zeros_like(r)],
                axis=1,
            )
            tr_packed = carry.tr_packed.at[widx_t].set(rows_t, mode="drop")
        else:
            tr_packed = carry.tr_packed

        if static.track_last_interaction:
            tr_idx = jnp.where(interacts, pkt_id, n_packets + 1)
            rows_li = jnp.stack(
                [
                    jnp.where(is_line, 2.0, 1.0),
                    jnp.where(is_line, i_event, -1).astype(F32),
                    jnp.where(is_line, em_line, -1).astype(F32),
                    shell_c.astype(F32),
                    nu_pre_interaction,
                    r,
                ],
                axis=1,
            )
            li_packed = carry.li_packed.at[tr_idx].set(rows_li, mode="drop")
        else:
            li_packed = carry.li_packed

        # ------------------------------------------------ 7. deaths
        dying = emitted | reabsorbed
        out_base = jnp.where(dying, pkt_id, n_packets) * 2
        nu_signed = jnp.where(emitted, nu, -nu)
        out_packed = carry.out_packed.at[
            jnp.concatenate([out_base, out_base + 1])
        ].set(jnp.concatenate([nu_signed, energy]), mode="drop")
        alive = alive & ~dying
        event_idx = event_idx + 1

        return carry._replace(
            r=r,
            mu=mu,
            nu=nu,
            energy=energy,
            shell=shell,
            next_line=next_line,
            pkt_id=pkt_id,
            event_idx=event_idx,
            alive=alive,
            next_unborn=next_unborn,
            est_j=est_j,
            est_nubar=est_nubar,
            line_diff=line_diff,
            out_packed=out_packed,
            tr_packed=tr_packed,
            li_packed=li_packed,
            n_steps=carry.n_steps + 1,
            n_events=carry.n_events + jnp.sum(alive.astype(F32)),
        )

    return step


def nonhom_transport_loop(
    tables: NonhomTables,
    static: TransportStaticConfig,
    pool_mu,
    pool_nu_cmf,
    base_key,
    n_packets: int,
    batch_size: int,
    max_steps: int = 1 << 30,
    pid_offset=0,
):
    step = make_nonhom_step(
        tables, static, pool_mu, pool_nu_cmf, n_packets, base_key, pid_offset
    )
    carry0 = init_carry(static, batch_size, n_packets)

    def cond(c: TransportCarry):
        running = (c.next_unborn < n_packets) | jnp.any(c.alive)
        return running & (c.n_steps < max_steps)

    return lax.while_loop(cond, step, carry0)


@partial(
    jax.jit,
    static_argnames=("static", "n_packets", "batch_size", "max_steps"),
)
def run_nonhom_transport(
    tables: NonhomTables,
    static: TransportStaticConfig,
    pool_mu,
    pool_nu_cmf,
    base_key,
    n_packets: int,
    batch_size: int,
    max_steps: int = 1 << 30,
):
    return nonhom_transport_loop(
        tables, static, pool_mu, pool_nu_cmf, base_key,
        n_packets, batch_size, max_steps,
    )


# ----------------------------------------------------------------------
# host-side builders


def nonhomologous_tau_scale(geometry) -> np.ndarray:
    """Per-shell factor converting homologous tau_sobolev to nonhomologous.

    tau_hom = K * t_exp; tau_nonhom = K / |dv/dr|
    (reference modes/nonhomologous/tau_sobolev.py:55-60 — we use |dv/dr|
    so receding-gradient shells keep a positive Sobolev depth; gradients
    are floored at 1e-8/t_exp to keep tau finite in coasting shells).
    """
    t_exp = geometry.time_explosion
    dvdr = np.abs(np.asarray(geometry.velocity_gradient, dtype=np.float64))
    dvdr = np.maximum(dvdr, 1e-8 / t_exp)
    return 1.0 / (t_exp * dvdr)


def nonhomologous_plasma_state(plasma_state, geometry):
    """PlasmaState with tau/beta recomputed for the nonhomologous law."""
    import dataclasses

    from tardis_tpu.plasma.lte import beta_sobolev

    scale = nonhomologous_tau_scale(geometry)
    tau = plasma_state.tau_sobolev * scale[None, :]
    return dataclasses.replace(
        plasma_state,
        tau_sobolev=tau,
        beta_sobolev=beta_sobolev(tau),
    )


def build_nonhom_tables(
    geometry,
    plasma_state,
    atom_data,
    line_interaction_type: str = "scatter",
    macro_state=None,
    disable_electron_scattering: bool = False,
):
    """Build device tables; ``plasma_state`` must already hold the
    nonhomologous tau (see :func:`nonhomologous_plasma_state`)."""
    ct = C * geometry.time_explosion
    S = geometry.no_of_shells
    L = atom_data.n_lines

    tau = plasma_state.tau_sobolev  # (L, S) f64
    cum = np.zeros((S, L + 1), dtype=np.float64)
    np.cumsum(tau.T, axis=1, out=cum[:, 1:])
    cum_rev = np.zeros((S, L + 1), dtype=np.float64)
    np.cumsum(tau[::-1].T, axis=1, out=cum_rev[:, 1:])

    from tardis_tpu.utils.twofloat import split_f64_to_f32_pair

    hi, lo = split_f64_to_f32_pair(cum)
    rhi, rlo = split_f64_to_f32_pair(cum_rev)

    sigma = 1e-200 if disable_electron_scattering else SIGMA_THOMSON
    chi_e = (sigma * plasma_state.electron_densities * ct).astype(np.float32)

    line_nu_scaled = (atom_data.line_nu / NU_UNIT).astype(np.float32)
    mode = {"scatter": LINE_SCATTER, "downbranch": LINE_DOWNBRANCH,
            "macroatom": LINE_MACROATOM}[line_interaction_type]

    if macro_state is not None:
        cum_prob, block_start, dest, emit, mline, line2macro = macro_state
        macro_block_bits = int(
            np.ceil(np.log2(max(2, int(np.max(np.diff(block_start))))))
        ) + 1
    else:
        cum_prob = np.ones((1, S), dtype=np.float32)
        block_start = np.zeros(2, dtype=np.int32)
        dest = np.zeros(1, dtype=np.int32)
        emit = np.ones(1, dtype=bool)
        mline = np.zeros(1, dtype=np.int32)
        line2macro = np.zeros(L, dtype=np.int32)
        macro_block_bits = 1

    dvdr = np.asarray(geometry.velocity_gradient, dtype=np.float64)
    tables = NonhomTables(
        r_inner=jnp.asarray(geometry.r_inner / ct, jnp.float32),
        r_outer=jnp.asarray(geometry.r_outer / ct, jnp.float32),
        beta_in=jnp.asarray(geometry.v_inner / C, jnp.float32),
        m_grad=jnp.asarray(dvdr * geometry.time_explosion, jnp.float32),
        line_nu=jnp.asarray(line_nu_scaled),
        tau_cum_hi=jnp.asarray(hi),
        tau_cum_lo=jnp.asarray(lo),
        rev_cum_hi=jnp.asarray(rhi),
        rev_cum_lo=jnp.asarray(rlo),
        chi_e=jnp.asarray(chi_e),
        macro_cum_prob=jnp.asarray(cum_prob, jnp.float32),
        macro_block_start=jnp.asarray(block_start, jnp.int32),
        macro_dest=jnp.asarray(dest, jnp.int32),
        macro_emit=jnp.asarray(emit),
        macro_line=jnp.asarray(mline, jnp.int32),
        line2macro=jnp.asarray(line2macro, jnp.int32),
        neg_nu_tiled=build_tiled_table(-line_nu_scaled),
        pred_fwd=build_predicate_tables(cum, line_nu_scaled),
        pred_bwd=build_predicate_tables(
            cum_rev, line_nu_scaled[::-1].copy()
        ),
    )
    on_accelerator = jax.default_backend() != "cpu"
    static = TransportStaticConfig(
        n_shells=S,
        n_lines=L,
        line_interaction_mode=mode,
        max_macro_jumps=(
            1 if mode == LINE_DOWNBRANCH else (24 if on_accelerator else 40)
        ),
        macro_block_bits=macro_block_bits,
        line_search_bits=int(np.ceil(np.log2(max(2, L)))) + 1,
        unroll_macro_walk=on_accelerator,
    )
    return tables, static
