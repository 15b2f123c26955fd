"""Batched Monte Carlo packet-transport kernel (single device).

TPU-native redesign of the reference's per-packet event loop
(/root/reference/tardis/transport/montecarlo/modes/classic/packet_propagation.py:51
 and modes/homologous_rad_packet_transport.py:32).  Key differences:

1. **Lockstep events**: a fixed-size batch of B packet "slots" advances one
   event per step inside a single ``lax.while_loop``; dead slots are refilled
   from the unborn-packet pool so VPU lanes stay busy (persistent-threads
   pattern instead of the reference's prange over packets).
2. **Packed 128-ary line search with in-row extraction**: the combined
   optical depth to line i, g(i) = dC(i) + chi_e * s(i), is monotone in i
   (homologous flow); the event line comes from a 3-level 128-ary search
   over PACKED rows (c_hi | c_lo | nu | aux), and the event's frequency,
   exact two-float prefix, and per-line aux channel are extracted from the
   already-fetched row by one-hot reduction (tiled_search.py, round 3).
   Rationale: XLA:TPU serializes gathers at ~10 ns per gathered row
   regardless of width, so the step budget is gather/scatter COUNT.
3. **Difference-array line estimators**: the per-line j_blue/e_dot increments
   for a crossed range [a, b) are E*nu_i/nu^2 and E*nu_i/nu — separable in i —
   so each event does one flat scatter-add into an interleaved difference
   array; the per-line estimator is recovered at end of iteration as
   nu_i * cumsum(diff) (replacing estimators/radfield_estimator_calcs.py:
   128-170's per-line adds).  Flat f32 scatters run ~5x faster than
   multi-column row scatters on this stack (probe_loop_ops2).
4. **Packed-CDF macro atom**: the absorbing-chain categorical draws
   (macro_atom_solver.solve_macro_chain, device-built) sample via
   component-local packed CDF rows — ONE row gather + a VPU row-count per
   draw, with the emitted line's id AND frequency extracted from the same
   emission row (replacing macro_atom.py:52-104's RNG walk, the round-2
   CDF search, and the round-3 host-built alias tables).
5. **Counter-based RNG**: all of a step's draws come from ONE
   threefry pass:  U = uniform(fold_in(fold_in(key, packet_id), event_idx),
   (10,)) — reproducible across batch sizes and device counts (replacing
   np.random.seed(packet.seed), modes/montecarlo_transport.py:65).

Scaled units (see device_state.py): lengths / (c t_exp), frequencies / 1e15 Hz,
energies in packet birth units.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from tardis_tpu.transport.device_state import (
    LINE_MACROATOM,
    LINE_SCATTER,
    TransportStaticConfig,
    TransportTables,
)
from tardis_tpu.transport.tiled_search import (
    predicate_search_packed,
    tiled_searchsorted,
)
from tardis_tpu.utils.search import searchsorted_unrolled
from tardis_tpu.utils.twofloat import df32_accumulate, df32_diff

F32 = jnp.float32
I32 = jnp.int32

STATUS_IN_PROCESS = 0
STATUS_EMITTED = 1
STATUS_REABSORBED = 2
TILE_128 = 128

# ablation hooks for benchmarks/probe_step* (trace-time; never set in prod)
_DISABLE_LINE_SCATTER = False
_DISABLE_OUT_SCATTER = False
_DISABLE_BULK_EST = False

# One uniform matrix U (B, 10) per step; columns by draw site.  The alias
# accept draws reuse the FB/FF columns (those are only consumed on the
# continuum path, which samples via the Markov tables instead).
N_RNG_COLS = 10
COL_TAU = 0
COL_MU = 1
COL_ESCAT = 2  # e-scatter vs continuum-process split
COL_BFFF = 3  # bound-free vs free-free split
COL_CONT_SEL = 4  # which bound-free continuum absorbed
COL_ALBEDO = 5
COL_MK_ROW = 6  # absorbing-state draw (alias k / Markov row u)
COL_MK_DEACT = 7  # deactivation-channel draw
COL_FB = 8  # free-bound emission frequency | alias accept #1
COL_FF = 9  # free-free emission frequency | alias accept #2

# legacy per-tag draw scheme (kept for the rare no-chain walk fallback)
_TAG_MACRO = 8


class TransportCarry(NamedTuple):
    # slot state (B,)
    r: jnp.ndarray
    mu: jnp.ndarray
    nu: jnp.ndarray  # lab frame, scaled
    energy: jnp.ndarray
    shell: jnp.ndarray  # i32
    next_line: jnp.ndarray  # i32
    pkt_id: jnp.ndarray  # i32
    event_idx: jnp.ndarray  # i32
    alive: jnp.ndarray  # bool
    # pool pointer
    next_unborn: jnp.ndarray  # i32 scalar
    # estimators
    est_j: jnp.ndarray  # (S,)
    est_nubar: jnp.ndarray  # (S,)
    # interleaved flat line difference array:
    # index 2*(line*S + shell) + {0: j_blue, 1: e_dot}
    line_diff: jnp.ndarray  # (2*(L+1)*S,) f32
    # interleaved flat outputs: index 2*pkt + {0: signed nu, 1: energy};
    # nu > 0 emitted, nu < 0 reabsorbed, 0 in-process
    out_packed: jnp.ndarray  # (2*N,) f32
    # vpacket spawn records (capacity R; (1,8) dummy when disabled)
    # columns: r, mu, nu, energy, shell, next_line, li_type, out_line
    # (li_type: -1 birth, 1 escat, 2 line, 3 contproc — feeds per-vpacket
    # tracking, reference virt_packet_* properties,
    # montecarlo_transport_state.py:33-44)
    vp_packed: jnp.ndarray  # (R, 8) f32
    vp_count: jnp.ndarray  # i32 scalar (attempted; clamp to capacity on use)
    # full tracker: (N*K, 6) packed event log ((1,6) when disabled)
    tr_packed: jnp.ndarray  # r, nu, energy, shell, type, unused
    # last-interaction tracking ((N,6) packed; (1,6) when disabled)
    li_packed: jnp.ndarray  # type, in_line, out_line, shell, in_nu, r
    # continuum estimator moments per (grid cell, shell): columns
    # [M0=w, M1=w/nu, M2=w*nu, Mb0=w*b, Mb1=w*b/nu, Mb2=w*b*nu, count, 0]
    # with w = E_cmf * path_cmf, b = exp(-h nu_cmf / k T_e); the per-continuum
    # estimators of the reference (radfield_estimator_calcs.py:57-125) are
    # recovered host-side EXACTLY under linear-interp cross-sections —
    # O(1) per event instead of O(active continua).  ((1,8) when disabled)
    cont_moments: jnp.ndarray
    est_ff_heat: jnp.ndarray  # (S,) f32 ff-heating estimator ((1,) disabled)
    # diagnostics
    n_steps: jnp.ndarray  # i32 scalar
    n_events: jnp.ndarray  # i64-ish f32 accumulator
    # ---- two-float low parts of the accumulators (compensated summation;
    # hi + lo tracks the f64 value — replaces the reference's f64
    # accumulators, estimators/estimators_bulk.py:15) ----
    line_lo: jnp.ndarray = jnp.zeros(1, jnp.float32)
    est_j_lo: jnp.ndarray = jnp.zeros(1, jnp.float32)
    est_nubar_lo: jnp.ndarray = jnp.zeros(1, jnp.float32)
    cont_lo: jnp.ndarray = jnp.zeros((1, 8), jnp.float32)
    ff_lo: jnp.ndarray = jnp.zeros(1, jnp.float32)

    # ---- f64 views combining (hi, lo) pairs ----
    def line_diff_f64(self):
        import numpy as np

        return np.asarray(self.line_diff, np.float64) + np.asarray(
            self.line_lo, np.float64
        )

    def est_j_f64(self):
        import numpy as np

        return np.asarray(self.est_j, np.float64) + np.asarray(
            self.est_j_lo, np.float64
        )

    def est_nubar_f64(self):
        import numpy as np

        return np.asarray(self.est_nubar, np.float64) + np.asarray(
            self.est_nubar_lo, np.float64
        )

    def cont_moments_f64(self):
        import numpy as np

        return np.asarray(self.cont_moments, np.float64) + np.asarray(
            self.cont_lo, np.float64
        )

    def est_ff_heat_f64(self):
        import numpy as np

        return np.asarray(self.est_ff_heat, np.float64) + np.asarray(
            self.ff_lo, np.float64
        )

    # ---- unpacking views (compatibility accessors) ----
    @property
    def out_nu(self):
        return jnp.abs(self.out_packed[0::2])

    @property
    def out_energy(self):
        return self.out_packed[1::2]

    @property
    def out_status(self):
        nu_signed = self.out_packed[0::2]
        return jnp.where(
            nu_signed > 0, 1, jnp.where(nu_signed < 0, 2, 0)
        ).astype(jnp.int8)

    @property
    def jblue_diff(self):
        return self.line_diff[0::2]

    @property
    def edot_diff(self):
        return self.line_diff[1::2]


def _step_uniforms(base_key, pid, eidx):
    """All of a step's uniforms in one threefry pass: (B, N_RNG_COLS).

    Key = fold_in(fold_in(base_key, global packet id), event index); every
    column is an independent uniform in (0, 1).  Draws are identical
    regardless of batch size, chunking, or device count.
    """

    def one(p, e):
        k = jax.random.fold_in(
            jax.random.fold_in(base_key, p.astype(jnp.uint32)),
            e.astype(jnp.uint32),
        )
        return jax.random.uniform(
            k, (N_RNG_COLS,), F32, minval=1e-9, maxval=1.0
        )

    return jax.vmap(one)(pid, eidx)


def _uniform_from_key(keys, tag):
    """Legacy per-tag uniform (walk-fallback path only)."""

    def one(k):
        return jax.random.uniform(
            jax.random.fold_in(k, tag), (), dtype=F32, minval=1e-9, maxval=1.0
        )

    return jax.vmap(one)(keys)


def _bsearch_first_true(pred_fn, lo, hi, n_bits):
    """Vectorized first-true binary search on a monotone predicate.

    Returns smallest i in [lo, hi) with pred(i); hi if none.  The loop is
    unrolled (n_bits is ~log2(L), small) — unrolled compare/select chains
    both trace and run faster than lax.scan/fori on TPU.
    """
    for _ in range(n_bits):
        active = lo < hi
        mid = (lo + hi) >> 1
        p = pred_fn(jnp.maximum(mid, 0))
        lo = jnp.where(active & ~p, mid + 1, lo)
        hi = jnp.where(active & p, mid, hi)
    return lo


def _distance_boundary(r, mu, r_in, r_out):
    """Distance to shell boundary + shell index delta.

    (reference transport/geometry/calculate_distances.py:25-61)
    """
    out_d = jnp.sqrt(
        jnp.maximum(r_out * r_out + (mu * mu - 1.0) * r * r, 0.0)
    ) - r * mu
    check = r_in * r_in + r * r * (mu * mu - 1.0)
    # STRICTLY inward only: a tangential ray (mu == 0) grazes and exits
    # outward.  Under f32 a scatter can land a packet at exactly mu = 0 ON
    # a shell boundary; with `mu <= 0` that state alternated zero-distance
    # inner/outer crossings forever — an immortal lane that ran the
    # while_loop into the platform's program-wall-time watchdog (found by
    # the 20-iteration production run at iteration 18)
    hits_inner = (mu < 0.0) & (check >= 0.0)
    in_d = -r * mu - jnp.sqrt(jnp.maximum(check, 0.0))
    distance = jnp.where(hits_inner, in_d, out_d)
    delta = jnp.where(hits_inner, -1, 1).astype(I32)
    # single materialization: XLA otherwise duplicates this computation into
    # several consumer fusions with shape-dependent FMA contraction, which
    # breaks bitwise batch-size/device-layout invariance
    return lax.optimization_barrier((jnp.maximum(distance, 0.0), delta))


def _macro_walk(tables, static, level, fallback_line, shell, keys,
                is_line):
    """Macro-atom / downbranch emission-line selection (walk fallback).

    Replaces the RNG probability walk of macro_atom_interaction
    (reference transport/montecarlo/macro_atom.py:52-104) with bounded jumps,
    each sampling a transition by binary search over the block's cumulative
    probabilities.  Only used when the absorbing-chain tables would not fit
    device memory (solve_macro_chain -> None).
    """
    S = static.n_shells
    em_line = fallback_line  # resonant scatter if the walk never emits
    done = ~is_line

    def jump_body(state):
        jump, level, em_line, done = state
        u = _uniform_from_key(keys, _TAG_MACRO + jump)
        b0 = tables.macro_block_start[level]
        b1 = tables.macro_block_start[level + 1]

        def pred(t):
            return tables.macro_cum_prob[t * S + shell] >= u

        t = _bsearch_first_true(pred, b0, b1, static.macro_block_bits)
        t = jnp.clip(t, b0, jnp.maximum(b1 - 1, b0))
        emit = tables.macro_emit[t]
        em_line = jnp.where(~done & emit, tables.macro_line[t], em_line)
        level = jnp.where(~done & ~emit, tables.macro_dest[t], level)
        done = done | emit
        return jump + 1, level, em_line, done

    if static.unroll_macro_walk:
        state = (jnp.zeros((), I32), level, em_line, done)
        for _ in range(static.max_macro_jumps):
            state = jump_body(state)
        _, level, em_line, done = state
    else:

        def cond(state):
            jump, level, em_line, done = state
            return (jump < static.max_macro_jumps) & ~jnp.all(done)

        _, level, em_line, done = lax.while_loop(
            cond, jump_body, (jnp.zeros((), I32), level, em_line, done)
        )
    return em_line


def _chain_emission(tables, static, level, shell, u_row, u_acc1, u_deact,
                    u_acc2):
    """Absorbing-chain macro-atom emission-line selection via CDF rows.

    Exact replacement for the RNG walk (reference macro_atom.py:52-104):
    the deactivating level j is drawn by inverse-CDF over the
    absorbing-probability row B[shell, level, :] (component-local width W,
    global state recovered as base + slot), and the emitted line by
    inverse-CDF over level j's emission block with in-row line-id
    extraction — ONE row gather per draw, tables device-built by
    opacities/macro_atom_solver.solve_macro_chain (round 4; u_acc1/u_acc2
    are unused since the alias-accept draws were retired).
    """
    M = static.n_chain_states
    We = static.emit_width

    if static.line_interaction_mode == LINE_MACROATOM:
        W = static.chain_width
        row = tables.chain_cdf[shell * M + level]  # (B, W+1)
        k = jnp.sum(row[:, :W] < u_row[:, None], axis=1).astype(I32)
        k = jnp.minimum(k, W - 1)
        j = row[:, W].astype(I32) + k  # base + local slot
    else:  # downbranch: deactivate at the activated level
        j = level

    erow = tables.emit_cdf[shell * M + j]  # (B, 3*We)
    k2 = jnp.minimum(
        jnp.sum(erow[:, :We] < u_deact[:, None], axis=1), We - 1
    ).astype(I32)
    sel = jnp.arange(We, dtype=I32)[None, :] == k2[:, None]
    em_line = jnp.sum(jnp.where(sel, erow[:, We : 2 * We], 0.0), axis=1)
    # emitted-line frequency extracted from the SAME row (third block)
    # instead of a separate line_nu gather
    nu_em = jnp.sum(jnp.where(sel, erow[:, 2 * We :], 0.0), axis=1)
    return em_line.astype(I32), nu_em


def _markov_interaction(tables, static, state0, shell, u1, u2):
    """Absorbing-Markov macro-atom interaction: exactly two categorical draws.

    Replaces the reference's macro_atom_interaction_iip
    (transport/montecarlo/macro_atom.py:107-184): draw the absorbing state
    from the precomputed B-matrix row, then the deactivation channel within
    that state's block — both as batched binary searches with fixed trip
    counts (the TPU-friendly formulation of macro-atom + continuum physics).

    Returns (emission kind (B,) int8, channel id (B,) int32).
    """
    M = static.n_macro_states
    S = static.n_shells
    row_base = (shell * M + state0) * M

    def pred_row(i):
        return tables.mk_cum_B[row_base + i] >= u1

    a = _bsearch_first_true(
        pred_row, jnp.zeros_like(state0), jnp.full_like(state0, M),
        static.state_bits,
    )
    a = jnp.clip(a, 0, M - 1)

    b0 = tables.deact_block_start[a]
    b1 = tables.deact_block_start[a + 1]

    def pred_d(t):
        return tables.deact_cum_prob[t * S + shell] >= u2

    t = _bsearch_first_true(pred_d, b0, b1, static.deact_bits)
    t = jnp.clip(t, b0, jnp.maximum(b1 - 1, b0))
    return tables.deact_kind[t], tables.deact_id[t]


def _sample_fb_nu(tables, static, cont_id, shell, z):
    """Sample a free-bound emission frequency from the per-block CDF.

    (reference sample_nu_free_bound, interaction_events.py:40-57: searchsorted
    into the cumulative emissivity block + linear inverse interpolation)
    """
    S = static.n_shells
    c = jnp.clip(cont_id, 0, static.n_continua - 1)
    b0 = tables.pion_block_start[c]
    b1 = tables.pion_block_start[c + 1]

    def pred(i):
        return tables.fb_cdf[i * S + shell] >= z

    idx = _bsearch_first_true(pred, b0, b1, static.fb_bits)
    idx = jnp.clip(idx, b0 + 1, jnp.maximum(b1 - 1, b0 + 1))
    cdf_i = tables.fb_cdf[idx * S + shell]
    cdf_im = tables.fb_cdf[(idx - 1) * S + shell]
    nu_i = tables.fb_nu[idx]
    nu_im = tables.fb_nu[idx - 1]
    frac = jnp.where(cdf_i > cdf_im, (cdf_i - z) / (cdf_i - cdf_im), 0.0)
    return nu_i - frac * (nu_i - nu_im)


def make_transport_step(
    tables: TransportTables,
    static: TransportStaticConfig,
    pool_mu,
    pool_nu_cmf,
    n_packets: int,
    base_key,
    pid_offset=0,
    pool_w=None,
    n_out: int | None = None,
    out_offset=0,
):
    """Build the per-event step function for lax.while_loop.

    ``n_packets`` is the LOCAL pool size driving the refill; ``pid_offset``
    is the global packet id of pool entry 0 (stored into ``pkt_id`` at
    refill and feeding the counter RNG).  ``n_out`` / ``out_offset`` size
    and address the per-packet output buffers (out/tracker/last-interaction):
    a packet writes at row ``pkt_id - out_offset`` in buffers of ``n_out``
    rows.  Defaults reproduce the single-pool case (n_out=n_packets,
    out_offset=pid_offset is NOT implied — callers carrying lanes across
    pool chunks keep one global buffer with out_offset=0).
    """
    if n_out is None:
        n_out = n_packets
    S = static.n_shells
    L = static.n_lines
    LP1 = L + 1
    beta_inner = tables.r_inner[0]
    tables = tables._replace(
        macro_cum_prob=tables.macro_cum_prob.reshape(-1),
    )
    # birth line ids for the whole pool, hoisted out of the event loop
    # (reference packets/radiative_packet.py:96-110); one tiled search per
    # iteration instead of one per step
    pool_birth = tiled_searchsorted(
        tables.neg_nu_tiled, -pool_nu_cmf, side="right"
    )
    # packed pool rows -> ONE refill gather per step instead of 3-4
    pool_pack = jnp.stack(
        [
            pool_mu,
            pool_nu_cmf,
            pool_birth.astype(F32),
            (pool_w if pool_w is not None
             else jnp.ones_like(pool_mu)),
        ],
        axis=1,
    )
    use_walk = (
        static.line_interaction_mode != LINE_SCATTER
        and not static.use_macro_chain
        and not static.enable_continuum
    )

    def step(carry: TransportCarry) -> TransportCarry:
        # ------------------------------------------------ 1. refill
        dead = ~carry.alive
        order = jnp.cumsum(dead.astype(I32))
        new_ids = carry.next_unborn + order - 1
        can_fill = dead & (new_ids < n_packets)
        ids_c = jnp.clip(new_ids, 0, n_packets - 1)
        prow = pool_pack[ids_c]  # (B, 4)
        b_mu = prow[:, 0]
        b_nu_cmf = prow[:, 1]
        birth_line = prow[:, 2].astype(I32)
        if static.enable_full_relativity:
            # (reference set_packet_props_full_relativity,
            #  classic/packet_propagation.py:284-317)
            gamma_in = 1.0 / jnp.sqrt(1.0 - beta_inner * beta_inner)
            inv_dop = (1.0 + b_mu * beta_inner) * gamma_in
            b_nu = b_nu_cmf * inv_dop
            b_energy = inv_dop
            b_mu = (b_mu + beta_inner) / (1.0 + beta_inner * b_mu)
        else:
            inv_dop = 1.0 / (1.0 - b_mu * beta_inner)
            b_nu = b_nu_cmf * inv_dop
            b_energy = inv_dop
        # per-packet statistical weights (weighted / relativistic sources;
        # reference black_body_weighted.py:9, black_body_relativistic.py)
        b_energy = b_energy * prow[:, 3]

        r = jnp.where(can_fill, beta_inner, carry.r)
        mu = jnp.where(can_fill, b_mu, carry.mu)
        nu = jnp.where(can_fill, b_nu, carry.nu)
        energy = jnp.where(can_fill, b_energy, carry.energy)
        shell = jnp.where(can_fill, 0, carry.shell)
        next_line = jnp.where(can_fill, birth_line, carry.next_line)
        pkt_id = jnp.where(can_fill, new_ids + pid_offset, carry.pkt_id)
        event_idx = jnp.where(can_fill, 0, carry.event_idx)
        alive = carry.alive | can_fill
        next_unborn = carry.next_unborn + jnp.sum(can_fill.astype(I32))
        # materialize the refilled lane state once (see _distance_boundary)
        r, mu, nu, energy = lax.optimization_barrier((r, mu, nu, energy))

        # birth vpacket spawn records (reference packet_propagation.py:108-118:
        # volley at packet birth before the first trace)
        if static.vpacket_capacity > 0:
            vp_idx = carry.vp_count + jnp.cumsum(can_fill.astype(I32)) - 1
            widx = jnp.where(
                can_fill & (vp_idx < static.vpacket_capacity),
                vp_idx,
                static.vpacket_capacity + 1,
            )
            rows = jnp.stack(
                [
                    jnp.full_like(b_mu, beta_inner),
                    b_mu,
                    b_nu,
                    b_energy,
                    jnp.zeros_like(b_mu),
                    birth_line.astype(F32),
                    jnp.full_like(b_mu, -1.0),
                    jnp.full_like(b_mu, -1.0),
                ],
                axis=1,
            )
            vp_packed = carry.vp_packed.at[widx].set(rows, mode="drop")
            vp_count = carry.vp_count + jnp.sum(can_fill.astype(I32))
        else:
            vp_packed, vp_count = carry.vp_packed, carry.vp_count

        # ------------------------------------------------ 2. RNG
        U = _step_uniforms(base_key, pkt_id, event_idx)
        if use_walk:
            # legacy per-tag keys for the walk fallback's jump draws
            def mk_key(pid, eidx):
                return jax.random.fold_in(
                    jax.random.fold_in(base_key, pid.astype(jnp.uint32)),
                    eidx.astype(jnp.uint32),
                )

            walk_keys = jax.vmap(mk_key)(pkt_id, event_idx)

        # ------------------------------------------------ 3. trace
        shell_c = jnp.clip(shell, 0, S - 1)
        chi_e_cmf = tables.chi_e[shell_c]
        r_in = tables.r_inner[shell_c]
        r_out = tables.r_outer[shell_c]
        z = mu * r
        if static.enable_full_relativity:
            gamma = 1.0 / jnp.sqrt(jnp.maximum(1.0 - r * r, 1e-12))
            dop = (1.0 - z) * gamma
        else:
            dop = 1.0 - z  # = 1 - mu*beta(r)  (homologous: beta = r/ct)
        nu_cmf = nu * dop
        if static.enable_continuum:
            # chi_continuum = chi_e + chi_bf(nu_cmf) + chi_ff(nu_cmf)
            # (reference modes/iip/packet_propagation.py:125-141); bound-free
            # via ONE searchsorted on the merged grid + dense (B, C) gather —
            # replaces the per-active-continuum loop of chi_bf_interpolator
            # (opacities/opacities.py:111-180)
            Cn, Ng = static.n_continua, static.n_cont_grid
            gcell = searchsorted_unrolled(
                tables.cont_grid_nu, nu_cmf, side="right"
            ) - 1
            gcell = jnp.clip(gcell, 0, Ng - 2)
            dg = tables.cont_grid_nu[gcell + 1] - tables.cont_grid_nu[gcell]
            tfrac = jnp.clip(
                (nu_cmf - tables.cont_grid_nu[gcell])
                / jnp.maximum(dg, 1e-30),
                0.0,
                1.0,
            )
            cols = jnp.arange(Cn)[None, :]
            x0 = tables.cont_xsect[gcell[:, None] * Cn + cols]
            x1 = tables.cont_xsect[(gcell[:, None] + 1) * Cn + cols]
            xs_bf = x0 + tfrac[:, None] * (x1 - x0)  # (B, C)
            boltz = jnp.exp(-nu_cmf * tables.cont_boltz_coef[shell_c])
            coefA = tables.cont_A[cols * S + shell_c[:, None]]
            coefB = tables.cont_B[cols * S + shell_c[:, None]]
            chi_bf_cum = jnp.cumsum(
                jnp.maximum(xs_bf * (coefA - coefB * boltz[:, None]), 0.0),
                axis=1,
            )
            chi_bf_tot = chi_bf_cum[:, -1]
            chi_ff = (
                tables.cont_ff_coef[shell_c]
                / jnp.maximum(nu_cmf, 1e-30) ** 3
                * (1.0 - boltz)
            )
            chi = chi_e_cmf + chi_bf_tot + chi_ff
        else:
            chi = chi_e_cmf
        if static.enable_full_relativity:
            # (reference classic/packet_propagation.py:138-141)
            chi = chi * dop
        d_b, delta_shell = _distance_boundary(r, mu, r_in, r_out)

        tau_event = -jnp.log(U[:, COL_TAU])

        # exclusive prefix at the domain start: ONE packed (hi, lo) gather
        c0row = tables.tau_pack[shell_c * LP1 + next_line]  # (B, 2)
        c0_hi = c0row[:, 0]
        c0_lo = c0row[:, 1]

        # comoving frequency at the boundary crossing: lines with
        # nu_i <= nu_thresh resonate beyond the boundary (reference
        # trace_packet's while nu_line >= comov_nu_boundary loop bound,
        # homologous_rad_packet_transport.py:102-161)
        if static.enable_full_relativity:
            p2_fr = jnp.maximum(r * r * (1.0 - mu * mu), 0.0)
            y_b = z + d_b
            rb2 = r * r + d_b * d_b + 2.0 * r * d_b * mu
            nu_thresh = (
                nu * (1.0 - y_b)
                / jnp.sqrt(jnp.maximum(1.0 - rb2, 1e-12))
            )
        else:
            p2_fr = None
            nu_thresh = nu * (1.0 - (z + d_b))
        i_event, nu_ev, cev_hi, cev_lo, aux_ev = predicate_search_packed(
            tables.pred_packed,
            shell_c,
            next_line,
            L,
            c0_hi,
            c0_lo,
            chi,
            z,
            nu,
            tau_event,
            nu_thresh,
            full_relativity=static.enable_full_relativity,
            p2=p2_fr,
        )
        # classify: i_event is the first line whose resonance lies past the
        # boundary (not found) OR the first line where the accumulated
        # optical depth exceeds tau_event (found); the event frequency and
        # exact exclusive prefix come from the search row extraction
        found = (i_event < L) & (nu_ev > nu_thresh)
        if static.enable_full_relativity:
            a_fr = nu_ev * nu_ev
            b_fr = nu * nu
            disc = jnp.maximum(a_fr * (a_fr - (a_fr + b_fr) * p2_fr), 0.0)
            y_ev = (b_fr - jnp.sqrt(disc)) / (a_fr + b_fr)
            s_ev = jnp.maximum(y_ev - z, 0.0)
        else:
            s_ev = jnp.maximum(1.0 - nu_ev / nu - z, 0.0)
        tau_at = df32_diff(cev_hi, cev_lo, c0_hi, c0_lo)
        d_cont = jnp.maximum((tau_event - tau_at) / chi, 0.0)
        s_ev, d_cont = lax.optimization_barrier((s_ev, d_cont))
        escat_f = d_cont < s_ev
        if static.disable_line_scattering:
            escat_f = jnp.ones_like(escat_f)
        escat_nf = d_cont < d_b

        EV_BOUNDARY, EV_LINE, EV_ESCAT = 0, 1, 2
        event = jnp.where(
            found,
            jnp.where(escat_f, EV_ESCAT, EV_LINE),
            jnp.where(escat_nf, EV_ESCAT, EV_BOUNDARY),
        )
        distance = jnp.where(
            found,
            jnp.where(escat_f, d_cont, s_ev),
            jnp.where(escat_nf, d_cont, d_b),
        )
        # materialize once: XLA fusion otherwise RECOMPUTES shared
        # intermediates per consumer with shape-dependent FMA contraction,
        # breaking bitwise batch-size/chunk/device-layout invariance
        distance = lax.optimization_barrier(distance)
        # exclusive end of crossed-line range (LINE includes its own line)
        end_line = jnp.where(
            found & ~escat_f, i_event + 1, i_event
        )

        # ------------------------------------------------ 4. estimators
        live_f = alive.astype(F32)
        e_com = energy * dop
        # full relativity: length contraction of the estimator path
        # (reference packets/movement.py:63-71)
        path = distance * dop if static.enable_full_relativity else distance
        w_j = live_f * e_com * path
        onehot = (shell_c[:, None] == jnp.arange(S)[None, :]).astype(F32)
        if _DISABLE_BULK_EST:
            est_j, est_j_lo = carry.est_j, carry.est_j_lo
            est_nubar, est_nubar_lo = carry.est_nubar, carry.est_nubar_lo
        else:
            # ONE (2, B) x (B, S) matmul covers both bulk estimators
            wj2 = jnp.stack([w_j, w_j * nu_cmf], axis=0)
            sums = jnp.dot(wj2, onehot, preferred_element_type=F32)
            est_j, est_j_lo = df32_accumulate(
                carry.est_j, carry.est_j_lo, sums[0]
            )
            est_nubar, est_nubar_lo = df32_accumulate(
                carry.est_nubar, carry.est_nubar_lo, sums[1]
            )

        if static.enable_continuum:
            # continuum estimator moments per (grid cell, shell); host
            # reconstructs the reference's per-continuum estimators
            # (update_estimators_bound_free,
            #  estimators/radfield_estimator_calcs.py:57-125) exactly
            n_mrows = (static.n_cont_grid - 1) * S
            m_idx = jnp.where(alive, gcell * S + shell_c, n_mrows)
            inv_nu = 1.0 / jnp.maximum(nu_cmf, 1e-30)
            wb = w_j * boltz
            mrows = jnp.stack(
                [w_j, w_j * inv_nu, w_j * nu_cmf, wb, wb * inv_nu,
                 wb * nu_cmf, live_f, jnp.zeros_like(w_j)],
                axis=1,
            )
            mdelta = jnp.zeros_like(carry.cont_moments).at[m_idx].add(
                mrows, mode="drop"
            )
            cont_moments, cont_lo = df32_accumulate(
                carry.cont_moments, carry.cont_lo, mdelta
            )
            est_ff_heat, ff_lo = df32_accumulate(
                carry.est_ff_heat, carry.ff_lo,
                jnp.dot(w_j * chi_ff, onehot, preferred_element_type=F32),
            )
        else:
            cont_moments, cont_lo = carry.cont_moments, carry.cont_lo
            est_ff_heat, ff_lo = carry.est_ff_heat, carry.ff_lo

        if static.enable_full_relativity:
            # increments are line-independent: E/nu and E (reference
            # calc_packet_energy_full_relativity) — finalize must NOT apply
            # the nu_i factor in this mode
            w1 = live_f * energy / nu  # j_blue weight
            w2 = live_f * energy  # e_dot weight
        else:
            w1 = live_f * energy / (nu * nu)  # j_blue weight
            w2 = live_f * energy / nu  # e_dot weight
        if _DISABLE_LINE_SCATTER:
            line_diff, line_lo = carry.line_diff, carry.line_lo
        else:
            # ONE flat interleaved scatter-add (4B scalar updates): flat
            # f32 scatters run ~5x faster than (rows, 2) scatters on TPU
            base_a = (next_line * S + shell_c) * 2
            base_b = (end_line * S + shell_c) * 2
            idx_cat = jnp.concatenate(
                [base_a, base_a + 1, base_b, base_b + 1]
            )
            vals_cat = jnp.concatenate([w1, w2, -w1, -w2])
            ldelta = jnp.zeros_like(carry.line_diff).at[idx_cat].add(
                vals_cat
            )
            line_diff, line_lo = df32_accumulate(
                carry.line_diff, carry.line_lo, ldelta
            )

        # ------------------------------------------------ 5. move
        r_new = jnp.sqrt(
            jnp.maximum(r * r + distance * distance + 2.0 * r * distance * mu,
                        1e-20)
        )
        mu_new = (mu * r + distance) / r_new
        r_new, mu_new = lax.optimization_barrier((r_new, mu_new))

        # ------------------------------------------------ 6. events
        is_boundary = alive & (event == EV_BOUNDARY)
        is_escat = alive & (event == EV_ESCAT)
        is_line = alive & (event == EV_LINE)
        if static.enable_continuum:
            # split the continuous event into Thomson vs continuum process
            # (reference trace_packet escat_prob branch,
            #  homologous_rad_packet_transport.py:131-141)
            u_esc = U[:, COL_ESCAT]
            escat_prob = chi_e_cmf / jnp.maximum(
                chi_e_cmf + chi_bf_tot + chi_ff, 1e-30
            )
            is_contproc = is_escat & (u_esc >= escat_prob)
            is_escat = is_escat & (u_esc < escat_prob)
        else:
            is_contproc = jnp.zeros_like(is_escat)

        # boundary
        new_shell = shell + jnp.where(is_boundary, delta_shell, 0)
        emitted = is_boundary & (new_shell >= S)
        hits_core = is_boundary & (new_shell < 0)
        if static.inner_boundary_albedo > 0.0:
            # reflective inner boundary (reference
            # enable_reflective_inner_boundary config)
            reflected = hits_core & (
                U[:, COL_ALBEDO] < static.inner_boundary_albedo
            )
            reabsorbed = hits_core & ~reflected
        else:
            reflected = jnp.zeros_like(hits_core)
            reabsorbed = hits_core

        # scatter/line common: new direction drawn in CMF
        mu_draw = 2.0 * U[:, COL_MU] - 1.0
        if static.enable_full_relativity:
            gamma_new = 1.0 / jnp.sqrt(jnp.maximum(1.0 - r_new * r_new,
                                                   1e-12))
            dop_old_pos = (1.0 - mu_new * r_new) * gamma_new
            inv_dop_new = (1.0 + mu_draw * r_new) * gamma_new
            # aberration CMF -> LF (reference frame_transformations.py:89)
            mu_emit = (mu_draw + r_new) / (1.0 + r_new * mu_draw)
        else:
            dop_old_pos = 1.0 - mu_new * r_new
            inv_dop_new = 1.0 / (1.0 - mu_draw * r_new)
            mu_emit = mu_draw

        # Thomson (reference interaction_events.py:184-218)
        nu_escat = nu * dop_old_pos * inv_dop_new
        e_escat = energy * dop_old_pos * inv_dop_new

        # line emission (reference interaction_events.py:227-262 +
        # interaction_event_callers.py:187-240)
        if static.enable_continuum:
            # IIP mode: line AND continuum absorptions both activate the
            # absorbing-Markov macro atom (reference continuum_event +
            # line_scatter_event -> macro_atom_event -> interaction_iip)
            frac_bf = chi_bf_tot / jnp.maximum(chi_bf_tot + chi_ff, 1e-30)
            is_bf = U[:, COL_BFFF] < frac_bf
            u_csel = U[:, COL_CONT_SEL] * chi_bf_tot
            c_sel = jnp.sum(
                (chi_bf_cum < u_csel[:, None]).astype(I32), axis=1
            )
            c_sel = jnp.clip(c_sel, 0, static.n_continua - 1)
            line_state = aux_ev[0].astype(I32)  # line2state at i_event
            state0 = jnp.where(
                is_line,
                line_state,
                jnp.where(
                    is_bf, tables.photo_ion_state[c_sel], static.k_state
                ),
            )
            em_kind, chan_id = _markov_interaction(
                tables, static, state0, shell_c,
                U[:, COL_MK_ROW], U[:, COL_MK_DEACT],
            )
            em_line = jnp.clip(chan_id, 0, L - 1)
            nu_cmf_fb = _sample_fb_nu(
                tables, static, chan_id, shell_c, U[:, COL_FB]
            )
            # nu_ff = -kT/h ln(u) (sample_nu_free_free,
            # interaction_events.py:141-152)
            nu_cmf_ff = -jnp.log(U[:, COL_FF]) / tables.cont_boltz_coef[shell_c]
            nu_cmf_em = jnp.where(
                em_kind == 0,
                tables.line_nu[em_line],
                jnp.where(em_kind == 1, nu_cmf_fb, nu_cmf_ff),
            )
            if static.enable_two_photon:
                # two-photon continuum emission: linear-interp inverse CDF
                # of the Nussbaumer & Schmutz (1984) energy distribution
                # (continuum_macro.two_photon_inv_cdf); reference defines
                # the channel (MacroAtomTransitionType.TWO_PHOTON) but
                # never samples it — completed here
                TPN = static.n_two_photon_table
                pos = U[:, COL_FB] * (TPN - 1)
                i_tp = jnp.clip(pos.astype(I32), 0, TPN - 2)
                frac_tp = pos - i_tp.astype(F32)
                nu_cmf_tp = (
                    tables.two_photon_nu[i_tp] * (1.0 - frac_tp)
                    + tables.two_photon_nu[i_tp + 1] * frac_tp
                )
                nu_cmf_em = jnp.where(em_kind == 3, nu_cmf_tp, nu_cmf_em)
            nu_line_new = nu_cmf_em * inv_dop_new
            # next line id: emitted line + 1 for bb, reverse-searchsorted of
            # the comoving frequency for bf/ff (get_current_line_id,
            # interaction_events.py:21-36)
            next_line_em = jnp.where(
                em_kind == 0,
                em_line + 1,
                tiled_searchsorted(
                    tables.neg_nu_tiled, -nu_cmf_em, side="right"
                ),
            )
        else:
            if static.line_interaction_mode == LINE_SCATTER:
                em_line = i_event
                nu_line_em = nu_ev  # extracted by the search: no gather
            else:
                level = aux_ev[0].astype(I32)  # line2macro at i_event
                if static.use_macro_chain:
                    em_line, nu_chain = _chain_emission(
                        tables, static, level, shell_c,
                        U[:, COL_MK_ROW], U[:, COL_FB],
                        U[:, COL_MK_DEACT], U[:, COL_FF],
                    )
                    em_line = jnp.where(is_line, em_line, i_event)
                    nu_line_em = jnp.where(is_line, nu_chain, nu_ev)
                else:
                    em_line = _macro_walk(
                        tables, static, level, i_event, shell_c, walk_keys,
                        is_line,
                    )
                    em_line = jnp.where(is_line, em_line, i_event)
                    nu_line_em = tables.line_nu[
                        jnp.clip(em_line, 0, L - 1)
                    ]
            nu_line_new = nu_line_em * inv_dop_new
            next_line_em = em_line + 1
        e_line = energy * dop_old_pos * inv_dop_new

        absorbs = is_line | is_contproc
        interacts = is_escat | absorbs
        # adiabatic-cooling deactivation: the macro-atom chain ended in
        # expansion work — the packet is destroyed, its energy leaves the
        # radiation field (reference interaction_events.py:130
        # adiabatic_cooling -> PacketStatus.ADIABATIC_COOLING)
        if static.enable_continuum and static.enable_adiabatic_cooling:
            from tardis_tpu.opacities.continuum_macro import EMIT_ADIABATIC

            is_adiab = absorbs & (em_kind == EMIT_ADIABATIC)
        else:
            is_adiab = jnp.zeros_like(absorbs)
        nu_pre_interaction = nu
        nu = jnp.where(is_escat, nu_escat, jnp.where(absorbs, nu_line_new, nu))
        energy = jnp.where(
            is_escat, e_escat, jnp.where(absorbs, e_line, energy)
        )
        mu_after = jnp.where(interacts, mu_emit, mu_new)
        next_line = jnp.where(
            absorbs, next_line_em, jnp.where(alive, end_line, next_line)
        )

        r = jnp.where(alive, r_new, r)
        mu = jnp.where(alive, jnp.where(reflected, -mu_after, mu_after), mu)
        shell = jnp.where(
            is_boundary & ~emitted & ~reabsorbed & ~reflected,
            new_shell, shell,
        )
        r, mu, nu, energy = lax.optimization_barrier((r, mu, nu, energy))

        pkt_row = pkt_id - out_offset  # row in the per-packet out buffers

        # full tracker writes (event log capped at K events per packet)
        if static.track_rpacket_length > 0:
            K = static.track_rpacket_length
            slot_ok = alive & (event_idx < K)
            widx_t = jnp.where(
                slot_ok, pkt_row * K + jnp.minimum(event_idx, K - 1),
                n_out * K + 1,
            )
            ev_code = jnp.where(
                is_line, 2.0,
                jnp.where(is_escat, 1.0, jnp.where(is_contproc, 4.0, 3.0)),
            )
            rows_t = jnp.stack(
                [r, nu, energy, shell.astype(F32), ev_code, mu],
                axis=1,
            )
            tr_packed = carry.tr_packed.at[widx_t].set(rows_t, mode="drop")
        else:
            tr_packed = carry.tr_packed

        # last-interaction tracking (one scatter-set per field at pkt_id)
        if static.track_last_interaction:
            tr_idx = jnp.where(interacts, pkt_row, n_out + 1)
            rows_li = jnp.stack(
                [
                    jnp.where(is_line, 2.0, jnp.where(is_contproc, 3.0, 1.0)),
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

        # interaction vpacket spawn records (reference
        # packet_propagation.py:186-227: volley after line/e-scatter events)
        if static.vpacket_capacity > 0:
            vp_idx2 = vp_count + jnp.cumsum(interacts.astype(I32)) - 1
            widx2 = jnp.where(
                interacts & (vp_idx2 < static.vpacket_capacity),
                vp_idx2,
                static.vpacket_capacity + 1,
            )
            li_type_vp = jnp.where(
                is_line, 2.0, jnp.where(is_contproc, 3.0, 1.0)
            )
            out_line_vp = jnp.where(
                absorbs, (next_line - 1).astype(F32), -1.0
            )
            rows2 = jnp.stack(
                [r, mu, nu, energy, shell.astype(F32),
                 next_line.astype(F32), li_type_vp, out_line_vp],
                axis=1,
            )
            vp_packed = vp_packed.at[widx2].set(rows2, mode="drop")
            vp_count = vp_count + jnp.sum(interacts.astype(I32))

        # ------------------------------------------------ 7. deaths
        # adiabatic kills record status "reabsorbed" with ZERO energy: the
        # energy went into expansion work, so it must appear in neither
        # the emitted nor the reabsorbed luminosity (the reference gives
        # these packets their own ADIABATIC_COOLING status and filters
        # them from both sums)
        dying = emitted | reabsorbed | is_adiab
        out_base = jnp.where(dying, pkt_row, n_out) * 2
        nu_signed = jnp.where(
            emitted, nu, jnp.where(is_adiab, -nu_pre_interaction, -nu)
        )
        out_energy = jnp.where(is_adiab, 0.0, energy)
        if _DISABLE_OUT_SCATTER:
            out_packed = carry.out_packed
        else:
            # flat interleaved scatter (2B scalar updates, drop for alive)
            out_packed = carry.out_packed.at[
                jnp.concatenate([out_base, out_base + 1])
            ].set(
                jnp.concatenate([nu_signed, out_energy]), mode="drop"
            )
        alive = alive & ~dying
        event_idx = event_idx + 1

        return TransportCarry(
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
            vp_packed=vp_packed,
            vp_count=vp_count,
            tr_packed=tr_packed,
            li_packed=li_packed,
            cont_moments=cont_moments,
            est_ff_heat=est_ff_heat,
            n_steps=carry.n_steps + 1,
            n_events=carry.n_events + jnp.sum(alive.astype(F32)),
            line_lo=line_lo,
            est_j_lo=est_j_lo,
            est_nubar_lo=est_nubar_lo,
            cont_lo=cont_lo,
            ff_lo=ff_lo,
        )

    return step


def init_carry(static: TransportStaticConfig, batch_size: int, n_packets: int):
    B = batch_size
    S, L = static.n_shells, static.n_lines
    R = max(static.vpacket_capacity, 1)
    T = n_packets if static.track_last_interaction else 1
    TRK = (
        n_packets * static.track_rpacket_length
        if static.track_rpacket_length > 0
        else 1
    )
    z = jnp.zeros
    return TransportCarry(
        r=z(B, F32),
        mu=z(B, F32),
        nu=jnp.ones(B, F32),
        energy=z(B, F32),
        shell=z(B, I32),
        next_line=z(B, I32),
        pkt_id=jnp.full(B, -1, I32),
        event_idx=z(B, I32),
        alive=jnp.zeros(B, bool),
        next_unborn=jnp.zeros((), I32),
        est_j=z(S, F32),
        est_nubar=z(S, F32),
        line_diff=z(2 * (L + 1) * S, F32),
        out_packed=z(2 * n_packets, F32),
        vp_packed=z((R, 8), F32),
        vp_count=jnp.zeros((), I32),
        tr_packed=z((TRK, 6), F32),
        li_packed=z((T, 6), F32),
        cont_moments=z(
            (
                (static.n_cont_grid - 1) * S
                if static.enable_continuum
                else 1,
                8,
            ),
            F32,
        ),
        est_ff_heat=z(S if static.enable_continuum else 1, F32),
        n_steps=jnp.zeros((), I32),
        n_events=jnp.zeros((), F32),
        line_lo=z(2 * (L + 1) * S, F32),
        est_j_lo=z(S, F32),
        est_nubar_lo=z(S, F32),
        cont_lo=z(
            ((static.n_cont_grid - 1) * S if static.enable_continuum else 1,
             8),
            F32,
        ),
        ff_lo=z(S if static.enable_continuum else 1, F32),
    )


def transport_loop(
    tables: TransportTables,
    static: TransportStaticConfig,
    pool_mu,
    pool_nu_cmf,
    base_key,
    n_packets: int,
    batch_size: int,
    max_steps: int = 1 << 30,
    pid_offset=0,
    carry0: TransportCarry | None = None,
    tail_threshold: int = 0,
    pool_w=None,
    n_out: int | None = None,
    out_offset=0,
    drain: bool = True,
):
    """The transport while-loop (traceable; used directly under shard_map).

    With ``tail_threshold`` > 0 the loop ALSO exits once the pool is
    exhausted and at most that many lanes remain alive — the host then
    repacks the survivors into a narrower batch (see run_transport_tail);
    per-packet counter RNG makes the result bitwise identical either way.

    With ``drain=False`` the loop exits as soon as the pool is exhausted,
    leaving every in-flight lane alive in the returned carry — the
    lane-continuity contract for chunked pools: the next chunk's loop
    (carry0=this carry, a fresh pool slice, its pid_offset) resumes the
    refill with no occupancy decay, making chunked execution nearly
    step-identical to one giant pool — only the lanes that die in the very
    boundary step refill one step late (only the FINAL chunk drains).
    """
    step = make_transport_step(
        tables, static, pool_mu, pool_nu_cmf, n_packets, base_key, pid_offset,
        pool_w=pool_w, n_out=n_out, out_offset=out_offset,
    )
    if carry0 is None:
        carry0 = init_carry(
            static, batch_size, n_packets if n_out is None else n_out
        )

    def cond(c: TransportCarry):
        pool_left = c.next_unborn < n_packets
        if not drain:
            return pool_left & (c.n_steps < max_steps)
        running = pool_left | jnp.any(c.alive)
        if tail_threshold > 0:
            not_tail = pool_left | (
                jnp.sum(c.alive.astype(I32)) > tail_threshold
            )
            running = running & not_tail
        return running & (c.n_steps < max_steps)

    return lax.while_loop(cond, step, carry0)


def run_transport(
    tables: TransportTables,
    static: TransportStaticConfig,
    pool_mu,
    pool_nu_cmf,
    base_key,
    n_packets: int,
    batch_size: int,
    max_steps: int = 1 << 30,
    tail_batch: int = 0,
    chunk_size: int = 2097152,
    pool_w=None,
    progress=None,
    tail_ladder: bool = False,
):
    """Run transport for all n_packets on one device; returns final carry.

    ``progress``: optional callable ``progress(done_packets, n_packets)``
    invoked after every chunk program returns — the TPU-native analogue of
    the reference's in-loop packet progress bar (progress_bars.py objmode
    hook): XLA programs cannot call back into Python mid-loop, so the
    chunk boundary is the natural progress granularity.

    ``tail_batch`` > 0 enables the two-phase tail optimization: the wide
    main loop exits once <= tail_batch lanes remain (pool exhausted), the
    survivors are repacked host-side into a (tail_batch,)-lane loop, and the
    per-packet counter RNG guarantees bitwise-identical results.  This
    bounds the cost of rare packets that resonant-scatter through very long
    line cascades (one lockstep event per step) — the analogue of the
    reference's cheap per-thread tail, which a wide lockstep batch lacks.

    Pools larger than ``chunk_size`` run as a host loop of chunk programs
    with **lane continuity** (round 3): ONE carry threads through every
    chunk; each non-final chunk's loop exits the moment its pool slice is
    exhausted (transport_loop drain=False) with all in-flight lanes still
    alive, and the next chunk resumes the refill from its own slice.  Chunk
    boundaries therefore cost zero occupancy (at most a one-step refill lag
    for lanes dying in the boundary step), and only the FINAL chunk pays a
    drain tail.  Per-packet trajectories stay bitwise identical to an
    unchunked run (counter RNG) and land in one global n_packets-row
    buffer (pkt_id is global), so no host-side merge step exists.

    Root cause of the chunking requirement (round-1 "1e6-packet fault",
    root-caused round 2): the TPU worker on this stack kills any single
    XLA program execution running longer than roughly a minute — a 1e7-
    packet while_loop (~70 s) reliably crashes the worker, while 2e6
    packets (~12 s) is fine at any packet count when split.  The default
    chunk therefore bounds per-kernel wall time, NOT device memory; raise
    it on runtimes without the watchdog.
    """
    import logging

    import numpy as np

    batch = min(batch_size, n_packets)
    if max_steps >= 1 << 30:
        # immortal-lane failsafe: the lockstep loop runs as long as the
        # WORST packet's event count, and continuum-thick (IIP) states
        # legitimately random-walk single packets through 10^4-10^5
        # events, so the ceiling must sit far above that tail.  A kernel
        # bug that leaves a lane alive forever (e.g. the round-4
        # tangential-boundary trap) then costs bounded time + a loud
        # warning instead of looping until the platform kills the worker
        max_steps = 500_000
    if chunk_size <= 0:
        chunk_size = n_packets
    if progress is not None:
        # finer fixed subdivision so the bar moves (one extra compiled
        # program size at most; lane continuity makes the split free)
        chunk_size = min(chunk_size, 262144)
        progress(0, n_packets)
    use_tail = 0 < tail_batch < batch
    # drain-tail repack LADDER (round 5, ``tail_ladder=True``): once the
    # pool is exhausted the lockstep batch decays from full occupancy to
    # empty over the longest-lived packets' remaining events.  A single
    # narrow repack at `tail_batch` lanes leaves the whole decay running
    # at width B — fine for classic mode (the drain is ~60 steps), but
    # catastrophic for IIP heavy tails, where thousands of packets
    # random-walk 1e4-1e5 events: measured occupancy parks at ~23% of a
    # full-width batch for tens of thousands of steps.  The ladder exits
    # the wide loop at half occupancy and repacks survivors into
    # successively halved widths (each width one cached XLA program;
    # per-packet counter RNG keeps results bitwise identical).  It is
    # OPT-IN because each extra stage costs a program dispatch (~0.1 s on
    # the axon tunnel), which outweighs the saving for short drains —
    # the continuum transport path enables it.
    first_exit = (
        batch // 2 if (use_tail and tail_ladder) else
        (tail_batch if use_tail else 0)
    )

    def _step_budget(width):
        # keep each XLA program execution well under the platform's
        # ~1-minute watchdog (the round-1 fault this module chunks
        # around): measured step cost on this chip is ~1.5 ms fixed +
        # ~80 ns/lane, so budget steps for a ~25 s program.  The step
        # LIMIT is a dynamic (traced) argument, so slicing reuses one
        # compiled program per (shape, static-config).
        return max(1000, int(25.0 / (0.0015 + 8e-8 * width)))

    def _run_sliced(c, start, n_loc, width, th, drain_, steps_done):
        """Run one logical chunk as watchdog-bounded program slices.

        Pool slices can stall far beyond any wall-time bound when no
        lane dies for tens of thousands of steps (IIP heavy tails), so
        every program gets a bounded step budget and the host loops on
        the carried state — bitwise identical to one long program.
        ``steps_done`` threads the carry's step counter host-side so the
        common single-slice case pays only its one exit-check fetch.
        Returns (carry, steps_done).
        """
        budget = _step_budget(width)
        sl = slice(start, start + n_loc)
        mu_sl, nu_sl = pool_mu[sl], pool_nu_cmf[sl]
        w_sl = None if pool_w is None else pool_w[sl]
        while True:
            limit = min(steps_done + budget, max_steps)
            c = _run_chunk_jit(
                tables, static, mu_sl, nu_sl, base_key,
                jnp.asarray(start, I32), c,
                n_packets=n_loc, batch_size=width,
                max_steps=jnp.asarray(limit, I32),
                tail_threshold=th, n_out=n_packets, drain=drain_,
                pool_w=w_sl,
            )
            steps_done = int(np.asarray(c.n_steps))
            if steps_done >= max_steps or steps_done < limit:
                # global cap, or the loop exited on its own condition
                return c, steps_done

    carry = init_carry(static, batch, n_packets)
    steps_done = 0
    for start in range(0, n_packets, chunk_size):
        n_local = min(chunk_size, n_packets - start)
        last = start + n_local >= n_packets
        tb = first_exit if (last and first_exit > tail_batch) else (
            tail_batch if (last and use_tail) else 0
        )
        if start > 0:
            carry = carry._replace(next_unborn=jnp.zeros((), I32))
        carry, steps_done = _run_sliced(
            carry, start, n_local, batch, tb, last, steps_done
        )
        if progress is not None:
            progress(min(start + n_local, n_packets), n_packets)

    def _warn_immortal(c):
        n_alive = int(np.asarray(c.alive).sum())
        if n_alive:
            logging.getLogger(__name__).warning(
                "%d packet lane(s) force-terminated after %d steps "
                "(immortal-lane guard) — their packets carry no output",
                n_alive, max_steps,
            )
        return c

    if not use_tail:
        return _warn_immortal(carry)

    last_start = ((n_packets - 1) // chunk_size) * chunk_size
    n_local = n_packets - last_start
    width = max(batch // 2, tail_batch) if tail_ladder else tail_batch
    while width >= tail_batch:
        if steps_done >= max_steps:
            # exited on the global cap before reaching this width
            return _warn_immortal(carry)
        # device-side repack: the previous stage's threshold exit
        # guarantees alive <= width, so survivors compact to the front by
        # a stable argsort with NO host round-trip (the per-packet
        # counter RNG keeps trajectories bitwise identical)
        narrowed = _repack_jit(carry, width)
        final_stage = width // 2 < tail_batch
        carry, steps_done = _run_sliced(
            narrowed, last_start, n_local, width,
            0 if final_stage else width // 2, True, steps_done,
        )
        if final_stage:
            break
        width //= 2
    return _warn_immortal(carry)


@partial(jax.jit, static_argnames=("width",), donate_argnames=("carry",))
def _repack_jit(carry: TransportCarry, width: int) -> TransportCarry:
    """Compact surviving lanes into the first ``width`` slots (stable)."""
    order = jnp.argsort(~carry.alive, stable=True)
    sel = order[:width]

    def take(x):
        return x[sel]

    return carry._replace(
        r=take(carry.r), mu=take(carry.mu), nu=take(carry.nu),
        energy=take(carry.energy), shell=take(carry.shell),
        next_line=take(carry.next_line), pkt_id=take(carry.pkt_id),
        event_idx=take(carry.event_idx), alive=take(carry.alive),
    )


# backwards-compatible alias: a chunked run IS the plain run now
_run_transport_chunked = run_transport


@partial(
    jax.jit,
    static_argnames=("static", "n_packets", "batch_size",
                     "tail_threshold", "n_out", "drain"),
    donate_argnames=("carry0",),
)
def _run_chunk_jit(
    tables, static, pool_mu, pool_nu_cmf, base_key, pid_offset, carry0,
    n_packets, batch_size, max_steps, tail_threshold, n_out, drain,
    pool_w=None,
):
    return transport_loop(
        tables, static, pool_mu, pool_nu_cmf, base_key,
        n_packets, batch_size, max_steps, pid_offset=pid_offset,
        carry0=carry0, tail_threshold=tail_threshold, pool_w=pool_w,
        n_out=n_out, drain=drain,
    )


