"""Per-iteration macro-atom transition-probability solve.

Mirrors the reference's ``LegacyMacroAtomSolver``
(/root/reference/tardis/opacities/macro_atom/macroatom_solver.py:56-210 and
macro_atom/util.py:9-56): runtime probability = stored coefficient x
beta_sobolev[line] (internal-up additionally x stimulated-emission factor x
J^b_blue), normalized per source-level block.

For the TPU kernel the per-block probabilities are stored **cumulatively**
(normalized running sum within each block), so an in-kernel categorical draw
is a binary search instead of the reference's linear probability walk
(transport/montecarlo/macro_atom.py:52-104).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from tardis_tpu.atomic.atom_data import MACRO_INTERNAL_UP, MacroAtomData

TILE = 128


def solve_transition_probabilities(
    macro: MacroAtomData,
    beta_sobolev: np.ndarray,  # (L, S)
    j_blues: np.ndarray,  # (L, S)
    stim_factor: np.ndarray,  # (L, S)
) -> np.ndarray:
    """Block-normalized transition probabilities (T, S)
    (cf. fast_calculate_transition_probabilities, macro_atom/util.py:9-56)."""
    line_idx = macro.transition_line_id
    p = macro.coef[:, None] * beta_sobolev[line_idx]  # (T, S)
    up = macro.transition_type == MACRO_INTERNAL_UP
    p[up] *= stim_factor[line_idx[up]] * j_blues[line_idx[up]]

    refs = macro.block_references
    block_of = np.repeat(np.arange(len(refs) - 1), np.diff(refs))
    T, S = p.shape
    excl = np.zeros((T + 1, S))
    np.cumsum(p, axis=0, out=excl[1:])
    start_vals = excl[refs[:-1]]
    end_vals = excl[refs[1:]]
    denom = (end_vals - start_vals)[block_of]
    with np.errstate(divide="ignore", invalid="ignore"):
        p_norm = p / denom
    return np.where(np.isfinite(p_norm), p_norm, 0.0)


def solve_macro_state(
    macro: MacroAtomData,
    beta_sobolev: np.ndarray,  # (L, S)
    j_blues: np.ndarray,  # (L, S)
    stim_factor: np.ndarray,  # (L, S)
):
    """Compute cumulative-normalized transition probabilities.

    Returns the tuple consumed by
    :func:`tardis_tpu.transport.device_state.build_transport_tables`:
    (cum_prob (T,S) f32, block_start, dest, emit, line, line2macro).
    """
    from tardis_tpu import native

    cum_native = native.macro_cum_probs(
        macro.coef,
        macro.transition_line_id,
        macro.transition_type,
        beta_sobolev,
        j_blues,
        stim_factor,
        macro.block_references,
    )
    if cum_native is not None:
        return (
            cum_native,
            macro.block_references.astype(np.int32),
            macro.destination_level_id.astype(np.int32),
            (macro.transition_type < 0),
            macro.transition_line_id.astype(np.int32),
            macro.line2macro_level_upper.astype(np.int32),
        )

    line_idx = macro.transition_line_id
    p = macro.coef[:, None] * beta_sobolev[line_idx]  # (T, S)
    up = macro.transition_type == MACRO_INTERNAL_UP
    p[up] *= stim_factor[line_idx[up]] * j_blues[line_idx[up]]

    # per-block cumulative normalization
    T, S = p.shape
    refs = macro.block_references
    block_of = np.repeat(
        np.arange(len(refs) - 1), np.diff(refs)
    )  # (T,) block id per transition
    excl = np.zeros((T + 1, S))
    np.cumsum(p, axis=0, out=excl[1:])  # excl[k] = sum of first k transitions
    start_vals = excl[refs[:-1]]  # (M, S) cumulative before each block
    end_vals = excl[refs[1:]]  # (M, S) cumulative through each block
    cum_local = excl[1:] - start_vals[block_of]
    denom = (end_vals - start_vals)[block_of]
    with np.errstate(divide="ignore", invalid="ignore"):
        cum_norm = cum_local / denom
    # empty/zero blocks: make the first entry of the block always win
    cum_norm = np.where(np.isfinite(cum_norm), cum_norm, 1.0)
    # force exact 1.0 at block ends to close the distribution under f32
    cum_norm = np.clip(cum_norm, 0.0, 1.0)
    cum_norm[refs[1:] - 1] = 1.0

    return (
        cum_norm.astype(np.float32),
        macro.block_references.astype(np.int32),
        macro.destination_level_id.astype(np.int32),
        (macro.transition_type < 0),
        macro.transition_line_id.astype(np.int32),
        macro.line2macro_level_upper.astype(np.int32),
    )


# ---------------------------------------------------------------------------
# Absorbing-chain formulation (the fast TPU path)
# ---------------------------------------------------------------------------
#
# The in-kernel RNG walk over transition blocks costs O(jumps x probes)
# dependent gathers per interaction.  The absorbing-Markov-chain formulation
# (the reference uses it for IIP continuum,
# transport/montecarlo/macro_atom.py:108-184 + absorbing_markov_chain.py)
# replaces the walk EXACTLY: the distribution of the deactivating level j
# given activation at level l is
#     B = (I - Q)^{-1} diag(d),
# with Q the internal-transition probabilities and d the per-level
# deactivation probability; the emitted line given deactivation at j is the
# emission-transition distribution of block j renormalized among emissions.
#
# Round 3: both categorical draws use **Walker alias tables** instead of
# 128-ary CDF row searches.  Measured XLA:TPU gather cost is ~10 ns per
# gathered row regardless of width, so the alias method (ONE row gather per
# draw) halves the chain's gather count vs the two-level CDF search while
# sampling the identical distribution (exact up to the same f32 rounding as
# the CDF tables).
#
# Round 4 (VERDICT r3 item 1): the ENTIRE per-iteration build moved onto the
# device, and the alias tables were replaced by **component-local packed CDF
# rows**.  The host used to spend >10x the transport-kernel time in numpy
# (this host moves memory at ~200 MB/s) plus ~7 s/iteration of host<->device
# transfers shipping alias tables.  Now one jitted XLA program does the
# probability build + normalization (segment-sums), Q assembly, the batched
# f32 LU absorbing solves over per-component blocks, and emits the sampling
# tables DEVICE-RESIDENT:
#
# - chain_cdf (S*M, W+1):  [cdf over the component's W local slots | base],
#   where W = largest component and base the component's first level id.
#   Q is block-diagonal over (atom, ion) groups (classic macro-atom has no
#   ionization channels); weak connected components are merged into
#   contiguous level-id ranges so the kernel recovers the global absorbing
#   state as base + count(cdf < u) -- ONE row gather + a VPU row-count,
#   no alias construction, no transfers.
# - emit_cdf (S*M, 2*We):  [cdf over the level's emission block | line ids],
#   emitted line extracted in-row by one-hot reduction.
#
# Components are padded to power-of-two buckets, one batched LU per bucket
# over (shell x component).  Cost model: a gathered row costs ~10 ns
# LATENCY regardless of width (probe_loop_ops2), and the extra row width
# (W+1 vs the alias rows' 3) adds only bandwidth: (W+1)*4 B * B lanes
# ~ 100 MB/step at W=200 ~ 0.1 ms -- far below the ~7 s/iteration of
# host work + transfers the alias design cost.


@dataclass
class MacroChainState:
    """Kernel-ready absorbing-chain macro-atom tables (device-resident).

    ``chain_cdf``/``emit_cdf`` are jax device arrays built on-accelerator;
    ``emit_block_start``/``emit_line`` are small host-side copies of the
    static emission-block structure for analysis code and tests.
    """

    n_states: int  # M
    chain_width: int  # W (0 for downbranch)
    emit_width: int  # We (longest emission block)
    chain_cdf: object | None  # (S*M, W+1) f32 [cdf | base] (None: downbranch)
    emit_cdf: object  # (S*M, 3*We) f32 [cdf | line ids | line nus]
    line2macro: np.ndarray  # (L,) i32 activation map
    emit_block_start: np.ndarray  # (M+1,) i32
    emit_line: np.ndarray  # (E0,) i32


class _ChainContext:
    """Static per-(macro-table, mode) structure for the device chain build.

    Everything here depends only on the SPARSITY of the transition table
    (which transitions exist, their source/destination levels, the merged
    connected components of the internal graph, the emission-block layout)
    — not on the per-iteration plasma state — so it is built once and
    cached on the MacroAtomData.

    Layout matters for cold-start cost on the TPU tunnel: every device
    array lives in the ``arrays`` pytree and is passed to the jitted build
    as an ARGUMENT (closed-over jax arrays would be embedded in the traced
    program as multi-MB constants — ~40 s of host tracing/hashing per
    process), and dtype conversion happens in numpy before ONE
    ``jax.device_put`` (an eager ``jnp.asarray`` with a dtype change
    compiles a throwaway convert program per distinct shape, ~0.5 s each
    on this stack).
    """

    def __init__(self, macro: MacroAtomData, mode: str,
                 line_nu_scaled=None):
        refs = macro.block_references.astype(np.int64)
        M = len(refs) - 1
        self.M = M
        ttype = macro.transition_type
        src = np.repeat(np.arange(M), np.diff(refs))
        emit_mask = ttype < 0

        arrays = {
            "coef": np.asarray(macro.coef, np.float32),
            "line_idx": np.asarray(macro.transition_line_id, np.int32),
            "up": np.asarray(ttype == MACRO_INTERNAL_UP),
            "block_of": np.asarray(src, np.int32),
        }

        # emission-block structure (dense (M, We) layout; blocks are
        # contiguous in the CSR table so within-block slots are offsets)
        e_idx = np.nonzero(emit_mask)[0]
        e_src = src[e_idx]
        e_line = macro.transition_line_id[e_idx].astype(np.int64)
        e_start = np.searchsorted(e_src, np.arange(M + 1)).astype(np.int64)
        self.emit_block_start = e_start.astype(np.int32)
        self.emit_line = e_line.astype(np.int32)
        elen = np.diff(e_start)
        We = int(max(int(elen.max()) if len(elen) else 1, 1))
        self.We = We
        slot = np.arange(len(e_src)) - e_start[e_src]
        line_dense = np.zeros((M, We), np.float32)
        line_dense[e_src, slot] = e_line.astype(np.float32)
        # emitted-line frequencies packed into the emission rows (third
        # block): extracting nu from the already-fetched row kills the
        # kernel's separate line_nu gather (1 of the 7 critical gathers)
        # empty emission blocks (levels with no emission transitions, only
        # reachable through degenerate self-deactivation chains) carry the
        # dummy entry "line 0 at line 0's REAL frequency" — matching the
        # retired alias path's dummy-self-entry behavior; a 0.0 default
        # would silently emit a zero-frequency packet that dies with
        # status 0 and drops out of both luminosities (ADVICE r4)
        nu_fill = (
            np.float32(np.asarray(line_nu_scaled).ravel()[0])
            if line_nu_scaled is not None and len(
                np.asarray(line_nu_scaled).ravel()
            )
            else np.float32(0.0)
        )
        nu_dense = np.full((M, We), nu_fill, np.float32)
        if line_nu_scaled is not None:
            nu_dense[e_src, slot] = np.asarray(
                line_nu_scaled, np.float32
            )[e_line]
        arrays.update(
            emit_idx=np.asarray(e_idx, np.int32),
            e_src=np.asarray(e_src, np.int32),
            e_slot=np.asarray(e_src * We + slot, np.int32),
            line_dense=line_dense,
            nu_dense=nu_dense,
        )

        self.bucket_meta = []
        if mode == "downbranch":
            self.W = 0
        else:
            # contiguous block-diagonal components: weak connected
            # components of the internal-transition graph, with overlapping
            # level-id ranges merged so each component is a contiguous
            # [base, base+size) interval (unions of disconnected components
            # stay closed under transitions, so block-diagonality is
            # preserved; contiguity lets the kernel recover the global
            # state as base + local slot)
            from scipy.sparse import coo_matrix
            from scipy.sparse.csgraph import connected_components

            i_idx = np.nonzero(~emit_mask)[0]
            i_src = src[i_idx]
            i_dest = macro.destination_level_id[i_idx].astype(np.int64)
            g = coo_matrix(
                (np.ones(len(i_src)), (i_src, i_dest)), shape=(M, M)
            )
            n_comp, comp = connected_components(
                g, directed=True, connection="weak"
            )
            clo = np.full(n_comp, M, np.int64)
            chi = np.full(n_comp, -1, np.int64)
            np.minimum.at(clo, comp, np.arange(M))
            np.maximum.at(chi, comp, np.arange(M))
            ranges = []
            for c in np.argsort(clo):
                if ranges and clo[c] <= ranges[-1][1]:
                    ranges[-1][1] = max(ranges[-1][1], chi[c])
                else:
                    ranges.append([clo[c], chi[c]])
            r_lo = np.array([r[0] for r in ranges], np.int64)
            r_hi = np.array([r[1] for r in ranges], np.int64)
            sizes = r_hi - r_lo + 1
            self.W = int(sizes.max())

            base = np.zeros(M, np.int64)
            for a, b in ranges:
                base[a : b + 1] = a
            arrays.update(
                base=base.astype(np.float32),
                local=(np.arange(M) - base).astype(np.int32),
            )

            comp_of_level = (
                np.searchsorted(r_lo, np.arange(M), side="right") - 1
            )
            edge_comp = comp_of_level[i_src]
            pad_of = np.maximum(
                2
                ** np.ceil(np.log2(np.maximum(sizes, 1))).astype(np.int64),
                8,
            )
            for bi, Wp in enumerate(np.unique(pad_of)):
                comp_ids = np.nonzero(pad_of == Wp)[0]
                pos_of = np.full(len(ranges), -1, np.int64)
                pos_of[comp_ids] = np.arange(len(comp_ids))
                esel = np.nonzero(pos_of[edge_comp] >= 0)[0]
                seg = (
                    pos_of[edge_comp[esel]] * Wp
                    + (i_src[esel] - base[i_src[esel]])
                ) * Wp + (i_dest[esel] - base[i_dest[esel]])
                n_cb = len(comp_ids)
                levels = np.concatenate(
                    [np.arange(r_lo[c], r_hi[c] + 1) for c in comp_ids]
                )
                lvl_pos = np.concatenate(
                    [
                        np.full(int(sizes[c]), pos)
                        for pos, c in enumerate(comp_ids)
                    ]
                )
                member_flat = np.zeros(n_cb * Wp, np.int64)
                member_valid = np.zeros(n_cb * Wp, bool)
                for pos, c in enumerate(comp_ids):
                    sz = int(sizes[c])
                    member_flat[pos * Wp : pos * Wp + sz] = np.arange(
                        r_lo[c], r_hi[c] + 1
                    )
                    member_valid[pos * Wp : pos * Wp + sz] = True
                self.bucket_meta.append(dict(Wp=int(Wp), n_cb=n_cb))
                arrays[f"b{bi}_i_idx"] = np.asarray(i_idx[esel], np.int32)
                arrays[f"b{bi}_seg"] = np.asarray(seg, np.int32)
                arrays[f"b{bi}_member_flat"] = np.asarray(
                    member_flat, np.int32
                )
                arrays[f"b{bi}_member_valid"] = member_valid
                arrays[f"b{bi}_levels"] = np.asarray(levels, np.int32)
                arrays[f"b{bi}_lvl_pos"] = np.asarray(lvl_pos, np.int32)
                arrays[f"b{bi}_lvl_local"] = np.asarray(
                    levels - base[levels], np.int32
                )

        import jax

        # one batched transfer; no per-array convert programs
        self.arrays = jax.device_put(arrays)


def _chain_context(macro: MacroAtomData, mode: str,
                   line_nu_scaled=None) -> _ChainContext:
    key = "_chain_ctx_" + mode
    ctx = macro.__dict__.get(key)
    if ctx is None:
        ctx = _ChainContext(macro, mode, line_nu_scaled)
        import jax

        # ONE jitted program per context (static structure in closure,
        # all arrays as arguments): on the axon TPU stack each eagerly-
        # dispatched op costs up to ~1 s of tunnel round-trip, so the
        # whole per-iteration chain build traces into a single XLA
        # executable (compiled once, persistent-cached across processes)
        ctx.jit_fn = jax.jit(
            lambda arrays, beta, jb, stim: _device_chain_tables(
                ctx, arrays, _device_p_norm(ctx, arrays, beta, jb, stim)
            )
        )
        macro.__dict__[key] = ctx
    return ctx


def _device_p_norm(ctx, arrays, beta_d, jb_d, stim_d):
    """Block-normalized transition probabilities on device -> (T, S) f32."""
    import jax
    import jax.numpy as jnp

    li = arrays["line_idx"]
    p = arrays["coef"][:, None] * beta_d[li]
    p = jnp.where(
        arrays["up"][:, None], p * (stim_d[li] * jb_d[li]), p
    )
    bsum = jax.ops.segment_sum(p, arrays["block_of"], num_segments=ctx.M)
    denom = bsum[arrays["block_of"]]
    return jnp.where(denom > 0, p / denom, 0.0)


def _device_chain_tables(ctx, arrays, p_norm):
    """Device-resident sampling tables (chain_cdf, emit_cdf).

    One batched f32 LU solve per size bucket:  B = (I - Q)^{-1} diag(d)
    over (shell x component) blocks, then row-normalized inclusive CDFs.
    """
    import jax
    import jax.numpy as jnp

    S = p_norm.shape[1]
    M, We = ctx.M, ctx.We
    e_p = p_norm[arrays["emit_idx"]]  # (E0, S)

    # ---- emission CDF rows [cdf | line ids] ----
    dense = jax.ops.segment_sum(
        e_p, arrays["e_slot"], num_segments=M * We
    )  # (M*We, S)
    dense = dense.reshape(M, We, S).transpose(2, 0, 1)  # (S, M, We)
    cum = jnp.cumsum(dense, axis=2)
    tot = cum[:, :, -1:]
    ecdf = jnp.where(tot > 0, cum / tot, 1.0)
    emit_cdf = jnp.concatenate(
        [
            ecdf,
            jnp.broadcast_to(arrays["line_dense"][None], ecdf.shape),
            jnp.broadcast_to(arrays["nu_dense"][None], ecdf.shape),
        ],
        axis=2,
    ).reshape(S * M, 3 * We)

    if ctx.W == 0:  # downbranch: no absorbing chain
        return None, emit_cdf

    # ---- absorbing-probability rows B[s, level, :W] ----
    deact = jax.ops.segment_sum(
        e_p, arrays["e_src"], num_segments=M
    )  # (M, S)
    W = ctx.W
    rows = jnp.zeros((S, M, W), jnp.float32)
    for bi, meta in enumerate(ctx.bucket_meta):
        Wp, n_cb = meta["Wp"], meta["n_cb"]
        p_int = p_norm[arrays[f"b{bi}_i_idx"]]  # (Tb, S)
        Q = jax.ops.segment_sum(
            p_int, arrays[f"b{bi}_seg"], num_segments=n_cb * Wp * Wp
        )
        Q = (
            Q.reshape(n_cb, Wp, Wp, S)
            .transpose(3, 0, 1, 2)
            .reshape(S * n_cb, Wp, Wp)
        )
        eye = jnp.eye(Wp, dtype=jnp.float32)
        A = eye[None] - Q
        d = deact[arrays[f"b{bi}_member_flat"]]  # (n_cb*Wp, S)
        d = jnp.where(arrays[f"b{bi}_member_valid"][:, None], d, 0.0)
        d = d.reshape(n_cb, Wp, S).transpose(2, 0, 1).reshape(S * n_cb, Wp)
        B = jnp.linalg.solve(A, d[:, :, None] * eye[None])
        Bl = B.reshape(S, n_cb, Wp, Wp)[
            :, arrays[f"b{bi}_lvl_pos"], arrays[f"b{bi}_lvl_local"], :
        ]  # (S, n_lb, Wp)
        # pow2 padding can exceed the global row width W; the dropped
        # columns are zero-mass padding
        wc = min(Wp, W)
        rows = rows.at[:, arrays[f"b{bi}_levels"], :wc].set(Bl[:, :, :wc])

    rows = jnp.maximum(rows, 0.0)
    rcum = jnp.cumsum(rows, axis=2)
    rtot = rcum[:, :, -1:]
    # degenerate rows (no reachable deactivation): step CDF at the level's
    # own local slot -> self-deactivation, matching the walk fallback
    fallback = (
        jnp.arange(W, dtype=jnp.int32)[None, None, :]
        >= arrays["local"][None, :, None]
    ).astype(jnp.float32)
    ccdf = jnp.where(rtot > 0, rcum / rtot, fallback)
    chain_cdf = jnp.concatenate(
        [
            ccdf,
            jnp.broadcast_to(arrays["base"][None, :, None], (S, M, 1)),
        ],
        axis=2,
    ).reshape(S * M, W + 1)
    return chain_cdf, emit_cdf


def chain_tables_fit(
    macro: MacroAtomData,
    n_shells: int,
    mode: str = "macroatom",
    max_chain_bytes: float = 6e9,
    line_nu_scaled=None,
) -> bool:
    """Whether solve_macro_chain would build tables (vs the walk fallback).

    Depends only on the transition-table SPARSITY and the shell count, so
    callers can decide up front (e.g. whether the device line-plasma path
    is usable — the walk fallback needs the f64 host tables)."""
    ctx = _chain_context(macro, mode, line_nu_scaled)
    if mode == "downbranch":
        return True
    M, W, We = ctx.M, ctx.W, ctx.We
    S = n_shells
    solve_bytes = (
        max(
            S * b["n_cb"] * b["Wp"] * b["Wp"] * 4.0 * 3
            for b in ctx.bucket_meta
        )
        if ctx.bucket_meta
        else 0.0
    )
    table_bytes = S * M * (W + 1) * 4.0 + S * M * 3 * We * 4.0
    return table_bytes + solve_bytes <= max_chain_bytes


def solve_macro_chain(
    macro: MacroAtomData,
    beta_sobolev: np.ndarray,
    j_blues: np.ndarray,
    stim_factor: np.ndarray,
    mode: str = "macroatom",
    max_chain_bytes: float = 6e9,
    line_nu_scaled=None,
) -> MacroChainState | None:
    """Build device-resident absorbing-chain CDF tables; None if they would
    not fit within ``max_chain_bytes`` of device memory (caller falls back
    to the RNG-walk kernel path).  The whole numerical pipeline runs as one
    jitted XLA program on the accelerator — nothing is transferred back.
    """
    import jax.numpy as jnp

    if line_nu_scaled is None:
        raise ValueError(
            "solve_macro_chain requires line_nu_scaled (kernel-unit line "
            "frequencies) — emitted-line nus are packed into the emission "
            "rows"
        )
    ctx = _chain_context(macro, mode, line_nu_scaled)
    M, W, We = ctx.M, ctx.W, ctx.We
    S = beta_sobolev.shape[1]

    if mode != "downbranch":
        solve_bytes = (
            max(
                S * b["n_cb"] * b["Wp"] * b["Wp"] * 4.0 * 3
                for b in ctx.bucket_meta
            )
            if ctx.bucket_meta
            else 0.0
        )
        table_bytes = S * M * (W + 1) * 4.0 + S * M * 3 * We * 4.0
        if table_bytes + solve_bytes > max_chain_bytes:
            return None  # fall back to the in-kernel walk

    def as_f32_dev(x):
        # device-resident f32 inputs (line_mode='device') pass through;
        # a np.asarray here would round-trip them through the host
        if hasattr(x, "devices"):
            return x
        return jnp.asarray(np.asarray(x, np.float32))

    chain_cdf, emit_cdf = ctx.jit_fn(
        ctx.arrays,
        as_f32_dev(beta_sobolev),
        as_f32_dev(j_blues),
        as_f32_dev(stim_factor),
    )
    return MacroChainState(
        n_states=M,
        chain_width=W,
        emit_width=We,
        chain_cdf=chain_cdf,
        emit_cdf=emit_cdf,
        line2macro=macro.line2macro_level_upper.astype(np.int32),
        emit_block_start=ctx.emit_block_start,
        emit_line=ctx.emit_line,
    )
