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
# draw: [prob, alias] resp. [prob, line_k, line_alias]) halves the chain's
# gather count vs the two-level CDF search while sampling the identical
# distribution (exact up to the same f32 rounding as the CDF tables).
#
# Q is block-diagonal over (atom, ion) groups (classic macro-atom has no
# ionization channels), so the solve decomposes into small per-component
# systems — done in f64 on the host.


def build_alias_rows(p: np.ndarray):
    """Walker alias tables for a batch of distributions.

    p: (R, M) rows of probabilities (each row sums to ~1; rows are
    renormalized defensively).  Returns (prob (R, M) f32, alias (R, M) i32):
    sampling is  k = floor(u*M); j = k if frac(u*M) < prob[k] else alias[k].

    One-pass construction: smalls (q < 1) consume surplus from larges in
    index order; the assignment follows the cumulative-surplus boundaries
    (vectorized searchsorted), which yields a valid exact table because
    total deficit equals total surplus.
    """
    p = np.asarray(p, np.float64)
    R, M = p.shape
    # native per-row Vose (OpenMP; tardis_tpu/native host_pipeline.cpp
    # alias_rows) — ~100x the lockstep-numpy construction below, which is
    # kept as the transparent fallback
    from tardis_tpu import native

    nat = native.alias_rows(p)
    if nat is not None:
        return nat
    tot = p.sum(axis=1, keepdims=True)
    with np.errstate(divide="ignore", invalid="ignore"):
        p = np.where(tot > 0, p / tot, 1.0 / M)
    q = p * M  # working copy, mutated below
    prob = np.ones((R, M), np.float64)
    alias = np.broadcast_to(np.arange(M, dtype=np.int32), (R, M)).copy()

    # Vose's algorithm run in LOCKSTEP across all rows: every iteration
    # pairs each active row's next small with its next large; larges whose
    # surplus drops below 1 are re-queued as smalls (that re-classification
    # is what makes the table exact).  Buffers are rings of capacity 2M
    # (each entry is enqueued as small at most once plus once as a demoted
    # large).  Leftover entries keep prob 1 / alias self.
    cap = 2 * M
    small_buf = np.zeros((R, cap), np.int64)
    large_buf = np.zeros((R, M), np.int64)
    sc = np.zeros(R, np.int64)  # small count (enqueued)
    lc = np.zeros(R, np.int64)
    is_small = q < 1.0
    sc[:] = is_small.sum(axis=1)
    lc[:] = M - sc
    # fill initial queues (stable index order)
    idx = np.broadcast_to(np.arange(M), (R, M))
    order = np.argsort(~is_small, axis=1, kind="stable")  # smalls first
    sorted_idx = np.take_along_axis(idx, order, axis=1)
    for r in range(R):  # cheap: pure slicing
        small_buf[r, : sc[r]] = sorted_idx[r, : sc[r]]
        large_buf[r, : lc[r]] = sorted_idx[r, sc[r] :]
    sp = np.zeros(R, np.int64)
    lp = np.zeros(R, np.int64)
    rows = np.arange(R)
    while True:
        active = (sp < sc) & (lp < lc)
        if not active.any():
            break
        ra = rows[active]
        s = small_buf[ra, sp[active]]
        lg = large_buf[ra, lp[active]]
        qs = q[ra, s]
        prob[ra, s] = qs
        alias[ra, s] = lg
        q[ra, lg] -= 1.0 - qs
        sp[active] += 1
        demoted = q[ra, lg] < 1.0
        rd = ra[demoted]
        if len(rd):
            small_buf[rd, sc[rd]] = lg[demoted]
            sc[rd] += 1
            lp[rd] += 1
    return prob.astype(np.float32), alias


@dataclass
class MacroChainState:
    """Kernel-ready absorbing-chain macro-atom tables (alias form)."""

    n_states: int  # M
    emit_total: int  # E (emission entries incl. per-level dummies)
    # absorbing-state alias table (None for downbranch)
    chain_alias: np.ndarray | None  # (S*M*M, 2) f32 [prob, alias_state]
    # emission alias rows: (S*E, 3) f32 [prob, line_k, line_alias]
    emit_alias: np.ndarray
    emit_info: np.ndarray  # (M, 2) f32 [block start e0, block length n]
    emit_block_start: np.ndarray  # (M+1,) i32 (host-side consumers/tests)
    emit_line: np.ndarray  # (E,) i32
    line2macro: np.ndarray = None  # (L,) i32 activation map


def _emission_tables(e_src, e_line, e_p, M, S):
    """Per-(shell, level) emission alias tables.

    e_src sorted ascending; e_p (E, S) unnormalized within-block emission
    probabilities.  Returns dict of arrays for MacroChainState.
    """
    e_start = np.searchsorted(e_src, np.arange(M + 1)).astype(np.int64)
    elen = np.diff(e_start)

    # guarantee a nonempty block per level: dummy self-entry (never hit when
    # real emissions exist since those rows keep total mass)
    if (elen == 0).any():
        missing = np.nonzero(elen == 0)[0]
        e_src = np.concatenate([e_src, missing])
        e_line = np.concatenate([e_line, np.zeros(len(missing), np.int64)])
        e_p = np.concatenate([e_p, np.ones((len(missing), S))])
        order = np.argsort(e_src, kind="stable")
        e_src, e_line, e_p = e_src[order], e_line[order], e_p[order]
        e_start = np.searchsorted(e_src, np.arange(M + 1)).astype(np.int64)
        elen = np.diff(e_start)

    E = len(e_src)
    emit_alias = np.zeros((S, E, 3), np.float32)
    # batch the alias builds over levels with EQUAL block length (one
    # vectorized build per distinct length instead of one per level)
    for n in np.unique(elen):
        lvls = np.nonzero(elen == n)[0]
        starts = e_start[lvls]  # (G,)
        cols = starts[:, None] + np.arange(n)[None, :]  # (G, n)
        block_p = e_p[cols]  # (G, n, S)
        flat_p = np.moveaxis(block_p, 2, 1).reshape(-1, n)  # (G*S, n)
        prob, alias = build_alias_rows(flat_p)
        prob = prob.reshape(len(lvls), S, n)
        alias = alias.reshape(len(lvls), S, n)
        lines_blk = e_line[cols].astype(np.float32)  # (G, n)
        alias_lines = np.take_along_axis(
            lines_blk[:, None, :].repeat(S, axis=1), alias, axis=2
        )
        for gi, j in enumerate(lvls):
            a, b = e_start[j], e_start[j + 1]
            emit_alias[:, a:b, 0] = prob[gi]
            emit_alias[:, a:b, 1] = lines_blk[gi][None, :]
            emit_alias[:, a:b, 2] = alias_lines[gi]

    emit_info = np.stack(
        [e_start[:-1].astype(np.float32), elen.astype(np.float32)], axis=1
    )
    return dict(
        emit_total=E,
        emit_alias=emit_alias.reshape(S * E, 3),
        emit_info=emit_info,
        emit_block_start=e_start.astype(np.int32),
        emit_line=e_line.astype(np.int32),
    )


def solve_macro_chain(
    macro: MacroAtomData,
    beta_sobolev: np.ndarray,
    j_blues: np.ndarray,
    stim_factor: np.ndarray,
    mode: str = "macroatom",
    max_chain_bytes: float = 6e9,
) -> MacroChainState | None:
    """Build absorbing-chain alias sampling tables; None if the chain would
    not fit within ``max_chain_bytes`` of device memory (caller falls back
    to the RNG-walk kernel path)."""
    p_norm = solve_transition_probabilities(
        macro, beta_sobolev, j_blues, stim_factor
    ).astype(np.float64)
    refs = macro.block_references.astype(np.int64)
    M = len(refs) - 1
    S = p_norm.shape[1]
    ttype = macro.transition_type
    src = np.repeat(np.arange(M), np.diff(refs))
    emit_mask = ttype < 0

    e_tabs = _emission_tables(
        src[emit_mask],
        macro.transition_line_id[emit_mask].astype(np.int64),
        p_norm[emit_mask],
        M,
        S,
    )

    l2m = macro.line2macro_level_upper.astype(np.int32)
    if mode == "downbranch":
        return MacroChainState(
            n_states=M,
            chain_alias=None,
            line2macro=l2m,
            **e_tabs,
        )

    chain_bytes = S * M * M * 2 * 4.0
    if chain_bytes > max_chain_bytes:
        return None  # fall back to the in-kernel walk

    # deactivation probability per (level, shell)
    excl = np.zeros((p_norm.shape[0] + 1, S))
    np.cumsum(np.where(emit_mask[:, None], p_norm, 0.0), axis=0, out=excl[1:])
    deact = excl[refs[1:]] - excl[refs[:-1]]  # (M, S)

    i_mask = ~emit_mask
    i_src = src[i_mask]
    i_dest = macro.destination_level_id[i_mask].astype(np.int64)
    p_int = p_norm[i_mask]  # (Ti, S)

    # connected components of the internal-transition graph -> small solves
    from scipy.sparse import coo_matrix
    from scipy.sparse.csgraph import connected_components

    g = coo_matrix(
        (np.ones(len(i_src)), (i_src, i_dest)), shape=(M, M)
    )
    n_comp, comp = connected_components(g, directed=True, connection="weak")
    members = [np.nonzero(comp == c)[0] for c in range(n_comp)]
    # local index within component
    local = np.zeros(M, np.int64)
    for m in members:
        local[m] = np.arange(len(m))
    edge_comp = comp[i_src]

    from tardis_tpu import native

    use_native = native.available()
    chain_alias = np.zeros((S, M, M, 2), np.float32)
    for s in range(S):
        B_s = np.zeros((M, M))
        for c, m in enumerate(members):
            mc = len(m)
            sel = edge_comp == c
            Q = np.zeros((mc, mc))
            np.add.at(Q, (local[i_src[sel]], local[i_dest[sel]]),
                      p_int[sel, s])
            d = np.clip(deact[m, s], 0.0, None)
            A = np.eye(mc) - Q
            try:
                Bc = np.linalg.solve(A, np.diag(d))
            except np.linalg.LinAlgError:
                Bc = np.diag(d)
            B_s[np.ix_(m, m)] = Bc if use_native else np.clip(Bc, 0.0, None)
        if use_native:
            # clip + row normalization + alias build + interleaved f32
            # write, all fused in one native pass (degenerate rows
            # self-deactivate, matching the numpy fallback)
            native.alias_rows_interleaved(B_s, chain_alias[s])
            continue
        row_tot = B_s.sum(axis=1, keepdims=True)
        with np.errstate(divide="ignore", invalid="ignore"):
            B_s = np.where(row_tot > 0, B_s / row_tot, 0.0)
        # degenerate rows (no mass anywhere): deactivate in place
        dead = (row_tot[:, 0] <= 0)
        if dead.any():
            B_s[dead, dead] = 1.0
        prob, alias = build_alias_rows(B_s)
        chain_alias[s, :, :, 0] = prob
        chain_alias[s, :, :, 1] = alias.astype(np.float32)

    return MacroChainState(
        n_states=M,
        chain_alias=chain_alias.reshape(S * M * M, 2),
        line2macro=l2m,
        **e_tabs,
    )
