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
# dependent gathers per interaction — measured as ~90% of the whole transport
# step on TPU.  The absorbing-Markov-chain formulation (the reference uses it
# for IIP continuum, transport/montecarlo/macro_atom.py:108-184 +
# absorbing_markov_chain.py) replaces the walk EXACTLY: the distribution of
# the deactivating level j given activation at level l is
#     B = (I - Q)^{-1} diag(d),
# with Q the internal-transition probabilities and d the per-level
# deactivation probability; the emitted line given deactivation at j is the
# emission-transition distribution of block j renormalized among emissions.
# Both draws are realized in-kernel as 128-ary *row* searches over
# tile-aligned cumulative tables ((B,128) row gathers are nearly free on
# TPU, unlike dependent scalar probes), so one macro interaction costs ~4
# row gathers with a fixed trip count.
#
# Q is block-diagonal over (atom, ion) groups (classic macro-atom has no
# ionization channels), so the solve decomposes into small per-component
# systems — done in f64 on the host.


@dataclass
class MacroChainState:
    """Kernel-ready absorbing-chain macro-atom tables (tile-aligned)."""

    n_states: int  # M
    chain_tile_w: int  # W = ceil(M/128); 0 => identity chain (downbranch)
    emit_tiles_total: int  # Et
    # chain row-search tables (None for downbranch)
    chain_summary: np.ndarray | None  # (S*M, 128) f32
    chain_tiles: np.ndarray | None  # (S*M*W, 128) f32
    # emission-block row-search tables
    emit_summary: np.ndarray  # (S*M, 128) f32
    emit_tiles: np.ndarray  # (S*Et, 128) f32
    emit_tile_start: np.ndarray  # (M+1,) i32
    emit_block_start: np.ndarray  # (M+1,) i32
    emit_line: np.ndarray  # (E,) i32
    line2macro: np.ndarray = None  # (L,) i32 activation map


def _emission_tables(e_src, e_line, e_p, M, S):
    """Tile-aligned per-level emission CDF tables.

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
    excl = np.zeros((E + 1, S))
    np.cumsum(e_p, axis=0, out=excl[1:])
    tot = excl[e_start[1:]] - excl[e_start[:-1]]  # (M, S)
    blk = np.repeat(np.arange(M), elen)
    with np.errstate(divide="ignore", invalid="ignore"):
        cum = (excl[1:] - excl[e_start[:-1]][blk]) / tot[blk]
    cum = np.where(np.isfinite(cum), np.clip(cum, 0.0, 1.0), 1.0)
    cum[e_start[1:] - 1] = 1.0  # close each block exactly

    ntiles = np.maximum((elen + TILE - 1) // TILE, 1)
    assert ntiles.max() <= TILE, "emission block too large for 2-level search"
    tile_start = np.zeros(M + 1, np.int64)
    np.cumsum(ntiles, out=tile_start[1:])
    Et = int(tile_start[-1])

    # slot -> (tile row, lane)
    off = np.arange(E) - e_start[blk]
    slot_tile = tile_start[blk] + off // TILE
    slot_lane = off % TILE

    emit_tiles = np.full((S, Et, TILE), 2.0, np.float32)
    emit_tiles[:, slot_tile, slot_lane] = cum.T.astype(np.float32)

    # summary: value at the END of each tile of each level
    t_level = np.repeat(np.arange(M), ntiles)
    t_in = np.arange(int(ntiles.sum())) - tile_start[t_level]
    end_slot = e_start[t_level] + np.minimum(
        (t_in + 1) * TILE, elen[t_level]
    ) - 1
    emit_summary = np.full((S, M, TILE), 2.0, np.float32)
    emit_summary[:, t_level, t_in] = cum[end_slot].T.astype(np.float32)

    return dict(
        emit_tiles_total=Et,
        emit_summary=emit_summary.reshape(S * M, TILE),
        emit_tiles=emit_tiles.reshape(S * Et, TILE),
        emit_tile_start=tile_start.astype(np.int32),
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
    """Build absorbing-chain sampling tables; None if the chain would not fit
    within ``max_chain_bytes`` of device memory (caller falls back to the
    RNG-walk kernel path)."""
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
            chain_tile_w=0,
            chain_summary=None,
            chain_tiles=None,
            line2macro=l2m,
            **e_tabs,
        )

    W = -(-M // TILE)
    if W > TILE:
        return None  # M > 16384: 2-level search insufficient
    chain_bytes = S * M * (W + 1) * TILE * 4.0
    if chain_bytes > max_chain_bytes:
        return None

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

    chain_summary = np.full((S, M, TILE), 2.0, np.float32)
    chain_tiles = np.full((S, M * W, TILE), 2.0, np.float32)
    lane = np.arange(M)
    row_tile = lane // TILE
    row_lane = lane % TILE
    sum_pos = np.minimum((np.arange(W) + 1) * TILE, M) - 1

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
            B_s[np.ix_(m, m)] = np.clip(Bc, 0.0, None)
        row_tot = B_s.sum(axis=1, keepdims=True)
        with np.errstate(divide="ignore", invalid="ignore"):
            B_s = np.where(row_tot > 0, B_s / row_tot, 0.0)
        # degenerate rows (no mass anywhere): deactivate in place
        dead = (row_tot[:, 0] <= 0)
        if dead.any():
            B_s[dead, dead] = 1.0
        cum = np.cumsum(B_s, axis=1)
        cum = np.clip(cum, 0.0, 1.0)
        cum[:, -1] = 1.0
        ct = chain_tiles[s].reshape(M, W, TILE)
        ct[:, row_tile, row_lane] = cum.astype(np.float32)
        chain_summary[s, :, :W] = cum[:, sum_pos].astype(np.float32)

    return MacroChainState(
        n_states=M,
        chain_tile_w=W,
        chain_summary=chain_summary.reshape(S * M, TILE),
        chain_tiles=chain_tiles.reshape(S * M * W, TILE),
        line2macro=l2m,
        **e_tabs,
    )
