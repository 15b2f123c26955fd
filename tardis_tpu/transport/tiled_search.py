"""Tiled 3-level (128-ary) searches for the transport kernel.

XLA:TPU executes long chains of dependent (B,)-wide gathers pathologically
slowly (~1 ms per probe on this stack), which makes a classic 18-probe
binary search ~16 ms per call.  A 128-ary search replaces the dependent
probe chain with three levels of **aligned row gathers** ((B,128) rows from
tiled tables) plus row-wide compare-and-count — measured ~14x faster and
exact.

Two searches are provided:

- value search (searchsorted) on a sorted 1-D table (the line-frequency
  list), used for the boundary-window and birth-line lookups;
- the **event-predicate search**: first line index i in [lo, hi) with
      g(i) = (C[shell, i+1] - C0) + chi * s(i) > tau_event
  where C is the per-shell two-float tau prefix sum and s(i) the distance
  to resonance.  g is monotone in i, and the predicate is evaluated on
  whole 128-wide rows per level.  Coarse levels use hi-only prefix values
  (absolute error ~ulp32(C_max)); the final level uses the full two-float
  difference.  Near-tie events can therefore shift by O(1) line in rare
  cases — statistically negligible (SURVEY.md §7 hard part (c)).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

F32 = jnp.float32
I32 = jnp.int32

TILE = 128


class TiledTable(NamedTuple):
    """Ascending 1-D table tiled for 3-level search (value search)."""

    tiles: jnp.ndarray  # (T0, 128) padded +inf
    sum1: jnp.ndarray  # (T1, 128) first element of each tile, padded +inf
    sum2: jnp.ndarray  # (T2,) first element of each sum1 row, T2 <= 128
    n: int  # true length


def build_tiled_table(ascending: np.ndarray) -> TiledTable:
    n = len(ascending)
    t0 = -(-n // TILE)
    pad0 = np.full(t0 * TILE, np.inf, np.float32)
    pad0[:n] = ascending
    tiles = pad0.reshape(t0, TILE)
    s1 = tiles[:, 0]
    t1 = -(-t0 // TILE)
    pad1 = np.full(t1 * TILE, np.inf, np.float32)
    pad1[:t0] = s1
    sum1 = pad1.reshape(t1, TILE)
    sum2 = sum1[:, 0]
    assert t1 <= TILE, "table too large for 3-level search"
    return TiledTable(
        tiles=jnp.asarray(tiles),
        sum1=jnp.asarray(sum1),
        sum2=jnp.asarray(sum2),
        n=n,
    )


def tiled_searchsorted(tt: TiledTable, v, side: str = "left"):
    """searchsorted(table, v, side) for batched v; returns int32 in [0, n]."""

    def cnt(rows, vv):
        if side == "left":
            c = rows < vv[:, None]
        else:
            c = rows <= vv[:, None]
        return jnp.sum(c, axis=1).astype(I32)

    # level 2: (B, T2) broadcast compare
    if side == "left":
        c2 = jnp.sum(tt.sum2[None, :] < v[:, None], axis=1).astype(I32)
    else:
        c2 = jnp.sum(tt.sum2[None, :] <= v[:, None], axis=1).astype(I32)
    u = jnp.clip(c2 - 1, 0, tt.sum1.shape[0] - 1)
    # level 1
    row1 = tt.sum1[u]  # (B, 128)
    c1 = cnt(row1, v)
    t = jnp.clip(u * TILE + c1 - 1, 0, tt.tiles.shape[0] - 1)
    # level 0
    row0 = tt.tiles[t]  # (B, 128)
    c0 = cnt(row0, v)
    return jnp.minimum(t * TILE + c0, tt.n)


class PredicateTables(NamedTuple):
    """Per-shell tiled tables for the event-predicate search.

    Index convention: entry k of tile t holds values for line index
    i = t*128 + k; prefix values are C[shell, i+1] (the inclusive sum
    through line i).
    """

    c_hi: jnp.ndarray  # (S*T0, 128) f32, padded +inf
    c_lo: jnp.ndarray  # (S*T0, 128) f32, padded 0
    nu: jnp.ndarray  # (T0, 128) line nu, padded -inf
    c1_hi: jnp.ndarray  # (S*T1, 128) level-1 summaries (positions i=t*128)
    nu1: jnp.ndarray  # (T1, 128)
    c2_hi: jnp.ndarray  # (S, 128) level-2 summaries (positions i=u*128^2)
    nu2: jnp.ndarray  # (128,)
    t0: int
    t1: int


def build_predicate_tables(
    cum_f64: np.ndarray,  # (S, L+1) f64 inclusive prefix with leading 0
    line_nu: np.ndarray,  # (L,) descending, kernel units
) -> PredicateTables:
    S, Lp1 = cum_f64.shape
    L = Lp1 - 1
    t0 = -(-L // TILE)
    t1 = -(-t0 // TILE)
    assert t1 <= TILE

    # level-0 tiles: C[s, i+1] for i = t*128+k
    c_pad = np.full((S, t0 * TILE), np.inf, np.float64)
    c_pad[:, :L] = cum_f64[:, 1:]
    hi = c_pad.astype(np.float32)
    with np.errstate(invalid="ignore"):  # inf - inf in the padding tail
        lo = np.where(
            np.isfinite(c_pad), (c_pad - hi.astype(np.float64)), 0.0
        ).astype(np.float32)
    nu_pad = np.full(t0 * TILE, -np.inf, np.float32)
    nu_pad[:L] = line_nu

    # level-1: positions i = (u*128 + k) * 128
    pos1 = (np.arange(t1 * TILE) * TILE).clip(0, t0 * TILE - 1)
    c1 = c_pad[:, pos1].astype(np.float32)
    c1[:, np.arange(t1 * TILE) * TILE >= t0 * TILE] = np.inf
    nu1 = nu_pad[pos1]
    nu1[np.arange(t1 * TILE) * TILE >= t0 * TILE] = -np.inf

    # level-2: positions i = w * 128^2
    pos2 = (np.arange(TILE) * TILE * TILE).clip(0, t0 * TILE - 1)
    c2 = c_pad[:, pos2].astype(np.float32)
    c2[:, np.arange(TILE) * TILE * TILE >= t0 * TILE] = np.inf
    nu2 = nu_pad[pos2]
    nu2[np.arange(TILE) * TILE * TILE >= t0 * TILE] = -np.inf

    return PredicateTables(
        c_hi=jnp.asarray(hi.reshape(S * t0, TILE)),
        c_lo=jnp.asarray(lo.reshape(S * t0, TILE)),
        nu=jnp.asarray(nu_pad.reshape(t0, TILE)),
        c1_hi=jnp.asarray(c1.reshape(S * t1, TILE)),
        nu1=jnp.asarray(nu1.reshape(t1, TILE)),
        c2_hi=jnp.asarray(c2),
        nu2=jnp.asarray(nu2),
        t0=t0,
        t1=t1,
    )


def predicate_search(
    pt: PredicateTables,
    shell,  # (B,) i32
    lo_dom,  # (B,) i32 inclusive domain start (next_line)
    n_lines,  # python int: true line count (final clamp upper bound)
    c0_hi,  # (B,) f32 C[shell, lo_dom] (exclusive prefix at domain start)
    c0_lo,
    chi,  # (B,)
    z,  # (B,) mu*r
    nu_lab,  # (B,)
    tau_event,  # (B,)
    nu_thresh,  # (B,) comoving frequency at the shell boundary
    full_relativity: bool = False,
    p2=None,  # (B,) impact parameter^2 (full relativity only)
):
    """Fused event/boundary search.

    First line i in [lo_dom, n_lines] satisfying the monotone predicate
      P(i) = (i >= lo_dom) & (nu_i <= nu_thresh  |  g(i) > tau_event)
    where nu_i <= nu_thresh marks resonances past the shell boundary
    (lines are descending in nu) and
    g(i) = (C[shell, i] - C0) + chi * s(i) the combined optical depth to
    line i's resonance at distance s(i).  The caller classifies the
    result: nu_{i*} <= nu_thresh (or i* == n_lines) means no line event
    before the boundary (i* is then the old "i_bound"), else i* is the
    event line — one search replaces the previous separate boundary-window
    searchsorted + event search, and one shared C-gather replaces the two
    tau lookups.  Padding rows carry nu = -inf, which fires the boundary
    arm, keeping the predicate monotone (s(-inf) is NaN under full
    relativity).
    """

    def s_of_nu(nu_row):
        if full_relativity:
            a = nu_row * nu_row
            b = (nu_lab * nu_lab)[:, None]
            disc = jnp.maximum(a * (a - (a + b) * p2[:, None]), 0.0)
            y = (b - jnp.sqrt(disc)) / (a + b)
            return jnp.maximum(y - z[:, None], 0.0)
        zeta = 1.0 - nu_row / nu_lab[:, None]
        return jnp.maximum(zeta - z[:, None], 0.0)

    def count_false(c_row, nu_row, idx, exact_lo=None):
        # idx: sample positions, broadcastable to (B, 128)
        dC = c_row - c0_hi[:, None]
        if exact_lo is not None:
            dC = dC + (exact_lo - c0_lo[:, None])
        s = s_of_nu(nu_row)
        g = dC + chi[:, None] * s
        in_dom = idx >= lo_dom[:, None]
        fire = (nu_row <= nu_thresh[:, None]) | (g > tau_event[:, None])
        p = in_dom & fire
        return jnp.sum(jnp.logical_not(p), axis=1).astype(I32)

    T0, T1 = pt.t0, pt.t1

    # level 2: rows (B, 128) gathered by shell from (S, 128); samples at
    # positions w * 128^2.  The transition block is (count_false - 1); an
    # exactly-at-boundary transition falls out of the natural overflow of
    # the lower levels (all-false tile => index = next tile start).
    c2_row = pt.c2_hi[shell]
    idx2 = (jnp.arange(TILE, dtype=I32) * (TILE * TILE))[None, :]
    w = jnp.clip(
        count_false(c2_row, pt.nu2[None, :], idx2) - 1, 0, T1 - 1
    )

    # level 1: samples at positions (w*128 + k) * 128
    row1 = pt.c1_hi[shell * T1 + w]
    nu1_row = pt.nu1[w]
    idx1 = (w[:, None] * TILE + jnp.arange(TILE, dtype=I32)[None, :]) * TILE
    t = jnp.clip(
        w * TILE + count_false(row1, nu1_row, idx1) - 1,
        0,
        T0 - 1,
    )

    # level 0 (exact two-float)
    row0_hi = pt.c_hi[shell * T0 + t]
    row0_lo = pt.c_lo[shell * T0 + t]
    nu0_row = pt.nu[t]
    idx0 = t[:, None] * TILE + jnp.arange(TILE, dtype=I32)[None, :]
    c0f = count_false(row0_hi, nu0_row, idx0, exact_lo=row0_lo)
    i_event = t * TILE + c0f
    # rare coarse-level overshoot: if the whole tile is already past the
    # transition, fall back to the domain start clamp below
    i_event = jnp.clip(i_event, lo_dom, n_lines)
    return i_event


# ---------------------------------------------------------------------------
# Packed predicate search (round-3 fast path)
# ---------------------------------------------------------------------------
#
# The round-2 search cost ~8 serialized B-wide row gathers per step (5 for
# the 3 levels + 3 more afterwards for nu_ev / two-float dC at the event
# line).  Measured XLA:TPU gather cost is ~10 ns per gathered row REGARDLESS
# of row width (latency-bound), so the fast path:
#
# - packs (c_hi | c_lo | nu | aux) into ONE wide level-0 row -> 1 gather;
# - packs (c1_hi | nu1) into one level-1 row -> 1 gather;
# - uses a tile STRIDE of 127 with one-entry overlap so the event line is
#   guaranteed to fall INSIDE the fetched level-0 row, letting nu_ev, the
#   exact two-float C[i_event], and any aux per-line channel be extracted
#   with a one-hot reduction on the VPU instead of three more gathers.
#
# Coarse levels still compare hi-only f32 prefix values, so near-tie events
# can shift by O(1) line exactly as in the round-2 search (module docstring
# above; SURVEY.md §7 hard part (c)).

STRIDE = 127  # level tile stride (128-entry rows, one-entry overlap)


class PackedPredTables(NamedTuple):
    """Packed per-shell tables for predicate_search_packed.

    Registered as a pytree whose integer geometry (t0, t1, n_aux) is STATIC
    aux data, so jitted callers can use them in Python control flow."""

    lvl0: jnp.ndarray  # (S*T0, 128*(3+n_aux)) [c_hi | c_lo | nu | aux...]
    lvl1: jnp.ndarray  # (S*T1, 256) [c1_hi | nu1]
    lvl2: jnp.ndarray  # (S, 256) [c2_hi | nu2]
    t0: int
    t1: int
    n_aux: int


import jax as _jax

_jax.tree_util.register_pytree_node(
    PackedPredTables,
    lambda p: ((p.lvl0, p.lvl1, p.lvl2), (p.t0, p.t1, p.n_aux)),
    lambda aux, ch: PackedPredTables(*ch, *aux),
)


def build_packed_pred_tables_device(
    hi,  # (S, L+1) f32 two-float hi prefix (device or host array)
    lo,  # (S, L+1) f32 two-float lo parts
    line_nu: np.ndarray,  # (L,) descending, kernel units, f32
    aux: list | tuple = (),  # per-line f32-exact channels (e.g. line2macro)
) -> PackedPredTables:
    """Device-side packed-table construction (round 4), jit-compiled.

    Builds bit-identical tables to the host path below, but with XLA
    gathers/concats on the accelerator: the only host work is the one h2d
    transfer of the (hi, lo) prefix arrays that the caller already needs
    for ``tau_cum_hi/lo``.  At kurucz scale this replaces ~6 s of numpy
    window/concat traffic (this host moves memory at ~200 MB/s) with
    milliseconds of device time.  The whole build traces into ONE XLA
    program (jit cache keyed by shapes): eager per-op dispatch costs ~1 s
    of tunnel round-trip each on the axon TPU stack.
    """
    global _PACKED_JIT
    if _PACKED_JIT is None:
        import jax

        _PACKED_JIT = jax.jit(_packed_pred_tables_impl)
    return _PACKED_JIT(
        jnp.asarray(hi),
        jnp.asarray(lo),
        jnp.asarray(line_nu, F32),
        tuple(jnp.asarray(a, F32) for a in aux),
    )


_PACKED_JIT = None


def _packed_pred_tables_impl(hi, lo, line_nu, aux):
    S, Lp1 = hi.shape
    L = Lp1 - 1
    t0 = -(-max(L, 1) // STRIDE)
    t1 = -(-t0 // STRIDE)
    assert t1 <= TILE, "line list too large for 3-level packed search"

    hi = jnp.asarray(hi)
    lo = jnp.asarray(lo)
    n_pos = t0 * STRIDE + TILE
    pad = n_pos - L
    c_hi = jnp.concatenate(
        [hi[:, 1:], jnp.full((S, pad), jnp.inf, F32)], axis=1
    )
    c_lo = jnp.concatenate([lo[:, 1:], jnp.zeros((S, pad), F32)], axis=1)
    nu_pad = jnp.concatenate(
        [jnp.asarray(line_nu, F32), jnp.full(pad, -jnp.inf, F32)]
    )
    aux_pad = [
        jnp.concatenate(
            [jnp.asarray(a, F32), jnp.zeros(pad, F32)]
        )
        for a in aux
    ]

    # level-0 rows: row t covers entries t*127 .. t*127+127 (overlap 1)
    win = (
        (jnp.arange(t0, dtype=I32) * STRIDE)[:, None]
        + jnp.arange(TILE, dtype=I32)[None, :]
    )  # (T0, 128)
    chw = c_hi[:, win]  # (S, T0, 128)
    clw = c_lo[:, win]
    blocks = [chw, clw, jnp.broadcast_to(nu_pad[win], chw.shape)]
    for ap in aux_pad:
        blocks.append(jnp.broadcast_to(ap[win], chw.shape))
    lvl0 = jnp.concatenate(blocks, axis=2).reshape(S * t0, -1)

    # level-1 rows: entry (u, k) samples line position (u*127 + k)*127
    tsam = (
        jnp.arange(t1, dtype=I32)[:, None] * STRIDE
        + jnp.arange(TILE, dtype=I32)[None, :]
    )
    psam = jnp.minimum(tsam * STRIDE, n_pos - 1)
    valid1 = tsam * STRIDE < n_pos
    c1 = jnp.where(valid1[None], c_hi[:, psam], jnp.inf)  # (S, T1, 128)
    nu1 = jnp.where(valid1, nu_pad[psam], -jnp.inf)
    lvl1 = jnp.concatenate(
        [c1, jnp.broadcast_to(nu1, c1.shape)], axis=2
    ).reshape(S * t1, 2 * TILE)

    # level-2: entry w samples line position w*127*127
    p2s = jnp.minimum(
        jnp.arange(TILE, dtype=I32) * (STRIDE * STRIDE), n_pos - 1
    )
    valid2 = jnp.arange(TILE) * (STRIDE * STRIDE) < n_pos
    c2 = jnp.where(valid2[None], c_hi[:, p2s], jnp.inf)
    nu2 = jnp.where(valid2, nu_pad[p2s], -jnp.inf)
    lvl2 = jnp.concatenate([c2, jnp.broadcast_to(nu2, c2.shape)], axis=1)

    return PackedPredTables(
        lvl0=lvl0, lvl1=lvl1, lvl2=lvl2, t0=t0, t1=t1, n_aux=len(aux_pad)
    )


def build_packed_pred_tables(
    cum_f64: np.ndarray,  # (S, L+1) f64 inclusive prefix with leading 0
    line_nu: np.ndarray,  # (L,) descending, kernel units
    aux: list | tuple = (),  # per-line f32-exact channels (e.g. line2macro)
) -> PackedPredTables:
    S, Lp1 = cum_f64.shape
    L = Lp1 - 1
    t0 = -(-max(L, 1) // STRIDE)
    t1 = -(-t0 // STRIDE)
    assert t1 <= TILE, "line list too large for 3-level packed search"

    # entry for line i holds (C[i+1], nu_i, aux_i); padding i >= L holds
    # (+inf, -inf, 0) -- the -inf frequency fires the boundary arm of the
    # predicate, keeping it monotone
    n_pos = t0 * STRIDE + TILE  # last row reaches t0*127 .. +128
    c_pad = np.full((S, n_pos), np.inf, np.float64)
    c_pad[:, :L] = cum_f64[:, 1:]
    nu_pad = np.full(n_pos, -np.inf, np.float32)
    nu_pad[:L] = line_nu
    aux_pad = []
    for a in aux:
        ap = np.zeros(n_pos, np.float32)
        ap[:L] = np.asarray(a, np.float32)
        aux_pad.append(ap)

    # level-0 rows: row t covers entries t*127 .. t*127+127 (overlap 1)
    starts = np.arange(t0) * STRIDE
    win = starts[:, None] + np.arange(TILE)[None, :]  # (T0, 128)
    c_hi = c_pad[:, win].astype(np.float32)  # (S, T0, 128)
    with np.errstate(invalid="ignore"):
        c_lo = np.where(
            np.isfinite(c_pad[:, win]),
            c_pad[:, win] - c_hi.astype(np.float64),
            0.0,
        ).astype(np.float32)
    blocks = [c_hi, c_lo, np.broadcast_to(nu_pad[win], c_hi.shape)]
    for ap in aux_pad:
        blocks.append(np.broadcast_to(ap[win], c_hi.shape))
    lvl0 = np.concatenate(blocks, axis=2).reshape(S * t0, -1)

    # level-1 rows: row u entry k samples line position (u*127 + k)*127
    tidx = (np.arange(t1 * TILE).reshape(t1, TILE) // TILE * STRIDE
            + np.arange(TILE)[None, :])
    # tile index sampled by entry (u, k) is u*127 + k
    tsam = (np.arange(t1)[:, None] * STRIDE + np.arange(TILE)[None, :])
    psam = np.minimum(tsam * STRIDE, n_pos - 1)  # line positions
    valid1 = tsam * STRIDE < n_pos
    c1 = c_pad[:, psam].astype(np.float32)  # (S, T1, 128)
    c1[:, ~valid1] = np.inf
    nu1 = nu_pad[psam]
    nu1[~valid1] = -np.inf
    lvl1 = np.concatenate(
        [c1, np.broadcast_to(nu1, c1.shape)], axis=2
    ).reshape(S * t1, 2 * TILE)

    # level-2: entry w samples line position w*127*127
    p2s = np.minimum(np.arange(TILE) * STRIDE * STRIDE, n_pos - 1)
    valid2 = np.arange(TILE) * STRIDE * STRIDE < n_pos
    c2 = c_pad[:, p2s].astype(np.float32)
    c2[:, ~valid2] = np.inf
    nu2 = nu_pad[p2s].copy()
    nu2[~valid2] = -np.inf
    lvl2 = np.concatenate(
        [c2, np.broadcast_to(nu2, c2.shape)], axis=1
    )

    return PackedPredTables(
        lvl0=jnp.asarray(lvl0),
        lvl1=jnp.asarray(lvl1),
        lvl2=jnp.asarray(lvl2),
        t0=t0,
        t1=t1,
        n_aux=len(aux_pad),
    )


def predicate_search_packed(
    pt: PackedPredTables,
    shell,  # (B,) i32
    lo_dom,  # (B,) i32 inclusive domain start (next_line)
    n_lines,  # python int
    c0_hi,  # (B,) f32 C[shell, lo_dom]
    c0_lo,
    chi,  # (B,)
    z,  # (B,) mu*r
    nu_lab,  # (B,)
    tau_event,  # (B,)
    nu_thresh,  # (B,)
    full_relativity: bool = False,
    p2=None,
):
    """Fused event/boundary search with in-row value extraction.

    Same predicate as predicate_search (first line i >= lo_dom with
    nu_i <= nu_thresh or g(i) > tau_event), but returns
    (i_event, nu_ev, cev_hi, cev_lo, aux_ev) in TWO row gathers total:
    nu_ev / aux are the per-line values AT i_event and (cev_hi, cev_lo)
    the exact two-float C[shell, i_event] (the exclusive prefix used by
    the caller's tau_at), all extracted from the level-0 row.
    """
    ar = jnp.arange(TILE, dtype=I32)

    def s_of_nu(nu_row):
        if full_relativity:
            a = nu_row * nu_row
            b = (nu_lab * nu_lab)[:, None]
            disc = jnp.maximum(a * (a - (a + b) * p2[:, None]), 0.0)
            y = (b - jnp.sqrt(disc)) / (a + b)
            return jnp.maximum(y - z[:, None], 0.0)
        zeta = 1.0 - nu_row / nu_lab[:, None]
        return jnp.maximum(zeta - z[:, None], 0.0)

    def count_false(c_row, nu_row, idx, exact_lo=None):
        dC = c_row - c0_hi[:, None]
        if exact_lo is not None:
            dC = dC + (exact_lo - c0_lo[:, None])
        g = dC + chi[:, None] * s_of_nu(nu_row)
        in_dom = idx >= lo_dom[:, None]
        fire = (nu_row <= nu_thresh[:, None]) | (g > tau_event[:, None])
        p = in_dom & fire
        return jnp.sum(jnp.logical_not(p), axis=1).astype(I32)

    T0, T1 = pt.t0, pt.t1

    # level 2 (one small (B,256) gather by shell)
    row2 = pt.lvl2[shell]
    idx2 = (ar * (STRIDE * STRIDE))[None, :]
    w = jnp.clip(
        count_false(row2[:, :TILE], row2[:, TILE:], idx2) - 1, 0, T1 - 1
    )

    # level 1
    row1 = pt.lvl1[shell * T1 + w]
    idx1 = (w[:, None] * STRIDE + ar[None, :]) * STRIDE
    t = jnp.clip(
        w * STRIDE + count_false(row1[:, :TILE], row1[:, TILE:], idx1) - 1,
        0,
        T0 - 1,
    )

    # level 0 (exact two-float) - ONE wide gather
    row0 = pt.lvl0[shell * T0 + t]
    chh = row0[:, :TILE]
    cll = row0[:, TILE : 2 * TILE]
    nuu = row0[:, 2 * TILE : 3 * TILE]
    idx0 = t[:, None] * STRIDE + ar[None, :]
    c0f = count_false(chh, nuu, idx0, exact_lo=cll)

    # extraction: value channels AT entry c0f (clamped to the row);
    # the exclusive prefix C[i_event] sits at entry c0f-1 (which holds
    # C[(i_event-1)+1]); at c0f == 0 the event is at the domain start so
    # C[i_event] == C[lo_dom] == c0 (or a coarse-level near-tie, where the
    # O(1)-line drift is accepted as documented)
    c0f_v = jnp.clip(c0f, 0, TILE - 1)
    sel_v = (ar[None, :] == c0f_v[:, None])
    sel_c = (ar[None, :] == jnp.maximum(c0f_v - 1, 0)[:, None])
    # where-selects, not mask multiplies: padding entries hold +/-inf and
    # inf * 0 would poison the reduction with NaN
    nu_ev = jnp.sum(jnp.where(sel_v, nuu, 0.0), axis=1)
    nu_ev = jnp.where(
        jnp.sum(jnp.where(sel_v, jnp.isfinite(nuu), False), axis=1),
        nu_ev,
        -jnp.inf,
    )
    at_start = c0f <= 0
    cev_hi = jnp.where(
        at_start, c0_hi, jnp.sum(jnp.where(sel_c, chh, 0.0), axis=1)
    )
    cev_lo = jnp.where(
        at_start, c0_lo, jnp.sum(jnp.where(sel_c, cll, 0.0), axis=1)
    )
    cev_inf = jnp.sum(jnp.where(sel_c, ~jnp.isfinite(chh), False), axis=1)
    cev_hi = jnp.where(~at_start & (cev_inf > 0), jnp.inf, cev_hi)
    aux_ev = []
    for a in range(pt.n_aux):
        blk = row0[:, (3 + a) * TILE : (4 + a) * TILE]
        aux_ev.append(jnp.sum(jnp.where(sel_v, blk, 0.0), axis=1))

    i_event = jnp.clip(t * STRIDE + c0f_v, lo_dom, n_lines)
    return i_event, nu_ev, cev_hi, cev_lo, aux_ev
