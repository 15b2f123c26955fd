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
