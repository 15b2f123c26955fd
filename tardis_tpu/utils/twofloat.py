"""Double-single ("two-float") arithmetic helpers.

The transport kernel runs in float32 on TPU (float64 is emulated and slow).
A handful of quantities need more than single precision — most importantly the
per-shell prefix sums of Sobolev optical depths, whose magnitudes can reach
1e5+ while event physics depends on *differences* of order 1e-6..1e2.

We store such quantities as an unevaluated pair (hi, lo) with ``hi + lo``
equal to the f64 value and ``|lo| <= ulp(hi)/2``, and compute differences with
error-compensated float32 arithmetic (Knuth two-sum / Dekker).  This gives
~48 bits of effective precision for the difference at ordinary VPU cost.

This replaces the float64 accumulation the reference gets for free from numba
(/root/reference/tardis/transport/montecarlo/modes/homologous_rad_packet_transport.py:102-161).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def split_f64_to_f32_pair(x: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Split a float64 array into (hi, lo) float32 arrays, hi+lo == x (f64)."""
    hi = x.astype(np.float32)
    lo = (x - hi.astype(np.float64)).astype(np.float32)
    return hi, lo


def two_sum(a, b):
    """Error-free transformation: a+b = s + e exactly (Knuth).

    e = (a - (s - b')) + (b - b') with b' = s - a.  (A previous version had
    the two error terms' operands crossed, which collapses to e = 0 whenever
    |b| << |a| — caught by tests/test_estimator_precision.py.)
    """
    s = a + b
    bb = s - a
    e = (a - (s - bb)) + (b - bb)
    return s, e


def df32_accumulate(hi, lo, x):
    """(hi, lo) += x with Knuth error compensation; returns new (hi, lo).

    Used for the transport estimator accumulators: the running f32 sums
    would otherwise swamp small per-step increments over ~1e8-packet runs
    (reference accumulates in f64,
    estimators/estimators_bulk.py:15).  hi + lo tracks the f64 sum to
    ~48 effective bits at plain VPU cost.
    """
    s, e = two_sum(hi, x)
    # renormalize so |lo| stays <= ulp(hi)/2 — without this the lo part
    # itself swamps over ~1e6 increments
    return two_sum(s, lo + e)


def df32_diff(hi_a, lo_a, hi_b, lo_b):
    """Compute (a - b) to ~f64 accuracy and round to f32.

    a = hi_a + lo_a, b = hi_b + lo_b.  Returns a float32 approximation of
    a - b whose error is O(ulp32(result)) rather than O(ulp32(max(|a|,|b|))).
    """
    s, e = two_sum(hi_a, -hi_b)
    return s + (e + (lo_a - lo_b))


def df32_add_scalar(hi, lo, scalar):
    """(hi+lo) + scalar as a new (hi, lo) pair (scalar f32)."""
    s, e = two_sum(hi, scalar)
    lo2 = lo + e
    hi2, e2 = two_sum(s, lo2)
    return hi2, e2


def df32_value(hi, lo):
    """Collapse the pair to a plain f32 (for non-critical uses)."""
    return hi + lo


def prefix_sum_pairs(x_f64: np.ndarray, axis: int = -1):
    """Exclusive-then-inclusive f64 prefix sum returned as an f32 pair.

    Returns (hi, lo) for the *inclusive* cumulative sum along ``axis``.
    Host-side (numpy, f64): done once per iteration, not performance critical.
    """
    c = np.cumsum(x_f64.astype(np.float64), axis=axis)
    return split_f64_to_f32_pair(c)


def searchsorted_df32(hi: jnp.ndarray, lo: jnp.ndarray, v_hi, v_lo, side="right"):
    """Binary search in a sorted two-float array for a two-float value.

    All comparisons use compensated differences.  Not currently used by the
    transport kernel (which searches a combined monotonic predicate instead)
    but exposed for tests.
    """
    n = hi.shape[0]
    n_steps = int(np.ceil(np.log2(max(n, 2)))) + 1

    def cmp(idx):
        d = df32_diff(hi[idx], lo[idx], v_hi, v_lo)
        if side == "right":
            return d <= 0
        return d < 0

    lo_i = jnp.zeros((), jnp.int32)
    hi_i = jnp.asarray(n, jnp.int32)
    for _ in range(n_steps):
        mid = (lo_i + hi_i) // 2
        go_right = cmp(jnp.clip(mid, 0, n - 1))
        lo_i = jnp.where(go_right, mid + 1, lo_i)
        hi_i = jnp.where(go_right, hi_i, mid)
    return lo_i
