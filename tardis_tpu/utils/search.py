"""Unrolled vectorized binary search.

``jnp.searchsorted`` lowers to ``lax.scan``, whose tracing is pathologically
slow in this environment (and scan adds loop overhead on TPU).  These helpers
unroll the ceil(log2(n))-step search into a short compare/select chain, which
traces instantly and runs as straight-line VPU code.
"""

from __future__ import annotations

import math

import jax.numpy as jnp


def searchsorted_unrolled(sorted_arr, values, side: str = "left"):
    """Equivalent of jnp.searchsorted(sorted_arr, values, side=side).

    sorted_arr: (n,) ascending (static shape).  values: any shape.
    Returns int32 insertion indices.
    """
    n = sorted_arr.shape[0]
    n_bits = max(1, math.ceil(math.log2(max(n, 2))) + 1)
    lo = jnp.zeros_like(values, dtype=jnp.int32)
    hi = jnp.full_like(lo, n)
    for _ in range(n_bits):
        active = lo < hi
        mid = (lo + hi) >> 1
        a = sorted_arr[jnp.clip(mid, 0, n - 1)]
        if side == "left":
            go_right = a < values
        else:
            go_right = a <= values
        lo = jnp.where(active & go_right, mid + 1, lo)
        hi = jnp.where(active & ~go_right, mid, hi)
    return lo
