"""Is TPU scatter-add cost per-update or per-call?  Decides whether deferring
the line_diff scatter into a K-step log buffer pays off."""

from __future__ import annotations

import json
import time

import numpy as np


def timeit(fn, *args, n=4):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(n):
        t0 = time.time()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append(time.time() - t0)
    return min(ts)


def main():
    import jax
    import jax.numpy as jnp

    key = jax.random.key(np.uint32(7))
    LP1S = 183061 * 20
    target = jnp.zeros((LP1S, 2), jnp.float32)

    f = jax.jit(lambda t, i, v: t.at[i].add(v))
    for nup in (65536, 262144, 1048576, 4194304):
        sidx = jax.random.randint(jax.random.fold_in(key, nup), (nup,), 0,
                                  LP1S)
        svals = jax.random.uniform(key, (nup, 2))
        ms = timeit(f, target, sidx, svals) * 1e3
        print(json.dumps({"scatter_updates": nup, "ms": ms,
                          "ns_per_update": ms * 1e6 / nup}), flush=True)

    # sorted-index variant at 1M
    nup = 1048576
    sidx = jnp.sort(
        jax.random.randint(jax.random.fold_in(key, 1), (nup,), 0, LP1S)
    )
    svals = jax.random.uniform(key, (nup, 2))
    ms = timeit(f, target, sidx, svals) * 1e3
    print(json.dumps({"scatter_sorted_1M_ms": ms}), flush=True)

    # segment-sum alternative: sort + diff-flag + scatter of unique? just
    # measure the sort cost itself
    raw = jax.random.randint(jax.random.fold_in(key, 2), (nup,), 0, LP1S)
    fs = jax.jit(jnp.sort)
    ms = timeit(fs, raw) * 1e3
    print(json.dumps({"sort_1M_i32_ms": ms}), flush=True)

    # argsort + take (the full reorder path)
    fa = jax.jit(lambda x: jnp.take(x, jnp.argsort(x)))
    ms = timeit(fa, raw) * 1e3
    print(json.dumps({"argsort_take_1M_ms": ms}), flush=True)


if __name__ == "__main__":
    main()
