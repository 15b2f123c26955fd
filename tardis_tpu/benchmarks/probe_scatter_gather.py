"""Microbenchmark: XLA:TPU scatter/gather cost model for the transport step.

Times the exact scatter/gather shapes the kernel step uses (probe_step3
showed they dominate: line_diff scatter 9.7 ms, chain gathers 8.7 ms,
out scatter 7.5 ms of a 40 ms step at B=131072) plus candidate
replacements, to drive the Pallas kernel design.

Usage: python -m tardis_tpu.benchmarks.probe_scatter_gather
"""

from __future__ import annotations

import json
import time

import numpy as np


def timeit(f, *args, n=20):
    import jax

    g = jax.jit(f)
    o = g(*args)
    jax.block_until_ready(o)
    t0 = time.time()
    for _ in range(n):
        o = g(*args)
    jax.block_until_ready(o)
    return (time.time() - t0) / n * 1e3


def main():
    import jax
    import jax.numpy as jnp

    key = jax.random.key(0)
    out = {}

    B = 131072
    M_LINE = 183061 * 20  # (L+1)*S line_diff rows
    N_OUT = 524288

    idx = jax.random.randint(jax.random.fold_in(key, 1), (2 * B,), 0, M_LINE)
    vals = jax.random.normal(jax.random.fold_in(key, 2), (2 * B, 2))
    tgt = jnp.zeros((M_LINE, 2), jnp.float32)

    # 1. the production line_diff scatter-add (2B updates, width 2)
    out["scatter_add_2B_w2"] = timeit(
        lambda t, i, v: t.at[i].add(v), tgt, idx, vals
    )

    # 1b. scatter-add into a flat (M*2,) target with interleaved indices
    idx_flat = jnp.stack([idx * 2, idx * 2 + 1], axis=1).reshape(-1)
    vals_flat = vals.reshape(-1)
    tgt_flat = jnp.zeros((M_LINE * 2,), jnp.float32)
    out["scatter_add_4B_flat"] = timeit(
        lambda t, i, v: t.at[i].add(v), tgt_flat, idx_flat, vals_flat
    )

    # 1c. half the updates (B, width 2)
    out["scatter_add_1B_w2"] = timeit(
        lambda t, i, v: t.at[i].add(v), tgt, idx[:B], vals[:B]
    )

    # 1d. 8x the updates in one call (batched across steps)
    idx8 = jax.random.randint(jax.random.fold_in(key, 3), (16 * B,), 0, M_LINE)
    vals8 = jax.random.normal(jax.random.fold_in(key, 4), (16 * B, 2))
    out["scatter_add_16B_w2"] = timeit(
        lambda t, i, v: t.at[i].add(v), tgt, idx8, vals8
    )

    # 1e. sorted indices (does XLA exploit sortedness?)
    idx_sorted = jnp.sort(idx)
    out["scatter_add_2B_w2_sorted"] = timeit(
        lambda t, i, v: t.at[i].add(v), tgt, idx_sorted, vals
    )

    # 2. the out_packed scatter-set (B updates, width 4, mode drop)
    oidx = jax.random.randint(jax.random.fold_in(key, 5), (B,), 0, N_OUT + 1)
    ovals = jax.random.normal(jax.random.fold_in(key, 6), (B, 4))
    otgt = jnp.zeros((N_OUT, 4), jnp.float32)
    out["scatter_set_B_w4_drop"] = timeit(
        lambda t, i, v: t.at[i].set(v, mode="drop"), otgt, oidx, ovals
    )

    # 2b. scatter-add instead of set (out rows are written once per packet:
    # add into zeros == set)
    out["scatter_add_B_w4_drop"] = timeit(
        lambda t, i, v: t.at[i].add(v, mode="drop"), otgt, oidx, ovals
    )

    # 3. row gathers (B,128) from tables of different sizes
    for rows, name in [
        (2861, "gather_rows_2.8k"),  # c2-level table
        (28620, "gather_rows_28k"),  # c_hi level-0, S=20
        (36000, "gather_rows_36k"),  # chain_summary S*M
        (540000, "gather_rows_540k"),  # chain_tiles S*M*W
    ]:
        tab = jax.random.normal(jax.random.fold_in(key, rows), (rows, 128))
        gi = jax.random.randint(jax.random.fold_in(key, rows + 1), (B,), 0,
                                rows)
        out[name] = timeit(lambda t, i: t[i], tab, gi)

    # 3b. same gather narrower: (B, 8) rows
    tab8 = jax.random.normal(jax.random.fold_in(key, 77), (540000, 8))
    gi = jax.random.randint(jax.random.fold_in(key, 78), (B,), 0, 540000)
    out["gather_rows_540k_w8"] = timeit(lambda t, i: t[i], tab8, gi)

    # 3c. scalar gather (B,) from (L,) — the s_of/line_nu pattern
    tab1 = jax.random.normal(jax.random.fold_in(key, 79), (183061,))
    gi1 = jax.random.randint(jax.random.fold_in(key, 80), (B,), 0, 183061)
    out["gather_scalar_183k"] = timeit(lambda t, i: t[i], tab1, gi1)

    # 4. take_along_axis formulation of the row gather
    tab = jax.random.normal(jax.random.fold_in(key, 99), (36000, 128))
    gi = jax.random.randint(jax.random.fold_in(key, 98), (B,), 0, 36000)
    out["gather_rows_36k_dynslice_vmap"] = timeit(
        lambda t, i: jax.vmap(
            lambda j: jax.lax.dynamic_slice_in_dim(t, j, 1, 0)[0]
        )(i),
        tab, gi,
    )

    # 5. full-step reference points
    ones = jnp.ones((B,), jnp.float32)
    out["elementwise_30ops_B"] = timeit(
        lambda x: sum(jnp.sin(x * k) for k in range(1, 31)), ones
    )

    # 6. cumsum over B (refill uses one per step)
    out["cumsum_B_i32"] = timeit(
        lambda x: jnp.cumsum(x.astype(jnp.int32)), ones
    )

    # 7. (B,S) onehot matmul reduction (bulk estimators): S=20
    S = 20
    sh = jax.random.randint(jax.random.fold_in(key, 101), (B,), 0, S)
    w = jax.random.normal(jax.random.fold_in(key, 102), (B,))
    out["onehot_segsum_S20"] = timeit(
        lambda s, ww: jnp.sum(
            ww[:, None] * (s[:, None] == jnp.arange(S)[None, :]), axis=0
        ),
        sh, w,
    )

    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
