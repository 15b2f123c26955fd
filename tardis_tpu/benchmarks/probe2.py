"""Second profiling probe: scatter scaling, big-B gathers, VMEM size.

Informs the kernel redesign (see profile_step.py for the first probe).
"""

from __future__ import annotations

import json
import time

import numpy as np


def timeit(fn, *args, n=5):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    times = []
    for _ in range(n):
        t0 = time.time()
        out = fn(*args)
        jax.block_until_ready(out)
        times.append(time.time() - t0)
    return min(times)


def main():
    import jax
    import jax.numpy as jnp

    key = jax.random.key(np.uint32(7))
    class R(dict):
        def __setitem__(self, k, v):
            super().__setitem__(k, v)
            print(json.dumps({k: v}), flush=True)

    results = R()
    LP1S = 183061 * 20

    # ---- scatter-add cost vs number of updates ----
    target = jnp.zeros((LP1S, 2), jnp.float32)
    for nup in (262144, 1048576, 4194304):
        sidx = jax.random.randint(key, (nup,), 0, LP1S)
        svals = jax.random.uniform(key, (nup, 2))

        def scat(target, sidx, svals):
            return target.at[sidx].add(svals)

        f = jax.jit(scat)
        results[f"scatter_add_{nup}_ms"] = timeit(f, target, sidx, svals) * 1e3

    # sorted indices variant
    nup = 262144
    sidx = jnp.sort(jax.random.randint(key, (nup,), 0, LP1S))
    svals = jax.random.uniform(key, (nup, 2))
    f = jax.jit(lambda t, i, v: t.at[i].add(v))
    results["scatter_add_sorted_262k_ms"] = timeit(f, target, sidx, svals) * 1e3

    # 1-D scatter (no trailing dim)
    t1 = jnp.zeros((LP1S,), jnp.float32)
    v1 = jax.random.uniform(key, (nup,))
    i1 = jax.random.randint(key, (nup,), 0, LP1S)
    f = jax.jit(lambda t, i, v: t.at[i].add(v))
    results["scatter_add_1d_262k_ms"] = timeit(f, t1, i1, v1) * 1e3

    # ---- gather cost vs batch size ----
    big = jax.random.uniform(key, (12_000_000,))
    for B in (131072, 1048576):
        idx = jax.random.randint(key, (B,), 0, big.shape[0])
        f = jax.jit(lambda i: big[i])
        results[f"scalar_gather_B{B}_ms"] = timeit(f, idx) * 1e3

    rows = jax.random.uniform(key, (28620, 128))
    for B in (131072, 1048576):
        ridx = jax.random.randint(key, (B,), 0, rows.shape[0])
        f = jax.jit(lambda i: jnp.sum(rows[i], axis=1))
        results[f"row_gather_B{B}_ms"] = timeit(f, ridx) * 1e3

    # row gather from a HUGE table (the absorbing-chain use case):
    # (S*M, Mpad128) with S=20, M=3600 -> (72000, 3712) ~ 1.07 GB
    Mpad = 3712
    chain = jax.random.uniform(key, (72000 * (Mpad // 128), 128))
    for B in (131072,):
        ridx = jax.random.randint(key, (B,), 0, chain.shape[0])
        f = jax.jit(lambda i: jnp.sum(chain[i], axis=1))
        results[f"chain_row_gather_B{B}_ms"] = timeit(f, ridx) * 1e3

    # two dependent row gathers (the 2-level search pattern)
    summ = jax.random.uniform(key, (72000, 128))

    def two_level(ridx, u):
        r1 = summ[ridx]  # (B,128)
        w = jnp.sum((r1 < u[:, None]), axis=1).astype(jnp.int32)
        r2 = chain[jnp.clip(ridx * 29 + w, 0, chain.shape[0] - 1)]
        return jnp.sum((r2 < u[:, None]), axis=1)

    B = 131072
    ridx = jax.random.randint(key, (B,), 0, 72000)
    u = jax.random.uniform(key, (B,))
    f = jax.jit(two_level)
    results["two_level_rowsearch_ms"] = timeit(f, ridx, u) * 1e3

    # ---- while_loop step overhead (empty-ish body) ----
    def loop(x):
        def body(c):
            i, x = c
            return i + 1, x * 1.000001 + 1e-9

        def cond(c):
            return c[0] < 100

        return jax.lax.while_loop(cond, body, (0, x))

    x = jax.random.uniform(key, (131072,))
    f = jax.jit(loop)
    results["while100_trivial_ms"] = timeit(f, x) * 1e3

    # ---- Pallas feasibility: VMEM budget + in-kernel dynamic slice ----
    try:
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        vmem_ok = 0
        for mb in (16, 32, 64, 96, 120):
            n = mb * 1024 * 1024 // 4 // 128

            def kern(x_ref, o_ref):
                o_ref[:] = x_ref[:] * 2.0

            try:
                x = jnp.ones((n, 128), jnp.float32)
                out = pl.pallas_call(
                    kern,
                    out_shape=jax.ShapeDtypeStruct((n, 128), jnp.float32),
                    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
                    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                )(x)
                jax.block_until_ready(out)
                vmem_ok = mb
            except Exception:
                break
        results["vmem_roundtrip_ok_mb"] = vmem_ok

        # per-lane dynamic gather inside pallas (jnp.take)
        def gkern(tab_ref, idx_ref, o_ref):
            o_ref[:] = jnp.take(tab_ref[:], idx_ref[:], axis=0)

        try:
            tab = jax.random.uniform(key, (4096,))
            gidx = jax.random.randint(key, (1024,), 0, 4096)
            out = pl.pallas_call(
                gkern,
                out_shape=jax.ShapeDtypeStruct((1024,), jnp.float32),
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(tab, gidx)
            jax.block_until_ready(out)
            results["pallas_take_1d"] = "ok"
        except Exception as e:  # noqa: BLE001
            results["pallas_take_1d"] = f"fail: {str(e)[:120]}"

        # 2-D take_along_axis within lanes
        def gkern2(tab_ref, idx_ref, o_ref):
            o_ref[:] = jnp.take_along_axis(tab_ref[:], idx_ref[:], axis=1)

        try:
            tab = jax.random.uniform(key, (1024, 128))
            gidx = jax.random.randint(key, (1024, 128), 0, 128)
            out = pl.pallas_call(
                gkern2,
                out_shape=jax.ShapeDtypeStruct((1024, 128), jnp.float32),
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(tab, gidx)
            jax.block_until_ready(out)
            results["pallas_take_along_lanes"] = "ok"
        except Exception as e:  # noqa: BLE001
            results["pallas_take_along_lanes"] = f"fail: {str(e)[:120]}"
    except Exception as e:  # noqa: BLE001
        results["pallas"] = f"unavailable: {str(e)[:120]}"

    print(json.dumps(results, indent=1), flush=True)


if __name__ == "__main__":
    main()
