"""Microbenchmark: per-step cost of kernel-step patterns INSIDE a fori_loop.

probe_scatter_gather showed every scatter/gather is ~35us in isolation
(dispatch-bound), yet probe_step3 attributes ~9.7 ms/step to the line_diff
scatter inside the transport while_loop.  This probe times each pattern
inside a fori_loop to expose loop-carried-buffer effects (copies, failed
aliasing, fusion changes).

Usage: python -m tardis_tpu.benchmarks.probe_loop_ops [--steps N]
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--batch", type=int, default=131072)
    args = ap.parse_args()
    N = args.steps
    B = args.batch

    import jax
    import jax.numpy as jnp
    from jax import lax

    from tardis_tpu.utils.twofloat import df32_accumulate

    key = jax.random.key(0)
    M_LINE = 183061 * 20
    out = {}

    def timeloop(make_body, init, label, n_rep=3):
        def run(*xs):
            def body(i, c):
                return make_body(i, c, *xs)

            return lax.fori_loop(0, N, body, init)

        f = jax.jit(run)
        t0 = time.time()
        o = f()
        jax.block_until_ready(o)
        compile_s = time.time() - t0
        ts = []
        for _ in range(n_rep):
            t0 = time.time()
            o = f()
            jax.block_until_ready(o)
            ts.append(time.time() - t0)
        ms = min(ts) / N * 1e3
        out[label] = round(ms, 4)
        out[label + "_compile_s"] = round(compile_s, 1)
        print(json.dumps({label: out[label]}), flush=True)

    idx0 = jax.random.randint(jax.random.fold_in(key, 1), (2 * B,), 0, M_LINE)
    vals0 = jax.random.normal(jax.random.fold_in(key, 2), (2 * B, 2))

    # A. line_diff pattern: zeros+scatter-add then df32_accumulate (hi, lo)
    def body_a(i, c):
        hi, lo = c
        idx = (idx0 + i) % M_LINE
        ldelta = jnp.zeros_like(hi).at[idx].add(vals0)
        hi, lo = df32_accumulate(hi, lo, ldelta)
        return (hi, lo)

    timeloop(body_a, (jnp.zeros((M_LINE, 2), jnp.float32),
                      jnp.zeros((M_LINE, 2), jnp.float32)),
             "A_linediff_zeros_scatter_df32")

    # B. direct scatter-add into carry (no zeros temp, no compensation)
    def body_b(i, c):
        idx = (idx0 + i) % M_LINE
        return c.at[idx].add(vals0)

    timeloop(body_b, jnp.zeros((M_LINE, 2), jnp.float32),
             "B_linediff_direct_scatter")

    # C. df32 accumulate alone (dense delta, no scatter)
    dense = jax.random.normal(jax.random.fold_in(key, 3), (M_LINE, 2))

    def body_c(i, c):
        hi, lo = c
        hi, lo = df32_accumulate(hi, lo, dense * (i % 3))
        return (hi, lo)

    timeloop(body_c, (jnp.zeros((M_LINE, 2), jnp.float32),
                      jnp.zeros((M_LINE, 2), jnp.float32)),
             "C_df32_dense_only")

    # D. zeros+scatter only (no accumulate) -> measures scatter+copy
    def body_d(i, c):
        idx = (idx0 + i) % M_LINE
        ldelta = jnp.zeros_like(c).at[idx].add(vals0)
        return c + ldelta

    timeloop(body_d, jnp.zeros((M_LINE, 2), jnp.float32),
             "D_zeros_scatter_plus")

    # E. out scatter-set pattern
    N_OUT = 524288
    oidx0 = jax.random.randint(jax.random.fold_in(key, 5), (B,), 0, N_OUT + 9)
    ovals = jax.random.normal(jax.random.fold_in(key, 6), (B, 4))

    def body_e(i, c):
        oidx = (oidx0 + i) % (N_OUT + 9)
        return c.at[oidx].set(ovals, mode="drop")

    timeloop(body_e, jnp.zeros((N_OUT, 4), jnp.float32),
             "E_out_scatter_set")

    # F. chain-emission gathers: 4 row gathers (B,128) + compares
    tabs = [
        jax.random.normal(jax.random.fold_in(key, 10 + k), (rows, 128))
        for k, rows in enumerate([36000, 540000, 36000, 540000])
    ]
    gi0 = jax.random.randint(jax.random.fold_in(key, 20), (B,), 0, 36000)

    def body_f(i, c):
        g = (gi0 + i) % 36000
        u = (c[:B] % 1.0)
        acc = c
        for k, t in enumerate(tabs):
            row = t[g % t.shape[0]]
            cnt = jnp.sum(row < u[:, None], axis=1).astype(jnp.float32)
            acc = acc.at[:B].add(cnt * 1e-9)
            g = (g * 5 + k) % t.shape[0]
        return acc

    timeloop(body_f, jnp.zeros((B,), jnp.float32), "F_chain_4_row_gathers")

    # G. single row gather in loop
    def body_g(i, c):
        g = (gi0 + i) % 540000
        row = tabs[1][g]
        return c + jnp.sum(row, axis=1) * 1e-9

    timeloop(body_g, jnp.zeros((B,), jnp.float32), "G_one_row_gather_540k")

    # H. elementwise control: 30 VPU ops on (B,)
    def body_h(i, c):
        x = c
        for k in range(30):
            x = x * 1.0000001 + 1e-9
        return x

    timeloop(body_h, jnp.ones((B,), jnp.float32), "H_elementwise30")

    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
