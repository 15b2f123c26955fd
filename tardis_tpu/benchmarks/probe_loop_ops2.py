"""Loop-op microbenchmark, part 2: scatter variants + gathers + sort costs.

Follow-up to probe_loop_ops: XLA:TPU serializes in-loop scatters at
~41 ns/update-row.  This probes which knobs change that (unique_indices,
target size, update width, sortedness), what staged dense writes cost,
and re-times the row-gather patterns (part 1 crashed before F).

Usage: python -m tardis_tpu.benchmarks.probe_loop_ops2 [--steps N]
"""

from __future__ import annotations

import argparse
import json
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--batch", type=int, default=131072)
    ap.add_argument("--only", default=None)
    args = ap.parse_args()
    N = args.steps
    B = args.batch

    import jax
    import jax.numpy as jnp
    from jax import lax

    key = jax.random.key(0)
    M_LINE = 183061 * 20
    out = {}

    def timeloop(make_body, init, label, n_rep=3):
        if args.only and args.only not in label:
            return

        def run():
            return lax.fori_loop(0, N, make_body, init)

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
        print(json.dumps({label: out[label], "compile_s":
                          round(compile_s, 1)}), flush=True)

    idx0 = jax.random.randint(jax.random.fold_in(key, 1), (2 * B,), 0, M_LINE)
    vals0 = jax.random.normal(jax.random.fold_in(key, 2), (2 * B, 2))

    # A. unique_indices=True scatter-add (indices not actually unique, but
    # measures the lowering difference)
    def body_a(i, c):
        idx = (idx0 + i) % M_LINE
        return c.at[idx].add(vals0, unique_indices=True)

    timeloop(body_a, jnp.zeros((M_LINE, 2), jnp.float32),
             "A_scatter_add_unique")

    # B. unique + indices_are_sorted
    idx_s = jnp.sort(idx0)

    def body_b(i, c):
        return c.at[idx_s].add(vals0, unique_indices=True,
                               indices_are_sorted=True)

    timeloop(body_b, jnp.zeros((M_LINE, 2), jnp.float32),
             "B_scatter_add_unique_sorted")

    # C. small target (4096 rows), same 2B updates
    idx_sm = idx0 % 4096

    def body_c(i, c):
        return c.at[(idx_sm + i) % 4096].add(vals0)

    timeloop(body_c, jnp.zeros((4096, 2), jnp.float32),
             "C_scatter_add_target4k")

    # D. width-1 scatter (2B scalar updates)
    v1 = vals0[:, 0]

    def body_d(i, c):
        return c.at[(idx0 + i) % M_LINE].add(v1)

    timeloop(body_d, jnp.zeros((M_LINE,), jnp.float32),
             "D_scatter_add_w1")

    # D2. half updates (B)
    def body_d2(i, c):
        return c.at[(idx0[:B] + i) % M_LINE].add(v1[:B])

    timeloop(body_d2, jnp.zeros((M_LINE,), jnp.float32),
             "D2_scatter_add_w1_halfB")

    # E. out-scatter with unique_indices (safe there: one row per packet)
    N_OUT = 524288
    oidx0 = jax.random.randint(jax.random.fold_in(key, 5), (B,), 0, N_OUT + 9)
    ovals = jax.random.normal(jax.random.fold_in(key, 6), (B, 4))

    def body_e(i, c):
        oidx = (oidx0 + i) % (N_OUT + 9)
        return c.at[oidx].set(ovals, mode="drop", unique_indices=True)

    timeloop(body_e, jnp.zeros((N_OUT, 4), jnp.float32),
             "E_out_scatter_set_unique")

    # F. staged dense write: dynamic_update_slice of (B,4) into (K,B,4)
    K = 32

    def body_f(i, c):
        return lax.dynamic_update_slice(c, ovals[None], (i % K, 0, 0))

    timeloop(body_f, jnp.zeros((K, B, 4), jnp.float32),
             "F_staging_dus")

    # G. sort (2B,) f32 keys in loop
    keys0 = jax.random.normal(jax.random.fold_in(key, 7), (2 * B,))

    def body_g(i, c):
        return c + jnp.sort(keys0 + i)[::2 * B - 1].sum()

    timeloop(body_g, jnp.zeros((), jnp.float32), "G_sort_2B_f32", n_rep=2)

    # G2. sort with payload (argsort-like: sort u32 keys carrying values)
    ik = (idx0 + 0).astype(jnp.uint32)

    def body_g2(i, c):
        k2, v2 = lax.sort((ik + i, vals0[:, 0]), num_keys=1)
        return c + v2[0] + k2[0].astype(jnp.float32) * 0

    timeloop(body_g2, jnp.zeros((), jnp.float32), "G2_sort_kv_2B",
             n_rep=2)

    # H. row gathers in loop: (B,128) rows from (R,128)
    for rows in (36000, 540000):
        tab = jax.random.normal(jax.random.fold_in(key, rows), (rows, 128))
        gi0 = jax.random.randint(jax.random.fold_in(key, rows + 1), (B,),
                                 0, rows)

        def body_h(i, c, tab=tab, gi0=gi0, rows=rows):
            row = tab[(gi0 + i) % rows]
            return c + jnp.sum(row, axis=1) * 1e-9

        timeloop(body_h, jnp.zeros((B,), jnp.float32),
                 f"H_row_gather_{rows}")

    # H2. row gather + compare-count (the chain-emission inner op)
    tab = jax.random.normal(jax.random.fold_in(key, 31), (36000, 128))
    gi0 = jax.random.randint(jax.random.fold_in(key, 32), (B,), 0, 36000)
    u0 = jax.random.uniform(jax.random.fold_in(key, 33), (B,))

    def body_h2(i, c):
        row = tab[(gi0 + i) % 36000]
        cnt = jnp.sum(row < u0[:, None], axis=1).astype(jnp.float32)
        return c + cnt * 1e-9

    timeloop(body_h2, jnp.zeros((B,), jnp.float32), "H2_gather_cmp_36k")

    # I. scalar gather (B,) from (183k,)
    tab1 = jax.random.normal(jax.random.fold_in(key, 41), (183061,))
    gi1 = jax.random.randint(jax.random.fold_in(key, 42), (B,), 0, 183061)

    def body_i(i, c):
        return c + tab1[(gi1 + i) % 183061] * 1e-9

    timeloop(body_i, jnp.zeros((B,), jnp.float32), "I_scalar_gather_183k")

    # J. elementwise 30 ops control
    def body_j(i, c):
        x = c
        for _ in range(30):
            x = x * 1.0000001 + 1e-9
        return x

    timeloop(body_j, jnp.ones((B,), jnp.float32), "J_elementwise30")

    # K. threefry: one uniform draw (B,) via vmapped fold_in (kernel pattern)
    kk = jax.random.split(key, B)

    def body_k(i, c):
        u = jax.vmap(
            lambda k_: jax.random.uniform(jax.random.fold_in(k_, i), ())
        )(kk)
        return c + u * 1e-9

    timeloop(body_k, jnp.zeros((B,), jnp.float32), "K_vmap_folded_uniform")

    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
