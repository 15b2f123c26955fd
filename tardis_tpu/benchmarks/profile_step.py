"""Dissect the cost of one transport lockstep step on the current backend.

Times each suspected-hot component of transport/kernel.py's step function in
isolation at bench scale (B=131072, ~183k lines, macroatom), so kernel
optimization targets measurements instead of guesses.

Usage: python -m tardis_tpu.benchmarks.profile_step [--batch B] [--mode m]
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def timeit(fn, *args, n=5):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    compile_s = 0.0
    times = []
    for _ in range(n):
        t0 = time.time()
        out = fn(*args)
        jax.block_until_ready(out)
        times.append(time.time() - t0)
    return min(times)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=131072)
    ap.add_argument("--mode", default="macroatom")
    ap.add_argument("--levels", type=int, default=200)
    ap.add_argument("--jump", type=int, default=60)
    args = ap.parse_args()
    B = args.batch

    import jax
    import jax.numpy as jnp

    from tardis_tpu.benchmarks.transport_bench import build_problem
    from tardis_tpu.opacities.macro_atom_solver import solve_macro_state
    from tardis_tpu.transport import kernel as K
    from tardis_tpu.transport.device_state import build_transport_tables
    from tardis_tpu.transport.source import sample_blackbody_packets
    from tardis_tpu.transport.tiled_search import (
        predicate_search,
        tiled_searchsorted,
    )

    config, state, atom, plasma = build_problem(
        args.levels, args.jump, args.mode
    )
    macro_state = None
    if args.mode in ("downbranch", "macroatom"):
        macro = (
            atom.downbranch if args.mode == "downbranch" else atom.macro_atom
        )
        macro_state = solve_macro_state(
            macro,
            plasma.beta_sobolev,
            plasma.j_blues,
            plasma.stimulated_emission_factor,
        )
    tables, static = build_transport_tables(
        state.geometry, plasma, atom, args.mode, macro_state=macro_state
    )
    S, L = static.n_shells, static.n_lines
    T = tables.macro_cum_prob.shape[0]
    print(
        json.dumps(
            {
                "platform": jax.devices()[0].platform,
                "B": B,
                "L": L,
                "S": S,
                "macro_T": T,
                "macro_block_bits": static.macro_block_bits,
                "max_macro_jumps": static.max_macro_jumps,
            }
        ),
        flush=True,
    )

    key = jax.random.key(np.uint32(23111963))
    pool_mu, pool_nu = sample_blackbody_packets(key, B, state.t_inner)
    results = {}

    # ---------------- RNG draws ----------------
    pid = jnp.arange(B, dtype=jnp.int32)
    eidx = jnp.ones(B, jnp.int32)

    @jax.jit
    def rng_only(pid, eidx):
        def mk_key(p, e):
            return jax.random.fold_in(
                jax.random.fold_in(key, p.astype(jnp.uint32)),
                e.astype(jnp.uint32),
            )

        keys = jax.vmap(mk_key)(pid, eidx)
        tot = 0.0
        for tag in range(4):
            tot = tot + K._uniform_from_key(keys, tag)
        return tot

    results["rng_4draws_ms"] = timeit(rng_only, pid, eidx) * 1e3

    # ---------------- isolated (B,) scalar gather ----------------
    big = tables.macro_cum_prob.reshape(-1)
    idx = jax.random.randint(key, (B,), 0, big.shape[0])

    @jax.jit
    def gather1(idx):
        return big[idx]

    results["scalar_gather_1_ms"] = timeit(gather1, idx) * 1e3

    @jax.jit
    def gather_chain10(idx):
        v = idx
        tot = 0.0
        for _ in range(10):
            g = big[v]
            tot = tot + g
            v = (v + g.astype(jnp.int32) + 7) % big.shape[0]
        return tot

    results["scalar_gather_chain10_ms"] = timeit(gather_chain10, idx) * 1e3

    # 10 independent gathers (no dependency chain)
    idxs = jax.random.randint(key, (10, B), 0, big.shape[0])

    @jax.jit
    def gather_indep10(idxs):
        return sum(big[idxs[i]] for i in range(10))

    results["scalar_gather_indep10_ms"] = timeit(gather_indep10, idxs) * 1e3

    # ---------------- (B,128) row gather ----------------
    pt = tables.pred_tables
    rows_tbl = pt.c_hi  # (S*T0, 128)
    ridx = jax.random.randint(key, (B,), 0, rows_tbl.shape[0])

    @jax.jit
    def rowgather(ridx):
        return jnp.sum(rows_tbl[ridx], axis=1)

    results["row_gather_128_ms"] = timeit(rowgather, ridx) * 1e3

    # ---------------- scatter-adds ----------------
    LP1S = (L + 1) * S
    target = jnp.zeros((LP1S, 2), jnp.float32)
    sidx = jax.random.randint(key, (2 * B,), 0, LP1S)
    svals = jax.random.uniform(key, (2 * B, 2))

    @jax.jit
    def scat(target, sidx, svals):
        return target.at[sidx].add(svals)

    results["line_diff_scatter_ms"] = timeit(scat, target, sidx, svals) * 1e3

    out_t = jnp.zeros((B, 4), jnp.float32)
    oidx = jax.random.randint(key, (B,), 0, B)
    ovals = jax.random.uniform(key, (B, 4))

    @jax.jit
    def scat_set(out_t, oidx, ovals):
        return out_t.at[oidx].set(ovals, mode="drop")

    results["out_scatter_set_ms"] = timeit(scat_set, out_t, oidx, ovals) * 1e3

    # ---------------- searches ----------------
    nu_q = jax.random.uniform(key, (B,), minval=0.1, maxval=2.0)

    @jax.jit
    def tsearch(nu_q):
        return tiled_searchsorted(tables.neg_nu_tiled, -nu_q, side="right")

    results["tiled_searchsorted_ms"] = timeit(tsearch, nu_q) * 1e3

    shell = jax.random.randint(key, (B,), 0, S)
    lo_dom = jax.random.randint(key, (B,), 0, L // 2)
    hi_dom = lo_dom + L // 4
    c0h = jnp.zeros(B)
    c0l = jnp.zeros(B)
    chi = jnp.full(B, 0.5)
    z = jnp.zeros(B)
    tau_ev = jnp.full(B, 1.0)

    @jax.jit
    def psearch(shell, lo_dom, hi_dom, nu_q):
        return predicate_search(
            pt, shell, lo_dom, hi_dom, c0h, c0l, chi, z, nu_q, tau_ev
        )

    results["predicate_search_ms"] = (
        timeit(psearch, shell, lo_dom, hi_dom, nu_q) * 1e3
    )

    # ---------------- macro walk ----------------
    if args.mode in ("downbranch", "macroatom"):
        i_event = jax.random.randint(key, (B,), 0, L)
        keys = jax.vmap(
            lambda p: jax.random.fold_in(key, p.astype(jnp.uint32))
        )(pid)
        is_line = jnp.ones(B, bool)

        @jax.jit
        def mwalk(i_event, keys):
            return K._macro_walk(
                tables._replace(
                    macro_cum_prob=tables.macro_cum_prob.reshape(-1)
                ),
                static,
                i_event,
                shell,
                keys,
                is_line,
            )

        results["macro_walk_ms"] = timeit(mwalk, i_event, keys) * 1e3

    # ---------------- one-hot estimator matmul ----------------
    w = jax.random.uniform(key, (B,))

    @jax.jit
    def onehot_est(w, shell):
        onehot = (shell[:, None] == jnp.arange(S)[None, :]).astype(
            jnp.float32
        )
        return jnp.sum(w[:, None] * onehot, axis=0)

    results["onehot_estimator_ms"] = timeit(onehot_est, w, shell) * 1e3

    print(json.dumps(results, indent=1), flush=True)


if __name__ == "__main__":
    main()
