"""Ablation probe v3: per-component step cost via the production while_loop.

probe_step2's unrolled fori_loop exceeds the remote-compile request size on
the axon stack (HTTP 413), so this probe times ``transport_loop`` — the
exact production code path — at a fixed ``max_steps`` with one component
disabled at a time (monkeypatched fakes / trace-time flags).  The pool is
oversized (4B packets) so every lane stays busy for all probed steps.

Usage:  python -m tardis_tpu.benchmarks.probe_step3 [--batch B] [--steps N]
        [--only LABEL]
"""

from __future__ import annotations

import json
import time

import numpy as np


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=131072)
    ap.add_argument("--steps", type=int, default=60)
    ap.add_argument("--only", default=None)
    args = ap.parse_args()
    B = args.batch

    import jax
    import jax.numpy as jnp

    from tardis_tpu.benchmarks.transport_bench import build_problem
    from tardis_tpu.opacities.macro_atom_solver import solve_macro_chain
    from tardis_tpu.transport import kernel as K
    from tardis_tpu.transport import tiled_search as TS
    from tardis_tpu.transport.device_state import build_transport_tables
    from tardis_tpu.transport.source import sample_blackbody_packets

    config, state, atom, plasma = build_problem(200, 60, "macroatom")
    mchain = solve_macro_chain(
        atom.macro_atom,
        plasma.beta_sobolev,
        plasma.j_blues,
        plasma.stimulated_emission_factor,
        mode="macroatom",
        line_nu_scaled=atom.line_nu / 1e15,
    )
    tables, static = build_transport_tables(
        state.geometry, plasma, atom, "macroatom", macro_chain=mchain
    )
    key = jax.random.key(np.uint32(23111963))
    n_pool = 4 * B
    pool_mu, pool_nu = sample_blackbody_packets(key, n_pool, state.t_inner)
    jax.block_until_ready(pool_mu)

    def run_variant(static_v, label):
        # tables must be jit ARGUMENTS: closing over them bakes ~100 MB of
        # constants into the HLO and the axon remote-compile endpoint
        # rejects the request (HTTP 413)
        def fn(tb, pm, pn):
            return K.transport_loop(
                tb, static_v, pm, pn, key,
                n_packets=n_pool, batch_size=B, max_steps=args.steps,
            )

        f = jax.jit(fn)
        t0 = time.time()
        c = f(tables, pool_mu, pool_nu)
        jax.block_until_ready(c)
        compile_s = time.time() - t0
        ts = []
        for _ in range(3):
            t0 = time.time()
            c = f(tables, pool_mu, pool_nu)
            jax.block_until_ready(c)
            ts.append(time.time() - t0)
        ms = min(ts) * 1e3 / args.steps
        print(
            json.dumps(
                {label: round(ms, 3), "compile_s": round(compile_s, 1)}
            ),
            flush=True,
        )
        return ms

    def fake_uniform(keys, tag):
        return jnp.full((keys.shape[0],), 0.5, jnp.float32)

    def fake_search(pt, shell, lo, n_lines, *a, **k):
        return jnp.minimum(lo + 1, n_lines)

    def fake_chain(tables, static, i_event, shell, keys):
        return i_event

    variants = {
        "full_step_ms": (None, None),
        "scatter_mode_step_ms": (None, None),
        "no_search_ms": ("predicate_search", fake_search),
        "no_chain_emission_ms": ("_chain_emission", fake_chain),
        "no_rng_ms": ("_uniform_from_key", fake_uniform),
        "no_line_scatter_ms": (None, None),
        "no_out_scatter_ms": (None, None),
        "no_bulk_est_ms": (None, None),
    }
    for label, (attr, fake) in variants.items():
        if args.only and args.only != label:
            continue
        st = static
        if label == "scatter_mode_step_ms":
            st = static._replace(line_interaction_mode=0)
        orig = getattr(K, attr) if attr else None
        if attr:
            setattr(K, attr, fake)
        if label == "no_line_scatter_ms":
            K._DISABLE_LINE_SCATTER = True
        if label == "no_out_scatter_ms":
            K._DISABLE_OUT_SCATTER = True
        if label == "no_bulk_est_ms":
            K._DISABLE_BULK_EST = True
        try:
            run_variant(st, label)
        finally:
            if attr:
                setattr(K, attr, orig)
            K._DISABLE_LINE_SCATTER = False
            K._DISABLE_OUT_SCATTER = False
            K._DISABLE_BULK_EST = False


if __name__ == "__main__":
    main()
