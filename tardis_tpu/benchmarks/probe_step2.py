"""Ablation timing of the chain-mode transport step: which component owns
the remaining per-step milliseconds?

Runs single jitted steps (and N-step while_loops) with components disabled
one at a time.  Usage: python -m tardis_tpu.benchmarks.probe_step2
"""

from __future__ import annotations

import json
import time

import numpy as np


def timeit(fn, *args, n=6):
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
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=131072)
    ap.add_argument("--nsteps", type=int, default=20)
    ap.add_argument("--only", default=None)
    args = ap.parse_args()
    B = args.batch

    import jax
    import jax.numpy as jnp
    from jax import lax

    from tardis_tpu.benchmarks.transport_bench import build_problem
    from tardis_tpu.opacities.macro_atom_solver import solve_macro_chain
    from tardis_tpu.transport import kernel as K
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
    pool_mu, pool_nu = sample_blackbody_packets(key, B, state.t_inner)

    def run_n(static_v, label):
        step = K.make_transport_step(
            tables, static_v, pool_mu, pool_nu, B, key
        )
        carry0 = K.init_carry(static_v, B, B)

        def fn(c):
            return lax.fori_loop(0, args.nsteps, lambda i, cc: step(cc), c)

        f = jax.jit(fn)
        t0 = time.time()
        c1 = f(carry0)
        jax.block_until_ready(c1)
        compile_s = time.time() - t0
        ms = timeit(f, c1) * 1e3 / args.nsteps
        print(
            json.dumps({label: round(ms, 3), "compile_s": round(compile_s, 1)}),
            flush=True,
        )
        return ms

    def fake_tss(tt, v, side="left"):
        return jnp.clip(v.astype(jnp.int32), 0, tt.n)

    def fake_uniform(keys, tag):
        return jnp.full((keys.shape[0],), 0.5, jnp.float32)

    variants = {
        "full_step_ms": (None, None),
        "scatter_mode_step_ms": (None, None),
        "no_predicate_search_ms": (
            "predicate_search",
            lambda pt, shell, lo, hi, *a, **k: jnp.minimum(lo + 1, hi),
        ),
        "no_tiled_searchsorted_ms": ("tiled_searchsorted", fake_tss),
        "no_chain_emission_ms": (
            "_chain_emission",
            lambda tables, static, i_event, shell, keys: i_event,
        ),
        "no_rng_ms": ("_uniform_from_key", fake_uniform),
        "no_line_scatter_ms": (None, None),
        "no_out_scatter_ms": (None, None),
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
        try:
            run_n(st, label)
        finally:
            if attr:
                setattr(K, attr, orig)
            K._DISABLE_LINE_SCATTER = False
            K._DISABLE_OUT_SCATTER = False


if __name__ == "__main__":
    main()
