"""Transport-kernel benchmark: packets/s for a tardis_example-scale problem.

Runs one Monte Carlo iteration (W7-like model, 20 shells, synthetic atomic
dataset scaled to a kurucz-like line count) and reports packets/s.

Usage:  python -m tardis_tpu.benchmarks.transport_bench [--packets N]
        [--lines-levels L] [--batch B] [--mode scatter|macroatom] [--json]

The platform comes from JAX_PLATFORMS (axon = the real TPU chip; cpu = host).
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def build_problem(n_levels=250, max_level_jump=80, mode="scatter"):
    from tardis_tpu.atomic.synthetic import make_synthetic_atom_data
    from tardis_tpu.config.reader import config_from_dict
    from tardis_tpu.model.state import SimulationState
    from tardis_tpu.plasma.solver import PlasmaSolver

    config = config_from_dict(
        {
            "supernova": {
                "luminosity_requested": "9.44 log_lsun",
                "time_explosion": "13 day",
            },
            "model": {
                "structure": {
                    "type": "specific",
                    "velocity": {
                        "start": "1.1e4 km/s",
                        "stop": "20000 km/s",
                        "num": 20,
                    },
                    "density": {"type": "branch85_w7"},
                },
                "abundances": {
                    "type": "uniform",
                    "O": 0.19,
                    "Mg": 0.03,
                    "Si": 0.52,
                    "S": 0.19,
                    "Ar": 0.04,
                    "Ca": 0.03,
                },
            },
            "plasma": {"line_interaction_type": mode},
            "montecarlo": {"seed": 23111963, "no_of_packets": 1e5,
                           "iterations": 1},
            "spectrum": {"start": "500 angstrom", "stop": "20000 angstrom",
                         "num": 10000},
        }
    )
    state = SimulationState.from_config(config)
    atom = make_synthetic_atom_data(
        n_levels=n_levels, max_level_jump=max_level_jump
    ).prepare(
        selected_atoms=[8, 12, 14, 16, 18, 20], line_interaction_type=mode
    )
    plasma = PlasmaSolver(atom, state).update(
        state.t_radiative, state.dilution_factor
    )
    return config, state, atom, plasma


def bench_transport(
    n_packets=1_000_000,
    batch_size=131072,
    n_levels=250,
    max_level_jump=80,
    mode="scatter",
    repeats=2,
    chunk_size=524288,
):
    import jax

    from tardis_tpu.opacities.macro_atom_solver import (
        solve_macro_chain,
        solve_macro_state,
    )
    from tardis_tpu.transport.device_state import build_transport_tables
    from tardis_tpu.transport.kernel import run_transport
    from tardis_tpu.transport.source import sample_blackbody_packets

    config, state, atom, plasma = build_problem(n_levels, max_level_jump, mode)
    macro_state = None
    macro_chain = None
    t_host0 = time.time()
    if mode in ("downbranch", "macroatom"):
        macro = atom.downbranch if mode == "downbranch" else atom.macro_atom
        margs = (
            macro,
            plasma.beta_sobolev,
            plasma.j_blues,
            plasma.stimulated_emission_factor,
        )
        macro_chain = solve_macro_chain(*margs, mode=mode)
        if macro_chain is None:
            macro_state = solve_macro_state(*margs)
    macro_solve_s = time.time() - t_host0
    # table build includes the one-time device->host readback warm-up
    # (device_state._warm_device_readback): on the axon stack the first
    # readback of a process costs 50-250 s REGARDLESS of size, so it is
    # paid here during setup, not inside the timed transport call
    t_host0 = time.time()
    tables, static = build_transport_tables(
        state.geometry, plasma, atom, mode,
        macro_state=macro_state, macro_chain=macro_chain,
    )
    tables_build_s = time.time() - t_host0

    key = jax.random.key(np.uint32(23111963))
    pool_mu, pool_nu = sample_blackbody_packets(
        jax.random.fold_in(key, 0), n_packets, state.t_inner
    )
    pool_mu.block_until_ready()

    run_key = jax.random.fold_in(key, 1)
    batch = min(batch_size, n_packets)

    times = []
    carry = None
    for _ in range(repeats):
        t0 = time.time()
        carry = run_transport(
            tables, static, pool_mu, pool_nu, run_key,
            n_packets=n_packets, batch_size=batch,
            tail_batch=min(2048, batch // 4) if batch >= 8192 else 0,
            chunk_size=chunk_size,
        )
        jax.block_until_ready(carry)
        times.append(time.time() - t0)

    best = min(times)
    return {
        "n_packets": n_packets,
        "n_lines": atom.n_lines,
        "batch_size": batch,
        "mode": mode,
        "time_s": best,
        "first_time_s": times[0],
        "macro_solve_s": macro_solve_s,
        "tables_build_s": tables_build_s,
        "packets_per_s": n_packets / best,
        "n_steps": int(carry.n_steps),
        "n_events": float(carry.n_events),
        "events_per_s": float(carry.n_events) / best,
        "platform": jax.devices()[0].platform,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--packets", type=int, default=1_000_000)
    ap.add_argument("--batch", type=int, default=131072)
    ap.add_argument("--levels", type=int, default=250)
    ap.add_argument("--jump", type=int, default=80)
    ap.add_argument("--mode", default="scatter")
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument("--chunk", type=int, default=2097152)
    ap.add_argument(
        "--platform", default=None,
        help="force the jax platform (e.g. 'cpu'); FAILS if the resulting "
        "backend does not match (the axon stack ignores JAX_PLATFORMS, so "
        "the override must go through jax.config before backend init)",
    )
    args = ap.parse_args()
    if args.platform:
        import os

        os.environ["JAX_PLATFORMS"] = args.platform
        import jax

        jax.config.update("jax_platforms", args.platform)
    out = bench_transport(
        n_packets=args.packets,
        batch_size=args.batch,
        n_levels=args.levels,
        max_level_jump=args.jump,
        mode=args.mode,
        repeats=args.repeats,
        chunk_size=args.chunk,
    )
    if args.platform and out["platform"] != args.platform:
        raise SystemExit(
            f"requested platform {args.platform!r} but ran on "
            f"{out['platform']!r} — refusing to report a mislabeled anchor"
        )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
