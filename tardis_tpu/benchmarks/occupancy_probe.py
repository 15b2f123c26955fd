"""Lane-occupancy diagnostics for the lockstep transport loop.

Samples the live-lane count every K steps by running the (bitwise-
invariant) chunked kernel in max_steps slices — the per-step live-lane
fraction the aggregate events/(steps*B) figure averages away (VERDICT r4
item 5).  Modes:

- ``macroatom``: the classic bench problem.  Measured round 5: occupancy
  holds 81-98% while the pool lasts, then a short (~60-step) drain tail;
  aggregate 0.80.
- ``iip``: H-continuum problem.  Measured round 5: the pool exhausts in
  ~100 steps, then ~23% of the batch random-walks for tens of thousands
  of steps — the motivation for run_transport's opt-in drain-tail repack
  ladder (2.7x events/s on this problem, transport_bench --iip).

Usage:  python -m tardis_tpu.benchmarks.occupancy_probe [macroatom|iip]
        [--packets N] [--batch B] [--every K] [--max-steps M]
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def build_tables(mode, n_levels=200, jump=60):
    import jax.numpy as jnp  # noqa: F401

    if mode == "iip":
        from tardis_tpu.atomic.synthetic import make_synthetic_atom_data
        from tardis_tpu.config.reader import config_from_dict
        from tardis_tpu.model.state import SimulationState
        from tardis_tpu.opacities.continuum_macro import (
            solve_continuum_macro_state,
        )
        from tardis_tpu.plasma.continuum import ContinuumSolver
        from tardis_tpu.plasma.solver import PlasmaSolver
        from tardis_tpu.transport.device_state import build_transport_tables

        config = config_from_dict(
            {
                "supernova": {"luminosity_requested": "9.44 log_lsun",
                              "time_explosion": "13 day"},
                "model": {
                    "structure": {
                        "type": "specific",
                        "velocity": {"start": "1.1e4 km/s",
                                     "stop": "20000 km/s", "num": 20},
                        "density": {"type": "branch85_w7"},
                    },
                    "abundances": {"type": "uniform", "H": 0.8, "He": 0.2},
                },
                "plasma": {"line_interaction_type": "macroatom"},
                "montecarlo": {"seed": 23111963, "no_of_packets": 1e5,
                               "iterations": 1},
                "spectrum": {"start": "500 angstrom",
                             "stop": "20000 angstrom", "num": 1000},
            }
        )
        state = SimulationState.from_config(config)
        atom = make_synthetic_atom_data(
            atomic_numbers=(1, 2), max_ion_stage=2, n_levels=10,
            continuum_species=((1, 0),),
        ).prepare(line_interaction_type="macroatom")
        pls = PlasmaSolver(atom, state)
        ps = pls.update(state.t_radiative, state.dilution_factor)
        cs = ContinuumSolver(atom, pls)
        cont = cs.update(ps)
        macro = solve_continuum_macro_state(atom, ps, cont, ps.j_blues)
        tables, static = build_transport_tables(
            state.geometry, ps, atom, "macroatom",
            enable_full_relativity=True,
            continuum_state=cont, continuum_macro=macro,
        )
        return tables, static, state
    from tardis_tpu.benchmarks.transport_bench import build_problem
    from tardis_tpu.opacities.macro_atom_solver import solve_macro_chain
    from tardis_tpu.transport.device_state import (
        NU_UNIT,
        build_transport_tables,
    )

    config, state, atom, ps = build_problem(n_levels, jump, "macroatom")
    mc = solve_macro_chain(
        atom.macro_atom, ps.beta_sobolev, ps.j_blues,
        ps.stimulated_emission_factor, mode="macroatom",
        line_nu_scaled=atom.line_nu / NU_UNIT,
    )
    tables, static = build_transport_tables(
        state.geometry, ps, atom, "macroatom", macro_chain=mc
    )
    return tables, static, state


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("mode", nargs="?", default="macroatom",
                    choices=["macroatom", "iip"])
    ap.add_argument("--packets", type=int, default=None)
    ap.add_argument("--batch", type=int, default=None)
    ap.add_argument("--every", type=int, default=50)
    ap.add_argument("--max-steps", type=int, default=5000)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from tardis_tpu.transport.kernel import _run_chunk_jit, init_carry
    from tardis_tpu.transport.source import sample_blackbody_packets

    tables, static, state = build_tables(args.mode)
    N = args.packets or (65536 if args.mode == "iip" else 2097152)
    B = args.batch or (16384 if args.mode == "iip" else 131072)

    key = jax.random.key(np.uint32(7))
    pool_mu, pool_nu = sample_blackbody_packets(
        jax.random.fold_in(key, 0), N, state.t_inner
    )
    rk = jax.random.fold_in(key, 1)
    carry = init_carry(static, B, N)
    curve = []
    total = 0
    t0 = time.time()
    while True:
        carry = _run_chunk_jit(
            tables, static, pool_mu, pool_nu, rk,
            jnp.asarray(0, jnp.int32), carry,
            n_packets=N, batch_size=B, max_steps=total + args.every,
            tail_threshold=0, n_out=N, drain=True,
        )
        alive = int(np.asarray(carry.alive).sum())
        steps = int(carry.n_steps)
        curve.append({"step": steps, "alive": alive,
                      "fraction": round(alive / B, 4)})
        done = steps < total + args.every or (
            alive == 0 and int(carry.next_unborn) >= N
        )
        total = steps
        if done or steps >= args.max_steps:
            break
    print(json.dumps({
        "mode": args.mode, "n_packets": N, "batch": B,
        "n_steps": int(carry.n_steps),
        "n_events": float(carry.n_events),
        "aggregate_occupancy": float(carry.n_events)
        / (int(carry.n_steps) * B),
        "elapsed_s": round(time.time() - t0, 1),
        "curve": curve,
    }))


if __name__ == "__main__":
    main()
