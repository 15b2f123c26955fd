"""Production-scale demonstration run.

Executes the FULL production pipeline at reference-benchmark scale and
beyond — kurucz-like 183k-line list, macroatom interactions, N damped
convergence iterations of `packets` Monte Carlo packets each, then a
final high-statistics iteration with virtual packets and the formal
integral — and prints one JSON line with wall-clock, per-phase costs,
and convergence/sanity figures.

The reference's headline ASV benchmark (`time_run_tardis`,
benchmarks/run_tardis.py) runs 2e5 packets x 5 iterations + 5e5 final;
the default here is 2e6 x 20 + 4e6 final — 40x the iteration work — to
demonstrate production-deployment scale on one chip.

Usage: python -m tardis_tpu.benchmarks.production_run [--packets N]
       [--iterations K] [--final N] [--vpackets V]
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--packets", type=int, default=2_097_152)
    ap.add_argument("--iterations", type=int, default=20)
    ap.add_argument("--final", type=int, default=4_194_304)
    ap.add_argument("--vpackets", type=int, default=2)
    ap.add_argument("--levels", type=int, default=200)
    ap.add_argument("--jump", type=int, default=60)
    ap.add_argument(
        "--checkpoint", default=None,
        help="checkpoint file: written every iteration; if it already "
        "exists the run RESUMES from it (an outer retry loop makes the "
        "run survive accelerator-service restarts)",
    )
    args = ap.parse_args()

    import jax

    from tardis_tpu.benchmarks.transport_bench import build_problem
    from tardis_tpu.simulation.base import Simulation

    t_setup0 = time.time()
    config, state, atom, _ = build_problem(
        args.levels, args.jump, "macroatom",
        mc_overrides={
            "no_of_packets": args.packets,
            "iterations": args.iterations + 1,
            "last_no_of_packets": args.final,
            "no_of_virtual_packets": args.vpackets,
            "batch_size": 131072,
            "tracking": {"track_last_interaction": False},
            "convergence_strategy": {"type": "damped",
                                     "damping_constant": 0.5},
        },
    )
    sim = Simulation.from_config(config, atom_data=atom)
    resumed_from = 0
    if args.checkpoint:
        import os

        from tardis_tpu.io.hdf import resume_simulation

        if os.path.exists(args.checkpoint):
            resume_simulation(sim, args.checkpoint)
            resumed_from = sim.iterations_executed
            print(f"# resuming from iteration {resumed_from}", flush=True)
    setup_s = time.time() - t_setup0

    t0 = time.time()
    sim.run_convergence(checkpoint_path=args.checkpoint)
    convergence_s = time.time() - t0

    t1 = time.time()
    sim.run_final()
    final_s = time.time() - t1

    t2 = time.time()
    spec_int = sim.integrate_spectrum()
    integral_s = time.time() - t2

    t_rad = np.asarray(sim.state.t_radiative, np.float64)
    w = np.asarray(sim.state.dilution_factor, np.float64)
    lum = np.asarray(sim.spectrum_real.luminosity_nu, np.float64)
    total_packets = args.packets * args.iterations + args.final
    # throughput accounting covers only the work THIS process performed:
    # on a resumed run, convergence_s spans (iterations - resumed_from)
    # iterations, so the packet count must match (ADVICE r4: dividing the
    # full workload by the post-resume time inflated the figure)
    run_iterations = max(args.iterations - resumed_from, 1)
    run_packets = args.packets * (args.iterations - resumed_from) + args.final
    emitted = sim.history[-1].emitted_luminosity
    out = {
        "n_lines": atom.n_lines,
        "n_shells": sim.state.no_of_shells,
        "iterations": args.iterations,
        "packets_per_iteration": args.packets,
        "final_packets": args.final,
        "n_vpackets": args.vpackets,
        "total_packets": total_packets,
        "setup_s": round(setup_s, 2),
        "convergence_s": round(convergence_s, 2),
        "s_per_iteration": round(convergence_s / run_iterations, 3),
        "final_iteration_s": round(final_s, 2),
        "formal_integral_s": round(integral_s, 2),
        "total_s": round(convergence_s + final_s + integral_s, 2),
        "resumed_from_iteration": resumed_from,
        "e2e_packets_per_s": round(
            run_packets / (convergence_s + final_s), 1
        ),
        "t_inner": round(float(sim.state.t_inner), 1),
        "t_rad_range": [round(t_rad.min(), 1), round(t_rad.max(), 1)],
        "w_range": [round(w.min(), 4), round(w.max(), 4)],
        "emitted_over_requested": round(
            emitted / sim.state.luminosity_requested, 4
        ),
        "spectra_finite": bool(
            np.isfinite(lum).all()
            and np.isfinite(
                np.asarray(sim.spectrum_virtual.luminosity_nu)
            ).all()
            and np.isfinite(np.asarray(spec_int.luminosity_nu)).all()
        ),
        "platform": jax.devices()[0].platform,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
