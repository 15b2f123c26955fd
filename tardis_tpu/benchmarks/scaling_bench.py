"""Multi-device scaling-efficiency harness.

Measures packet throughput vs device count for the shard_map transport
(parallel/transport.py) — the TPU-native analogue of measuring thread
scaling in the reference (SURVEY.md §7 step 6).  Weak scaling: the
per-device packet load is fixed, so ideal scaling doubles packets/s per
doubling of devices; efficiency = (throughput_N / throughput_1) / N.

On real hardware run under a multi-chip mesh; in CI this runs on a virtual
CPU mesh (XLA_FLAGS=--xla_force_host_platform_device_count=8), where the
EFFICIENCY number is still meaningful for collective/overlap overheads but
absolute throughput is not.

Usage: python -m tardis_tpu.benchmarks.scaling_bench [--per-device N]
       [--devices 1 2 4 8]
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def run_scaling(per_device=8192, device_counts=(1, 2, 4, 8), mode="scatter",
                n_levels=30, repeats=2):
    import jax

    from tardis_tpu.benchmarks.transport_bench import build_problem
    from tardis_tpu.parallel.transport import packet_mesh, run_transport_sharded
    from tardis_tpu.transport.device_state import build_transport_tables
    from tardis_tpu.transport.source import sample_blackbody_packets

    config, state, atom, plasma = build_problem(n_levels, None, mode)
    tables, static = build_transport_tables(
        state.geometry, plasma, atom, mode
    )
    key = jax.random.key(np.uint32(7))
    devices = jax.devices()
    results = []
    for n_dev in device_counts:
        if n_dev > len(devices):
            continue
        n_packets = per_device * n_dev
        pool_mu, pool_nu = sample_blackbody_packets(
            jax.random.fold_in(key, 0), n_packets, state.t_inner
        )
        mesh = packet_mesh(devices[:n_dev])
        times = []
        for _ in range(repeats + 1):
            t0 = time.time()
            carry = run_transport_sharded(
                tables, static, pool_mu, pool_nu,
                jax.random.fold_in(key, 1),
                n_packets=n_packets,
                batch_size=min(per_device, 16384),
                tail_batch=min(256, per_device // 8),
                mesh=mesh,
            )
            jax.block_until_ready(carry.est_j)
            times.append(time.time() - t0)
        best = min(times[1:])  # skip compile
        # isolated estimator all-reduce cost (the big (L+1)*S*2 line array):
        # in production this collective runs ONCE after the final chunk
        # (parallel/transport.py _final_reduce), so its standalone cost is
        # the total reduce overhead of a whole-iteration run
        from tardis_tpu.parallel.transport import _final_reduce

        red_times = []
        for _ in range(repeats + 1):
            t0 = time.time()
            out = _final_reduce(carry, mesh, static)
            jax.block_until_ready(out.est_j)
            red_times.append(time.time() - t0)
        results.append(
            {
                "devices": n_dev,
                "n_packets": n_packets,
                "time_s": best,
                "packets_per_s": n_packets / best,
                "est_reduce_s": min(red_times[1:]),
            }
        )
    base = results[0]["packets_per_s"] / results[0]["devices"]
    for r in results:
        r["efficiency"] = r["packets_per_s"] / (base * r["devices"])
    return results


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--per-device", type=int, default=8192)
    ap.add_argument("--devices", type=int, nargs="+", default=[1, 2, 4, 8])
    ap.add_argument("--mode", default="scatter")
    args = ap.parse_args()
    out = run_scaling(
        per_device=args.per_device,
        device_counts=tuple(args.devices),
        mode=args.mode,
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
