"""Driver benchmark: Monte Carlo transport throughput on the TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "packets/s", "vs_baseline": N}

Baseline note: the reference (numba) cannot run in this image (no numba /
astropy installed), so the CPU anchor is THIS framework's own kernel executed
on the host CPU backend (2 cores) — an optimistic stand-in for the reference's
single-node CPU throughput.  vs_baseline = TPU packets/s / CPU packets/s.
The workload is a tardis_example-scale problem: W7 density, 20 shells,
macroatom line interaction, ~180k-line synthetic atomic dataset.
"""

import json
import os
import subprocess
import sys

BENCH_ARGS = [
    "--packets", "1000000",
    "--batch", "131072",
    "--levels", "200",
    "--jump", "60",
    "--mode", "macroatom",
]
CPU_BENCH_ARGS = [
    "--packets", "50000",
    "--batch", "16384",
    "--levels", "200",
    "--jump", "60",
    "--mode", "macroatom",
]


def _run(platform, args):
    env = dict(os.environ)
    if platform == "cpu":
        env["JAX_PLATFORMS"] = "cpu"
    out = subprocess.run(
        [sys.executable, "-m", "tardis_tpu.benchmarks.transport_bench"] + args,
        capture_output=True,
        text=True,
        env=env,
        cwd=os.path.dirname(os.path.abspath(__file__)),
        timeout=1200,
    )
    if out.returncode != 0:
        raise RuntimeError(f"bench subprocess failed:\n{out.stderr[-2000:]}")
    return json.loads(out.stdout.strip().splitlines()[-1])


def main():
    tpu = _run(os.environ.get("JAX_PLATFORMS", "axon"), BENCH_ARGS)
    try:
        cpu = _run("cpu", CPU_BENCH_ARGS)
        vs = tpu["packets_per_s"] / cpu["packets_per_s"]
    except Exception:
        cpu = None
        vs = -1.0
    print(
        json.dumps(
            {
                "metric": "mc_transport_packets_per_s",
                "value": tpu["packets_per_s"],
                "unit": "packets/s",
                "vs_baseline": vs,
                "detail": {
                    "tpu": tpu,
                    "cpu_anchor": cpu,
                    "baseline_note": (
                        "reference numba cannot run here (no numba); "
                        "anchor is this kernel on 2-core host CPU"
                    ),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
