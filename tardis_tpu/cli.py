"""Command-line interface.

Counterpart of the reference's ``tardis`` script
(/root/reference/tardis/scripts/tardis: argparse, config -> spectrum file):
run a YAML config, write the spectrum as ASCII and optionally the full HDF.
"""

from __future__ import annotations

import argparse
import logging
import sys

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser(
        prog="tardis-tpu",
        description="TPU-native supernova radiative transfer",
    )
    ap.add_argument("config", help="YAML configuration file")
    ap.add_argument("spectrum", nargs="?", default=None,
                    help="output spectrum file (ASCII: wavelength[AA] L_lambda)")
    ap.add_argument("--hdf", default=None, help="write full results HDF")
    ap.add_argument("--log-level", default="INFO")
    ap.add_argument(
        "--spectrum-kind",
        default="real",
        choices=["real", "virtual", "integrated"],
    )
    args = ap.parse_args(argv)

    logging.basicConfig(
        level=getattr(logging, args.log_level.upper(), logging.INFO),
        format="%(asctime)s %(levelname)s %(name)s: %(message)s",
    )

    from tardis_tpu.simulation.base import run_tardis

    sim = run_tardis(args.config)

    spec = {
        "real": sim.spectrum_real,
        "virtual": sim.spectrum_virtual,
        "integrated": (
            sim.spectrum_integrated
            or (sim.integrate_spectrum()
                if args.spectrum_kind == "integrated" else None)
        ),
    }[args.spectrum_kind]
    if spec is None:
        print(f"spectrum kind '{args.spectrum_kind}' not available",
              file=sys.stderr)
        return 1

    if args.spectrum:
        wl_aa = spec.wavelength * 1e8
        order = np.argsort(wl_aa)
        np.savetxt(
            args.spectrum,
            np.column_stack([wl_aa[order], spec.luminosity_lambda[order]]),
            header="wavelength[AA] luminosity_lambda[erg/s/cm]",
        )
    if args.hdf:
        from tardis_tpu.io.hdf import simulation_to_hdf

        simulation_to_hdf(sim, args.hdf)
    return 0


if __name__ == "__main__":
    sys.exit(main())
