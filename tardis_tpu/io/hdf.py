"""HDF5 persistence of simulation results.

Counterpart of the reference's ``HDFWriterMixin``
(/root/reference/tardis/io/hdf_writer_mixin.py:14-330): a recursive dump of
the simulation tree (model state, plasma state, transport estimators,
spectra, per-iteration history) into a pandas HDFStore, compatible in spirit
with the reference's layout (`/simulation/simulation_state/...`).  This is
also the checkpoint format: `load_simulation_state` restores the mutable
radiation-field state {t_rad, W, t_inner, iteration} for resume.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def _store_array(store, path: str, arr):
    arr = np.asarray(arr)
    if arr.ndim <= 1:
        store.put(path, pd.Series(arr))
    else:
        store.put(path, pd.DataFrame(arr))


def _store_scalars(store, path: str, scalars: dict):
    store.put(path, pd.Series(scalars))


def simulation_to_hdf(sim, path: str, name: str = "simulation"):
    """Write a Simulation to an HDF file."""
    with pd.HDFStore(path, "w") as store:
        st = sim.state
        prefix = f"/{name}"
        _store_scalars(
            store,
            f"{prefix}/simulation_state/scalars",
            {
                "time_explosion": st.time_explosion,
                "t_inner": st.t_inner,
                "luminosity_requested": st.luminosity_requested,
                "no_of_shells": st.no_of_shells,
                "iterations_executed": sim.iterations_executed,
                "seed": sim.seed,
            },
        )
        _store_array(store, f"{prefix}/simulation_state/v_inner",
                     st.geometry.v_inner)
        _store_array(store, f"{prefix}/simulation_state/v_outer",
                     st.geometry.v_outer)
        _store_array(store, f"{prefix}/simulation_state/t_radiative",
                     st.t_radiative)
        _store_array(store, f"{prefix}/simulation_state/dilution_factor",
                     st.dilution_factor)
        _store_array(store, f"{prefix}/simulation_state/density",
                     st.composition.density)
        _store_array(
            store,
            f"{prefix}/simulation_state/abundance",
            st.composition.mass_fractions,
        )

        if sim.plasma_state is not None:
            ps = sim.plasma_state
            _store_array(store, f"{prefix}/plasma/electron_densities",
                         ps.electron_densities)
            _store_array(store, f"{prefix}/plasma/t_electrons",
                         ps.t_electrons)
            _store_array(store, f"{prefix}/plasma/tau_sobolev",
                         ps.tau_sobolev)
            _store_array(store, f"{prefix}/plasma/level_number_density",
                         ps.level_number_density)
            _store_array(store, f"{prefix}/plasma/ion_number_density",
                         ps.ion_number_density)

        res = sim.last_transport_result
        if res is not None:
            t = f"{prefix}/transport_state"
            _store_array(store, f"{t}/output_nu", res.output_nu)
            _store_array(store, f"{t}/output_energy", res.output_energy)
            _store_array(store, f"{t}/output_status", res.output_status)
            _store_array(store, f"{t}/j_estimator", res.j_estimator)
            _store_array(store, f"{t}/nu_bar_estimator", res.nu_bar_estimator)
            _store_scalars(
                store,
                f"{t}/scalars",
                {
                    "time_of_simulation": res.time_of_simulation,
                    "n_packets": res.n_packets,
                },
            )

        for label, spec in (
            ("spectrum", sim.spectrum_real),
            ("spectrum_virtual", sim.spectrum_virtual),
            ("spectrum_integrated", sim.spectrum_integrated),
        ):
            if spec is not None:
                _store_array(store, f"{prefix}/{label}/nu_edges",
                             spec.nu_edges)
                _store_array(store, f"{prefix}/{label}/luminosity_nu",
                             spec.luminosity_nu)

        # per-iteration history (analogue of iterations_* in the reference)
        if sim.history:
            hist = sim.history
            _store_array(
                store,
                f"{prefix}/iterations/t_radiative",
                np.stack([h.t_radiative for h in hist]),
            )
            _store_array(
                store,
                f"{prefix}/iterations/dilution_factor",
                np.stack([h.dilution_factor for h in hist]),
            )
            _store_array(
                store,
                f"{prefix}/iterations/t_inner",
                np.array([h.t_inner for h in hist]),
            )
            _store_array(
                store,
                f"{prefix}/iterations/emitted_luminosity",
                np.array([h.emitted_luminosity for h in hist]),
            )


def load_simulation_state(path: str, name: str = "simulation") -> dict:
    """Load the checkpointed radiation-field state for resume."""
    with pd.HDFStore(path, "r") as store:
        scalars = store[f"/{name}/simulation_state/scalars"]
        return {
            "t_inner": float(scalars["t_inner"]),
            "t_radiative": store[
                f"/{name}/simulation_state/t_radiative"
            ].to_numpy(),
            "dilution_factor": store[
                f"/{name}/simulation_state/dilution_factor"
            ].to_numpy(),
            "iterations_executed": int(scalars["iterations_executed"]),
            "seed": int(scalars["seed"]),
        }


def resume_simulation(sim, path: str, name: str = "simulation"):
    """Restore {t_rad, W, t_inner, iteration} into a fresh Simulation
    (the mid-run resume capability the reference lacks, SURVEY.md §5)."""
    ckpt = load_simulation_state(path, name)
    sim.state.t_inner = ckpt["t_inner"]
    sim.state.t_radiative = ckpt["t_radiative"]
    sim.state.dilution_factor = ckpt["dilution_factor"]
    sim.iterations_executed = ckpt["iterations_executed"]
    sim.plasma_state = None
    return sim
