"""pandas-HDFStore-compatible output: reference layout + fixed-format
round-trip through the h5py decoder (interop with TARDIS ecosystem)."""

import numpy as np
import pandas as pd
import pytest

from tardis_tpu.atomic.pandas_hdf import H5PandasStore, read_pandas_hdf
from tardis_tpu.io.pandas_hdf_writer import (
    simulation_to_tardis_hdf,
    write_frame,
    write_series,
)

import h5py


def test_series_frame_roundtrip(tmp_path):
    path = str(tmp_path / "rt.h5")
    s = pd.Series([1.5, 2.5, 3.5], name="value")
    mi = pd.MultiIndex.from_arrays(
        [[1, 1, 2], [0, 1, 0]], names=["atomic_number", "ion_number"]
    )
    df = pd.DataFrame(
        np.arange(6.0).reshape(3, 2), index=mi, columns=[0, 1]
    )
    with h5py.File(path, "w") as f:
        write_series(f, "/t/scalars", s)
        write_frame(f, "/t/ion_number_density", df)
    s2 = read_pandas_hdf(path, "/t/scalars")
    np.testing.assert_allclose(s2.to_numpy(), s.to_numpy())
    df2 = read_pandas_hdf(path, "/t/ion_number_density")
    np.testing.assert_allclose(df2.to_numpy(), df.to_numpy())
    assert list(df2.index.names) == ["atomic_number", "ion_number"]


def test_string_index_roundtrip(tmp_path):
    path = str(tmp_path / "s.h5")
    s = pd.Series({"t_inner": 10000.0, "time_explosion": 1.1e6}, name="value")
    with h5py.File(path, "w") as f:
        write_series(f, "/sim/scalars", s)
    s2 = read_pandas_hdf(path, "/sim/scalars")
    assert s2["t_inner"] == pytest.approx(10000.0)
    assert s2["time_explosion"] == pytest.approx(1.1e6)


@pytest.fixture(scope="module")
def small_sim(atom_data_prepared):
    from tardis_tpu.config.reader import config_from_dict
    from tardis_tpu.simulation.base import Simulation

    from tests.test_plasma import BASE_CONFIG

    cfg = config_from_dict(BASE_CONFIG)
    sim = Simulation.from_config(cfg, atom_data=atom_data_prepared)
    sim.run_convergence()
    sim.run_final()
    return sim


def test_simulation_tardis_layout(small_sim, tmp_path):
    path = str(tmp_path / "sim.h5")
    simulation_to_tardis_hdf(small_sim, path)
    store = H5PandasStore(path)
    keys = set(store.keys())
    # reference hdf_properties layout (simulation/base.py:125 etc.)
    for expect in (
        "/simulation/simulation_state/scalars",
        "/simulation/simulation_state/t_radiative",
        "/simulation/simulation_state/dilution_factor",
        "/simulation/simulation_state/abundance",
        "/simulation/plasma/electron_densities",
        "/simulation/plasma/tau_sobolevs",
        "/simulation/transport/transport_state/output_nu",
        "/simulation/transport/transport_state/j_estimator",
        "/simulation/transport/transport_state/scalars",
        "/simulation/spectrum_solver/spectrum_real_packets/wavelength",
        "/simulation/iterations_t_rad",
        "/simulation/iterations_t_inner",
    ):
        assert expect in keys, f"missing {expect} (have {sorted(keys)[:8]}...)"

    scal = store["/simulation/simulation_state/scalars"]
    assert scal["t_inner"] == pytest.approx(
        float(small_sim.state.t_inner)
    )
    tr = store["/simulation/simulation_state/t_radiative"]
    np.testing.assert_allclose(
        tr.to_numpy(), np.asarray(small_sim.state.t_radiative)
    )
    tau = store["/simulation/plasma/tau_sobolevs"]
    assert tau.shape == (
        small_sim.atom_data.n_lines,
        small_sim.state.no_of_shells,
    )
    out_nu = store["/simulation/transport/transport_state/output_nu"]
    assert (out_nu.to_numpy() > 0).all()
    # per-iteration history frames (TARDISHistory's food)
    itw = store["/simulation/iterations_t_rad"]
    assert itw.shape[1] == small_sim.state.no_of_shells


def test_auto_checkpoint_resume_bitwise(tmp_path, atom_data_prepared):
    """run_convergence(checkpoint_path=...) + resume_simulation continue an
    interrupted run on the exact trajectory of the uninterrupted one (the
    per-iteration RNG is keyed by (seed, iteration) and the plasma state
    is a pure function of {t_rad, W, t_inner})."""
    import copy

    from tardis_tpu.config.reader import config_from_dict
    from tardis_tpu.io.hdf import resume_simulation
    from tardis_tpu.simulation.base import Simulation
    from tests.test_plasma import BASE_CONFIG

    cfg = copy.deepcopy(BASE_CONFIG)
    cfg["montecarlo"] = dict(
        cfg["montecarlo"], no_of_packets=1024, last_no_of_packets=1024,
        iterations=6, seed=77,
    )
    ckpt = str(tmp_path / "run.ckpt.h5")

    # uninterrupted reference run
    sim_full = Simulation.from_config(
        config_from_dict(cfg), atom_data=atom_data_prepared
    )
    sim_full.run_convergence()

    # interrupted run: stop after 3 iterations (simulated crash)
    sim_a = Simulation.from_config(
        config_from_dict(cfg), atom_data=atom_data_prepared
    )
    class _Stop(Exception):
        pass

    def crash(s):
        if s.iterations_executed == 3:
            raise _Stop

    sim_a.add_callback(crash)
    try:
        sim_a.run_convergence(checkpoint_path=ckpt)
    except _Stop:
        pass
    assert sim_a.iterations_executed == 3

    # fresh process analogue: new Simulation, resume, continue
    sim_b = Simulation.from_config(
        config_from_dict(cfg), atom_data=atom_data_prepared
    )
    resume_simulation(sim_b, ckpt)
    assert sim_b.iterations_executed == 3
    sim_b.run_convergence(checkpoint_path=ckpt)
    assert sim_b.iterations_executed == sim_full.iterations_executed

    np.testing.assert_array_equal(
        np.asarray(sim_b.state.t_radiative),
        np.asarray(sim_full.state.t_radiative),
    )
    np.testing.assert_array_equal(
        np.asarray(sim_b.state.dilution_factor),
        np.asarray(sim_full.state.dilution_factor),
    )
    assert sim_b.state.t_inner == sim_full.state.t_inner
