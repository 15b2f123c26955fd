"""Multi-device sharded transport: results must be identical to single-device
(the TPU analogue of the reference's thread-count invariance, SURVEY.md §4)."""

import jax
import numpy as np
import pytest

from tardis_tpu.config.reader import config_from_dict
from tardis_tpu.model.state import SimulationState
from tardis_tpu.parallel.transport import packet_mesh, run_transport_sharded
from tardis_tpu.plasma.solver import PlasmaSolver
from tardis_tpu.transport.device_state import build_transport_tables
from tardis_tpu.transport.kernel import run_transport
from tardis_tpu.transport.source import sample_blackbody_packets

from tests.test_plasma import BASE_CONFIG


@pytest.fixture(scope="module")
def setup(atom_data_prepared):
    cfg = config_from_dict(BASE_CONFIG)
    state = SimulationState.from_config(cfg)
    ps = PlasmaSolver(atom_data_prepared, state).update(
        state.t_radiative, state.dilution_factor
    )
    tables, static = build_transport_tables(
        state.geometry, ps, atom_data_prepared, "scatter"
    )
    return state, tables, static


def test_eight_devices_available():
    assert len(jax.devices()) == 8


def test_sharded_matches_single_device(setup):
    state, tables, static = setup
    N = 1600
    key = jax.random.key(np.uint32(21))
    pool_mu, pool_nu = sample_blackbody_packets(
        jax.random.fold_in(key, 0), N, state.t_inner
    )
    run_key = jax.random.fold_in(key, 1)

    single = run_transport(
        tables, static, pool_mu, pool_nu, run_key,
        n_packets=N, batch_size=128,
    )
    mesh = packet_mesh()
    sharded = run_transport_sharded(
        tables, static, pool_mu, pool_nu, run_key,
        n_packets=N, batch_size=128, mesh=mesh,
    )

    np.testing.assert_array_equal(
        np.asarray(single.out_status), np.asarray(sharded.out_status)
    )
    np.testing.assert_array_equal(
        np.asarray(single.out_nu), np.asarray(sharded.out_nu)
    )
    np.testing.assert_allclose(
        np.asarray(single.est_j), np.asarray(sharded.est_j), rtol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(single.est_nubar), np.asarray(sharded.est_nubar), rtol=2e-5
    )
    # line-estimator difference arrays: sparse, compare sums and nonzeros
    a = np.asarray(single.jblue_diff, dtype=np.float64)
    b = np.asarray(sharded.jblue_diff, dtype=np.float64)
    np.testing.assert_allclose(a.sum(), b.sum(), atol=1e-4)
    nz = np.abs(a) > 1e-8
    np.testing.assert_allclose(a[nz], b[nz], rtol=5e-4, atol=1e-7)


def test_sharded_all_finish(setup):
    state, tables, static = setup
    N = 800
    key = jax.random.key(np.uint32(33))
    pool_mu, pool_nu = sample_blackbody_packets(
        jax.random.fold_in(key, 0), N, state.t_inner
    )
    mesh = packet_mesh()
    carry = run_transport_sharded(
        tables, static, pool_mu, pool_nu, jax.random.fold_in(key, 1),
        n_packets=N, batch_size=64, mesh=mesh,
    )
    st = np.asarray(carry.out_status)
    assert (st != 0).all()


def test_scaling_harness_runs():
    """Scaling-efficiency harness executes on the virtual mesh and reports
    sane efficiencies (SURVEY.md §7 step 6 analogue)."""
    from tardis_tpu.benchmarks.scaling_bench import run_scaling

    results = run_scaling(
        per_device=512, device_counts=(1, 2), n_levels=6, repeats=1
    )
    assert len(results) == 2
    assert results[0]["efficiency"] == 1.0
    assert results[1]["devices"] == 2
    assert 0.0 < results[1]["efficiency"] <= 1.5


def test_sharded_chunked_tail_poolw_bitwise(setup):
    """Production-parity features of the sharded path (round 3): host-side
    chunking, on-device tail repack, and per-packet weights must all be
    bitwise identical to the single-device reference path."""
    state, tables, static = setup
    N = 1600
    key = jax.random.key(np.uint32(77))
    pool_mu, pool_nu = sample_blackbody_packets(
        jax.random.fold_in(key, 0), N, state.t_inner
    )
    pool_w = 0.5 + jax.random.uniform(jax.random.fold_in(key, 2), (N,))
    run_key = jax.random.fold_in(key, 1)

    single = run_transport(
        tables, static, pool_mu, pool_nu, run_key,
        n_packets=N, batch_size=128, pool_w=pool_w,
    )
    mesh = packet_mesh()
    sharded = run_transport_sharded(
        tables, static, pool_mu, pool_nu, run_key,
        n_packets=N, batch_size=64, mesh=mesh,
        chunk_size=800,  # 2 chunks of 100/device
        tail_batch=16,  # exercises the on-device repack
        pool_w=pool_w,
    )
    np.testing.assert_array_equal(
        np.asarray(single.out_status), np.asarray(sharded.out_status)
    )
    np.testing.assert_array_equal(
        np.asarray(single.out_nu), np.asarray(sharded.out_nu)
    )
    np.testing.assert_array_equal(
        np.asarray(single.out_energy), np.asarray(sharded.out_energy)
    )
    np.testing.assert_allclose(
        np.asarray(single.est_j), np.asarray(sharded.est_j), rtol=2e-5
    )
    a = np.asarray(single.jblue_diff, dtype=np.float64)
    b = np.asarray(sharded.jblue_diff, dtype=np.float64)
    np.testing.assert_allclose(a.sum(), b.sum(), atol=1e-4)


def test_run_iteration_uses_mesh_and_matches_single(atom_data_prepared):
    """TransportSolver.run_iteration selects the sharded path on a multi-
    device mesh (PRODUCTION wiring) and reproduces the single-device result."""
    from tardis_tpu.config.reader import config_from_dict
    from tardis_tpu.transport.solver import TransportSolver

    cfg = config_from_dict(BASE_CONFIG)
    state = SimulationState.from_config(cfg)
    ps = PlasmaSolver(atom_data_prepared, state).update(
        state.t_radiative, state.dilution_factor
    )
    kwargs = dict(
        sim_state=state, plasma_state=ps, atom_data=atom_data_prepared,
        n_packets=1600, seed=42, iteration=0,
    )
    r_multi = TransportSolver(line_interaction_type="scatter").run_iteration(
        **kwargs
    )
    r_single = TransportSolver(
        line_interaction_type="scatter", mesh=None
    ).run_iteration(**kwargs)
    assert len(jax.devices()) == 8  # the auto mesh really was multi-device
    np.testing.assert_array_equal(
        r_multi.output_status, r_single.output_status
    )
    np.testing.assert_array_equal(r_multi.output_nu, r_single.output_nu)
    np.testing.assert_allclose(
        r_multi.j_estimator, r_single.j_estimator, rtol=2e-5
    )
    # zero-mass cells carry f32 cumsum roundoff (~1e-24 here): compare with
    # an atol scaled to the estimator's dynamic range
    scale = np.abs(r_single.j_blue_estimator).max()
    np.testing.assert_allclose(
        r_multi.j_blue_estimator, r_single.j_blue_estimator,
        rtol=5e-4, atol=1e-6 * scale,
    )
