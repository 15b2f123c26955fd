"""Transport-kernel validation: vs the independent f64 event loop, RNG
determinism across batch sizes, energy bookkeeping, estimator consistency."""

import jax
import numpy as np
import pytest

from tardis_tpu.config.reader import config_from_dict
from tardis_tpu.model.state import SimulationState
from tardis_tpu.plasma.solver import PlasmaSolver
from tardis_tpu.transport.device_state import build_transport_tables
from tardis_tpu.transport.kernel import run_transport
from tardis_tpu.transport.source import sample_blackbody_packets

from tests.reference_transport import HostTables, propagate_packet
from tests.test_plasma import BASE_CONFIG


@pytest.fixture(scope="module")
def setup(atom_data_prepared):
    cfg = config_from_dict(BASE_CONFIG)
    state = SimulationState.from_config(cfg)
    atom = atom_data_prepared
    ps = PlasmaSolver(atom, state).update(
        state.t_radiative, state.dilution_factor
    )
    tables, static = build_transport_tables(state.geometry, ps, atom, "scatter")
    return cfg, state, atom, ps, tables, static


def _run(tables, static, pool_mu, pool_nu, key, n, batch):
    return run_transport(
        tables, static, pool_mu, pool_nu, key,
        n_packets=n, batch_size=batch,
    )


def test_kernel_matches_f64_reference(setup):
    """Per-packet agreement with the independent float64 event loop."""
    cfg, state, atom, ps, tables, static = setup
    N = 150
    base_key = jax.random.key(np.uint32(7))
    src_key = jax.random.fold_in(base_key, 0)
    run_key = jax.random.fold_in(base_key, 1)
    pool_mu, pool_nu = sample_blackbody_packets(src_key, N, state.t_inner)
    carry = _run(tables, static, pool_mu, pool_nu, run_key, N, 64)

    host = HostTables(state.geometry, ps, atom)
    mu_h = np.asarray(pool_mu)
    nu_h = np.asarray(pool_nu)
    ref_status = np.zeros(N, np.int8)
    ref_nu = np.zeros(N)
    est_j = np.zeros(state.no_of_shells)
    est_nubar = np.zeros(state.no_of_shells)
    jblue_direct = {}
    for pid in range(N):
        st, nu, en, (j, nubar, jb, ed) = propagate_packet(
            pid, mu_h[pid], nu_h[pid], host, run_key
        )
        ref_status[pid] = st
        ref_nu[pid] = nu
        est_j += j
        est_nubar += nubar
        for k, v in jb.items():
            jblue_direct[k] = jblue_direct.get(k, 0.0) + v

    ker_status = np.asarray(carry.out_status)
    ker_nu = np.asarray(carry.out_nu)

    # trajectories are chaotic under fp divergence: require large-majority
    # exact-status agreement and close frequencies for agreeing packets
    status_match = ker_status == ref_status
    assert status_match.mean() > 0.9, (
        f"status agreement {status_match.mean()}"
    )
    nu_close = np.abs(ker_nu - ref_nu) / ref_nu < 1e-3
    agree = (status_match & nu_close).mean()
    assert agree > 0.85, f"trajectory agreement {agree}"

    # estimators agree statistically (same physics, fp-divergent paths)
    kj = np.asarray(carry.est_j, dtype=np.float64)
    np.testing.assert_allclose(kj, est_j, rtol=0.05)
    knb = np.asarray(carry.est_nubar, dtype=np.float64)
    np.testing.assert_allclose(knb, est_nubar, rtol=0.05)

    # difference-array j_blue equals direct per-line accumulation
    S = state.no_of_shells
    L = atom.n_lines
    jb_k = np.cumsum(
        np.asarray(carry.jblue_diff, dtype=np.float64).reshape(L + 1, S),
        axis=0,
    )[:L]
    # kernel stores w = E/nu^2 accumulated per range; direct stores E*nu_i/nu^2
    nu_scaled = atom.line_nu / 1.0  # same scaled units as direct
    from tardis_tpu.transport.device_state import NU_UNIT

    jb_kernel_full = jb_k * (atom.line_nu / NU_UNIT)[:, None]
    direct = np.zeros((L, S))
    for (i, s), v in jblue_direct.items():
        direct[i, s] = v
    total_k = jb_kernel_full.sum()
    total_d = direct.sum()
    assert abs(total_k - total_d) / total_d < 0.05
    # cell-wise where meaningful mass exists
    mask = direct > direct.max() * 1e-3
    rel = np.abs(jb_kernel_full[mask] - direct[mask]) / direct[mask]
    assert np.median(rel) < 0.05


def test_batch_size_invariance(setup):
    """Counter-based RNG: identical outputs for any batch size."""
    cfg, state, atom, ps, tables, static = setup
    N = 400
    base_key = jax.random.key(np.uint32(3))
    pool_mu, pool_nu = sample_blackbody_packets(
        jax.random.fold_in(base_key, 0), N, state.t_inner
    )
    run_key = jax.random.fold_in(base_key, 1)
    c1 = _run(tables, static, pool_mu, pool_nu, run_key, N, 64)
    c2 = _run(tables, static, pool_mu, pool_nu, run_key, N, 256)
    np.testing.assert_array_equal(
        np.asarray(c1.out_status), np.asarray(c2.out_status)
    )
    np.testing.assert_array_equal(
        np.asarray(c1.out_nu), np.asarray(c2.out_nu)
    )
    np.testing.assert_array_equal(
        np.asarray(c1.out_energy), np.asarray(c2.out_energy)
    )
    # estimators identical up to f32 summation order
    np.testing.assert_allclose(
        np.asarray(c1.est_j), np.asarray(c2.est_j), rtol=1e-5
    )


def test_all_packets_finish(setup):
    cfg, state, atom, ps, tables, static = setup
    N = 1000
    key = jax.random.key(np.uint32(11))
    pool_mu, pool_nu = sample_blackbody_packets(
        jax.random.fold_in(key, 0), N, state.t_inner
    )
    carry = _run(tables, static, pool_mu, pool_nu,
                 jax.random.fold_in(key, 1), N, 128)
    st = np.asarray(carry.out_status)
    assert (st != 0).all()
    assert not np.asarray(carry.alive).any()
    assert (st == 1).sum() > 0.5 * N  # most packets escape


def test_free_streaming_energy_conservation(setup):
    """No lines + no e-scattering: every packet escapes, redshifted."""
    cfg, state, atom, ps, tables, static = setup
    import dataclasses

    ps0 = dataclasses.replace(
        ps, tau_sobolev=np.zeros_like(ps.tau_sobolev)
    )
    tables0, static0 = build_transport_tables(
        state.geometry, ps0, atom, "scatter",
        disable_electron_scattering=True,
    )
    N = 500
    key = jax.random.key(np.uint32(5))
    pool_mu, pool_nu = sample_blackbody_packets(
        jax.random.fold_in(key, 0), N, state.t_inner
    )
    carry = _run(tables0, static0, pool_mu, pool_nu,
                 jax.random.fold_in(key, 1), N, 128)
    st = np.asarray(carry.out_status)
    assert (st == 1).all()  # all emitted
    # free streaming: lab-frame nu and energy unchanged from birth
    inv_dop = 1.0 / (
        1.0 - np.asarray(pool_mu) * float(tables0.r_inner[0])
    )
    np.testing.assert_allclose(
        np.asarray(carry.out_nu), np.asarray(pool_nu) * inv_dop, rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(carry.out_energy), inv_dop, rtol=1e-5
    )


def test_thomson_only_redshifts_spectrum(setup):
    """Pure electron scattering thermalizes direction but conserves
    comoving-frame statistics; all packets still finish."""
    cfg, state, atom, ps, tables, static = setup
    import dataclasses

    ps0 = dataclasses.replace(ps, tau_sobolev=np.zeros_like(ps.tau_sobolev))
    tables0, static0 = build_transport_tables(
        state.geometry, ps0, atom, "scatter"
    )
    N = 500
    key = jax.random.key(np.uint32(9))
    pool_mu, pool_nu = sample_blackbody_packets(
        jax.random.fold_in(key, 0), N, state.t_inner
    )
    carry = _run(tables0, static0, pool_mu, pool_nu,
                 jax.random.fold_in(key, 1), N, 128)
    st = np.asarray(carry.out_status)
    assert (st != 0).all()
    assert (st == 2).sum() > 0  # some backscattered into the core


def test_full_relativity_mode(setup):
    """Full-relativity kernel runs and matches partial relativity to O(beta)."""
    cfg, state, atom, ps, _, _ = setup
    from tardis_tpu.transport.device_state import build_transport_tables

    tables_fr, static_fr = build_transport_tables(
        state.geometry, ps, atom, "scatter", enable_full_relativity=True
    )
    N = 400
    key = jax.random.key(np.uint32(17))
    pool_mu, pool_nu = sample_blackbody_packets(
        jax.random.fold_in(key, 0), N, state.t_inner
    )
    carry = _run(tables_fr, static_fr, pool_mu, pool_nu,
                 jax.random.fold_in(key, 1), N, 128)
    st = np.asarray(carry.out_status)
    assert (st != 0).all()
    # beta ~ 0.04-0.07: escaped fraction should agree with partial
    # relativity within a few percent
    tables_pr, static_pr = build_transport_tables(
        state.geometry, ps, atom, "scatter"
    )
    carry_pr = _run(tables_pr, static_pr, pool_mu, pool_nu,
                    jax.random.fold_in(key, 1), N, 128)
    frac_fr = (st == 1).mean()
    frac_pr = (np.asarray(carry_pr.out_status) == 1).mean()
    assert abs(frac_fr - frac_pr) < 0.1


def test_full_tracker_and_reflective_boundary(setup):
    cfg, state, atom, ps, tables, static = setup
    N, K = 200, 16
    st_track = static._replace(track_rpacket_length=K,
                               inner_boundary_albedo=0.0)
    key = jax.random.key(np.uint32(23))
    pool_mu, pool_nu = sample_blackbody_packets(
        jax.random.fold_in(key, 0), N, state.t_inner
    )
    carry = _run(tables, st_track, pool_mu, pool_nu,
                 jax.random.fold_in(key, 1), N, 64)
    tr = np.asarray(carry.tr_packed).reshape(N, K, 6)
    tr_type = tr[:, :, 4]
    tr_r = tr[:, :, 0]
    # every packet logged at least its first event
    assert (tr_type[:, 0] != 0).all()
    assert (tr_r[tr_type != 0] > 0).all()

    # reflective boundary with albedo=1: nothing is reabsorbed
    st_refl = static._replace(inner_boundary_albedo=1.0)
    carry2 = _run(tables, st_refl, pool_mu, pool_nu,
                  jax.random.fold_in(key, 1), N, 64)
    st2 = np.asarray(carry2.out_status)
    assert (st2 == 2).sum() == 0
    assert (st2 == 1).all()


def test_tail_phase_bitwise_identical(setup):
    """Two-phase tail optimization must not change any output bit."""
    cfg, state, atom, ps, tables, static = setup
    N = 600
    key = jax.random.key(np.uint32(41))
    pool_mu, pool_nu = sample_blackbody_packets(
        jax.random.fold_in(key, 0), N, state.t_inner
    )
    rk = jax.random.fold_in(key, 1)
    c_plain = run_transport(tables, static, pool_mu, pool_nu, rk,
                            n_packets=N, batch_size=256)
    c_tail = run_transport(tables, static, pool_mu, pool_nu, rk,
                           n_packets=N, batch_size=256, tail_batch=32)
    np.testing.assert_array_equal(
        np.asarray(c_plain.out_status), np.asarray(c_tail.out_status)
    )
    np.testing.assert_array_equal(
        np.asarray(c_plain.out_nu), np.asarray(c_tail.out_nu)
    )
    np.testing.assert_allclose(
        np.asarray(c_plain.est_j), np.asarray(c_tail.est_j), rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(c_plain.jblue_diff), np.asarray(c_tail.jblue_diff),
        rtol=1e-5, atol=1e-7,
    )


def test_chunked_pool_bitwise_identical(setup):
    """Host-side pool chunking must not change any output bit."""
    cfg, state, atom, ps, tables, static = setup
    N = 700
    key = jax.random.key(np.uint32(43))
    pool_mu, pool_nu = sample_blackbody_packets(
        jax.random.fold_in(key, 0), N, state.t_inner
    )
    rk = jax.random.fold_in(key, 1)
    c_plain = run_transport(tables, static, pool_mu, pool_nu, rk,
                            n_packets=N, batch_size=128, chunk_size=0)
    c_chunk = run_transport(tables, static, pool_mu, pool_nu, rk,
                            n_packets=N, batch_size=128, chunk_size=256)
    np.testing.assert_array_equal(
        np.asarray(c_plain.out_status), np.asarray(c_chunk.out_status)
    )
    np.testing.assert_array_equal(
        np.asarray(c_plain.out_nu), np.asarray(c_chunk.out_nu)
    )
    np.testing.assert_allclose(
        np.asarray(c_plain.est_j), np.asarray(c_chunk.est_j), rtol=1e-5
    )


def test_tangential_boundary_packet_terminates(setup):
    """mu == 0.0 exactly ON a shell boundary must graze OUTWARD and
    terminate.  Under f32 a scatter can produce this state; with the old
    `mu <= 0` inner-boundary branch it alternated zero-distance
    inner/outer crossings forever (the immortal lane that crashed the
    20-iteration production run), so this is the direct regression
    probe: drive the trap state through transport_loop and assert the
    lane dies in a bounded number of steps."""
    import jax.numpy as jnp

    from tardis_tpu.transport.kernel import (
        init_carry,
        transport_loop,
    )

    cfg, state, atom, ps, tables, static = setup
    # craft a lane sitting exactly on the shell-2/3 boundary with mu = 0
    B = 8
    carry = init_carry(static, B, B)
    r_b = tables.r_outer[2]  # == r_inner[3] in kernel units
    nu0 = jnp.full(B, float(-tables.neg_line_nu[10]) * 1.001, jnp.float32)
    carry = carry._replace(
        r=jnp.full(B, r_b, jnp.float32),
        mu=jnp.zeros(B, jnp.float32),
        nu=nu0,
        energy=jnp.ones(B, jnp.float32),
        shell=jnp.full(B, 2, jnp.int32),
        next_line=jnp.full(B, 11, jnp.int32),
        pkt_id=jnp.arange(B, dtype=jnp.int32),
        alive=jnp.ones(B, bool),
        next_unborn=jnp.asarray(B, jnp.int32),  # pool exhausted
    )
    key = jax.random.key(np.uint32(3))
    pool_mu = jnp.zeros(B, jnp.float32)
    pool_nu = nu0
    out = transport_loop(
        tables, static, pool_mu, pool_nu, key,
        n_packets=B, batch_size=B, max_steps=3000, carry0=carry,
    )
    alive = np.asarray(out.alive)
    assert not alive.any(), (
        f"{alive.sum()} tangential-boundary lanes still alive after 3000 "
        "steps (immortal-lane regression)"
    )
