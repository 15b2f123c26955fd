"""Nonhomologous-mode transport validation.

Strategy (mirrors the reference's own default construction: its
NonhomologousTARDISWorkflow initialises the nonhomologous geometry with the
homologous law r = v*t, workflows/nonhomologous_tardis_workflow.py:68-79):

1. A homologous velocity law run through the nonhomologous kernel must
   reproduce the classic kernel packet-for-packet (m~=1, q=0 collapses
   beta_los(x) to x).
2. The resonance equation beta_los(x) = 1 - nu_line/nu_lab must match the
   reference's depressed-quartic formulation
   (transport/geometry/calculate_distances.py:116-195).
3. Aggressive mixed-sign-gradient profiles must stay finite, conserve
   packet accounting, and terminate.
4. The end-to-end workflow must converge and produce a spectrum.
"""

import jax
import numpy as np
import pytest

from tardis_tpu.config.reader import config_from_dict
from tardis_tpu.model.geometry import NonhomologousRadial1DGeometry
from tardis_tpu.model.state import SimulationState
from tardis_tpu.opacities.macro_atom_solver import solve_macro_state
from tardis_tpu.plasma.solver import PlasmaSolver
from tardis_tpu.transport.device_state import build_transport_tables
from tardis_tpu.transport.kernel import run_transport
from tardis_tpu.transport.nonhomologous import (
    build_nonhom_tables,
    nonhomologous_plasma_state,
    run_nonhom_transport,
)
from tardis_tpu.transport.source import sample_blackbody_packets

from tests.test_plasma import BASE_CONFIG


@pytest.fixture(scope="module")
def setup(atom_data_prepared):
    cfg = config_from_dict(BASE_CONFIG)
    state = SimulationState.from_config(cfg)
    atom = atom_data_prepared
    ps = PlasmaSolver(atom, state).update(
        state.t_radiative, state.dilution_factor
    )
    return cfg, state, atom, ps


def test_homologous_law_matches_classic_kernel(setup):
    """m~=1, q=0: the nonhomologous kernel must reproduce the classic one."""
    cfg, state, atom, ps = setup
    n, batch = 2048, 512
    key = jax.random.key(np.uint32(7))
    pool_mu, pool_nu = sample_blackbody_packets(
        jax.random.fold_in(key, 0), n, state.t_inner
    )
    run_key = jax.random.fold_in(key, 1)

    tables_h, static_h = build_transport_tables(
        state.geometry, ps, atom, "scatter"
    )
    c_h = run_transport(
        tables_h, static_h, pool_mu, pool_nu, run_key,
        n_packets=n, batch_size=batch,
    )

    geom = NonhomologousRadial1DGeometry.from_homologous(state.geometry)
    ps_nh = nonhomologous_plasma_state(ps, geom)
    # tau must be unchanged for the homologous law (dv/dr = 1/t_exp)
    np.testing.assert_allclose(
        ps_nh.tau_sobolev, ps.tau_sobolev, rtol=1e-7
    )
    t_nh, s_nh = build_nonhom_tables(geom, ps_nh, atom, "scatter")
    c_n = run_nonhom_transport(
        t_nh, s_nh, pool_mu, pool_nu, run_key,
        n_packets=n, batch_size=batch, max_steps=20000,
    )

    sh = np.asarray(c_h.out_status)
    sn = np.asarray(c_n.out_status)
    # same RNG stream, same physics -> near-identical event histories; the
    # two kernels use different (but equivalent) search implementations, so
    # an occasional near-tie event may resolve differently (fp chaos)
    assert (sh == sn).mean() > 0.999
    nu_h = np.asarray(c_h.out_nu)
    nu_n = np.asarray(c_n.out_nu)
    traj_same = (sh == sn) & (
        np.abs(nu_h - nu_n) <= 5e-6 * np.maximum(nu_h, 1e-6)
    )
    assert traj_same.mean() > 0.995, f"trajectory agreement {traj_same.mean()}"
    np.testing.assert_allclose(
        np.asarray(c_h.out_energy)[traj_same],
        np.asarray(c_n.out_energy)[traj_same],
        rtol=5e-6,
    )
    np.testing.assert_allclose(
        np.asarray(c_h.est_j), np.asarray(c_n.est_j), rtol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(c_h.est_nubar), np.asarray(c_n.est_nubar), rtol=1e-3
    )
    jb_h = np.asarray(c_h.jblue_diff)
    jb_n = np.asarray(c_n.jblue_diff)
    S = s_nh.n_shells
    cum_h = np.cumsum(jb_h.reshape(-1, S), axis=0)
    cum_n = np.cumsum(jb_n.reshape(-1, S), axis=0)
    # the ~0.05% fp-chaotic trajectories (different-but-equivalent searches
    # resolving near-ties differently) bound the estimator difference to a
    # couple of single-packet contributions
    d = np.abs(cum_h - cum_n)
    assert d.max() <= 1e-2 * np.abs(cum_h).max()
    assert np.quantile(d, 0.999) <= 1e-3 * np.abs(cum_h).max()


def test_resonance_equation_matches_reference_quartic():
    """beta_los(x) = n is algebraically the reference's quartic:

    a x^4 + b x^3 + c x^2 + d x + e = 0 with a=m^2, b=-2nm,
    c = n^2 + m^2 p^2 - q^2, d = -2nm p^2, e = n^2 p^2 in scaled units
    (reference calculate_distance_line_nonhomologous,
    transport/geometry/calculate_distances.py:160-170 after
    non-dimensionalisation).  Verify the bisection root of beta_los
    coincides with a positive real quartic root for random shell states.
    """
    rng = np.random.default_rng(0)
    checked = 0
    for _ in range(300):
        r = rng.uniform(0.02, 0.06)
        mu = rng.uniform(-1.0, 1.0)
        m = rng.uniform(-30.0, 30.0)
        q = rng.uniform(-0.02, 0.02)
        d_b = rng.uniform(1e-4, 0.02)
        x0 = mu * r
        xb = x0 + d_b
        p2 = r * r * (1.0 - mu * mu)

        def beta_los(x):
            return m * x + q * x / np.sqrt(p2 + x * x)

        b0, b1 = beta_los(x0), beta_los(xb)
        if abs(b1 - b0) < 1e-9:
            continue
        # pick a resonance strictly inside the chord's velocity range
        f = rng.uniform(0.2, 0.8)
        n = b0 + f * (b1 - b0)

        # bisection (the kernel's formulation, f64 here)
        lo, hi = x0, xb
        s0 = -1.0 if b1 > b0 else 1.0
        for _ in range(80):
            mid = 0.5 * (lo + hi)
            if (beta_los(mid) - n) * s0 > 0:
                lo = mid
            else:
                hi = mid
        x_bis = 0.5 * (lo + hi)

        # reference quartic
        coeffs = [
            m * m,
            -2.0 * n * m,
            n * n + m * m * p2 - q * q,
            -2.0 * n * m * p2,
            n * n * p2,
        ]
        roots = np.roots(coeffs)
        real = roots[np.abs(roots.imag) < 1e-8].real
        assert len(real) > 0
        assert np.abs(real - x_bis).min() < 1e-6 * max(abs(x_bis), 1e-3)
        checked += 1
    assert checked > 200


def test_mixed_gradient_profile_is_robust(setup):
    """Oscillating velocity law with blueshifting shells: all packets
    terminate; estimators stay finite and non-negative."""
    cfg, state, atom, ps = setup
    g = state.geometry
    S = g.no_of_shells
    rng = np.random.default_rng(3)
    pert = 1.0 + 0.35 * np.sin(np.arange(S) * 1.7)
    pert += 0.1 * rng.standard_normal(S)
    geom = NonhomologousRadial1DGeometry(
        _r_inner=g.r_inner.copy(),
        _r_outer=g.r_outer.copy(),
        v_inner=g.v_inner * pert,
        v_outer=g.v_outer * np.roll(pert, -1),
        time_explosion=g.time_explosion,
    )
    m_scaled = geom.velocity_gradient * g.time_explosion
    assert (m_scaled < 0).any(), "profile must contain blueshifting shells"

    ps_nh = nonhomologous_plasma_state(ps, geom)
    assert (ps_nh.tau_sobolev >= 0).all()
    macro_state = solve_macro_state(
        atom.macro_atom, ps_nh.beta_sobolev, ps_nh.j_blues,
        ps_nh.stimulated_emission_factor,
    )
    tables, static = build_nonhom_tables(
        geom, ps_nh, atom, "macroatom", macro_state=macro_state
    )
    n, batch = 1024, 256
    key = jax.random.key(np.uint32(11))
    pool_mu, pool_nu = sample_blackbody_packets(
        jax.random.fold_in(key, 0), n, state.t_inner
    )
    c = run_nonhom_transport(
        tables, static, pool_mu, pool_nu, jax.random.fold_in(key, 1),
        n_packets=n, batch_size=batch, max_steps=60000,
    )
    assert int(np.asarray(c.alive).sum()) == 0
    # every packet emitted or reabsorbed
    assert (np.asarray(c.out_status) > 0).all()
    assert np.isfinite(np.asarray(c.out_packed)).all()
    assert np.isfinite(np.asarray(c.est_j)).all()
    assert (np.asarray(c.est_j) > 0).all()
    jb = np.cumsum(
        np.asarray(c.jblue_diff).reshape(-1, static.n_shells), axis=0
    )[:-1]
    assert np.isfinite(jb).all()
    # diff-array reconstruction must not produce significant negatives
    assert (jb < -1e-5 * np.abs(jb).max()).sum() == 0
    # blueward (reversed-walk) crossings must have produced line estimators
    assert (np.abs(jb).sum(axis=1) > 0).sum() > 100


def test_nonhomologous_workflow_end_to_end(atom_data_prepared):
    from tardis_tpu.workflows.nonhomologous import NonhomologousTARDISWorkflow

    from tests.test_plasma import BASE_CONFIG

    cfg = dict(BASE_CONFIG)
    cfg = config_from_dict(
        {
            **{k: v for k, v in BASE_CONFIG.items()},
            "montecarlo": {
                **BASE_CONFIG["montecarlo"],
                "no_of_packets": 2048,
                "last_no_of_packets": 4096,
                "iterations": 3,
                "no_of_virtual_packets": 0,
            },
        }
    )
    wf = NonhomologousTARDISWorkflow(
        cfg, atom_data=atom_data_prepared, show_progress_bars=False
    )
    assert isinstance(wf.geometry, NonhomologousRadial1DGeometry)
    # perturb the velocity law away from homology before running
    S = wf.geometry.no_of_shells
    wf.geometry.v_inner = wf.geometry.v_inner * (
        1.0 + 0.1 * np.sin(np.arange(S))
    )
    wf.geometry.v_outer = wf.geometry.v_outer * (
        1.0 + 0.1 * np.sin(np.arange(S) + 1.0)
    )
    wf.run()
    assert wf.completed
    spec = wf.sim.spectrum_real
    lum = np.asarray(spec.luminosity_nu)
    assert np.isfinite(lum).all() and lum.sum() > 0
    t_rad = wf.sim.state.t_radiative
    assert np.isfinite(t_rad).all() and (t_rad > 1000).all()
