"""Gamma-ray transport tests: decay chain, opacities, energy conservation."""

import numpy as np
import pytest

from tardis_tpu.config.reader import config_from_dict
from tardis_tpu.constants import DAY, SIGMA_THOMSON
from tardis_tpu.energy_input import decay
from tardis_tpu.model.state import SimulationState
from tardis_tpu.workflows.high_energy import TARDISHEWorkflow
from tests.test_plasma import BASE_CONFIG


def test_bateman_solution():
    n0 = np.array([1e50])
    ni, co = decay.bateman_ni_co(n0, 0.0)
    np.testing.assert_allclose(ni, n0)
    np.testing.assert_allclose(co, 0.0, atol=1e30)
    # at one Ni half-life, half the Ni remains
    ni, co = decay.bateman_ni_co(n0, decay.T_HALF_NI56)
    np.testing.assert_allclose(ni, 0.5 * n0, rtol=1e-10)
    assert 0 < co[0] < 0.5 * n0[0]
    # decays in [0, inf) = all Ni and all Co
    e_ni, e_co = decay.decay_energy_per_shell(n0, 0.0, 1e10)
    expected_ni = n0[0] * decay.ENERGY_PER_DECAY_NI56 * decay.KEV
    np.testing.assert_allclose(e_ni, expected_ni, rtol=1e-4)


def test_compton_opacity_thomson_limit():
    from tardis_tpu.energy_input.gamma_kernel import compton_opacity

    # at E << m_e c^2 the KN cross-section reduces to Thomson
    chi = float(compton_opacity(0.1, 1.0))
    assert abs(chi / SIGMA_THOMSON - 1.0) < 0.01


def test_kn_table_mean_cos():
    """High-energy Compton is forward-peaked."""
    import jax.numpy as jnp

    from tardis_tpu.energy_input.gamma_kernel import (
        build_kn_table,
        sample_kn_cos,
    )

    log_e, table = build_kn_table()
    u = jnp.linspace(0.01, 0.99, 500)
    cos_lo = np.mean(
        np.asarray(sample_kn_cos(log_e, table, jnp.full(500, 50.0), u))
    )
    cos_hi = np.mean(
        np.asarray(sample_kn_cos(log_e, table, jnp.full(500, 3000.0), u))
    )
    assert cos_hi > cos_lo  # forward peaking grows with energy
    assert abs(cos_lo) < 0.25  # near-isotropic at low energy


@pytest.fixture(scope="module")
def he_state():
    cfg = config_from_dict(BASE_CONFIG)
    return SimulationState.from_config(cfg)


def test_gamma_energy_conservation(he_state):
    wf = TARDISHEWorkflow(he_state, ni56_mass_fraction=0.1, seed=1)
    res = wf.run(n_packets=5000, t_start=5 * DAY, t_end=40 * DAY,
                 n_time_steps=8)
    assert res.total_emitted > 0
    accounted = res.total_escaped + res.total_deposited
    # packets still in flight at t_end carry the remainder
    assert accounted <= res.total_emitted * 1.02
    assert accounted > 0.3 * res.total_emitted
    assert res.total_deposited > 0
    assert res.total_escaped > 0


def test_gamma_thin_limit(he_state):
    """Near-zero density: everything escapes with the source spectrum."""
    import dataclasses

    state = he_state
    thin = dataclasses.replace(
        state,
        composition=dataclasses.replace(
            state.composition,
            density=state.composition.density * 1e-12,
        ),
    )
    wf = TARDISHEWorkflow(thin, ni56_mass_fraction=0.1, seed=2)
    res = wf.run(n_packets=3000, t_start=5 * DAY, t_end=40 * DAY,
                 n_time_steps=6)
    assert res.total_deposited < 0.01 * res.total_emitted
    # escape spectrum shows the 847 keV line of Co56
    centers = 0.5 * (res.energy_bins_kev[:-1] + res.energy_bins_kev[1:])
    peak_bin = np.argmax(res.escape_spectrum)
    assert 700 < centers[peak_bin] < 1000
