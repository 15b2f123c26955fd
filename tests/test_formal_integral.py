"""Formal-integral spectrum tests.

Analytic check: with no lines and no electron scattering, the formal
integral of a bare photosphere must reproduce the blackbody luminosity
L_nu = 4 pi^2 r_ph^2 B_nu(T) (diluted surface emission), and the full
pipeline must agree with the MC spectra within noise.
"""

import dataclasses

import numpy as np
import pytest

from tardis_tpu.config.reader import config_from_dict
from tardis_tpu.constants import C
from tardis_tpu.model.state import SimulationState
from tardis_tpu.plasma.lte import intensity_black_body
from tardis_tpu.plasma.solver import PlasmaSolver
from tardis_tpu.simulation.base import Simulation
from tests.test_plasma import BASE_CONFIG


def test_bare_photosphere_blackbody():
    """No lines, no e-scatter: L_nu = 4 pi^2 R^2 B_nu."""
    import jax.numpy as jnp

    from tardis_tpu.spectrum.formal_integral import _integrate_rays
    from tardis_tpu.transport.device_state import NU_UNIT

    cfg = config_from_dict(BASE_CONFIG)
    state = SimulationState.from_config(cfg)
    geometry = state.geometry
    ct = C * state.time_explosion
    S = geometry.no_of_shells
    L = 4

    t_inner = 10000.0
    nu_grid = np.linspace(2e14, 2e15, 40)
    n_p = 200
    p_grid = np.linspace(0.0, geometry.r_outer[-1], n_p + 1)[1:]
    i_bb = intensity_black_body(nu_grid, t_inner)

    I_nu_p = _integrate_rays(
        jnp.asarray(nu_grid / NU_UNIT, jnp.float32),
        jnp.asarray(p_grid / ct, jnp.float32),
        jnp.asarray(geometry.r_inner / ct, jnp.float32),
        jnp.asarray(geometry.r_outer / ct, jnp.float32),
        jnp.zeros(S, jnp.float32),  # no e-scatter
        jnp.asarray(-np.linspace(1e9, 4e9, L) / NU_UNIT, jnp.float32),
        jnp.asarray(np.linspace(4e9, 1e9, L) / NU_UNIT, jnp.float32),
        jnp.ones(L * S, jnp.float32),  # exp(-tau) = 1: no line opacity
        jnp.zeros(L * S, jnp.float32),
        jnp.zeros(L * S, jnp.float32),
        jnp.zeros(L * S, jnp.float32),
        jnp.asarray(i_bb, jnp.float32),
        n_shells=S,
        n_lines=L,
        n_p=n_p,
    )
    I_nu_p = np.asarray(I_nu_p, dtype=np.float64)
    dp = (p_grid[1] - p_grid[0]) / ct
    lum = 8.0 * np.pi**2 * np.trapezoid(I_nu_p, dx=dp, axis=1) * ct**2

    # analytic: only rays with p < r_ph carry I = B_nu(nu(1-z0), T);
    # ignoring the small doppler shift, L_nu ≈ 4 pi^2 r_ph^2 B_nu
    r_ph = geometry.r_inner[0]
    expected = 4.0 * np.pi**2 * r_ph**2 * intensity_black_body(nu_grid, t_inner)
    ratio = lum / expected
    # doppler redshift of the photosphere slightly distorts this; few % ok
    assert np.all(np.abs(ratio - 1.0) < 0.1), ratio


@pytest.mark.slow
def test_formal_integral_vs_mc_spectrum(atom_data_prepared):
    cfg = dict(BASE_CONFIG)
    cfg["plasma"] = dict(cfg["plasma"], line_interaction_type="macroatom")
    cfg["montecarlo"] = dict(
        cfg["montecarlo"],
        no_of_packets=20000,
        iterations=3,
        last_no_of_packets=40000,
    )
    cfg["spectrum"] = dict(cfg["spectrum"], num=500)
    sim = Simulation.from_config(config_from_dict(cfg))
    sim.run()
    spec_int = sim.integrate_spectrum()
    sp = sim.spectrum_real
    ratio = spec_int.luminosity / sp.luminosity
    assert 0.7 < ratio < 1.4, ratio


@pytest.fixture(scope="module")
def integ_setup(atom_data_prepared):
    import copy

    cfg = copy.deepcopy(BASE_CONFIG)
    cfg["plasma"]["line_interaction_type"] = "macroatom"
    cfg["montecarlo"]["no_of_packets"] = 3000
    cfg["montecarlo"]["last_no_of_packets"] = 3000
    cfg["montecarlo"]["iterations"] = 1
    sim = Simulation.from_config(
        config_from_dict(cfg), atom_data=atom_data_prepared
    )
    sim.run_convergence()
    sim.run_final()
    return (
        sim.state,
        sim.plasma_state,
        sim.last_transport_result,
        sim.atom_data,
        sim.spectrum_nu_edges,
    )


def test_requirements_check():
    """Mode rejection mirrors the reference's
    check_formal_integral_requirements (formal_integral/base.py:25)."""
    import pytest as _pytest

    from tardis_tpu.spectrum.formal_integral import (
        IntegrationError,
        check_formal_integral_requirements,
    )

    assert check_formal_integral_requirements("macroatom")
    assert check_formal_integral_requirements("downbranch")
    with _pytest.raises(IntegrationError):
        check_formal_integral_requirements("scatter")
    with _pytest.raises(IntegrationError):
        check_formal_integral_requirements("macroatom",
                                           continuum_enabled=True)
    assert not check_formal_integral_requirements("scatter", raises=False)


def test_shell_interpolation_consistency(integ_setup):
    """interpolate_shells refines the radial grid without changing the
    integrated spectrum beyond discretization differences (reference
    interpolate_integrator_quantities)."""
    import numpy as np

    from tardis_tpu.spectrum.formal_integral import FormalIntegralSolver

    sim_state, plasma, result, atom, nu_edges = integ_setup
    base = FormalIntegralSolver(n_points=120, n_impact_parameters=40).solve(
        nu_edges, sim_state, plasma, result, atom
    )
    fine = FormalIntegralSolver(
        n_points=120, n_impact_parameters=40,
        interpolate_shells=3 * sim_state.no_of_shells,
    ).solve(nu_edges, sim_state, plasma, result, atom)
    L_b = float(np.sum(base.luminosity_nu * np.abs(np.diff(nu_edges))))
    L_f = float(np.sum(fine.luminosity_nu * np.abs(np.diff(nu_edges))))
    assert L_f > 0
    assert abs(L_f - L_b) / L_b < 0.15
