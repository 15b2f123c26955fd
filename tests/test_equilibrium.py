"""Kinetic-equilibrium NLTE solver validation (reference
plasma/equilibrium/: RateMatrix / LevelPopulationSolver /
IonPopulationSolver / ThermalBalanceSolver).

Key physics check: under an undiluted Planck field with t_e = t_rad every
rate pair obeys detailed balance, so the kinetic solution must relax to
Saha--Boltzmann LTE."""

import copy

import numpy as np
import pytest

from tardis_tpu.atomic.synthetic import make_synthetic_atom_data
from tardis_tpu.config.reader import config_from_dict
from tardis_tpu.model.state import SimulationState
from tardis_tpu.plasma import lte
from tardis_tpu.plasma.equilibrium import (
    KineticEquilibriumSolver,
    ThermalBalanceSolver,
)
from tardis_tpu.plasma.solver import PlasmaSolver

from tests.test_plasma import BASE_CONFIG



# full-physics oracle tests: minutes on this 2-core host — run with
# `pytest -m "slow or not slow"` for the complete tier (see pytest.ini)
pytestmark = pytest.mark.slow

@pytest.fixture(scope="module")
def setup():
    cfg = copy.deepcopy(BASE_CONFIG)
    cfg["model"]["abundances"] = {"type": "uniform", "H": 0.9, "Si": 0.1}
    c = config_from_dict(cfg)
    state = SimulationState.from_config(c)
    atom = make_synthetic_atom_data(
        atomic_numbers=(1, 14),
        max_ion_stage=2,
        n_levels=8,
        continuum_species=((1, 0),),
    ).prepare(line_interaction_type="scatter")
    pls = PlasmaSolver(atom, state, link_t_rad_t_electron=1.0)
    return state, atom, pls


def test_lte_recovery(setup):
    """Planck field (w=1), t_e=t_rad: kinetic == Saha-Boltzmann."""
    state, atom, pls = setup
    t_rad = state.t_radiative
    w1 = np.ones_like(t_rad)
    # full Planck mean intensity at every line
    jb = lte.intensity_black_body(
        atom.line_nu[:, None], t_rad[None, :]
    ) * np.ones((1, len(t_rad)))
    ps = pls.update(t_rad, w1, j_blues=None)
    import dataclasses

    ps = dataclasses.replace(ps, w=w1)
    keq = KineticEquilibriumSolver(atom, pls)
    assert keq.elements == [1]
    level_pops, ion_pops, n_e = keq.solve(ps, j_blues=jb)

    em = keq._elem[1]
    # ion ratio vs the LTE plasma solve
    sp_h1 = pls._species_lookup[(1, 0)]
    sp_h2 = pls._species_lookup[(1, 1)]
    r_h1 = pls.species_ion_row[sp_h1]
    r_h2 = pls.species_ion_row[sp_h2]
    lte_ratio = (
        ps.ion_number_density[r_h2] / ps.ion_number_density[r_h1]
    )
    kin_ratio = ion_pops[1][1] / ion_pops[1][0]
    np.testing.assert_allclose(kin_ratio, lte_ratio, rtol=0.08)

    # level Boltzmann ratios within H I
    n = level_pops[1]
    h1_rows = em["rows"][em["stage_of"] == 0]
    e = atom.level_energy[h1_rows]
    g = atom.level_g[h1_rows]
    beta = lte.beta_rad(t_rad)
    k = 3
    expected = (g[k] / g[0]) * np.exp(-(e[k] - e[0]) * beta)
    got = n[k] / n[0]
    np.testing.assert_allclose(got, expected, rtol=0.05)

    # element conservation
    e_idx = em["e_idx"]
    np.testing.assert_allclose(
        level_pops[1].sum(axis=0),
        pls.number_density[e_idx],
        rtol=1e-8,
    )


def test_dilute_field_overionizes_vs_lte(setup):
    """w<1 with photoionization driven by the diluted field: recombination
    (local, t_e) is unchanged while ionization scales with w, so the kinetic
    ion ratio must deviate from the w-free Saha value toward the
    photoionization-dominated balance and n_e must stay positive/finite."""
    state, atom, pls = setup
    t_rad = state.t_radiative
    w = state.dilution_factor  # ~0.1-0.4
    ps = pls.update(t_rad, w)
    keq = KineticEquilibriumSolver(atom, pls)
    level_pops, ion_pops, n_e = keq.solve(ps)
    assert np.isfinite(n_e).all() and (n_e > 0).all()
    kin_ratio = ion_pops[1][1] / np.maximum(ion_pops[1][0], 1e-300)
    assert np.isfinite(kin_ratio).all()
    # populations conserve the element density
    np.testing.assert_allclose(
        level_pops[1].sum(axis=0),
        pls.number_density[keq._elem[1]["e_idx"]],
        rtol=1e-8,
    )
    # state write-back is consistent
    ps2 = keq.apply_to_state(ps, level_pops, ion_pops, n_e)
    np.testing.assert_allclose(ps2.electron_densities, n_e)
    assert np.isfinite(ps2.tau_sobolev).all()
    assert (ps2.tau_sobolev >= 0).all()


def test_thermal_balance_solver(setup):
    """ThermalBalanceSolver returns finite T_e inside the scan bounds using
    dilute-BB analytic estimators."""
    state, atom, pls = setup
    ps = pls.update(state.t_radiative, state.dilution_factor)
    keq = KineticEquilibriumSolver(atom, pls)
    cs = keq.cont.update(ps)

    # analytic stand-in estimators from the dilute-BB field
    from tardis_tpu.plasma.continuum import ContinuumEstimators

    C = atom.photo_ion.n_continua
    S = len(ps.t_rad)
    est = ContinuumEstimators(
        photo_ion=np.maximum(cs.gamma, 0.0),
        stim_recomb=np.maximum(cs.alpha_stim, 0.0),
        bf_heating=np.abs(cs.gamma) * 1e-12,
        stim_recomb_cooling=np.zeros((C, S)),
        photo_ion_statistics=np.ones((C, S)),
        ff_heating=cs.ff_cool_rate * 0.8,
    )
    tb = ThermalBalanceSolver(keq.cont)
    t_e = tb.solve(ps, est, t_e_bounds=(0.5, 1.5), n_grid=11)
    assert np.isfinite(t_e).all()
    assert (t_e >= 0.5 * ps.t_rad - 1).all()
    assert (t_e <= 1.5 * ps.t_rad + 1).all()


def test_thermal_electron_energy_distribution(setup):
    """ThermalElectronEnergyDistribution interchange dataclass (reference
    plasma/electron_energy_distribution/base.py): the kinetic solver
    accepts it and a distribution built from the plasma state reproduces
    the default path."""
    from tardis_tpu.constants import K_B
    from tardis_tpu.plasma.equilibrium import (
        KineticEquilibriumSolver,
        ThermalElectronEnergyDistribution,
    )

    state, atom, pls = setup
    ps = pls.update(state.t_radiative, state.dilution_factor)
    solver = KineticEquilibriumSolver(atom, pls, elements=[1])
    dist = ThermalElectronEnergyDistribution.from_plasma_state(ps)
    np.testing.assert_allclose(dist.energy, 1.5 * K_B * ps.t_electrons)
    np.testing.assert_allclose(dist.number_density,
                               ps.electron_densities)
    lp_a, ip_a, ne_a = solver.solve(ps)
    lp_b, ip_b, ne_b = solver.solve(ps, electron_distribution=dist)
    np.testing.assert_allclose(ne_b, ne_a, rtol=1e-12)
    for z in lp_a:
        np.testing.assert_allclose(lp_b[z], lp_a[z], rtol=1e-12)
