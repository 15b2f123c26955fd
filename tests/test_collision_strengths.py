"""Tabulated collision strengths (YgData analogue): loader, NLTE usage,
divergence from the van Regemorter approximation (VERDICT round-1 item 9)."""

import numpy as np
import pytest

from tardis_tpu.atomic.synthetic import make_synthetic_atom_data
from tardis_tpu.plasma.nlte import (
    BETA_COLL,
    interp_yg,
    nlte_level_boltzmann_factor,
)


@pytest.fixture(scope="module")
def atom_coll():
    return make_synthetic_atom_data(
        n_levels=8, collision_species=((14, 1),)
    ).prepare(selected_atoms=[8, 12, 14, 16, 18, 20],
              line_interaction_type="scatter")


def test_collision_data_built_and_selected(atom_coll):
    coll = atom_coll.collision
    assert coll is not None and len(coll) > 0
    # pairs are within Si II
    assert (atom_coll.level_z[coll.lower_flat] == 14).all()
    assert (atom_coll.level_ion[coll.lower_flat] == 1).all()
    assert coll.yg.shape == (len(coll), len(coll.temperatures))


def test_select_atoms_drops_collision_pairs():
    atom = make_synthetic_atom_data(
        n_levels=8, collision_species=((14, 1),)
    )
    sub = atom.select_atoms([8, 16])  # Si excluded
    assert sub.collision is None or len(sub.collision) == 0


def test_interp_yg_linear(atom_coll):
    coll = atom_coll.collision
    t = np.array([coll.temperatures[0], 7500.0, coll.temperatures[-1]])
    yg = interp_yg(coll, t)
    np.testing.assert_allclose(yg[:, 0], coll.yg[:, 0])
    np.testing.assert_allclose(yg[:, -1], coll.yg[:, -1])
    # 7500 between 5000 and 10000 grid points
    expect = coll.yg[:, 1] + (coll.yg[:, 2] - coll.yg[:, 1]) * 0.5
    np.testing.assert_allclose(yg[:, 1], expect)


def test_beta_coll_value():
    # BETA_COLL = (h^4/(8 k_B m_e^3 pi^3))^0.5 ~ 8.63e-6 cgs
    assert BETA_COLL == pytest.approx(8.63e-6, rel=2e-3)


def test_nlte_tabulated_vs_approximate_diverge(atom_coll):
    """NLTE level populations with tabulated strengths differ from the
    van Regemorter-only solution in the collision-dominated regime and the
    difference grows with n_e (collisions matter more)."""
    S = 4
    t_rad = np.full(S, 9000.0)
    w = np.full(S, 0.3)
    j_blues = np.zeros((atom_coll.n_lines, S))  # coronal-ish: collisions rule
    t_e = 0.9 * t_rad

    atom_no_coll = make_synthetic_atom_data(n_levels=8).prepare(
        selected_atoms=[8, 12, 14, 16, 18, 20],
        line_interaction_type="scatter",
    )

    for n_e_val, min_dev in ((1e6, 0.0), (1e10, 0.01)):
        n_e = np.full(S, n_e_val)
        _, bf_tab = nlte_level_boltzmann_factor(
            atom_coll, (14, 1), t_rad, w, j_blues,
            electron_densities=n_e, t_electrons=t_e,
        )
        _, bf_vr = nlte_level_boltzmann_factor(
            atom_no_coll, (14, 1), t_rad, w, j_blues,
            electron_densities=n_e, t_electrons=t_e,
        )
        rel = np.abs(bf_tab - bf_vr) / np.maximum(bf_vr, 1e-300)
        if n_e_val >= 1e10:
            assert rel.max() > min_dev, (
                f"tabulated rates had no effect at n_e={n_e_val}"
            )
        assert np.isfinite(bf_tab).all() and (bf_tab > 0).all()


def test_hdf_roundtrip_collision(tmp_path):
    """collision_data written in pandas layout loads back through the
    carsus HDF loader."""
    import pandas as pd

    import h5py

    from tardis_tpu.atomic.hdf_loader import atom_data_from_hdf
    from tardis_tpu.io.pandas_hdf_writer import write_frame, write_series

    atom = make_synthetic_atom_data(
        atomic_numbers=(14,), n_levels=4, collision_species=((14, 0),)
    )
    path = str(tmp_path / "atom.h5")
    lv = pd.DataFrame(
        {
            "atomic_number": atom.level_z,
            "ion_number": atom.level_ion,
            "level_number": atom.level_number,
            "energy": atom.level_energy / 1.602176634e-12,
            "g": atom.level_g,
            "metastable": atom.level_meta,
        }
    )
    ln = pd.DataFrame(
        {
            "atomic_number": atom.line_z,
            "ion_number": atom.line_ion,
            "level_number_lower": atom.level_number[atom.line_lower_idx],
            "level_number_upper": atom.level_number[atom.line_upper_idx],
            "nu": atom.line_nu,
            "f_lu": atom.line_f_lu,
        }
    )
    co = atom.collision
    cd = pd.DataFrame(
        {
            "atomic_number": atom.level_z[co.lower_flat],
            "ion_number": atom.level_ion[co.lower_flat],
            "level_number_lower": atom.level_number[co.lower_flat],
            "level_number_upper": atom.level_number[co.upper_flat],
            **{f"t{k}": co.yg[:, k] for k in range(co.yg.shape[1])},
        }
    )
    with h5py.File(path, "w") as f:
        write_frame(
            f, "/atom_data",
            pd.DataFrame({"atomic_number": atom.atomic_numbers,
                          "mass": atom.masses / 1.6605390666e-24}),
        )
        write_frame(
            f, "/ionization_data",
            pd.DataFrame({"atomic_number": atom.ionization_z,
                          "ion_number": atom.ionization_ion,
                          "ionization_energy":
                              atom.ionization_energy / 1.602176634e-12}),
        )
        write_frame(f, "/levels_data", lv)
        write_frame(f, "/lines_data", ln)
        write_frame(f, "/collision_data", cd)
        write_series(
            f, "/collision_data_temperatures", pd.Series(co.temperatures)
        )
    loaded = atom_data_from_hdf(path)
    assert loaded.collision is not None
    assert len(loaded.collision) == len(co)
    np.testing.assert_allclose(loaded.collision.temperatures, co.temperatures)
    np.testing.assert_allclose(loaded.collision.yg, co.yg)
    # pair endpoints survive the flat-index round trip
    np.testing.assert_array_equal(
        loaded.level_number[loaded.collision.lower_flat],
        atom.level_number[co.lower_flat],
    )


def test_hdf_loader_photoionization_and_two_photon(tmp_path):
    """carsus-layout photoionization_data and two_photon_data round-trip
    through the h5py writer into the CSR PhotoIonizationData / TwoPhotonData
    structures (reference AtomData carries both, io/atom_data/base.py:93-104)."""
    import h5py
    import pandas as pd

    from tardis_tpu.atomic.hdf_loader import atom_data_from_hdf
    from tardis_tpu.io.pandas_hdf_writer import write_frame, write_series

    atom = make_synthetic_atom_data(
        atomic_numbers=(1, 2), max_ion_stage=2, n_levels=4,
        continuum_species=((1, 0),),
    )
    pi = atom.photo_ion
    assert pi is not None
    path = str(tmp_path / "atom_pi.h5")
    lv = pd.DataFrame(
        {
            "atomic_number": atom.level_z,
            "ion_number": atom.level_ion,
            "level_number": atom.level_number,
            "energy": atom.level_energy / 1.602176634e-12,
            "g": atom.level_g,
            "metastable": atom.level_meta,
        }
    )
    ln = pd.DataFrame(
        {
            "atomic_number": atom.line_z,
            "ion_number": atom.line_ion,
            "level_number_lower": atom.level_number[atom.line_lower_idx],
            "level_number_upper": atom.level_number[atom.line_upper_idx],
            "nu": atom.line_nu,
            "f_lu": atom.line_f_lu,
        }
    )
    # carsus photoionization_data layout: one row per grid point
    blocks = np.repeat(
        np.arange(pi.n_continua), np.diff(pi.block_references)
    )
    pid = pd.DataFrame(
        {
            "atomic_number": pi.cont_z[blocks],
            "ion_number": pi.cont_ion[blocks],
            "level_number": pi.cont_level[blocks],
            "nu": pi.nu,
            "x_sect": pi.x_sect,
        }
    )
    tp = atom.two_photon
    tpd = pd.DataFrame(
        {
            "atomic_number": tp.z,
            "ion_number": tp.ion,
            "level_number_lower": tp.level_lower,
            "level_number_upper": tp.level_upper,
            "A_ul": tp.A_ul,
            "nu0": tp.nu0,
            "alpha": tp.alpha,
            "beta": tp.beta,
            "gamma": tp.gamma,
        }
    )
    with h5py.File(path, "w") as f:
        write_frame(
            f, "/atom_data",
            pd.DataFrame({"atomic_number": atom.atomic_numbers,
                          "mass": atom.masses / 1.6605390666e-24}),
        )
        write_frame(
            f, "/ionization_data",
            pd.DataFrame({"atomic_number": atom.ionization_z,
                          "ion_number": atom.ionization_ion,
                          "ionization_energy":
                              atom.ionization_energy / 1.602176634e-12}),
        )
        write_frame(f, "/levels_data", lv)
        write_frame(f, "/lines_data", ln)
        write_frame(f, "/photoionization_data", pid)
        write_frame(f, "/two_photon_data", tpd)

    loaded = atom_data_from_hdf(path)
    lp = loaded.photo_ion
    assert lp is not None and lp.n_continua == pi.n_continua
    # threshold-descending continuum order preserved
    thr = lp.nu[lp.block_references[:-1]]
    assert np.all(np.diff(thr) <= 0)
    np.testing.assert_allclose(np.sort(lp.nu), np.sort(pi.nu))
    np.testing.assert_allclose(
        lp.x_sect[lp.block_references[0]:lp.block_references[1]],
        pi.x_sect[pi.block_references[0]:pi.block_references[1]],
    )
    # flat level indices resolve to the right (z, ion, level)
    np.testing.assert_array_equal(
        loaded.level_number[lp.level_flat_idx], lp.cont_level
    )
    ltp = loaded.two_photon
    assert ltp is not None
    np.testing.assert_allclose(ltp.A_ul, tp.A_ul)
    np.testing.assert_allclose(ltp.nu0, tp.nu0)
    np.testing.assert_allclose(ltp.gamma, tp.gamma)


def test_iip_continuum_uses_tabulated_yg():
    """The IIP continuum coll-exc/deexc channels engage tabulated Yg
    strengths where collision data exists, van Regemorter only as fallback
    (VERDICT r4 item 4; reference CollExcRateCoeff,
    iip_plasma/properties/continuum.py:527-692)."""
    import copy

    from tardis_tpu.config.reader import config_from_dict
    from tardis_tpu.constants import H, K_B
    from tardis_tpu.model.state import SimulationState
    from tardis_tpu.plasma.continuum import ContinuumSolver
    from tardis_tpu.plasma.solver import PlasmaSolver
    from tests.test_plasma import BASE_CONFIG

    cfg = copy.deepcopy(BASE_CONFIG)
    cfg["model"]["abundances"] = {"H": 0.8, "He": 0.2}
    state = SimulationState.from_config(config_from_dict(cfg))

    def build(with_coll):
        atom = make_synthetic_atom_data(
            atomic_numbers=(1, 2),
            max_ion_stage=2,
            n_levels=10,
            continuum_species=((1, 0),),
            collision_species=((1, 0),) if with_coll else (),
        ).prepare(line_interaction_type="macroatom")
        pls = PlasmaSolver(atom, state)
        ps = pls.update(state.t_radiative, state.dilution_factor)
        cs = ContinuumSolver(atom, pls)
        return atom, cs, cs.update(ps), ps

    atom, cs, cont, ps = build(True)
    atom0, cs0, cont0, _ = build(False)

    has = cs._coll_yg_idx >= 0
    assert has.any(), "no collisional transition matched the yg table"
    assert (~has).any(), "need at least one van Regemorter fallback row"

    # f64 oracle for the tabulated rows (Przybilla & Butler 2004 A2)
    t_e = cont.t_electrons
    yg_rows = interp_yg(atom.collision, t_e)[cs._coll_yg_idx[has]]
    de = H * cs._coll_nu[has]
    q_oracle = (
        BETA_COLL / np.sqrt(t_e)[None, :]
        * yg_rows
        * np.exp(-de[:, None] / (K_B * t_e)[None, :])
    )
    np.testing.assert_allclose(
        cont.coll_exc_coeff[has], q_oracle, rtol=1e-12
    )
    # deexcitation satisfies detailed balance against the tabulated rate:
    # q_ul = beta_coll / sqrt(T_e) * yg * g_l / g_u  (no Boltzmann factor)
    gl, gu = cs._coll_gl[has], cs._coll_gu[has]
    q_ul_oracle = (
        BETA_COLL / np.sqrt(t_e)[None, :] * yg_rows
        * (gl / gu)[:, None]
    )
    np.testing.assert_allclose(
        cont.coll_deexc_coeff[has], q_ul_oracle, rtol=1e-10
    )
    # tabulated rows DIFFER from the van Regemorter values they replace...
    assert not np.allclose(
        cont.coll_exc_coeff[has], cont0.coll_exc_coeff[has], rtol=0.01
    )
    # ...and fallback rows are untouched
    np.testing.assert_allclose(
        cont.coll_exc_coeff[~has], cont0.coll_exc_coeff[~has], rtol=1e-12
    )


def test_hdf_loader_molecule_data(tmp_path):
    """The carsus ``molecules/*`` group loads into AtomData.meta
    ['molecule_data'] with the reference's three tables (MoleculeData,
    io/atom_data/base.py:111-135, from_hdf:239-246) — VERDICT r4 item 9:
    the key was named but nothing consumed the group."""
    import h5py
    import pandas as pd

    from tardis_tpu.atomic.hdf_loader import atom_data_from_hdf
    from tardis_tpu.io.pandas_hdf_writer import write_frame

    atom = make_synthetic_atom_data(atomic_numbers=(1, 2), max_ion_stage=2,
                                    n_levels=4)
    path = str(tmp_path / "atom_mol.h5")
    lv = pd.DataFrame(
        {
            "atomic_number": atom.level_z,
            "ion_number": atom.level_ion,
            "level_number": atom.level_number,
            "energy": atom.level_energy / 1.602176634e-12,
            "g": atom.level_g,
            "metastable": atom.level_meta,
        }
    )
    ln = pd.DataFrame(
        {
            "atomic_number": atom.line_z,
            "ion_number": atom.line_ion,
            "level_number_lower": atom.level_number[atom.line_lower_idx],
            "level_number_upper": atom.level_number[atom.line_upper_idx],
            "nu": atom.line_nu,
            "f_lu": atom.line_f_lu,
        }
    )
    temps = [1000.0, 5000.0, 10000.0]
    eq = pd.DataFrame(
        {t: [1.2e3 * (i + 1) * t for i in range(2)] for t in temps},
        index=pd.Index(["H2", "CO"], name="molecule"),
    )
    pf = pd.DataFrame(
        {t: [2.0 + i + t / 1e4 for i in range(2)] for t in temps},
        index=pd.Index(["H2", "CO"], name="molecule"),
    )
    de = pd.DataFrame(
        {"dissociation_energy": [4.48, 11.09]},
        index=pd.Index(["H2", "CO"], name="molecule"),
    )
    with h5py.File(path, "w") as f:
        write_frame(
            f, "/atom_data",
            pd.DataFrame({"atomic_number": atom.atomic_numbers,
                          "mass": atom.masses / 1.6605390666e-24}),
        )
        write_frame(
            f, "/ionization_data",
            pd.DataFrame({"atomic_number": atom.ionization_z,
                          "ion_number": atom.ionization_ion,
                          "ionization_energy":
                              atom.ionization_energy / 1.602176634e-12}),
        )
        write_frame(f, "/levels_data", lv)
        write_frame(f, "/lines_data", ln)
        write_frame(f, "/molecules/equilibrium_constants", eq)
        write_frame(f, "/molecules/partition_functions", pf)
        write_frame(f, "/molecules/dissociation_energies", de)

    loaded = atom_data_from_hdf(path)
    mol = loaded.meta.get("molecule_data")
    assert mol is not None
    assert set(mol) == {"equilibrium_constants", "partition_functions",
                        "dissociation_energies"}
    assert list(mol["equilibrium_constants"].index) == ["H2", "CO"]
    np.testing.assert_allclose(
        mol["dissociation_energies"]["dissociation_energy"].to_numpy(),
        [4.48, 11.09],
    )
