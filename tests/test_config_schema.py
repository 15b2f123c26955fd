"""Config-schema validation: unknown keys, enums, quantity dimensions,
defaults injection (mirrors reference config_validator.py behavior)."""

import copy

import pytest

from tardis_tpu.config.reader import config_from_dict
from tardis_tpu.config.schema import ConfigurationError, validate_schema

from tests.test_plasma import BASE_CONFIG

TARDIS_EXAMPLE = {
    # the reference docs/tardis_example.yml, as a dict
    "tardis_config_version": "v1.0",
    "supernova": {
        "luminosity_requested": "9.44 log_lsun",
        "time_explosion": "13 day",
    },
    "atom_data": "kurucz_cd23_chianti_H_He_latest.h5",
    "model": {
        "structure": {
            "type": "specific",
            "velocity": {
                "start": "1.1e4 km/s",
                "stop": "20000 km/s",
                "num": 20,
            },
            "density": {"type": "branch85_w7"},
        },
        "abundances": {
            "type": "uniform",
            "O": 0.19, "Mg": 0.03, "Si": 0.52, "S": 0.19,
            "Ar": 0.04, "Ca": 0.03,
        },
    },
    "plasma": {
        "disable_electron_scattering": False,
        "ionization": "lte",
        "excitation": "lte",
        "radiative_rates_type": "dilute-blackbody",
        "line_interaction_type": "macroatom",
    },
    "montecarlo": {
        "seed": 23111963,
        "no_of_packets": 4.0e4,
        "iterations": 20,
        "nthreads": 1,
        "last_no_of_packets": 1.0e5,
        "no_of_virtual_packets": 10,
        "convergence_strategy": {
            "type": "damped",
            "damping_constant": 1.0,
            "threshold": 0.05,
            "fraction": 0.8,
            "hold_iterations": 3,
            "t_inner": {"damping_constant": 0.5},
        },
    },
    "spectrum": {
        "start": "500 angstrom",
        "stop": "20000 angstrom",
        "num": 10000,
    },
}


def test_tardis_example_validates_and_parses():
    cfg = config_from_dict(TARDIS_EXAMPLE)
    assert cfg.montecarlo.no_of_packets == 40000
    assert cfg.montecarlo.last_no_of_packets == 100000
    assert cfg.plasma.line_interaction_type == "macroatom"
    # schema defaults injected
    assert cfg.montecarlo.convergence_strategy.hold_iterations == 3
    assert cfg.plasma.helium_treatment == "none"


def test_misspelled_key_raises_with_suggestion():
    bad = copy.deepcopy(BASE_CONFIG)
    bad["montecarlo"]["iteratons"] = 5
    del bad["montecarlo"]["iterations"]
    with pytest.raises(ConfigurationError, match="iterations"):
        validate_schema(bad)


def test_unknown_section_raises():
    bad = copy.deepcopy(BASE_CONFIG)
    bad["montecarl"] = {"seed": 1}
    with pytest.raises(ConfigurationError, match="montecarlo"):
        validate_schema(bad)


def test_enum_violation_raises():
    bad = copy.deepcopy(BASE_CONFIG)
    bad["plasma"]["line_interaction_type"] = "macro-atom"
    with pytest.raises(ConfigurationError, match="not one of"):
        validate_schema(bad)


def test_wrong_quantity_dimension_raises():
    bad = copy.deepcopy(BASE_CONFIG)
    bad["supernova"]["time_explosion"] = "13 km/s"
    with pytest.raises(ConfigurationError, match="time quantity"):
        validate_schema(bad)


def test_unknown_unit_raises():
    bad = copy.deepcopy(BASE_CONFIG)
    bad["supernova"]["time_explosion"] = "13 fortnight"
    with pytest.raises(ConfigurationError, match="Unknown unit"):
        validate_schema(bad)


def test_missing_required_raises():
    bad = copy.deepcopy(BASE_CONFIG)
    del bad["montecarlo"]["no_of_packets"]
    with pytest.raises(ConfigurationError, match="no_of_packets"):
        validate_schema(bad)
    bad2 = copy.deepcopy(BASE_CONFIG)
    del bad2["supernova"]
    with pytest.raises(ConfigurationError, match="supernova"):
        validate_schema(bad2)


def test_abundance_element_keys_pass():
    ok = validate_schema(copy.deepcopy(BASE_CONFIG))
    ab = ok["model"]["abundances"]
    assert ab["Si"] == 0.52
    # isotope keys allowed too
    cfg = copy.deepcopy(BASE_CONFIG)
    cfg["model"]["abundances"]["Ni56"] = 0.01
    validate_schema(cfg)


def test_lowercase_junk_in_abundances_raises():
    cfg = copy.deepcopy(BASE_CONFIG)
    cfg["model"]["abundances"]["silicon"] = 0.1
    with pytest.raises(ConfigurationError, match="unknown key"):
        validate_schema(cfg)


def test_no_silently_ignored_schema_keys():
    """Every schema leaf key is referenced somewhere in the non-schema
    source: an accepted-but-unread config option is worse than a missing
    one (round-3 VERDICT item 4: enable_adiabatic_cooling was validated
    and then ignored).  String-level check — coarse, but it catches the
    dead-flag pattern."""
    import glob
    import os

    from tardis_tpu.config import schema

    def walk(spec, path, out):
        if isinstance(spec, dict) and spec.get("type") == "object":
            for k, sub in (spec.get("properties") or {}).items():
                walk(sub, path + [k], out)
        else:
            out.append(path)

    leaves = []
    for k, spec in schema.BASE_SCHEMA.items():
        walk(spec, [k], leaves)
    assert len(leaves) > 60  # sanity: the walk sees the whole schema

    root = os.path.join(os.path.dirname(__file__), "..", "tardis_tpu")
    src = ""
    for f in glob.glob(os.path.join(root, "**", "*.py"), recursive=True):
        if f.endswith(os.path.join("config", "schema.py")):
            continue
        src += open(f).read()

    unread = [
        ".".join(p) for p in leaves if p[-1] not in src
    ]
    assert not unread, f"schema keys no code path reads: {unread}"


def test_v_boundary_masking():
    """model.structure.v_inner_boundary/v_outer_boundary trim the shell
    grid, clipping the partially-covered boundary shells (reference
    parse_geometry_configuration.py)."""
    import copy

    import numpy as np

    from tardis_tpu.config.reader import config_from_dict
    from tardis_tpu.model.state import SimulationState
    from tests.test_plasma import BASE_CONFIG

    cfg = copy.deepcopy(BASE_CONFIG)
    full = SimulationState.from_config(config_from_dict(cfg))
    cfg["model"]["structure"]["v_inner_boundary"] = "1.2e4 km/s"
    cfg["model"]["structure"]["v_outer_boundary"] = "1.8e4 km/s"
    cut = SimulationState.from_config(config_from_dict(cfg))
    assert cut.no_of_shells < full.no_of_shells
    np.testing.assert_allclose(cut.geometry.v_inner[0], 1.2e9)
    np.testing.assert_allclose(cut.geometry.v_outer[-1], 1.8e9)
    # trimmed boundary shells keep their untrimmed densities
    lo = np.searchsorted(full.geometry.v_outer, 1.2e9, side="right")
    np.testing.assert_allclose(
        cut.composition.density[0], full.composition.density[lo]
    )


def test_abundance_file_simple_ascii(tmp_path):
    """abundances: {type: file} with the reference's simple_ascii layout
    (first data row = centre, ignored; columns = Z starting at 1)."""
    import copy

    import numpy as np

    from tardis_tpu.config.reader import config_from_dict
    from tardis_tpu.model.state import SimulationState
    from tests.test_plasma import BASE_CONFIG

    cfg = copy.deepcopy(BASE_CONFIG)
    n = cfg["model"]["structure"]["velocity"]["num"]
    rows = [np.concatenate([[0], np.zeros(14)])]  # centre row (unused)
    rng = np.random.default_rng(3)
    for i in range(n):
        x = np.zeros(14)
        x[7] = 0.2 + 0.4 * rng.random()  # O
        x[13] = 1.0 - x[7]  # Si
        rows.append(np.concatenate([[i], x]))
    f = tmp_path / "abund.dat"
    np.savetxt(f, np.array(rows))
    cfg["model"]["abundances"] = {"type": "file", "filename": str(f),
                                  "filetype": "simple_ascii"}
    state = SimulationState.from_config(config_from_dict(cfg))
    assert list(state.composition.atomic_numbers) == [8, 14]
    np.testing.assert_allclose(
        state.composition.mass_fractions.sum(axis=0), 1.0, rtol=1e-12
    )
    # per-shell variation survived
    assert state.composition.mass_fractions[0].std() > 0.01


@pytest.mark.slow
def test_runtime_config_access_audit():
    """Access-tracking dead-flag audit (VERDICT r4 item 6): every key
    ACCEPTED in a maximal classic-mode config is actually READ by the
    machinery during a real run — asserted on runtime ConfigDict access
    paths, not source text, so a key mentioned only in a comment or
    docstring cannot pass.  (The string-level test above still covers the
    schema leaves this config matrix does not exercise.)"""
    from tardis_tpu.atomic.synthetic import make_synthetic_atom_data
    from tardis_tpu.config.reader import (
        config_from_dict,
        track_config_access,
    )
    from tardis_tpu.simulation.base import Simulation

    raw = {
        "supernova": {
            "luminosity_requested": "9.44 log_lsun",
            "time_explosion": "13 day",
            "luminosity_wavelength_start": "100 angstrom",
            "luminosity_wavelength_end": "30000 angstrom",
        },
        "model": {
            "structure": {
                "type": "specific",
                "velocity": {"start": "1.1e4 km/s", "stop": "2e4 km/s",
                             "num": 8},
                "density": {"type": "branch85_w7",
                            "w7_time_0": "0.0002 day"},
                "v_inner_boundary": "1.15e4 km/s",
                "v_outer_boundary": "1.9e4 km/s",
            },
            "abundances": {"type": "uniform", "O": 0.2, "Si": 0.8},
        },
        "plasma": {
            "ionization": "nebular",
            "excitation": "dilute-lte",
            "radiative_rates_type": "detailed",
            "line_interaction_type": "macroatom",
            "link_t_rad_t_electron": 0.9,
            "w_epsilon": 1e-10,
            "initial_t_inner": "10000 K",
            "initial_t_rad": "10000 K",
            "disable_electron_scattering": False,
            "disable_line_scattering": False,
            "nlte": {"species": [], "coronal_approximation": False,
                     "classical_nebular": False},
        },
        "montecarlo": {
            "seed": 3, "no_of_packets": 512, "iterations": 2,
            "last_no_of_packets": 512, "no_of_virtual_packets": 1,
            "batch_size": 256,
            "enable_full_relativity": False,
            "enable_reflective_inner_boundary": True,
            "inner_boundary_albedo": 0.1,
            "nthreads": 2,
            "virtual_spectrum_spawn_range": {"start": "100 angstrom",
                                             "end": "30000 angstrom"},
            "tracking": {"track_last_interaction": True,
                         "track_rpacket": True,
                         "initial_array_length": 4},
            "convergence_strategy": {
                "type": "damped", "damping_constant": 0.7,
                "threshold": 0.05, "fraction": 0.8, "hold_iterations": 2,
                "stop_if_converged": True, "lock_t_inner_cycles": 1,
                "t_inner_update_exponent": -0.5,
            },
        },
        "spectrum": {
            "start": "500 angstrom", "stop": "20000 angstrom", "num": 200,
            "method": "integrated",
            "integrated": {"points": 100, "interpolate_shells": 0,
                           "compute": "jax"},
            "virtual": {"virtual_packet_logging": True,
                        "tau_russian": 10.0,
                        "survival_probability": 0.0,
                        "enable_biasing": False},
        },
    }

    def leaf_paths(d, prefix=""):
        out = []
        for k, v in d.items():
            p = f"{prefix}.{k}" if prefix else k
            if isinstance(v, dict):
                out += leaf_paths(v, p)
            else:
                out.append(p)
        return out

    cfg = config_from_dict(raw)
    atom = make_synthetic_atom_data(n_levels=6).prepare(
        selected_atoms=[8, 14], line_interaction_type="macroatom"
    )
    with track_config_access() as acc:
        sim = Simulation.from_config(cfg, atom_data=atom)
        sim.run()
    # sensitivity control: the tracker only contains what was read
    assert "montecarlo.never_read_key" not in acc

    # abundance element keys are consumed wholesale (dict copy +
    # iteration) by design; the subtree itself must still be read
    assert "model.abundances" in acc
    unread = [
        p for p in leaf_paths(raw)
        if p not in acc and not p.startswith("model.abundances")
    ]
    assert not unread, f"schema-accepted keys the run never read: {unread}"
