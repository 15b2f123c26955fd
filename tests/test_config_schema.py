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
