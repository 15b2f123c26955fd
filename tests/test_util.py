"""Util + logging subsystem tests (reference tardis/util/base.py,
io/logger/logger.py)."""

import logging

import numpy as np
import pytest

from tardis_tpu.utils.base import (
    MalformedElementSymbolError,
    MalformedSpeciesError,
    atomic_number2element_symbol,
    calculate_luminosity,
    element_symbol2atomic_number,
    int_to_roman,
    quantity_linspace,
    roman_to_int,
    species_string_to_tuple,
    species_tuple_to_string,
)


def test_roman_numerals_roundtrip():
    for i in (1, 4, 9, 14, 40, 90, 400, 1994, 3999):
        assert roman_to_int(int_to_roman(i)) == i
    with pytest.raises(ValueError):
        roman_to_int("IIII")
    with pytest.raises(ValueError):
        int_to_roman(0)


def test_species_parsing():
    assert species_string_to_tuple("Si II") == (14, 1)
    assert species_string_to_tuple("si_ii") == (14, 1)
    assert species_string_to_tuple("Fe2") == (26, 1)
    assert species_string_to_tuple("Ca 2") == (20, 1)
    assert species_tuple_to_string((14, 1)) == "Si II"
    assert species_tuple_to_string((26, 3)) == "Fe IV"
    assert element_symbol2atomic_number("sI") == 14
    assert atomic_number2element_symbol(20) == "Ca"
    with pytest.raises(MalformedElementSymbolError):
        species_string_to_tuple("Xx 2")
    with pytest.raises(MalformedSpeciesError):
        species_string_to_tuple("Si")
    with pytest.raises(ValueError):
        species_string_to_tuple("H 5")


def test_quantity_linspace_and_luminosity(tmp_path):
    v = quantity_linspace("1.1e4 km/s", "2e4 km/s", 3)
    np.testing.assert_allclose(v, [1.1e9, 1.55e9, 2.0e9])
    # flat F_lambda=1 over 1000 A at 10 pc
    f = tmp_path / "spec.dat"
    wl = np.linspace(4000, 5000, 101)
    np.savetxt(f, np.column_stack([wl, np.ones_like(wl)]))
    pc = 3.0857e18
    lum, wmin, wmax = calculate_luminosity(str(f), f"{10 * pc} cm")
    np.testing.assert_allclose(
        lum, 1000.0 * 4 * np.pi * (10 * pc) ** 2, rtol=1e-6
    )
    assert (wmin, wmax) == (4000.0, 5000.0)


def test_logging_state_specific_level(capsys):
    from tardis_tpu.io.logger import logging_state

    logging_state("WARNING", None, specific_log_level=True)
    lg = logging.getLogger("tardis_tpu.test_util")
    lg.warning("warn-visible")
    lg.error("error-hidden-by-specific")
    err = capsys.readouterr().err
    assert "warn-visible" in err
    assert "error-hidden-by-specific" not in err

    logging_state("INFO", None)
    lg.info("info-visible")
    lg.debug("debug-hidden")
    err = capsys.readouterr().err
    assert "info-visible" in err and "debug-hidden" not in err
    with pytest.raises(ValueError):
        logging_state("BOGUS", None)


def test_synpp_yaml_export(tmp_path):
    import yaml

    from tardis_tpu.atomic.synthetic import make_synthetic_atom_data
    from tardis_tpu.config.reader import config_from_dict
    from tardis_tpu.plasma.solver import PlasmaSolver
    from tardis_tpu.model.state import SimulationState
    from tardis_tpu.utils.base import create_synpp_yaml

    from tests.test_plasma import BASE_CONFIG

    cfg = config_from_dict(BASE_CONFIG)
    state = SimulationState.from_config(cfg)
    atom = make_synthetic_atom_data(n_levels=6).prepare(
        selected_atoms=[14, 16], line_interaction_type="scatter"
    )
    ps = PlasmaSolver(atom, state).update(
        state.t_radiative, state.dilution_factor
    )

    class _Sim:  # duck-typed simulation
        plasma_state = ps
        atom_data = atom

    _Sim.state = state
    out = tmp_path / "synpp.yaml"
    doc = create_synpp_yaml(_Sim, str(out))
    loaded = yaml.safe_load(out.read_text())
    setup = loaded["setups"][0]
    assert len(setup["ions"]) == len(setup["log_tau"]) > 0
    assert all(i // 100 in (14, 16) for i in setup["ions"])
    assert loaded["opacity"]["v_ref"] * 1e8 == pytest.approx(
        state.geometry.v_inner[0]
    )


def test_adaptive_damped_convergence():
    import numpy as np

    from tardis_tpu.simulation.convergence import (
        ConvergenceSolver,
        make_convergence_solvers,
    )

    solver = ConvergenceSolver(
        damping_constant=0.5, type="adaptive_damped"
    )
    value = np.array([10000.0, 11000.0])
    estimated = np.array([12000.0, 13000.0])
    out = solver.converge(value, estimated)
    # best candidate is the largest step toward the estimate (lambda=0.55)
    np.testing.assert_allclose(solver.damping_constant, 0.55)
    np.testing.assert_allclose(
        out, value + 0.55 * (estimated - value)
    )
    # repeated calls keep climbing lambda until lambda_max
    for _ in range(20):
        solver.converge(value, estimated)
    assert solver.damping_constant <= solver.lambda_max + 1e-12

    solvers = make_convergence_solvers(
        {"type": "adaptive_damped", "damping_constant": 0.8}
    )
    assert solvers["t_rad"].type == "adaptive_damped"

    import pytest

    with pytest.raises(NotImplementedError):
        make_convergence_solvers({"type": "custom"})


def test_atom_data_download_cache_and_registry(tmp_path, monkeypatch):
    from tardis_tpu.atomic import download as dl

    monkeypatch.setenv("TARDIS_TPU_DATA_DIR", str(tmp_path))
    # unknown name rejected
    import pytest

    with pytest.raises(ValueError):
        dl.download_atom_data("no_such_dataset")

    # pre-staged file matching its checksum is used without network access
    # (a checksum MISMATCH now triggers a re-download; see test_advice_fixes)
    import hashlib as _hl

    name = dl.ATOMIC_DATA_REPO["default"]
    staged = tmp_path / f"{name}.h5"
    staged.write_bytes(b"fake atomic data")
    entry = dict(dl.ATOMIC_DATA_REPO[name])
    entry["md5"] = _hl.md5(b"fake atomic data").hexdigest()
    monkeypatch.setitem(dl.ATOMIC_DATA_REPO, name, entry)
    out = dl.download_atom_data()
    assert out == staged

    # checksum helper
    import hashlib

    assert dl.md5_checksum(staged) == hashlib.md5(
        b"fake atomic data"
    ).hexdigest()

    # failed download produces the actionable air-gap message
    monkeypatch.setitem(
        dl.ATOMIC_DATA_REPO,
        "broken",
        {"url": "http://127.0.0.1:1/none.h5", "mirrors": (), "md5": ""},
    )
    with pytest.raises(RuntimeError, match="copy the file manually"):
        dl.download_atom_data("broken")


def test_jupyter_log_widget_handler():
    """Jupyter log panel (reference io/logger/logger.py widget columns):
    records land in per-level columns with batched flushes."""
    import logging

    from tardis_tpu.io.logger import JupyterLogWidgetHandler, TARDISLogger

    h = JupyterLogWidgetHandler(batch_size=3)
    h.setFormatter(logging.Formatter("%(message)s"))
    lg = logging.getLogger("tardis_tpu.test_widget")
    lg.setLevel(logging.DEBUG)
    lg.addHandler(h)
    try:
        lg.info("first info")
        lg.warning("a warning")
        # batch of 3 not reached -> widgets still empty
        assert "first info" not in h._columns["INFO"].value
        lg.debug("some debug")  # third record triggers flush
        assert "first info" in h._columns["INFO"].value
        assert "a warning" in h._columns["WARNING/ERROR"].value
        assert "some debug" in h._columns["DEBUG"].value
        assert "a warning" in h._columns["ALL"].value
        lg.error("boom")  # ERROR flushes immediately
        assert "boom" in h._columns["WARNING/ERROR"].value
    finally:
        lg.removeHandler(h)

    # configure_logging wires it on demand (forced outside a notebook)
    tl = TARDISLogger("tardis_tpu.test_widget2")
    tl.configure_logging("INFO", display_widget=True)
    assert tl._widget_handler is not None
    tl.configure_logging("INFO", display_widget=False)
    assert tl._widget_handler is None
