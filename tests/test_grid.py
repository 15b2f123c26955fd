"""Parameter-grid driver (reference grid/base.py:35-170)."""

import copy

import numpy as np
import pandas as pd

from tardis_tpu.grid.base import TardisGrid
from tests.test_plasma import BASE_CONFIG


def _small_config():
    cfg = copy.deepcopy(BASE_CONFIG)
    cfg["montecarlo"] = dict(
        cfg["montecarlo"], no_of_packets=512, last_no_of_packets=512,
        iterations=1,
    )
    return cfg


def test_grid_overrides_and_run(atom_data_prepared):
    grid = pd.DataFrame(
        {
            "supernova.time_explosion": ["10 day", "16 day"],
            "montecarlo.seed": [1, 2],
        }
    )
    tg = TardisGrid(_small_config(), grid, atom_data=atom_data_prepared)
    c0 = tg.grid_row_to_config(0)
    c1 = tg.grid_row_to_config(1)
    np.testing.assert_allclose(c0.supernova.time_explosion, 10 * 86400.0)
    np.testing.assert_allclose(c1.supernova.time_explosion, 16 * 86400.0)
    assert c1.montecarlo.seed == 2

    st = tg.grid_row_to_simulation_state(1)
    np.testing.assert_allclose(st.time_explosion, 16 * 86400.0)

    results = tg.run()
    assert len(results) == 2
    for sim in results:
        assert sim.spectrum_real is not None
        assert np.isfinite(
            np.asarray(sim.spectrum_real.luminosity_nu)
        ).all()
    # different t_exp -> different radii -> different spectra
    assert not np.allclose(
        np.asarray(results[0].spectrum_real.luminosity_nu),
        np.asarray(results[1].spectrum_real.luminosity_nu),
    )


def test_grid_from_axes_and_save(tmp_path):
    axes = {
        "supernova.time_explosion": ["10 day", "13 day"],
        "model.structure.velocity.num": [10, 15, 20],
    }
    tg = TardisGrid.from_axes(_small_config(), axes)
    assert len(tg.grid) == 6  # Cartesian product
    assert set(tg.grid.columns) == set(axes)
    # every combination appears exactly once
    combos = set(map(tuple, tg.grid.values))
    assert len(combos) == 6

    out = tmp_path / "grid.csv"
    tg.save_grid(str(out))
    back = pd.read_csv(out, index_col=0)
    assert list(back.columns) == list(tg.grid.columns)
    assert len(back) == 6
