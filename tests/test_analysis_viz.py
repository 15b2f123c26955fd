"""Line-info analysis + Grotrian diagram smoke tests (reference
visualization/widgets/line_info.py and grotrian.py)."""

import matplotlib

matplotlib.use("Agg")

import numpy as np
import pytest

from tardis_tpu.atomic.synthetic import make_synthetic_atom_data
from tardis_tpu.config.reader import config_from_dict
from tardis_tpu.simulation.base import Simulation

from tests.test_plasma import BASE_CONFIG


@pytest.fixture(scope="module")
def sim(atom_data_prepared):
    import copy

    cfg = copy.deepcopy(BASE_CONFIG)
    cfg["montecarlo"]["no_of_packets"] = 2048
    cfg["montecarlo"]["last_no_of_packets"] = 4096
    cfg["montecarlo"]["iterations"] = 2
    s = Simulation.from_config(
        config_from_dict(cfg), atom_data=atom_data_prepared
    )
    s.run_convergence()
    s.run_final()
    return s


def test_line_info_species_interactions(sim):
    from tardis_tpu.analysis.line_info import LineInfo

    info = LineInfo.from_simulation(sim)
    df = info.get_species_interactions((500.0, 20000.0))
    assert len(df) > 0
    total = df["Fraction of packets interacting"].sum()
    np.testing.assert_allclose(total, 1.0, rtol=1e-10)
    species = df.index[0]
    counts = info.get_last_line_counts(
        species, wavelength_range=(500.0, 20000.0), group_mode="both"
    )
    assert counts["No. of packets"].sum() > 0
    counts_exc = info.get_last_line_counts(
        species, wavelength_range=(500.0, 20000.0), group_mode="exc"
    )
    assert (
        counts_exc["No. of packets"].sum()
        == counts["No. of packets"].sum()
    )
    with pytest.raises(ValueError):
        info.get_species_interactions((500.0, 20000.0), filter_mode="bad")


def test_grotrian_plot(sim):
    from tardis_tpu.utils.base import species_tuple_to_string
    from tardis_tpu.visualization.grotrian import plot_grotrian

    atom = sim.atom_data
    sp = species_tuple_to_string(
        (int(atom.species_z[0]), int(atom.species_ion[0]))
    )
    ax = plot_grotrian(sim, sp, max_levels=8)
    assert ax.get_title().startswith("Grotrian")
    assert len(ax.lines) + len(ax.collections) > 0
