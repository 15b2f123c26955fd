"""Virtual-packet spectrum: agreement with the real-packet spectrum."""

import numpy as np

from tardis_tpu.simulation.base import run_tardis
from tests.test_plasma import BASE_CONFIG


def test_virtual_spectrum_matches_real_luminosity():
    cfg = dict(BASE_CONFIG)
    cfg["montecarlo"] = dict(
        cfg["montecarlo"],
        no_of_packets=5000,
        iterations=2,
        last_no_of_packets=10000,
        no_of_virtual_packets=5,
    )
    sim = run_tardis(cfg)
    sp, sv = sim.spectrum_real, sim.spectrum_virtual
    assert sv is not None
    ratio = sv.luminosity / sp.luminosity
    # virtual estimator is unbiased for the escaping luminosity
    assert 0.85 < ratio < 1.18, ratio
    # virtual spectrum is far less noisy: compare smoothed shapes
    def smooth(x, k=9):
        kern = np.ones(k) / k
        return np.convolve(x, kern, mode="same")

    r = smooth(sp.luminosity_nu)
    v = smooth(sv.luminosity_nu)
    mask = r > r.max() * 0.2
    rel = np.abs(r[mask] - v[mask]) / r[mask]
    assert np.median(rel) < 0.25
