"""Full end-to-end run on a kurucz-scale (>=1e5-line) list with realistic
near-degeneracies: golden-spectrum regression + near-tie drift quantification
(VERDICT round-2 item 6; reference analogue tests/test_tardis_full.py:51-110).

Real kurucz_cd23 data cannot be shipped in this image (no network egress and
the reference checkout carries no line-list HDF), so the fixture is the
fine-structure synthetic generator: 105,948 lines with ~2,200 sub-1e-6
relative line pairs and ~460 adjacent pairs that are DEGENERATE in float32 —
the exact tie-breaking regime of real line lists that the f32 tiled
predicate search must survive (tiled_search.py module docstring).
"""

import copy

import jax
import numpy as np
import pytest

from tardis_tpu.atomic.synthetic import make_synthetic_atom_data
from tardis_tpu.config.reader import config_from_dict
from tardis_tpu.model.state import SimulationState
from tardis_tpu.plasma.solver import PlasmaSolver

from tests.test_plasma import BASE_CONFIG

GOLDEN = "tests/data/golden_kurucz_like.npz"


@pytest.fixture(scope="module")
def big_atom():
    return make_synthetic_atom_data(
        n_levels=55, fine_structure_split=3e-6
    ).prepare(
        selected_atoms=[8, 12, 14, 16, 18, 20],
        line_interaction_type="macroatom",
    )


def _e2e_config():
    cfg = copy.deepcopy(BASE_CONFIG)
    cfg["plasma"]["line_interaction_type"] = "macroatom"
    cfg["montecarlo"] = dict(
        cfg["montecarlo"],
        seed=23111963,
        no_of_packets=10000,
        iterations=3,
        last_no_of_packets=20000,
        no_of_virtual_packets=0,
    )
    cfg["spectrum"] = {
        "start": "500 angstrom", "stop": "20000 angstrom", "num": 400,
    }
    return cfg


@pytest.mark.slow
def test_golden_spectrum_kurucz_scale(big_atom):
    """Fixed-seed run through run_tardis reproduces the committed golden
    spectrum/estimators exactly (bit-stable kernel) on the 1e5-line list."""
    import os

    from tardis_tpu.simulation.base import run_tardis

    assert big_atom.n_lines >= 100_000
    sim = run_tardis(_e2e_config(), atom_data=big_atom)
    lum = np.asarray(sim.spectrum_real.luminosity_nu, np.float64)
    t_rad = np.asarray(sim.state.t_radiative, np.float64)
    w = np.asarray(sim.state.dilution_factor, np.float64)

    if not os.path.exists(GOLDEN):  # pragma: no cover - regeneration path
        np.savez_compressed(
            GOLDEN, luminosity_nu=lum, t_radiative=t_rad,
            dilution_factor=w,
        )
        pytest.skip("golden file regenerated; rerun to compare")

    g = np.load(GOLDEN)
    # physical sanity first (mirrors reference test_tardis_full assertions)
    assert 8000 < t_rad[0] < 13000
    assert np.all((w > 0) & (w < 0.6))
    assert lum.sum() > 0
    # golden regression: the kernel is deterministic at fixed seed, so the
    # comparison is tight; tolerance covers BLAS/XLA build drift only
    np.testing.assert_allclose(t_rad, g["t_radiative"], rtol=5e-5)
    np.testing.assert_allclose(w, g["dilution_factor"], rtol=5e-4)
    scale = g["luminosity_nu"].max()
    np.testing.assert_allclose(
        lum / scale, g["luminosity_nu"] / scale, atol=5e-4
    )


@pytest.mark.slow
def test_near_tie_drift_vs_f64_oracle(big_atom):
    """Quantify the f32 tiled-search near-tie drift at kurucz line density
    (round-2 Weak #7): per-packet trajectories vs the independent float64
    event loop on the 105k-line list with f32-degenerate pairs."""
    from tardis_tpu.transport.device_state import build_transport_tables
    from tardis_tpu.transport.kernel import run_transport
    from tardis_tpu.transport.source import sample_blackbody_packets

    from tests.reference_transport import HostTables, propagate_packet

    cfg = config_from_dict(_e2e_config())
    state = SimulationState.from_config(cfg)
    ps = PlasmaSolver(big_atom, state).update(
        state.t_radiative, state.dilution_factor
    )
    tables, static = build_transport_tables(
        state.geometry, ps, big_atom, "scatter"
    )
    N = 120
    key = jax.random.key(np.uint32(7))
    pool_mu, pool_nu = sample_blackbody_packets(
        jax.random.fold_in(key, 0), N, state.t_inner
    )
    run_key = jax.random.fold_in(key, 1)
    carry = run_transport(
        tables, static, pool_mu, pool_nu, run_key,
        n_packets=N, batch_size=64,
    )

    host = HostTables(state.geometry, ps, big_atom)
    mu_h = np.asarray(pool_mu)
    nu_h = np.asarray(pool_nu)
    ref_status = np.zeros(N, np.int8)
    ref_nu = np.zeros(N)
    for pid in range(N):
        st, nu, en, _ = propagate_packet(
            pid, mu_h[pid], nu_h[pid], host, run_key
        )
        ref_status[pid] = st
        ref_nu[pid] = nu

    ker_status = np.asarray(carry.out_status)
    ker_nu = np.asarray(carry.out_nu)
    status_match = ker_status == ref_status
    nu_close = np.abs(ker_nu - ref_nu) / np.maximum(ref_nu, 1e-30) < 1e-3
    agree = (status_match & nu_close).mean()
    # near-tie drift shifts O(1) line for a small fraction of events; over
    # whole trajectories the divergence rate must stay bounded at the
    # kurucz-scale line density (quantifies SURVEY.md §7 hard part (c))
    assert agree > 0.80, f"trajectory agreement {agree} at 1e5-line density"
