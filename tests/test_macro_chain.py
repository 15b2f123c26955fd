"""Absorbing-chain macro-atom sampler: exactness vs the analytic chain and
statistical equivalence with the RNG-walk kernel path."""

import jax
import numpy as np
import pytest

from tardis_tpu.config.reader import config_from_dict
from tardis_tpu.model.state import SimulationState
from tardis_tpu.opacities.macro_atom_solver import (
    solve_macro_chain,
    solve_macro_state,
    solve_transition_probabilities,
)
from tardis_tpu.plasma.solver import PlasmaSolver
from tardis_tpu.transport.device_state import build_transport_tables
from tardis_tpu.transport.kernel import run_transport
from tardis_tpu.transport.source import sample_blackbody_packets

from tests.test_plasma import BASE_CONFIG


@pytest.fixture(scope="module")
def problem(atom_data_prepared):
    cfg = config_from_dict(BASE_CONFIG)
    state = SimulationState.from_config(cfg)
    atom = atom_data_prepared
    ps = PlasmaSolver(atom, state).update(
        state.t_radiative, state.dilution_factor
    )
    return cfg, state, atom, ps


def _brute_force_emission_dist(macro, p_norm, level, shell, n_max=200):
    """Analytic absorbing-chain emission distribution over lines from
    ``level`` by dense linear algebra on the full transition table."""
    refs = macro.block_references
    M = len(refs) - 1
    src = np.repeat(np.arange(M), np.diff(refs))
    emit = macro.transition_type < 0
    Q = np.zeros((M, M))
    np.add.at(
        Q,
        (src[~emit], macro.destination_level_id[~emit]),
        p_norm[~emit, shell],
    )
    N = np.linalg.inv(np.eye(M) - Q)
    # expected visits row from `level`, times emission prob per line
    visits = N[level]  # (M,)
    L = int(macro.transition_line_id.max()) + 1
    dist = np.zeros(L)
    e_src = src[emit]
    e_line = macro.transition_line_id[emit]
    e_p = p_norm[emit, shell]
    np.add.at(dist, e_line, visits[e_src] * e_p)
    tot = dist.sum()
    return dist / tot if tot > 0 else dist


def test_chain_matches_analytic_distribution(problem):
    """The chain tables reproduce the exact absorbing-chain emission
    distribution (B-matrix row x per-level emission CDF)."""
    cfg, state, atom, ps = problem
    macro = atom.macro_atom
    p_norm = solve_transition_probabilities(
        macro, ps.beta_sobolev, ps.j_blues, ps.stimulated_emission_factor
    ).astype(np.float64)
    mc = solve_macro_chain(
        macro, ps.beta_sobolev, ps.j_blues, ps.stimulated_emission_factor,
        mode="macroatom", line_nu_scaled=atom.line_nu / 1e15,
    )
    S = ps.beta_sobolev.shape[1]
    M = mc.n_states
    # pick an activated level with internal structure
    level = int(macro.line2macro_level_upper[len(macro.line2macro_level_upper) // 2])
    shell = 3
    # absorbing-state distribution implied by the component-local CDF row
    # [cdf over W local slots | base]: P(base + k) = cdf[k] - cdf[k-1]
    W = mc.chain_width
    cc = np.asarray(mc.chain_cdf, np.float64).reshape(S, M, W + 1)
    row = cc[shell, level]
    base = int(row[W])
    p_local = np.diff(np.concatenate([[0.0], row[:W]]))
    B_row = np.zeros(M)
    kmax = min(W, M - base)
    B_row[base : base + kmax] = p_local[:kmax]

    # emission distribution implied by the emission CDF rows
    # [cdf over We slots | line ids | line nus]
    We = mc.emit_width
    ec = np.asarray(mc.emit_cdf, np.float64).reshape(S, M, 3 * We)
    L = atom.n_lines
    dist_tables = np.zeros(L)
    for j in range(M):
        if B_row[j] <= 0:
            continue
        erow = ec[shell, j]
        pe = np.diff(np.concatenate([[0.0], erow[:We]]))
        lines = erow[We : 2 * We].astype(np.int64)
        np.add.at(dist_tables, lines, B_row[j] * pe)
    dist_tables /= dist_tables.sum()

    dist_exact = _brute_force_emission_dist(macro, p_norm, level, shell)
    np.testing.assert_allclose(dist_tables, dist_exact, atol=2e-4)


def test_chain_kernel_statistically_matches_walk(problem):
    """Full transport with chain sampling matches the walk kernel path
    within Monte Carlo noise (same pool, same per-packet trajectories up to
    the macro interaction draws)."""
    cfg, state, atom, ps = problem
    args = (
        atom.macro_atom,
        ps.beta_sobolev,
        ps.j_blues,
        ps.stimulated_emission_factor,
    )
    mchain = solve_macro_chain(
        *args, mode="macroatom", line_nu_scaled=atom.line_nu / 1e15
    )
    mwalk = solve_macro_state(*args)
    N = 20000
    key = jax.random.key(np.uint32(5))
    pool_mu, pool_nu = sample_blackbody_packets(
        jax.random.fold_in(key, 0), N, state.t_inner
    )
    rk = jax.random.fold_in(key, 1)
    t_w, s_w = build_transport_tables(
        state.geometry, ps, atom, "macroatom", macro_state=mwalk
    )
    t_c, s_c = build_transport_tables(
        state.geometry, ps, atom, "macroatom", macro_chain=mchain
    )
    assert s_c.use_macro_chain
    cw = run_transport(t_w, s_w, pool_mu, pool_nu, rk, n_packets=N,
                       batch_size=4096)
    cc = run_transport(t_c, s_c, pool_mu, pool_nu, rk, n_packets=N,
                       batch_size=4096)

    em_w = np.asarray(cw.out_status) == 1
    em_c = np.asarray(cc.out_status) == 1
    assert abs(em_w.mean() - em_c.mean()) < 0.01
    # spectral histograms agree within Poisson noise
    h_w, _ = np.histogram(
        np.asarray(cw.out_nu)[em_w], bins=30, range=(0.1, 2.0)
    )
    h_c, _ = np.histogram(
        np.asarray(cc.out_nu)[em_c], bins=30, range=(0.1, 2.0)
    )
    z = np.abs(h_w - h_c) / np.maximum(np.sqrt(h_w + h_c), 1.0)
    assert z.max() < 4.0, f"max z {z.max()}"
    # bulk estimators agree closely (macro draws barely perturb them)
    np.testing.assert_allclose(
        np.asarray(cc.est_j), np.asarray(cw.est_j), rtol=0.02
    )


def test_chain_downbranch_mode(problem):
    """Downbranch chain (identity B) runs and emits only downward lines."""
    cfg, state, atom, ps = problem
    mchain = solve_macro_chain(
        atom.downbranch,
        ps.beta_sobolev,
        ps.j_blues,
        ps.stimulated_emission_factor,
        mode="downbranch", line_nu_scaled=atom.line_nu / 1e15,
    )
    assert mchain.chain_cdf is None
    N = 5000
    key = jax.random.key(np.uint32(9))
    pool_mu, pool_nu = sample_blackbody_packets(
        jax.random.fold_in(key, 0), N, state.t_inner
    )
    t_c, s_c = build_transport_tables(
        state.geometry, ps, atom, "downbranch", macro_chain=mchain
    )
    cc = run_transport(
        t_c, s_c, pool_mu, pool_nu, jax.random.fold_in(key, 1),
        n_packets=N, batch_size=2048,
    )
    assert (np.asarray(cc.out_status) > 0).all()
    em = np.asarray(cc.out_status) == 1
    assert 0.5 < em.mean() <= 1.0


def test_chain_size_guard(problem):
    """Oversized chains return None (walk fallback path)."""
    cfg, state, atom, ps = problem
    mc = solve_macro_chain(
        atom.macro_atom,
        ps.beta_sobolev,
        ps.j_blues,
        ps.stimulated_emission_factor,
        mode="macroatom",
        max_chain_bytes=1024,
        line_nu_scaled=atom.line_nu / 1e15,
    )
    assert mc is None
