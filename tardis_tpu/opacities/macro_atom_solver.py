"""Per-iteration macro-atom transition-probability solve.

Mirrors the reference's ``LegacyMacroAtomSolver``
(/root/reference/tardis/opacities/macro_atom/macroatom_solver.py:56-210 and
macro_atom/util.py:9-56): runtime probability = stored coefficient x
beta_sobolev[line] (internal-up additionally x stimulated-emission factor x
J^b_blue), normalized per source-level block.

For the TPU kernel the per-block probabilities are stored **cumulatively**
(normalized running sum within each block), so an in-kernel categorical draw
is a binary search instead of the reference's linear probability walk
(transport/montecarlo/macro_atom.py:52-104).
"""

from __future__ import annotations

import numpy as np

from tardis_tpu.atomic.atom_data import MACRO_INTERNAL_UP, MacroAtomData


def solve_transition_probabilities(
    macro: MacroAtomData,
    beta_sobolev: np.ndarray,  # (L, S)
    j_blues: np.ndarray,  # (L, S)
    stim_factor: np.ndarray,  # (L, S)
) -> np.ndarray:
    """Block-normalized transition probabilities (T, S)
    (cf. fast_calculate_transition_probabilities, macro_atom/util.py:9-56)."""
    line_idx = macro.transition_line_id
    p = macro.coef[:, None] * beta_sobolev[line_idx]  # (T, S)
    up = macro.transition_type == MACRO_INTERNAL_UP
    p[up] *= stim_factor[line_idx[up]] * j_blues[line_idx[up]]

    refs = macro.block_references
    block_of = np.repeat(np.arange(len(refs) - 1), np.diff(refs))
    T, S = p.shape
    excl = np.zeros((T + 1, S))
    np.cumsum(p, axis=0, out=excl[1:])
    start_vals = excl[refs[:-1]]
    end_vals = excl[refs[1:]]
    denom = (end_vals - start_vals)[block_of]
    with np.errstate(divide="ignore", invalid="ignore"):
        p_norm = p / denom
    return np.where(np.isfinite(p_norm), p_norm, 0.0)


def solve_macro_state(
    macro: MacroAtomData,
    beta_sobolev: np.ndarray,  # (L, S)
    j_blues: np.ndarray,  # (L, S)
    stim_factor: np.ndarray,  # (L, S)
):
    """Compute cumulative-normalized transition probabilities.

    Returns the tuple consumed by
    :func:`tardis_tpu.transport.device_state.build_transport_tables`:
    (cum_prob (T,S) f32, block_start, dest, emit, line, line2macro).
    """
    from tardis_tpu import native

    cum_native = native.macro_cum_probs(
        macro.coef,
        macro.transition_line_id,
        macro.transition_type,
        beta_sobolev,
        j_blues,
        stim_factor,
        macro.block_references,
    )
    if cum_native is not None:
        return (
            cum_native,
            macro.block_references.astype(np.int32),
            macro.destination_level_id.astype(np.int32),
            (macro.transition_type < 0),
            macro.transition_line_id.astype(np.int32),
            macro.line2macro_level_upper.astype(np.int32),
        )

    line_idx = macro.transition_line_id
    p = macro.coef[:, None] * beta_sobolev[line_idx]  # (T, S)
    up = macro.transition_type == MACRO_INTERNAL_UP
    p[up] *= stim_factor[line_idx[up]] * j_blues[line_idx[up]]

    # per-block cumulative normalization
    T, S = p.shape
    refs = macro.block_references
    block_of = np.repeat(
        np.arange(len(refs) - 1), np.diff(refs)
    )  # (T,) block id per transition
    excl = np.zeros((T + 1, S))
    np.cumsum(p, axis=0, out=excl[1:])  # excl[k] = sum of first k transitions
    start_vals = excl[refs[:-1]]  # (M, S) cumulative before each block
    end_vals = excl[refs[1:]]  # (M, S) cumulative through each block
    cum_local = excl[1:] - start_vals[block_of]
    denom = (end_vals - start_vals)[block_of]
    with np.errstate(divide="ignore", invalid="ignore"):
        cum_norm = cum_local / denom
    # empty/zero blocks: make the first entry of the block always win
    cum_norm = np.where(np.isfinite(cum_norm), cum_norm, 1.0)
    # force exact 1.0 at block ends to close the distribution under f32
    cum_norm = np.clip(cum_norm, 0.0, 1.0)
    cum_norm[refs[1:] - 1] = 1.0

    return (
        cum_norm.astype(np.float32),
        macro.block_references.astype(np.int32),
        macro.destination_level_id.astype(np.int32),
        (macro.transition_type < 0),
        macro.transition_line_id.astype(np.int32),
        macro.line2macro_level_upper.astype(np.int32),
    )
