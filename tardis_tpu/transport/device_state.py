"""Device-side transport tables (the TPU analogue of OpacityStateNumba).

The reference packs plasma/opacity outputs into a numba jitclass
(/root/reference/tardis/opacities/opacity_state_numba.py:14) that kernels walk
line-by-line.  The TPU design instead precomputes **per-shell prefix sums of
Sobolev optical depth over the (descending-frequency) line list**, stored as
two-float (hi, lo) pairs.  Together with the homologous-flow identity

    s_i = ct * (1 - nu_i / nu_lab) - mu * r      (distance to resonance i)

this makes the combined optical depth to line i,

    g(i) = [C(i) - C(start-1)] + chi_e * s_i,

monotonic in i, so the event line is found by **binary search** instead of the
reference's linear line walk (homologous_rad_packet_transport.py:102-161) —
O(log L) per event, fully batched, no data-dependent loop lengths.

Scaled unit system used by the kernel (all f32-safe):
- length unit  = c * t_explosion  (radii are then local beta values ~0.03)
- frequency unit = 1e15 Hz
- energy unit  = single-packet birth energy (1/N erg)
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from tardis_tpu.constants import C, SIGMA_THOMSON
from tardis_tpu.utils.twofloat import split_f64_to_f32_pair

NU_UNIT = 1.0e15  # Hz

# line interaction modes (reference LineInteractionType,
# transport/montecarlo/interaction_events.py:220)
LINE_SCATTER = 0
LINE_DOWNBRANCH = 1
LINE_MACROATOM = 2


class TransportTables(NamedTuple):
    """All device arrays the transport kernel reads (replicated per device)."""

    # geometry, scaled by 1/(c t_exp)
    r_inner: jnp.ndarray  # (S,) f32
    r_outer: jnp.ndarray  # (S,) f32
    # lines
    line_nu: jnp.ndarray  # (L,) f32 descending, units NU_UNIT
    neg_line_nu: jnp.ndarray  # (L,) f32 ascending = -line_nu (for searchsorted)
    tau_cum_hi: jnp.ndarray  # (S, L+1) f32: per-shell inclusive prefix sums
    tau_cum_lo: jnp.ndarray  # (S, L+1) f32 (two-float low parts)
    chi_e: jnp.ndarray  # (S,) f32, electron-scattering opacity * (c t_exp)
    # macro-atom / downbranch tables (size-1 dummies in scatter mode)
    macro_cum_prob: jnp.ndarray  # (T, S) f32 cumulative-normalized per block
    macro_block_start: jnp.ndarray  # (M+1,) i32
    macro_dest: jnp.ndarray  # (T,) i32
    macro_emit: jnp.ndarray  # (T,) bool (transition_type < 0)
    macro_line: jnp.ndarray  # (T,) i32
    line2macro: jnp.ndarray  # (L,) i32
    # tiled-search structures (transport/tiled_search.py)
    neg_nu_tiled: object  # TiledTable over ascending -line_nu
    pred_tables: object  # PredicateTables over per-shell tau prefix sums


class TransportStaticConfig(NamedTuple):
    """Static (compile-time) kernel configuration."""

    n_shells: int
    n_lines: int
    line_interaction_mode: int  # LINE_SCATTER / DOWNBRANCH / MACROATOM
    disable_line_scattering: bool = False
    max_macro_jumps: int = 40
    macro_block_bits: int = 1  # ceil(log2(max block length))
    line_search_bits: int = 20  # ceil(log2(L)) + 1
    # virtual packets: spawn-point recording in the main loop
    # (records are traced in a separate dense pass, transport/vpacket.py)
    vpacket_capacity: int = 0  # 0 = disabled
    # last-interaction tracking (analogue of TrackerLastInteraction,
    # reference packets/trackers/tracker_last_interaction.py:8)
    track_last_interaction: bool = False
    # full per-event tracker: first K events per packet (analogue of
    # TrackerFull, reference packets/trackers/tracker_full.py:19; fixed
    # capacity instead of grow-by-doubling)
    track_rpacket_length: int = 0  # 0 = disabled
    # reflective inner boundary (reference enable_reflective_inner_boundary
    # + inner_boundary_albedo config, montecarlo schema)
    inner_boundary_albedo: float = 0.0
    # unroll the macro-atom walk instead of a nested lax.while_loop
    # (the nested while faults the TPU runtime at large table sizes)
    unroll_macro_walk: bool = False
    # full special-relativistic treatment (reference ENABLE_FULL_RELATIVITY):
    # gamma-corrected doppler factors, aberration at emission, quadratic
    # resonance-distance solve (monotonicity in line index is preserved,
    # so the binary-search design carries over unchanged)
    enable_full_relativity: bool = False


def build_transport_tables(
    geometry,
    plasma_state,
    atom_data,
    line_interaction_type: str = "scatter",
    disable_electron_scattering: bool = False,
    macro_state=None,
    enable_full_relativity: bool = False,
):
    """Build device tables from host-side plasma/geometry state.

    Parameters
    ----------
    geometry : Radial1DGeometry
    plasma_state : PlasmaState (tau_sobolev (L, S) f64, electron_densities)
    atom_data : prepared AtomData
    macro_state : optional (cum_prob (T,S) f64, block_start, dest, emit, line,
        line2macro) tuple from the macro-atom solver.
    """
    ct = C * geometry.time_explosion
    S = geometry.no_of_shells
    L = atom_data.n_lines

    tau = plasma_state.tau_sobolev  # (L, S) f64
    # per-shell prefix sums with leading zero -> (S, L+1); fused native
    # pipeline when built (tardis_tpu/native), numpy fallback otherwise
    from tardis_tpu import native
    from tardis_tpu.transport.tiled_search import (
        build_predicate_tables,
        build_tiled_table,
    )

    hi, lo = native.prefix_split(tau)
    cum_f64 = np.zeros((S, L + 1), dtype=np.float64)
    np.cumsum(tau.T, axis=1, out=cum_f64[:, 1:])

    sigma = 1e-200 if disable_electron_scattering else SIGMA_THOMSON
    chi_e = (sigma * plasma_state.electron_densities * ct).astype(np.float32)

    line_nu_scaled = (atom_data.line_nu / NU_UNIT).astype(np.float32)

    mode = {"scatter": LINE_SCATTER, "downbranch": LINE_DOWNBRANCH,
            "macroatom": LINE_MACROATOM}[line_interaction_type]

    if macro_state is not None:
        cum_prob, block_start, dest, emit, mline, line2macro = macro_state
        macro_block_bits = int(
            np.ceil(np.log2(max(2, int(np.max(np.diff(block_start))))))
        ) + 1
    else:
        cum_prob = np.ones((1, S), dtype=np.float32)
        block_start = np.zeros(2, dtype=np.int32)
        dest = np.zeros(1, dtype=np.int32)
        emit = np.ones(1, dtype=bool)
        mline = np.zeros(1, dtype=np.int32)
        line2macro = np.zeros(L, dtype=np.int32)
        macro_block_bits = 1

    tables = TransportTables(
        r_inner=jnp.asarray(geometry.r_inner / ct, jnp.float32),
        r_outer=jnp.asarray(geometry.r_outer / ct, jnp.float32),
        line_nu=jnp.asarray(line_nu_scaled),
        neg_line_nu=jnp.asarray(-line_nu_scaled),
        tau_cum_hi=jnp.asarray(hi),
        tau_cum_lo=jnp.asarray(lo),
        chi_e=jnp.asarray(chi_e),
        macro_cum_prob=jnp.asarray(cum_prob, jnp.float32),
        macro_block_start=jnp.asarray(block_start, jnp.int32),
        macro_dest=jnp.asarray(dest, jnp.int32),
        macro_emit=jnp.asarray(emit),
        macro_line=jnp.asarray(mline, jnp.int32),
        line2macro=jnp.asarray(line2macro, jnp.int32),
        neg_nu_tiled=build_tiled_table(-line_nu_scaled),
        pred_tables=build_predicate_tables(cum_f64, line_nu_scaled),
    )
    import jax

    on_accelerator = jax.default_backend() != "cpu"
    static = TransportStaticConfig(
        n_shells=S,
        n_lines=L,
        line_interaction_mode=mode,
        max_macro_jumps=(
            1 if mode == LINE_DOWNBRANCH else (24 if on_accelerator else 40)
        ),
        macro_block_bits=macro_block_bits,
        line_search_bits=int(np.ceil(np.log2(max(2, L)))) + 1,
        enable_full_relativity=enable_full_relativity,
        # nested while_loop faults the TPU runtime at large macro tables;
        # an unrolled masked walk compiles and runs cleanly there, while
        # XLA:CPU's LLVM backend prefers the small while_loop graph
        unroll_macro_walk=on_accelerator,
    )
    return tables, static
