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
    # packed per-(shell,line) exclusive prefix: [hi, lo] rows
    tau_pack: jnp.ndarray  # (S*(L+1), 2) f32
    # packed per-shell scalars: [chi_e, r_inner, r_outer, boltz_coef,
    # ff_coef, 0, 0, 0] -> one row gather serves all shell lookups
    shell_pack: jnp.ndarray  # (S, 8) f32
    # tiled-search structures (transport/tiled_search.py)
    neg_nu_tiled: object  # TiledTable over ascending -line_nu
    pred_packed: object  # PackedPredTables (3-level packed search)
    # ---- continuum (IIP) tables; size-1 dummies when disabled ----
    # merged bound-free frequency grid (all continua's knots + hard-edge
    # sentinels; linear interp on it EXACTLY reproduces the reference's
    # per-block interpolation, opacities/opacities.py:111-180)
    cont_grid_nu: jnp.ndarray = jnp.zeros(2, jnp.float32)  # (Ng,) ascending
    cont_xsect: jnp.ndarray = jnp.zeros(2, jnp.float32)  # (Ng*C,) flat
    cont_A: jnp.ndarray = jnp.zeros(1, jnp.float32)  # (C*S,) level_pop*ct
    cont_B: jnp.ndarray = jnp.zeros(1, jnp.float32)  # (C*S,) lte_coef*ct
    cont_boltz_coef: jnp.ndarray = jnp.zeros(1, jnp.float32)  # (S,) hnu/kTe
    cont_ff_coef: jnp.ndarray = jnp.zeros(1, jnp.float32)  # (S,)
    # absorbing-Markov macro tables (opacities/continuum_macro.py)
    mk_cum_B: jnp.ndarray = jnp.zeros(1, jnp.float32)  # (S*M*M,)
    deact_block_start: jnp.ndarray = jnp.zeros(2, jnp.int32)  # (M+1,)
    deact_cum_prob: jnp.ndarray = jnp.zeros(1, jnp.float32)  # (D*S,)
    deact_kind: jnp.ndarray = jnp.zeros(1, jnp.int8)  # (D,)
    deact_id: jnp.ndarray = jnp.zeros(1, jnp.int32)  # (D,)
    line2state: jnp.ndarray = jnp.zeros(1, jnp.int32)  # (L,)
    photo_ion_state: jnp.ndarray = jnp.zeros(1, jnp.int32)  # (C,)
    # free-bound emission sampling (interaction_events.py:40-57)
    fb_cdf: jnp.ndarray = jnp.zeros(1, jnp.float32)  # (P*S,)
    fb_nu: jnp.ndarray = jnp.zeros(1, jnp.float32)  # (P,) scaled
    pion_block_start: jnp.ndarray = jnp.zeros(2, jnp.int32)  # (C+1,)
    # ---- absorbing-chain macro-atom CDF rows (device-built;
    # opacities/macro_atom_solver.py solve_macro_chain); size-1 dummies
    # when the walk path is used ----
    chain_cdf: jnp.ndarray = jnp.zeros((1, 2), jnp.float32)  # (S*M, W+1)
    emit_cdf: jnp.ndarray = jnp.zeros((1, 3), jnp.float32)  # (S*M, 3*We)
    # two-photon decay emission: inverse-CDF frequency table in kernel nu
    # units (continuum_macro.two_photon_inv_cdf * nu0); size-1 dummy when
    # two-photon decay is disabled
    two_photon_nu: jnp.ndarray = jnp.zeros(1, jnp.float32)  # (TPN,)


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
    # ---- continuum (IIP) mode (reference modes/iip/) ----
    enable_continuum: bool = False
    n_continua: int = 0
    n_cont_grid: int = 0  # merged grid length Ng
    n_macro_states: int = 0  # Markov state count M (incl. i and k states)
    state_bits: int = 1  # ceil(log2 M) + 1
    deact_bits: int = 1  # ceil(log2 max deactivation block)
    fb_bits: int = 1  # ceil(log2 max photoionization block)
    k_state: int = 0
    # ---- absorbing-chain macro-atom sampling (alias method; replaces the
    # RNG walk with one row gather per draw; see solve_macro_chain) ----
    use_macro_chain: bool = False
    n_chain_states: int = 0  # M
    chain_width: int = 0  # W (component-local CDF row width)
    emit_width: int = 0  # We (emission-block CDF row width)
    # two-photon decay emission channel active (continuum mode only;
    # reference MacroAtomTransitionType.TWO_PHOTON, macro_atom.py:30)
    enable_two_photon: bool = False
    n_two_photon_table: int = 0  # inverse-CDF table length
    # adiabatic-cooling deactivation channel (continuum mode only;
    # reference MacroAtomTransitionType.ADIABATIC_COOLING)
    enable_adiabatic_cooling: bool = False


def _tau_pack_impl(hi, lo):
    return jnp.stack([hi.reshape(-1), lo.reshape(-1)], axis=1)


_TAU_PACK_JIT = None


def _tau_pack_jit(hi, lo):
    """Jitted (hi|lo) interleave (eager dispatch costs ~1 s on axon)."""
    global _TAU_PACK_JIT
    if _TAU_PACK_JIT is None:
        import jax

        _TAU_PACK_JIT = jax.jit(_tau_pack_impl)
    return _TAU_PACK_JIT(hi, lo)


def build_continuum_grid(photo_ion, edge_eps: float = 1e-6):
    """Merged bound-free frequency grid + per-continuum cross-section table.

    Returns (grid_nu (Ng,) ascending cgs Hz, xsect (Ng, C)).  Each continuum
    contributes its tabulation knots plus hard-edge sentinel knots just
    outside its support, so piecewise-linear interpolation on the merged grid
    reproduces the reference's per-block interpolation with hard thresholds
    (opacities/opacities.py:88-180) exactly, while the kernel needs only ONE
    searchsorted per event instead of one per active continuum.
    """
    pi = photo_ion
    Cn = pi.n_continua
    knots = [pi.nu]
    th = pi.nu_threshold
    mx = pi.nu_max
    knots.append(th * (1.0 - edge_eps))
    knots.append(mx * (1.0 + edge_eps))
    lo = pi.nu.min()
    hi = pi.nu.max()
    knots.append(np.array([lo * 0.5, lo * 0.75, hi * 1.5, hi * 2.0]))
    grid = np.unique(np.concatenate(knots))
    xs = np.zeros((len(grid), Cn))
    for c in range(Cn):
        a, b = pi.block_references[c], pi.block_references[c + 1]
        nus = np.concatenate(
            [[th[c] * (1.0 - edge_eps)], pi.nu[a:b], [mx[c] * (1.0 + edge_eps)]]
        )
        vals = np.concatenate([[0.0], pi.x_sect[a:b], [0.0]])
        xs[:, c] = np.interp(grid, nus, vals, left=0.0, right=0.0)
    return grid, xs


def build_transport_tables(
    geometry,
    plasma_state,
    atom_data,
    line_interaction_type: str = "scatter",
    disable_electron_scattering: bool = False,
    macro_state=None,
    enable_full_relativity: bool = False,
    continuum_state=None,
    continuum_macro=None,
    macro_chain=None,
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

    # per-shell prefix sums with leading zero -> (S, L+1): prefer the
    # prefix the fused native plasma pass already emitted (round 5;
    # bit-identical to prefix_split(tau)), else split here (fused native
    # pipeline when built, numpy fallback otherwise)
    from tardis_tpu import native
    from tardis_tpu.transport.tiled_search import (
        build_packed_pred_tables_device,
        build_tiled_table,
    )

    if getattr(plasma_state, "tau_prefix_hi", None) is not None:
        hi = plasma_state.tau_prefix_hi
        lo = plasma_state.tau_prefix_lo
    else:
        hi, lo = native.prefix_split(plasma_state.tau_sobolev)
    # ONE h2d transfer of the two-float prefix serves tau_cum_hi/lo,
    # tau_pack, AND the packed-search tables (built on device, round 4)
    hi_d = jnp.asarray(hi)
    lo_d = jnp.asarray(lo)

    sigma = 1e-200 if disable_electron_scattering else SIGMA_THOMSON
    chi_e = (sigma * plasma_state.electron_densities * ct).astype(np.float32)

    line_nu_scaled = (atom_data.line_nu / NU_UNIT).astype(np.float32)

    mode = {"scatter": LINE_SCATTER, "downbranch": LINE_DOWNBRANCH,
            "macroatom": LINE_MACROATOM}[line_interaction_type]

    chain_kw = {}
    chain_static = {}
    if macro_chain is not None:
        mc = macro_chain
        # already device-resident (built on-accelerator by the chain solve)
        chain_kw = dict(emit_cdf=mc.emit_cdf)
        if mc.chain_cdf is not None:
            chain_kw.update(chain_cdf=mc.chain_cdf)
        chain_static = dict(
            use_macro_chain=True,
            n_chain_states=mc.n_states,
            chain_width=mc.chain_width,
            emit_width=mc.emit_width,
        )

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
        if macro_chain is not None and macro_chain.line2macro is not None:
            line2macro = macro_chain.line2macro
        else:
            line2macro = np.zeros(L, dtype=np.int32)
        macro_block_bits = 1

    cont_kw = {}
    cont_static = {}
    if continuum_state is not None:
        from tardis_tpu.constants import H as H_PLANCK
        from tardis_tpu.constants import K_B
        from tardis_tpu.plasma.continuum import FF_OPAC_CONST

        cs = continuum_state
        cm = continuum_macro
        pi = atom_data.photo_ion
        grid, xs = build_continuum_grid(pi)
        Ng = len(grid)
        Cn = pi.n_continua
        M = cm.n_states
        t_e = cs.t_electrons
        # numpy-side casts; uploaded in the single batched device_put below
        cont_kw = dict(
            cont_grid_nu=np.asarray(grid / NU_UNIT, np.float32),
            cont_xsect=np.asarray(xs.reshape(-1), np.float32),
            cont_A=np.asarray((cs.level_pop * ct).reshape(-1), np.float32),
            cont_B=np.asarray(
                (cs.lte_pop_coef * ct).reshape(-1), np.float32
            ),
            cont_boltz_coef=np.asarray(
                H_PLANCK * NU_UNIT / (K_B * t_e), np.float32
            ),
            cont_ff_coef=np.asarray(
                FF_OPAC_CONST * cs.ff_opacity_factor * ct / NU_UNIT**3,
                np.float32,
            ),
            mk_cum_B=np.asarray(cm.cum_B.reshape(-1), np.float32),
            deact_block_start=np.asarray(cm.deact_block_start, np.int32),
            deact_cum_prob=np.asarray(
                cm.deact_cum_prob.reshape(-1), np.float32
            ),
            deact_kind=np.asarray(cm.deact_kind, np.int8),
            deact_id=np.asarray(cm.deact_id, np.int32),
            line2state=np.asarray(cm.line2state, np.int32),
            photo_ion_state=np.asarray(cm.photo_ion_state, np.int32),
            fb_cdf=np.asarray(cs.fb_emission_cdf.reshape(-1), np.float32),
            fb_nu=np.asarray(pi.nu / NU_UNIT, np.float32),
            pion_block_start=np.asarray(pi.block_references, np.int32),
        )
        if cm.n_two_photon > 0:
            if cm.n_two_photon > 1:
                raise NotImplementedError(
                    "only one two-photon decay transition is supported "
                    "(matching the reference, plasma/properties/"
                    "atomic.py:400-402)"
                )
            from tardis_tpu.opacities.continuum_macro import (
                two_photon_inv_cdf,
            )

            tp = atom_data.two_photon
            # the active transition is the one whose id was wired into the
            # deactivation block (kind EMIT_TWO_PHOTON)
            from tardis_tpu.opacities.continuum_macro import EMIT_TWO_PHOTON

            t_act = int(cm.deact_id[cm.deact_kind == EMIT_TWO_PHOTON][0])
            y_tab = two_photon_inv_cdf(
                float(tp.alpha[t_act]), float(tp.beta[t_act]),
                float(tp.gamma[t_act]),
            )
            cont_kw["two_photon_nu"] = np.asarray(
                y_tab * float(tp.nu0[t_act]) / NU_UNIT, np.float32
            )
        cont_static = dict(
            enable_continuum=True,
            n_continua=Cn,
            n_cont_grid=Ng,
            n_macro_states=M,
            state_bits=int(np.ceil(np.log2(max(2, M)))) + 1,
            deact_bits=int(
                np.ceil(np.log2(max(2, np.max(np.diff(cm.deact_block_start)))))
            ) + 1,
            fb_bits=int(
                np.ceil(np.log2(max(2, np.max(np.diff(pi.block_references)))))
            ) + 1,
            k_state=cm.k_state,
            enable_two_photon=cm.n_two_photon > 0,
            n_two_photon_table=256 if cm.n_two_photon > 0 else 0,
            enable_adiabatic_cooling=cm.has_adiabatic,
        )

    # per-line aux channel packed into the search's level-0 rows: the
    # macro-atom activation level (scatter mode: none; continuum: the
    # Markov line2state map)
    if continuum_state is not None:
        aux = [continuum_macro.line2state]
    elif mode != LINE_SCATTER:
        aux = [line2macro]
    else:
        aux = []

    shell_pack = np.zeros((S, 8), np.float32)
    shell_pack[:, 0] = chi_e
    shell_pack[:, 1] = geometry.r_inner / ct
    shell_pack[:, 2] = geometry.r_outer / ct
    if continuum_state is not None:
        from tardis_tpu.constants import H as H_PLANCK
        from tardis_tpu.constants import K_B
        from tardis_tpu.plasma.continuum import FF_OPAC_CONST

        shell_pack[:, 3] = (
            H_PLANCK * NU_UNIT / (K_B * continuum_state.t_electrons)
        )
        shell_pack[:, 4] = (
            FF_OPAC_CONST * continuum_state.ff_opacity_factor * ct
            / NU_UNIT**3
        )

    import jax

    # iteration-invariant line tables, cached on the AtomData instance
    # (line_nu only changes when the atom data does)
    line_cache = atom_data.__dict__.get("_dev_line_cache")
    if line_cache is None:
        line_cache = {
            "line_nu": jax.device_put(line_nu_scaled),
            "neg_line_nu": jax.device_put(-line_nu_scaled),
            "neg_nu_tiled": build_tiled_table(-line_nu_scaled),
        }
        atom_data.__dict__["_dev_line_cache"] = line_cache

    # ONE batched transfer for every small per-iteration host array: each
    # eagerly-dispatched upload costs up to ~10-50 ms of tunnel round-trip
    # on the axon stack, and there are ~10 of them per iteration (round 5;
    # same trick as macro_atom_solver._ChainContext)
    batch_np = dict(
        r_inner=np.asarray(geometry.r_inner / ct, np.float32),
        r_outer=np.asarray(geometry.r_outer / ct, np.float32),
        chi_e=chi_e,
        shell_pack=shell_pack,
        macro_cum_prob=np.asarray(cum_prob, np.float32),
        macro_block_start=np.asarray(block_start, np.int32),
        macro_dest=np.asarray(dest, np.int32),
        macro_emit=np.asarray(emit),
        macro_line=np.asarray(mline, np.int32),
        line2macro=np.asarray(line2macro, np.int32),
        **cont_kw,
    )
    batch_d = jax.device_put(batch_np)

    tables = TransportTables(
        line_nu=line_cache["line_nu"],
        neg_line_nu=line_cache["neg_line_nu"],
        neg_nu_tiled=line_cache["neg_nu_tiled"],
        tau_cum_hi=hi_d,
        tau_cum_lo=lo_d,
        tau_pack=_tau_pack_jit(hi_d, lo_d),
        pred_packed=build_packed_pred_tables_device(
            hi_d, lo_d, line_cache["line_nu"], aux=aux
        ),
        **batch_d,
        **chain_kw,
    )

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
        **cont_static,
        **chain_static,
    )
    _warm_device_readback(tables.r_inner)
    return tables, static


_READBACK_WARM = False


def _warm_device_readback(small_device_array):
    """One-time device->host transfer warm-up.

    On the axon TPU stack the FIRST device->host readback of a process
    pays a 50-250 s initialization (measured on 32-byte arrays; later
    fetches are milliseconds).  Every transport run eventually reads back
    (tail repack, estimators), so trigger that init here during table
    setup instead of inside the first timed transport call.  The fetch
    runs on a daemon thread: it overlaps with compilation, and a wedged
    transfer service degrades back to the old first-call stall instead of
    blocking table setup.
    """
    global _READBACK_WARM
    if _READBACK_WARM:
        return
    _READBACK_WARM = True
    import threading

    x = small_device_array[:1]
    threading.Thread(
        target=lambda: np.asarray(x), daemon=True
    ).start()
