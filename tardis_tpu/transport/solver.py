"""Transport solver: per-iteration orchestration around the device kernel.

Host-side counterpart of the reference's ``MCTransportSolverClassic``
(/root/reference/tardis/transport/montecarlo/modes/classic/solver.py:102-270):
builds device tables, samples the packet pool, runs the kernel, and converts
raw device estimators back to physical cgs units, including the
radiation-field inversion of ``MCRadiationFieldPropertiesSolver``
(/root/reference/tardis/transport/montecarlo/estimators/mc_rad_field_solver.py:37-142).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import numpy as np

import jax.numpy as jnp

from tardis_tpu.constants import (
    C,
    SIGMA_SB,
    T_RADIATIVE_ESTIMATOR_CONSTANT,
)
from tardis_tpu.opacities.macro_atom_solver import (
    solve_macro_chain,
    solve_macro_state,
)
from tardis_tpu.plasma.lte import intensity_black_body
from tardis_tpu.transport.device_state import (
    NU_UNIT,
    build_transport_tables,
)
from tardis_tpu.transport.kernel import (
    STATUS_EMITTED,
    STATUS_REABSORBED,
    run_transport,
)
from tardis_tpu.transport.source import sample_blackbody_packets


@dataclass
class TransportResult:
    """Physical-unit transport outputs for one MC iteration.

    The per-packet output arrays are LAZY: the raw signed-frequency buffer
    stays on device until ``output_nu``/``output_energy``/``output_status``
    is first touched (the convergence loop only needs the two filtered
    luminosity scalars, which run_iteration computes on device — reading
    2N floats back every iteration cost ~0.6 s at bench scale).
    """

    # packed device buffer: index 2*pkt + {0: signed nu (kernel units),
    # 1: energy (packet units)}
    _out_packed: object
    # estimators (physical)
    j_estimator: np.ndarray  # (S,) erg cm
    nu_bar_estimator: np.ndarray  # (S,) erg cm Hz
    # per-line estimators: None during convergence iterations unless the
    # radiative-rates mode needs them (the (L, S) readback costs ~2.5 s
    # per iteration on this host and the default dilute-blackbody mode
    # never reads them; the final iteration always materializes them for
    # the formal integral / HDF export)
    j_blue_estimator: np.ndarray | None  # (L, S)
    edot_lu_estimator: np.ndarray | None  # (L, S)
    # full per-event tracker (None unless enabled): dict of (N, K) arrays
    rpacket_tracker: dict | None
    # last-interaction tracking (None unless enabled)
    last_interaction: dict | None  # arrays keyed by name, physical units
    # virtual-packet spectrum (None unless vpackets enabled)
    virt_nu_edges: np.ndarray | None  # (M+1,) Hz
    virt_energy_hist: np.ndarray | None  # (M,) erg (attenuated vp energies)
    vp_records: int  # spawn records captured
    # bookkeeping
    time_of_simulation: float  # s
    n_packets: int
    n_events: float
    n_steps: int
    # continuum estimators (None unless continuum enabled); normalized by
    # 1/(dt V h) (rates) and 1/(dt V) (heatings) but NOT radiation-field
    # damped — the IIP workflow applies the damping factor
    continuum: object | None = None  # plasma.continuum.ContinuumEstimators
    # per-vpacket tracking (None unless vpacket_tracking enabled): dict of
    # reference-named virt_packet_* arrays
    # (montecarlo_transport_state.py:33-44)
    vpackets: dict | None = None
    # device-precomputed (emitted-in-window, reabsorbed) luminosities and
    # the window they were computed for (None = not precomputed)
    _lum_cache: tuple | None = None  # (nu_min, nu_max, emitted, reabsorbed)

    def _materialize(self):
        if not isinstance(self._out_packed, np.ndarray):
            out = np.asarray(self._out_packed, dtype=np.float64)
            nu_signed = out[0::2]
            self._out_nu = np.abs(nu_signed) * NU_UNIT
            self._out_energy = out[1::2] * (1.0 / self.n_packets)
            self._out_status = np.where(
                nu_signed > 0, 1, np.where(nu_signed < 0, 2, 0)
            ).astype(np.int8)
            self._out_packed = out

    @property
    def output_nu(self):
        self._materialize()
        return self._out_nu

    @property
    def output_energy(self):
        self._materialize()
        return self._out_energy

    @property
    def output_status(self):
        self._materialize()
        return self._out_status

    @property
    def emitted_mask(self):
        return self.output_status == STATUS_EMITTED

    def emitted_luminosity(self, nu_min=0.0, nu_max=np.inf) -> float:
        c = self._lum_cache
        if c is not None and c[0] == nu_min and c[1] == nu_max:
            return c[2]
        # strict bounds, matching spectrum.base.filtered_luminosity
        # (reference spectrum/luminosity.py:5)
        m = self.emitted_mask & (self.output_nu > nu_min) & (
            self.output_nu < nu_max
        )
        return float(self.output_energy[m].sum() / self.time_of_simulation)

    def reabsorbed_luminosity(self) -> float:
        if self._lum_cache is not None:
            return self._lum_cache[3]
        m = self.output_status == STATUS_REABSORBED
        return float(self.output_energy[m].sum() / self.time_of_simulation)


_SUMMARY_JIT = None


def _device_summary(carry, nu_min_scaled, nu_max_scaled):
    """Pack every small per-iteration readback into TWO device arrays.

    Each separate device->host fetch costs tens of ms of tunnel round-trip
    on the axon stack, and _finalize used to make ~9 of them (bulk
    estimator hi/lo pairs, step/event counters, the luminosity window
    sums) — ~0.28 s/iteration at bench scale.  One jitted packer returning
    a single f32 vector + a single i32 vector collapses that to two
    fetches.  Returns (np.float64 vector, np.int64 vector) with layout
    [est_j | est_j_lo | est_nubar | est_nubar_lo | n_events, em, re] and
    [n_steps, vp_count].
    """
    global _SUMMARY_JIT
    if _SUMMARY_JIT is None:

        def f(est_j, est_j_lo, est_nubar, est_nubar_lo, n_steps, n_events,
              vp_count, out, lo, hi):
            nu_s = out[0::2]
            e = out[1::2]
            nu = jnp.abs(nu_s)
            em = jnp.sum(
                jnp.where((nu_s > 0) & (nu > lo) & (nu < hi), e, 0.0)
            )
            re_ = jnp.sum(jnp.where(nu_s < 0, e, 0.0))
            vec_f = jnp.concatenate(
                [est_j, est_j_lo, est_nubar, est_nubar_lo,
                 jnp.stack([n_events, em, re_])]
            )
            vec_i = jnp.stack([n_steps, vp_count])
            return vec_f, vec_i

        _SUMMARY_JIT = jax.jit(f)
    hi = (
        jnp.float32(np.finfo(np.float32).max)
        if not np.isfinite(nu_max_scaled)
        else jnp.float32(nu_max_scaled)
    )
    vec_f, vec_i = _SUMMARY_JIT(
        carry.est_j, carry.est_j_lo, carry.est_nubar, carry.est_nubar_lo,
        carry.n_steps, carry.n_events, carry.vp_count,
        carry.out_packed, jnp.float32(nu_min_scaled), hi,
    )
    return np.asarray(vec_f, np.float64), np.asarray(vec_i, np.int64)


class TransportSolver:
    def __init__(
        self,
        line_interaction_type: str = "scatter",
        disable_electron_scattering: bool = False,
        disable_line_scattering: bool = False,
        batch_size: int = 65536,
        w_epsilon: float = 1e-10,
        vpacket_records_per_packet: int = 8,
        vpacket_tracking: bool = False,
        track_last_interaction: bool = False,
        enable_full_relativity: bool = False,
        track_rpacket_length: int = 0,
        inner_boundary_albedo: float = 0.0,
        use_macro_chain: bool | str = "auto",
        packet_source: str = "auto",
        mesh: object | str = "auto",
        show_packet_progress: bool = False,
    ):
        # device mesh for packet-parallel transport: "auto" shards over all
        # local devices when more than one is visible (the PRODUCTION
        # multi-chip path, parallel/transport.py); None forces single-device
        self.mesh = mesh
        # packet source selection (reference
        # parse_packet_source_configuration.py:49-77: relativistic source
        # iff enable_full_relativity; "weighted" additionally exposed)
        self.packet_source = packet_source
        # "auto": absorbing-chain macro-atom sampling when the chain tables
        # fit the device budget (see solve_macro_chain), RNG walk otherwise
        self.use_macro_chain = use_macro_chain
        self.line_interaction_type = line_interaction_type
        self.disable_electron_scattering = disable_electron_scattering
        self.disable_line_scattering = disable_line_scattering
        self.batch_size = batch_size
        self.w_epsilon = w_epsilon
        self.vpacket_records_per_packet = vpacket_records_per_packet
        self.vpacket_tracking = vpacket_tracking
        self.track_last_interaction = track_last_interaction
        self.enable_full_relativity = enable_full_relativity
        self.track_rpacket_length = track_rpacket_length
        self.inner_boundary_albedo = inner_boundary_albedo
        # in-run packet progress bar (chunk-granular; the TPU analogue of
        # the reference's montecarlo progress bar, util/base.py
        # update_packet_pbar / progress_bars config)
        self.show_packet_progress = show_packet_progress

    # ------------------------------------------------------------------
    def run_iteration(
        self,
        sim_state,
        plasma_state,
        atom_data,
        n_packets: int,
        seed: int,
        iteration: int,
        n_vpackets: int = 0,
        spectrum_nu_edges: np.ndarray | None = None,
        vpacket_spawn_nu_range: tuple | None = None,
        continuum_state=None,
        continuum_macro=None,
        need_line_estimators: bool = True,
        lum_nu_window: tuple | None = None,
    ) -> TransportResult:
        geometry = sim_state.geometry
        ct = C * geometry.time_explosion
        macro_state = None
        macro_chain = None
        if continuum_state is not None:
            # IIP mode: the absorbing-Markov tables replace the classic
            # macro-atom walk entirely (and force full relativity, as the
            # reference does — modes/iip/packet_propagation.py:102)
            pass
        elif self.line_interaction_type in ("downbranch", "macroatom"):
            macro = (
                atom_data.downbranch
                if self.line_interaction_type == "downbranch"
                else atom_data.macro_atom
            )
            if self.use_macro_chain in ("auto", True):
                # f32 copies from the fused native plasma pass when
                # available (bit-identical to astype(float32) of the f64
                # fields, which solve_macro_chain would otherwise pay
                # ~0.2 s/iteration to cast on this host)
                ps = plasma_state
                macro_chain = solve_macro_chain(
                    macro,
                    (ps.beta_sobolev if getattr(ps, "beta32", None) is None
                     else ps.beta32),
                    (ps.j_blues if getattr(ps, "j_blues32", None) is None
                     else ps.j_blues32),
                    (ps.stimulated_emission_factor
                     if getattr(ps, "stim32", None) is None else ps.stim32),
                    mode=self.line_interaction_type,
                    line_nu_scaled=atom_data.line_nu / NU_UNIT,
                )
            if macro_chain is None:
                macro_state = solve_macro_state(
                    macro,
                    plasma_state.beta_sobolev,
                    plasma_state.j_blues,
                    plasma_state.stimulated_emission_factor,
                )

        tables, static = build_transport_tables(
            geometry,
            plasma_state,
            atom_data,
            line_interaction_type=self.line_interaction_type,
            disable_electron_scattering=self.disable_electron_scattering,
            macro_state=macro_state,
            enable_full_relativity=(
                self.enable_full_relativity or continuum_state is not None
            ),
            continuum_state=continuum_state,
            continuum_macro=continuum_macro,
            macro_chain=macro_chain,
        )
        if self.disable_line_scattering:
            static = static._replace(disable_line_scattering=True)
        if n_vpackets > 0:
            static = static._replace(
                vpacket_capacity=int(
                    n_packets * self.vpacket_records_per_packet
                )
            )
        if self.track_last_interaction:
            static = static._replace(track_last_interaction=True)
        if self.track_rpacket_length > 0:
            static = static._replace(
                track_rpacket_length=self.track_rpacket_length
            )
        if self.inner_boundary_albedo > 0.0:
            static = static._replace(
                inner_boundary_albedo=float(self.inner_boundary_albedo)
            )

        base_key = jax.random.key(np.uint32(seed))
        src_key = jax.random.fold_in(base_key, 2 * iteration)
        run_key = jax.random.fold_in(base_key, 2 * iteration + 1)

        src = self.packet_source
        if src == "auto":
            src = (
                "relativistic" if static.enable_full_relativity else "simple"
            )
        pool_w = None
        if src == "weighted":
            from tardis_tpu.transport.source import (
                sample_blackbody_packets_weighted,
            )

            pool_mu, pool_nu_cmf, pool_w = sample_blackbody_packets_weighted(
                src_key, n_packets, sim_state.t_inner
            )
        elif src == "relativistic":
            from tardis_tpu.transport.source import (
                sample_blackbody_packets_relativistic,
            )

            beta_inner = float(geometry.r_inner[0] / ct)
            pool_mu, pool_nu_cmf, pool_w = (
                sample_blackbody_packets_relativistic(
                    src_key, n_packets, sim_state.t_inner, beta_inner
                )
            )
        else:
            pool_mu, pool_nu_cmf = sample_blackbody_packets(
                src_key, n_packets, sim_state.t_inner
            )

        batch = min(self.batch_size, n_packets)
        tail = min(2048, batch // 4) if batch >= 8192 else 0
        progress = None
        pbar = None
        if self.show_packet_progress:
            try:
                from tqdm.auto import tqdm

                pbar = tqdm(
                    total=n_packets, desc="packets", unit="pkt",
                    unit_scale=True, leave=False,
                )

                def progress(done, total):
                    pbar.n = done
                    pbar.refresh()

            except ImportError:  # pragma: no cover
                pass
        mesh = self.mesh
        if mesh == "auto":
            mesh = None
            if len(jax.devices()) > 1:
                from tardis_tpu.parallel.transport import packet_mesh

                mesh = packet_mesh()
        if mesh is not None and mesh.devices.size > 1 and (
            n_packets % mesh.devices.size == 0
        ):
            from tardis_tpu.parallel.transport import run_transport_sharded

            carry = run_transport_sharded(
                tables,
                static,
                pool_mu,
                pool_nu_cmf,
                run_key,
                n_packets=n_packets,
                batch_size=max(batch // mesh.devices.size, 32),
                mesh=mesh,
                tail_batch=(
                    max(tail // mesh.devices.size, 64) if tail else 0
                ),
                pool_w=pool_w,
                progress=progress,
            )
        else:
            carry = run_transport(
                tables,
                static,
                pool_mu,
                pool_nu_cmf,
                run_key,
                n_packets=n_packets,
                batch_size=batch,
                tail_batch=tail,
                pool_w=pool_w,
                progress=progress,
                # IIP-mode packets legitimately random-walk 1e4-1e5 events;
                # the repack ladder keeps the drain tail near-full occupancy
                tail_ladder=continuum_state is not None,
            )
        if pbar is not None:
            pbar.n = n_packets
            pbar.refresh()
            pbar.close()

        virt_hist = None
        virt_edges = None
        vpackets = None
        if n_vpackets > 0:
            from tardis_tpu.transport.vpacket import trace_vpacket_records

            virt_edges = np.asarray(spectrum_nu_edges, dtype=np.float64)
            edges_scaled = jnp.asarray(virt_edges / NU_UNIT, jnp.float32)
            n_bins = len(virt_edges) - 1
            spawn_lo, spawn_hi = 0.0, np.inf
            if vpacket_spawn_nu_range is not None:
                spawn_lo, spawn_hi = vpacket_spawn_nu_range
            out = trace_vpacket_records(
                tables,
                static,
                carry.vp_packed[:, 0],
                carry.vp_packed[:, 1],
                carry.vp_packed[:, 2],
                carry.vp_packed[:, 3],
                carry.vp_packed[:, 4].astype(jnp.int32),
                carry.vp_packed[:, 5].astype(jnp.int32),
                n_vpackets=n_vpackets,
                nu_bin_edges=edges_scaled,
                n_bins=n_bins,
                spawn_nu_min=float(spawn_lo) / NU_UNIT,
                spawn_nu_max=(
                    float(spawn_hi) / NU_UNIT
                    if np.isfinite(spawn_hi)
                    else np.inf
                ),
                return_packets=self.vpacket_tracking,
            )
            if self.vpacket_tracking:
                hist, vnu, ve, rec_idx = out
                e0 = 1.0 / n_packets
                keep = np.asarray(ve) > 0
                rec = np.asarray(rec_idx)[keep]
                vp = np.asarray(carry.vp_packed, np.float64)
                # reference virt_packet_* naming
                # (montecarlo_transport_state.py:33-44)
                vpackets = {
                    "virt_packet_nus": np.asarray(vnu, np.float64)[keep]
                    * NU_UNIT,
                    "virt_packet_energies": np.asarray(ve, np.float64)[keep]
                    * e0,
                    "virt_packet_initial_rs": vp[rec, 0]
                    * (C * sim_state.time_explosion),
                    "virt_packet_initial_mus": vp[rec, 1],
                    "virt_packet_last_interaction_in_nu": vp[rec, 2]
                    * NU_UNIT,
                    "virt_packet_last_interaction_type": vp[rec, 6].astype(
                        np.int8
                    ),
                    "virt_packet_last_line_interaction_out_id": vp[
                        rec, 7
                    ].astype(np.int32),
                }
            else:
                hist = out
            virt_hist = np.asarray(hist, dtype=np.float64)

        return self._finalize(
            carry, sim_state, atom_data, n_packets,
            virt_edges=virt_edges, virt_hist=virt_hist,
            full_relativity=(
                self.enable_full_relativity or continuum_state is not None
            ),
            continuum_enabled=continuum_state is not None,
            vpackets=vpackets,
            need_line_estimators=need_line_estimators,
            lum_nu_window=lum_nu_window,
        )

    # ------------------------------------------------------------------
    def _finalize(self, carry, sim_state, atom_data, n_packets,
                  virt_edges=None, virt_hist=None, full_relativity=None,
                  continuum_enabled=False, vpackets=None,
                  need_line_estimators=True,
                  lum_nu_window=None) -> TransportResult:
        """Convert kernel-unit estimators to physical cgs.

        Kernel units: length ct, frequency NU_UNIT, energy E0 = 1/N erg
        (reference packet_collections.py:58: time_of_simulation = 1 erg / L).
        """
        ct = C * sim_state.time_explosion
        e0 = 1.0 / n_packets  # erg
        time_of_simulation = 1.0 / sim_state.luminosity_requested  # s
        S = sim_state.no_of_shells
        L = atom_data.n_lines

        # single batched readback of every small per-iteration output
        # (round 5: was ~9 separate fetches at ~30 ms tunnel latency each)
        if lum_nu_window is not None:
            w_lo = float(lum_nu_window[0]) / NU_UNIT
            w_hi = (
                float(lum_nu_window[1]) / NU_UNIT
                if np.isfinite(lum_nu_window[1])
                else np.inf
            )
        else:
            w_lo, w_hi = 0.0, np.inf
        vec_f, vec_i = _device_summary(carry, w_lo, w_hi)
        # (hi, lo) compensated accumulators -> f64
        est_j = (vec_f[0:S] + vec_f[S : 2 * S]) * e0 * ct
        est_nubar = (
            (vec_f[2 * S : 3 * S] + vec_f[3 * S : 4 * S])
            * e0 * ct * NU_UNIT
        )

        if full_relativity is None:
            full_relativity = self.enable_full_relativity
        if need_line_estimators:
            # difference-array -> per-line estimators
            nu_scaled = atom_data.line_nu / NU_UNIT
            line_diff = carry.line_diff_f64().reshape(L + 1, S, 2)
            jb = np.cumsum(line_diff[:, :, 0], axis=0)[:L]
            ed = np.cumsum(line_diff[:, :, 1], axis=0)[:L]
            if full_relativity:
                # FR increments are line-independent (see kernel step 4)
                j_blue = jb * (e0 / NU_UNIT)
                edot = ed * e0
            else:
                j_blue = jb * nu_scaled[:, None] * (e0 / NU_UNIT)
                edot = ed * nu_scaled[:, None] * e0
        else:
            j_blue = None
            edot = None

        rpacket_tracker = None
        if self.track_rpacket_length > 0:
            K = self.track_rpacket_length
            N = n_packets
            tr = np.asarray(carry.tr_packed, np.float64).reshape(N, K, 6)
            rpacket_tracker = {
                "r": tr[:, :, 0] * ct,
                "nu": tr[:, :, 1] * NU_UNIT,
                "energy": tr[:, :, 2],
                "shell": tr[:, :, 3].astype(np.int32),
                "type": tr[:, :, 4].astype(np.int8),
                # direction cosine AFTER each event (reference tracker
                # after_mu column, used by RPacketPlotter's theta geometry)
                "mu": tr[:, :, 5],
            }

        last_interaction = None
        if self.track_last_interaction:
            li = np.asarray(carry.li_packed, np.float64)
            last_interaction = {
                "type": li[:, 0].astype(np.int8),
                "in_line": li[:, 1].astype(np.int32),
                "out_line": li[:, 2].astype(np.int32),
                "shell": li[:, 3].astype(np.int32),
                "in_nu": li[:, 4] * NU_UNIT,
                "r": li[:, 5] * ct,
            }

        continuum = None
        if continuum_enabled:
            continuum = reconstruct_continuum_estimators(
                carry, atom_data, sim_state, n_packets, time_of_simulation
            )

        lum_cache = None
        if lum_nu_window is not None:
            nu_min, nu_max = lum_nu_window
            dt = 1.0 / sim_state.luminosity_requested
            lum_cache = (
                float(nu_min), float(nu_max),
                float(vec_f[4 * S + 1]) * e0 / dt,
                float(vec_f[4 * S + 2]) * e0 / dt,
            )
        return TransportResult(
            continuum=continuum,
            rpacket_tracker=rpacket_tracker,
            last_interaction=last_interaction,
            _out_packed=carry.out_packed,
            _lum_cache=lum_cache,
            j_estimator=est_j,
            nu_bar_estimator=est_nubar,
            j_blue_estimator=j_blue,
            edot_lu_estimator=edot,
            virt_nu_edges=virt_edges,
            virt_energy_hist=(
                None if virt_hist is None else virt_hist * e0
            ),
            vp_records=int(vec_i[1]),
            vpackets=vpackets,
            time_of_simulation=time_of_simulation,
            n_packets=n_packets,
            n_events=float(vec_f[4 * S]),
            n_steps=int(vec_i[0]),
        )


class NonhomologousTransportSolver(TransportSolver):
    """Transport solver for arbitrary piecewise-linear velocity laws.

    Counterpart of the reference's ``MCTransportSolverNonhomologous``
    (/root/reference/tardis/transport/montecarlo/modes/nonhomologous/solver.py):
    rescales the Sobolev depths to the local velocity gradient and runs the
    nonhomologous kernel (transport/nonhomologous.py).  Continuum, virtual
    packets, and full relativity are not part of this mode (the reference
    mode is line-only and raises on full relativity,
    modes/nonhomologous/packet_propagation.py:102-104).
    """

    def run_iteration(
        self,
        sim_state,
        plasma_state,
        atom_data,
        n_packets: int,
        seed: int,
        iteration: int,
        n_vpackets: int = 0,
        spectrum_nu_edges: np.ndarray | None = None,
        vpacket_spawn_nu_range: tuple | None = None,
        continuum_state=None,
        continuum_macro=None,
        need_line_estimators: bool = True,
        lum_nu_window: tuple | None = None,
    ) -> TransportResult:
        if self.enable_full_relativity:
            raise NotImplementedError(
                "Full relativity not supported for non-homology."
            )
        if continuum_state is not None:
            raise NotImplementedError(
                "Continuum processes not supported for non-homology."
            )
        from tardis_tpu.transport.nonhomologous import (
            build_nonhom_tables,
            nonhomologous_plasma_state,
            run_nonhom_transport,
        )

        geometry = sim_state.geometry
        if not hasattr(geometry, "velocity_gradient"):
            # plain homologous geometry (e.g. the
            # enable_nonhomologous_expansion config path): lift it to the
            # piecewise-linear representation, v(r) = r / t_exp
            from tardis_tpu.model.geometry import (
                NonhomologousRadial1DGeometry,
            )

            geometry = NonhomologousRadial1DGeometry.from_homologous(
                geometry
            )
        plasma_nh = nonhomologous_plasma_state(plasma_state, geometry)
        macro_state = None
        if self.line_interaction_type in ("downbranch", "macroatom"):
            macro = (
                atom_data.downbranch
                if self.line_interaction_type == "downbranch"
                else atom_data.macro_atom
            )
            macro_state = solve_macro_state(
                macro,
                plasma_nh.beta_sobolev,
                plasma_nh.j_blues,
                plasma_nh.stimulated_emission_factor,
            )

        tables, static = build_nonhom_tables(
            geometry,
            plasma_nh,
            atom_data,
            line_interaction_type=self.line_interaction_type,
            macro_state=macro_state,
            disable_electron_scattering=self.disable_electron_scattering,
        )
        if self.disable_line_scattering:
            static = static._replace(disable_line_scattering=True)
        if self.track_last_interaction:
            static = static._replace(track_last_interaction=True)
        if self.track_rpacket_length > 0:
            static = static._replace(
                track_rpacket_length=self.track_rpacket_length
            )
        if self.inner_boundary_albedo > 0.0:
            static = static._replace(
                inner_boundary_albedo=float(self.inner_boundary_albedo)
            )

        base_key = jax.random.key(np.uint32(seed))
        src_key = jax.random.fold_in(base_key, 2 * iteration)
        run_key = jax.random.fold_in(base_key, 2 * iteration + 1)
        pool_mu, pool_nu_cmf = sample_blackbody_packets(
            src_key, n_packets, sim_state.t_inner
        )
        carry = run_nonhom_transport(
            tables,
            static,
            pool_mu,
            pool_nu_cmf,
            run_key,
            n_packets=n_packets,
            batch_size=min(self.batch_size, n_packets),
        )
        return self._finalize(
            carry, sim_state, atom_data, n_packets, full_relativity=False,
            need_line_estimators=need_line_estimators,
            lum_nu_window=lum_nu_window,
        )


def reconstruct_continuum_estimators(
    carry, atom_data, sim_state, n_packets, time_of_simulation
):
    """Per-continuum estimators from the kernel's frequency-grid moments.

    Within each merged-grid cell every cross-section is linear in nu, so the
    reference's per-event per-active-continuum accumulations
    (update_estimators_bound_free, estimators/radfield_estimator_calcs.py:57)
    factor EXACTLY into (alpha_c, beta_c) contractions against the moments
    M_k = sum(w nu^k) and Mb_k = sum(w b nu^k) accumulated in-kernel.

    Returns a :class:`tardis_tpu.plasma.continuum.ContinuumEstimators` with
    the reference's volume normalization (photo_ion_norm_factor = 1/(dt V h),
    heatings x h; workflows/type_iip_workflow.py:768-790) already applied —
    radiation-field damping is left to the workflow.
    """
    from tardis_tpu.constants import H
    from tardis_tpu.plasma.continuum import ContinuumEstimators
    from tardis_tpu.transport.device_state import build_continuum_grid

    pi = atom_data.photo_ion
    ct = C * sim_state.time_explosion
    e0 = 1.0 / n_packets
    S = sim_state.no_of_shells
    grid, xs = build_continuum_grid(pi)  # same build as the kernel tables
    grid_s = grid / NU_UNIT

    m = carry.cont_moments_f64()
    cells = len(grid) - 1
    m = m.reshape(cells, S, 8)
    M0, M1, M2 = m[..., 0], m[..., 1], m[..., 2]
    Mb0, Mb1, Mb2 = m[..., 3], m[..., 4], m[..., 5]
    counts = m[..., 6]

    dg = grid_s[1:] - grid_s[:-1]  # (cells,)
    beta = (xs[1:] - xs[:-1]) / np.maximum(dg, 1e-300)[:, None]  # (cells, C)
    alpha = xs[:-1] - beta * grid_s[:-1, None]

    def contract(Ma, Mb_):
        # sum_g alpha[g, c] * Ma[g, s] + beta[g, c] * Mb_[g, s]
        return np.einsum("gc,gs->cs", alpha, Ma) + np.einsum(
            "gc,gs->cs", beta, Mb_
        )

    # sum w sigma / nu  and  sum w b sigma / nu
    photo_ion = contract(M1, M0) * (ct / NU_UNIT) * e0
    stim_recomb = contract(Mb1, Mb0) * (ct / NU_UNIT) * e0
    # sum w sigma (1 - nu_th/nu)
    nu_th_s = pi.nu_threshold / NU_UNIT
    bf_heating = (
        contract(M0, M2) - nu_th_s[:, None] * contract(M1, M0)
    ) * ct * e0
    stim_recomb_cooling = (
        contract(Mb0, Mb2) - nu_th_s[:, None] * contract(Mb1, Mb0)
    ) * ct * e0

    active = (xs[:-1] > 0) & (xs[1:] > 0)  # (cells, C)
    stats = np.einsum("gc,gs->cs", active.astype(np.float64), counts)

    ff_heating = carry.est_ff_heat_f64() * e0

    volume = sim_state.volume
    norm = 1.0 / (time_of_simulation * volume * H)  # (S,)
    return ContinuumEstimators(
        photo_ion=photo_ion * norm[None, :],
        stim_recomb=stim_recomb * norm[None, :],
        bf_heating=bf_heating * norm[None, :] * H,
        stim_recomb_cooling=stim_recomb_cooling * norm[None, :] * H,
        photo_ion_statistics=stats,
        ff_heating=ff_heating * norm * H,
    )


def solve_radiation_field(
    result: TransportResult,
    sim_state,
    atom_data,
    w_epsilon: float = 1e-10,
):
    """Invert MC estimators to (T_rad, W, j_blues).

    (reference mc_rad_field_solver.py:95-142)
    """
    volume = sim_state.volume
    dt = result.time_of_simulation
    t_rad = (
        T_RADIATIVE_ESTIMATOR_CONSTANT
        * result.nu_bar_estimator
        / result.j_estimator
    )
    w = result.j_estimator / (
        4.0 * SIGMA_SB * t_rad**4 * dt * volume
    )

    if result.j_blue_estimator is None:
        # line estimators skipped (non-detailed radiative rates): the
        # plasma's j_blues come from the dilute-Planck field instead
        return t_rad, w, None
    norm = C * sim_state.time_explosion / (4.0 * np.pi * dt * volume)
    j_blues = result.j_blue_estimator * norm[None, :]
    planck = w[None, :] * intensity_black_body(
        atom_data.line_nu[:, None], t_rad[None, :]
    )
    j_blues = np.where(j_blues == 0.0, w_epsilon * planck, j_blues)
    return t_rad, w, j_blues
