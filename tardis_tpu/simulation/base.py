"""Simulation orchestration: the outer convergence loop.

TPU-native counterpart of the reference's ``Simulation``
(/root/reference/tardis/simulation/base.py:103-812): alternates a plasma
solve, a Monte Carlo transport iteration, estimator inversion, and damped
radiation-field updates until converged, then runs a final high-statistics
iteration that produces spectra.
"""

from __future__ import annotations

import logging
from dataclasses import dataclass, field

import numpy as np

from tardis_tpu.atomic.hdf_loader import atom_data_from_hdf
from tardis_tpu.atomic.synthetic import make_synthetic_atom_data
from tardis_tpu.config.reader import ConfigDict
from tardis_tpu.model.state import SimulationState
from tardis_tpu.plasma.solver import PlasmaSolver
from tardis_tpu.simulation.convergence import (
    ConvergenceState,
    make_convergence_solvers,
)
from tardis_tpu.spectrum.base import (
    Spectrum,
    frequency_grid,
    real_packet_spectrum,
)
from tardis_tpu.transport.solver import (
    TransportResult,
    TransportSolver,
    solve_radiation_field,
)

logger = logging.getLogger(__name__)


@dataclass
class IterationRecord:
    """Per-iteration plasma/radiation state (cf. PlasmaStateStorerMixin,
    reference simulation/base.py:42-100)."""

    t_radiative: np.ndarray
    dilution_factor: np.ndarray
    t_inner: float
    electron_densities: np.ndarray
    emitted_luminosity: float
    reabsorbed_luminosity: float


class Simulation:
    def __init__(
        self,
        config: ConfigDict,
        simulation_state: SimulationState,
        atom_data,
        plasma_solver: PlasmaSolver,
        transport_solver: TransportSolver,
    ):
        self.config = config
        self.state = simulation_state
        self.atom_data = atom_data
        self.plasma_solver = plasma_solver
        self.transport = transport_solver

        mc = config.montecarlo
        self.iterations = mc.iterations
        self.no_of_packets = mc.no_of_packets
        self.last_no_of_packets = mc.last_no_of_packets
        self.seed = mc.seed
        strategy = mc.convergence_strategy
        self.convergence_solvers = make_convergence_solvers(strategy)
        self.convergence_state = ConvergenceState(
            hold_iterations=int(strategy.get("hold_iterations", 3))
        )
        self.stop_if_converged = bool(strategy.get("stop_if_converged", False))
        self.lock_t_inner_cycles = int(strategy.get("lock_t_inner_cycles", 1))
        self.t_inner_update_exponent = float(
            strategy.get("t_inner_update_exponent", -0.5)
        )

        sn = config.supernova
        self.lum_wavelength_start = sn.get("luminosity_wavelength_start", 0.0)
        self.lum_wavelength_end = sn.get(
            "luminosity_wavelength_end", float("inf")
        )

        self.plasma_state = None
        self.history: list[IterationRecord] = []
        self.iterations_executed = 0
        self.last_transport_result: TransportResult | None = None
        self.spectrum_real: Spectrum | None = None
        self.spectrum_virtual: Spectrum | None = None
        self.spectrum_integrated: Spectrum | None = None

        spec = config.spectrum
        self.spectrum_nu_edges = frequency_grid(
            spec.start, spec.stop, spec.num
        )

        self._callbacks = []

    # ------------------------------------------------------------------
    @classmethod
    def from_config(cls, config: ConfigDict, atom_data=None) -> "Simulation":
        if config.get("csvy_model"):
            from tardis_tpu.io.csvy import simulation_state_from_csvy

            state = simulation_state_from_csvy(config["csvy_model"], config)
        else:
            state = SimulationState.from_config(config)
        line_interaction_type = config.plasma.line_interaction_type
        if atom_data is None:
            path = config.atom_data
            if path in (None, "synthetic"):
                atom_data = make_synthetic_atom_data()
            else:
                atom_data = atom_data_from_hdf(path)
        if atom_data.species_z is None:
            atom_data = atom_data.prepare(
                selected_atoms=list(state.composition.atomic_numbers),
                line_interaction_type=line_interaction_type,
            )

        plasma_solver = PlasmaSolver(
            atom_data,
            state,
            ionization=config.plasma.ionization,
            excitation=config.plasma.excitation,
            radiative_rates_type=config.plasma.radiative_rates_type,
            link_t_rad_t_electron=config.plasma.get(
                "link_t_rad_t_electron", 0.9
            ),
            w_epsilon=config.plasma.get("w_epsilon", 1e-10),
            helium_treatment=config.plasma.get("helium_treatment", "none"),
            # the reference schema defaults this key to the STRING "none"
            # (standard_plasmas.py:156 checks `in ["none", None]`) — treat
            # the sentinel and empty strings as absent
            heating_rate_data_file=(
                lambda v: None if v in ("none", "", None) else v
            )(config.plasma.get("heating_rate_data_file", None)),
            nlte_species=[
                __import__(
                    "tardis_tpu.plasma.nlte", fromlist=["parse_species"]
                ).parse_species(sp) if isinstance(sp, str) else tuple(sp)
                for sp in config.plasma.get("nlte", {}).get("species", [])
            ],
            nlte_coronal_approximation=bool(
                config.plasma.get("nlte", {}).get(
                    "coronal_approximation", False
                )
            ),
            nlte_classical_nebular=bool(
                config.plasma.get("nlte", {}).get("classical_nebular", False)
            ),
        )
        if int(config.montecarlo.get("nthreads", 1)) != 1:
            # reference numba prange thread count; packet parallelism here
            # is device-side (jax.sharding mesh), and the host table
            # builds take OMP_NUM_THREADS
            logger.info(
                "montecarlo.nthreads is a no-op: packet parallelism runs "
                "on the accelerator mesh; set OMP_NUM_THREADS for the "
                "native host pipeline"
            )
        virtual_cfg = config.spectrum.get("virtual", {})
        if virtual_cfg.get("enable_biasing", False):
            raise NotImplementedError(
                "spectrum.virtual.enable_biasing: v-packet biasing is not "
                "implemented (the dense volley pass has no roulette to "
                "bias)"
            )
        if float(virtual_cfg.get("tau_russian", 10.0)) != 10.0 or float(
            virtual_cfg.get("survival_probability", 0.0)
        ) != 0.0:
            # the TPU v-packet pass integrates e^-tau exactly over the
            # whole ray (transport/vpacket.py) — Russian roulette is an
            # approximation it does not need, so these knobs cannot
            # change the result
            logger.info(
                "spectrum.virtual.tau_russian/survival_probability are "
                "no-ops: the v-packet pass computes the exact e^-tau "
                "attenuation the roulette would approximate"
            )

        solver_cls = TransportSolver
        if config.montecarlo.get("enable_nonhomologous_expansion", False):
            # arbitrary piecewise-linear v(r): same API, nonhomologous
            # kernel (reference modes/nonhomologous/)
            from tardis_tpu.transport.solver import (
                NonhomologousTransportSolver,
            )

            solver_cls = NonhomologousTransportSolver
        transport_solver = solver_cls(
            line_interaction_type=line_interaction_type,
            disable_electron_scattering=config.plasma.get(
                "disable_electron_scattering", False
            ),
            disable_line_scattering=config.plasma.get(
                "disable_line_scattering", False
            ),
            batch_size=config.montecarlo.get("batch_size", 65536),
            packet_source=config.montecarlo.get("packet_source", "auto"),
            vpacket_tracking=bool(
                config.spectrum.get("virtual", {}).get(
                    "virtual_packet_logging", False
                )
            ),
            track_last_interaction=bool(
                config.montecarlo.get("tracking", {}).get(
                    "track_last_interaction", True
                )
            ),
            enable_full_relativity=bool(
                config.montecarlo.get("enable_full_relativity", False)
            ),
            track_rpacket_length=(
                int(
                    config.montecarlo.get("tracking", {}).get(
                        "initial_array_length", 10
                    )
                )
                if config.montecarlo.get("tracking", {}).get(
                    "track_rpacket", False
                )
                else 0
            ),
            inner_boundary_albedo=(
                float(config.montecarlo.get("inner_boundary_albedo", 0.0))
                if config.montecarlo.get(
                    "enable_reflective_inner_boundary", False
                )
                else 0.0
            ),
        )
        return cls(config, state, atom_data, plasma_solver, transport_solver)

    # ------------------------------------------------------------------
    def add_callback(self, fn):
        """fn(simulation) called after each iteration
        (cf. reference run_tardis callbacks, tardis/base.py:70-100)."""
        self._callbacks.append(fn)

    _device_line_eligible: bool | None = None

    def _device_line_ok(self) -> bool:
        """Whether the convergence loop may use the device line-plasma
        path (plasma/device_line.py): classic transport solver, Planck-
        based radiative rates, no NLTE species, and the macro-chain
        sampler guaranteed to engage (the walk fallback reads the f64
        host tables)."""
        if self._device_line_eligible is None:
            t = self.transport
            ok = (
                type(t) is TransportSolver
                and self.plasma_solver.radiative_rates_type != "detailed"
                and not self.plasma_solver.nlte_species
                # IIP continuum: the ContinuumSolver and the Markov macro
                # build consume the f64 host line tables every iteration
                and not self.config.plasma.get(
                    "continuum_interaction", {}
                ).get("species")
            )
            lit = t.line_interaction_type if ok else None
            if ok and lit in ("downbranch", "macroatom"):
                from tardis_tpu.opacities.macro_atom_solver import (
                    chain_tables_fit,
                )
                from tardis_tpu.transport.device_state import NU_UNIT

                ok = t.use_macro_chain in ("auto", True) and (
                    chain_tables_fit(
                        self.atom_data.downbranch
                        if lit == "downbranch"
                        else self.atom_data.macro_atom,
                        self.state.no_of_shells,
                        mode=lit,
                        line_nu_scaled=self.atom_data.line_nu / NU_UNIT,
                    )
                )
            self._device_line_eligible = bool(ok)
        return self._device_line_eligible

    def _solve_plasma(self, estimator_j_blues=None, line_mode=None):
        if line_mode is None:
            line_mode = "device" if self._device_line_ok() else "host"
        self.plasma_state = self.plasma_solver.update(
            self.state.t_radiative,
            self.state.dilution_factor,
            j_blues=estimator_j_blues,
            line_mode=line_mode,
        )

    # ------------------------------------------------------------------
    def iterate(self, n_packets: int, iteration: int) -> TransportResult:
        """One plasma solve + MC transport run
        (reference simulation/base.py:419-490)."""
        if self.plasma_state is None:
            self._solve_plasma()
        result = self.transport.run_iteration(
            self.state,
            self.plasma_state,
            self.atom_data,
            n_packets=n_packets,
            seed=self.seed,
            iteration=iteration,
            # the (L, S) line-estimator readback is only consumed by the
            # 'detailed' radiative-rates mode during convergence; the
            # final iteration (run_final) always materializes it
            need_line_estimators=(
                self.plasma_solver.radiative_rates_type == "detailed"
            ),
            lum_nu_window=self._lum_nu_window(),
        )
        self.last_transport_result = result
        return result

    def _lum_nu_window(self):
        """(nu_min, nu_max) of the luminosity wavelength window [Hz]."""
        from tardis_tpu.constants import C as C_LIGHT

        lam_lo = self.lum_wavelength_start
        lam_hi = self.lum_wavelength_end
        nu_min = C_LIGHT / lam_hi if lam_hi > 0 and np.isfinite(
            lam_hi
        ) else 0.0
        nu_max = C_LIGHT / lam_lo if lam_lo > 0 else np.inf
        return nu_min, nu_max

    def advance_state(self, result: TransportResult, iteration: int) -> bool:
        """Invert estimators, check convergence, apply damped updates,
        re-solve plasma (reference simulation/base.py:270-417)."""
        est_t_rad, est_w, est_j_blues = solve_radiation_field(
            result, self.state, self.atom_data,
            w_epsilon=self.plasma_solver.w_epsilon,
        )
        # device-precomputed when the window matches (avoids the 2N-float
        # readback during convergence); lazy host fallback otherwise
        nu_min, nu_max = self._lum_nu_window()
        emitted = result.emitted_luminosity(nu_min, nu_max)
        reabsorbed = result.reabsorbed_luminosity()
        est_t_inner = self.state.t_inner * (
            emitted / self.state.luminosity_requested
        ) ** self.t_inner_update_exponent

        solvers = self.convergence_solvers
        t_rad_conv = solvers["t_rad"].get_convergence_status(
            self.state.t_radiative, est_t_rad, self.state.no_of_shells
        )
        w_conv = solvers["w"].get_convergence_status(
            self.state.dilution_factor, est_w, self.state.no_of_shells
        )
        t_inner_conv = solvers["t_inner"].get_convergence_status(
            self.state.t_inner, est_t_inner, 1
        )
        converged = self.convergence_state.update(
            t_rad_conv and w_conv and t_inner_conv
        )

        # damped updates
        self.state.t_radiative = solvers["t_rad"].converge(
            self.state.t_radiative, est_t_rad
        )
        self.state.dilution_factor = solvers["w"].converge(
            self.state.dilution_factor, est_w
        )
        if (iteration + 1) % self.lock_t_inner_cycles == 0:
            self.state.t_inner = float(
                solvers["t_inner"].converge(self.state.t_inner, est_t_inner)
            )

        self.history.append(
            IterationRecord(
                t_radiative=self.state.t_radiative.copy(),
                dilution_factor=self.state.dilution_factor.copy(),
                t_inner=self.state.t_inner,
                electron_densities=(
                    self.plasma_state.electron_densities.copy()
                ),
                emitted_luminosity=emitted,
                reabsorbed_luminosity=reabsorbed,
            )
        )
        logger.info(
            "iteration %d: L_emitted=%.4e L_requested=%.4e t_inner=%.1f",
            iteration,
            emitted,
            self.state.luminosity_requested,
            self.state.t_inner,
        )

        detailed = (
            self.plasma_solver.radiative_rates_type == "detailed"
        )
        self._solve_plasma(estimator_j_blues=est_j_blues if detailed else None)
        return converged

    # ------------------------------------------------------------------
    def run_convergence(self, checkpoint_path: str | None = None):
        """The main convergence loop (reference simulation/base.py:492-523).

        ``checkpoint_path``: write the minimal resume state after every
        iteration (io/hdf.py save_checkpoint; atomic, milliseconds) so an
        interrupted run continues from the last completed iteration with
        ``io.hdf.resume_simulation`` — the accelerator service this runs
        on can restart mid-run, and long production runs should survive
        that.  Resume starts at ``iterations_executed``, and the
        per-iteration RNG keys are derived from (seed, iteration), so the
        continued trajectory is the one the uninterrupted run would have
        taken."""
        if checkpoint_path is not None:
            from tardis_tpu.io.hdf import save_checkpoint
        for iteration in range(self.iterations_executed,
                               self.iterations - 1):
            result = self.iterate(self.no_of_packets, iteration)
            converged = self.advance_state(result, iteration)
            self.iterations_executed += 1
            if checkpoint_path is not None:
                save_checkpoint(self, checkpoint_path)
            for cb in self._callbacks:
                cb(self)
            if converged and self.stop_if_converged:
                break
        return self

    def run_final(self):
        """Final high-statistics iteration + spectra
        (reference simulation/base.py:525-570)."""
        iteration = self.iterations_executed
        n_vp = int(self.config.montecarlo.get("no_of_virtual_packets", 0))
        if self.plasma_state is None or (
            self.plasma_state.tau_sobolev is None
        ):
            # the final iteration consumes the f64 host line tables (the
            # formal integral, line-estimator materialization); device-mode
            # convergence states re-solve at the same (t_rad, W) —
            # deterministic, milliseconds via the fused native pass
            self._solve_plasma(line_mode="host")
        result = self.transport.run_iteration(
            self.state,
            self.plasma_state,
            self.atom_data,
            n_packets=self.last_no_of_packets,
            seed=self.seed,
            iteration=iteration,
            n_vpackets=n_vp,
            spectrum_nu_edges=self.spectrum_nu_edges,
            vpacket_spawn_nu_range=self._vpacket_spawn_nu_range(),
        )
        self.last_transport_result = result
        self.iterations_executed += 1
        self.spectrum_real = real_packet_spectrum(
            result.output_nu,
            result.output_energy,
            result.emitted_mask,
            self.spectrum_nu_edges,
            result.time_of_simulation,
        )
        if result.virt_energy_hist is not None:
            self.spectrum_virtual = Spectrum(
                nu_edges=result.virt_nu_edges,
                luminosity_nu=(
                    result.virt_energy_hist
                    / result.time_of_simulation
                    / np.diff(result.virt_nu_edges)
                ),
            )
        if self.config.spectrum.get("method") == "integrated":
            self.integrate_spectrum()
        for cb in self._callbacks:
            cb(self)
        return self

    def _vpacket_spawn_nu_range(self):
        """Config virtual_spectrum_spawn_range (wavelengths, reference
        schema montecarlo.yml) -> (nu_min, nu_max) in Hz."""
        from tardis_tpu.constants import C as _C

        rng = self.config.montecarlo.get("virtual_spectrum_spawn_range", {})
        start = float(rng.get("start", 0.0))
        end = float(rng.get("end", float("inf")))
        if start <= 0.0 and not np.isfinite(end):
            return (0.0, float("inf"))
        # values parsed from 'X angstrom' are cm; treat as wavelengths
        nu_hi = _C / start if start > 0 else float("inf")
        nu_lo = _C / end if np.isfinite(end) and end > 0 else 0.0
        return (nu_lo, nu_hi)

    def integrate_spectrum(self) -> Spectrum:
        """Formal-integral spectrum from the last iteration's estimators
        (reference FormalIntegralSolver, spectrum/formal_integral/)."""
        from tardis_tpu.spectrum.formal_integral import FormalIntegralSolver

        if self.last_transport_result is None:
            raise RuntimeError("run the simulation before integrating")
        integ_cfg = self.config.spectrum.get("integrated", {})
        compute = str(integ_cfg.get("compute", "jax")).lower()
        if compute not in ("jax", "cpu", "gpu", "automatic", ""):
            raise ValueError(
                f"spectrum.integrated.compute={compute!r}: the reference's "
                "CPU/CUDA integrator split does not exist here — one "
                "device path serves every backend"
            )
        solver = FormalIntegralSolver(
            n_points=int(integ_cfg.get("points", 1000)),
            interpolate_shells=int(integ_cfg.get("interpolate_shells", 0)),
        )
        self.spectrum_integrated = solver.solve(
            self.spectrum_nu_edges,
            self.state,
            self.plasma_state,
            self.last_transport_result,
            self.atom_data,
            line_interaction_type=self.transport.line_interaction_type,
        )
        return self.spectrum_integrated

    def run(self):
        self.run_convergence()
        self.run_final()
        return self


def run_tardis(config_or_path, atom_data=None, callbacks=(),
               log_level=None, specific_log_level=False,
               show_progress_bars=False) -> Simulation:
    """Top-level API (reference tardis/base.py:10-126).

    ``show_progress_bars`` enables the chunk-granular in-run packet
    progress bar (reference show_progress_bars / update_packet_pbar).
    """
    from tardis_tpu.config.reader import config_from_dict, config_from_yaml

    if isinstance(config_or_path, (str,)):
        config = config_from_yaml(config_or_path)
    elif isinstance(config_or_path, ConfigDict):
        config = config_or_path
    else:
        config = config_from_dict(config_or_path)

    from tardis_tpu.io.logger import logging_state

    logging_state(log_level, config, specific_log_level)
    sim = Simulation.from_config(config, atom_data=atom_data)
    sim.transport.show_packet_progress = bool(show_progress_bars)
    for cb in callbacks:
        sim.add_callback(cb)
    return sim.run()
