"""Type IIP (continuum) workflow: IIP transport + thermal balance.

Counterpart of the reference's TypeIIPWorkflow
(/root/reference/tardis/workflows/type_iip_workflow.py:41-1011):

per iteration
  1. plasma solve (with the current per-shell link_t_rad_t_electron and
     rate-equation electron densities),
  2. continuum state + absorbing-Markov macro atom solve,
  3. IIP Monte Carlo transport (continuum kernel, full relativity),
  4. continuum-estimator normalization + radiation-field damping
     (:748-801),
  5. T_rad / W / t_inner convergence updates,
  6. thermal balance: per-shell least squares over
     (electron fraction, link_t_rad_t_electron) zeroing the fractional
     heating and the rate-equation electron-density change (:532-722).
"""

from __future__ import annotations

import logging

import numpy as np

from tardis_tpu.constants import SIGMA_SB
from tardis_tpu.opacities.continuum_macro import solve_continuum_macro_state
from tardis_tpu.plasma.continuum import ContinuumEstimators, ContinuumSolver
from tardis_tpu.workflows.simple import SimpleTARDISWorkflow

logger = logging.getLogger(__name__)


class TypeIIPWorkflow(SimpleTARDISWorkflow):
    def __init__(self, config, atom_data=None, thermal_balance_max_nfev=25):
        super().__init__(config, atom_data)
        sim = self.sim
        if sim.atom_data.photo_ion is None:
            raise ValueError(
                "Type IIP workflow requires photoionization data in the "
                "atomic dataset"
            )
        if sim.transport.line_interaction_type != "macroatom":
            raise ValueError("IIP mode requires line_interaction_type="
                             "'macroatom' (as in the reference)")
        # the continuum solver + Markov macro build consume the f64 host
        # line tables every iteration — the device line-plasma fast path
        # (plasma/device_line.py) does not apply to IIP mode
        sim._device_line_eligible = False
        self.cont_solver = ContinuumSolver(sim.atom_data, sim.plasma_solver)
        self.cont_state = None
        self.cont_estimators: ContinuumEstimators | None = None
        S = sim.state.no_of_shells
        # initial link guess: W^0.25 (reference :612-628)
        self.sim.plasma_solver.link_t_rad_t_electron = (
            sim.state.dilution_factor**0.25
        )
        self.thermal_balance_max_nfev = thermal_balance_max_nfev
        self._damping = np.ones(S)
        ci = sim.config.plasma.get("continuum_interaction", {})
        # adiabatic k-packet cooling channel + thermal-balance term
        # (reference enable_adiabatic_cooling, schemas/plasma.yml:89)
        self.enable_adiabatic_cooling = bool(
            ci.get("enable_adiabatic_cooling", False)
        )

    # ------------------------------------------------------------------
    def solve_montecarlo(self, n_packets, iteration):
        sim = self.sim
        if sim.plasma_state is None:
            self.solve_plasma()
        self.cont_state = self.cont_solver.update(
            sim.plasma_state, self.cont_estimators
        )
        macro = solve_continuum_macro_state(
            sim.atom_data, sim.plasma_state, self.cont_state,
            sim.plasma_state.j_blues,
            enable_two_photon=bool(
                sim.config.plasma.get("continuum_interaction", {}).get(
                    "enable_two_photon_decay", False
                )
            ),
            enable_adiabatic_cooling=self.enable_adiabatic_cooling,
            time_explosion=sim.state.time_explosion,
        )
        result = sim.transport.run_iteration(
            sim.state,
            sim.plasma_state,
            sim.atom_data,
            n_packets=n_packets,
            seed=sim.seed,
            iteration=iteration,
            continuum_state=self.cont_state,
            continuum_macro=macro,
        )
        sim.last_transport_result = result
        self._update_continuum_estimators(result)
        return result

    # ------------------------------------------------------------------
    def _update_continuum_estimators(self, result):
        """Apply the radiation-field damping factor (reference :803-829)."""
        sim = self.sim
        est = result.continuum
        J_model = (
            sim.state.dilution_factor
            * sim.state.t_radiative**4
            * SIGMA_SB
            / np.pi
        )
        J_estim = result.j_estimator / (
            4.0 * np.pi * result.time_of_simulation * sim.state.volume
        )
        with np.errstate(divide="ignore", invalid="ignore"):
            damping = np.where(J_estim > 0, J_model / J_estim, 1.0)
        self._damping = damping
        self.cont_estimators = ContinuumEstimators(
            photo_ion=est.photo_ion * damping[None, :],
            stim_recomb=est.stim_recomb * damping[None, :],
            bf_heating=est.bf_heating * damping[None, :],
            stim_recomb_cooling=est.stim_recomb_cooling * damping[None, :],
            photo_ion_statistics=est.photo_ion_statistics,
            ff_heating=est.ff_heating * damping,
        )

    # ------------------------------------------------------------------
    def solve_thermal_balance(self):
        """Least-squares solve for (n_e fraction, link) per shell
        (reference :612-722)."""
        from scipy.optimize import least_squares
        from scipy.sparse import block_diag

        sim = self.sim
        pl = sim.plasma_solver
        S = sim.state.no_of_shells
        t_rad = sim.state.t_radiative
        w = sim.state.dilution_factor

        max_n_e = self._max_electron_density()

        link0 = np.broadcast_to(
            np.asarray(pl.link_t_rad_t_electron, float), (S,)
        ).copy()
        n_e0 = sim.plasma_state.electron_densities
        x0 = np.empty(2 * S)
        x0[::2] = np.clip(n_e0 / max_n_e, 1e-10, 1.0)
        x0[1::2] = np.clip(link0, 1500.0 / t_rad.min(), 1.5)

        def residuals(x):
            frac = x[::2]
            link = x[1::2]
            n_e = frac * max_n_e
            pl.link_t_rad_t_electron = link
            pl._fixed_electron_densities = n_e
            ps = pl.update(
                t_rad, w, j_blues=sim.plasma_state.j_blues
            )
            cs = self.cont_solver.update(ps, self.cont_estimators)
            n_e_rate = self.cont_solver.rate_equation_electron_density(
                ps, cs
            )
            _, frac_heat = self.cont_solver.heating_minus_cooling(
                ps, cs, self.cont_estimators,
                adiabatic_cooling=self.enable_adiabatic_cooling,
                time_explosion=sim.state.time_explosion,
            )
            res = np.empty(2 * S)
            with np.errstate(divide="ignore", invalid="ignore"):
                res[::2] = (n_e_rate - n_e) / np.maximum(n_e, 1e-300)
            res[1::2] = frac_heat
            return np.where(np.isfinite(res), res, 1e3)

        lower = np.empty(2 * S)
        upper = np.empty(2 * S)
        lower[::2], upper[::2] = 1e-10, 1.0
        lower[1::2], upper[1::2] = 1500.0 / t_rad.min(), 1.5
        x0 = np.clip(x0, lower, upper)
        result = least_squares(
            residuals,
            x0,
            bounds=(lower, upper),
            jac_sparsity=block_diag([np.ones((2, 2))] * S),
            xtol=1e-12,
            ftol=1e-10,
            max_nfev=self.thermal_balance_max_nfev,
            method="trf",
        )
        # apply the solution persistently (the plasma solver keeps the
        # per-shell link and fixed n_e for subsequent updates)
        frac = result.x[::2]
        link = result.x[1::2]
        pl.link_t_rad_t_electron = link
        pl._fixed_electron_densities = frac * max_n_e
        sim._solve_plasma()
        logger.info(
            "thermal balance: link=%.3f..%.3f cost=%.3e",
            link.min(), link.max(), result.cost,
        )
        return result

    def _max_electron_density(self):
        pl = self.sim.plasma_solver
        return (pl.number_density * pl.element_z[:, None]).sum(axis=0)

    # ------------------------------------------------------------------
    def run(self):
        sim = self.sim
        for iteration in range(sim.iterations - 1):
            result = self.solve_montecarlo(sim.no_of_packets, iteration)
            converged = self.solve_simulation_state(result, iteration)
            self.solve_thermal_balance()
            sim.iterations_executed += 1
            if converged and sim.stop_if_converged:
                break
        # final iteration with the last packet count (spectra)
        result = self.solve_montecarlo(
            sim.last_no_of_packets, sim.iterations - 1
        )
        from tardis_tpu.spectrum.base import real_packet_spectrum

        sim.spectrum_real = real_packet_spectrum(
            result.output_nu,
            result.output_energy,
            result.emitted_mask,
            sim.spectrum_nu_edges,
            result.time_of_simulation,
        )
        self.completed = True
        return self
