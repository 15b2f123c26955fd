"""Composable workflow API.

Counterpart of the reference's new-generation workflows
(/root/reference/tardis/workflows/simple_tardis_workflow.py:36-540,
standard_tardis_workflow.py:16): the same convergence loop as ``Simulation``
but exposed as overridable stages (solve_plasma / solve_montecarlo /
solve_simulation_state / spectrum), so custom workflows subclass and replace
individual stages.
"""

from __future__ import annotations

import logging

import numpy as np

from tardis_tpu.config.reader import ConfigDict, config_from_dict
from tardis_tpu.simulation.base import Simulation
from tardis_tpu.spectrum.base import real_packet_spectrum
from tardis_tpu.transport.solver import solve_radiation_field

logger = logging.getLogger(__name__)


class SimpleTARDISWorkflow:
    """Stage-decomposed convergence workflow."""

    def __init__(self, config, atom_data=None):
        if not isinstance(config, ConfigDict):
            config = config_from_dict(config)
        self.sim = Simulation.from_config(config, atom_data=atom_data)
        self.completed = False

    # --- stages (override points) -------------------------------------
    def solve_plasma(self, estimator_j_blues=None):
        self.sim._solve_plasma(estimator_j_blues)
        return self.sim.plasma_state

    def solve_montecarlo(self, n_packets, iteration):
        return self.sim.iterate(n_packets, iteration)

    def solve_simulation_state(self, transport_result, iteration):
        return self.sim.advance_state(transport_result, iteration)

    def solve_spectrum(self):
        self.sim.run_final()
        return self.sim.spectrum_real

    # --- driver -------------------------------------------------------
    def run(self):
        sim = self.sim
        for iteration in range(sim.iterations - 1):
            result = self.solve_montecarlo(sim.no_of_packets, iteration)
            converged = self.solve_simulation_state(result, iteration)
            sim.iterations_executed += 1
            if converged and sim.stop_if_converged:
                break
        self.solve_spectrum()
        self.completed = True
        return self

    # convenience accessors matching the reference attribute names
    @property
    def simulation_state(self):
        return self.sim.state

    @property
    def spectrum_solver(self):
        return self.sim

    @property
    def transport_state(self):
        return self.sim.last_transport_result


class StandardTARDISWorkflow(SimpleTARDISWorkflow):
    """Adds per-iteration logging and optional live convergence plotting
    (reference standard_tardis_workflow.py:16)."""

    def __init__(self, config, atom_data=None, show_convergence_plots=False,
                 show_progress_bars=True):
        super().__init__(config, atom_data)
        self.show_convergence_plots = show_convergence_plots
        self.show_progress_bars = show_progress_bars
        # in-run packet progress (chunk-granular) rides the same flag
        self.sim.transport.show_packet_progress = bool(show_progress_bars)
        self._progress = None

    def run(self):
        sim = self.sim
        iterator = range(sim.iterations - 1)
        if self.show_progress_bars:
            try:
                from tqdm.auto import tqdm

                iterator = tqdm(iterator, desc="iterations")
            except ImportError:  # pragma: no cover
                pass
        for iteration in iterator:
            result = self.solve_montecarlo(sim.no_of_packets, iteration)
            converged = self.solve_simulation_state(result, iteration)
            sim.iterations_executed += 1
            rec = sim.history[-1]
            logger.info(
                "iter %d: t_inner=%.1f L=%.3e/%.3e",
                iteration,
                rec.t_inner,
                rec.emitted_luminosity,
                sim.state.luminosity_requested,
            )
            if converged and sim.stop_if_converged:
                break
        self.solve_spectrum()
        if self.show_convergence_plots:
            self.plot_convergence()
        self.completed = True
        return self

    def plot_convergence(self):
        from tardis_tpu.visualization.convergence import plot_convergence

        return plot_convergence(self.sim)
