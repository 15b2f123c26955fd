"""Inner-velocity solver workflow.

Counterpart of the reference's ``InnerVelocitySolverWorkflow``
(/root/reference/tardis/workflows/v_inner_solver.py:23-312): each iteration,
the Rosseland-mean integrated optical depth profile is interpolated to find
the velocity where tau = 2/3 (the photosphere), and the inner boundary is
moved there (damped) before the next iteration.

The TPU build keeps the shell grid fixed and instead rebuilds the model with
the new v_inner (re-interpolating density/abundances), which maps cleanly to
static-shape kernels.
"""

from __future__ import annotations

import logging

import numpy as np

from tardis_tpu.workflows.simple import SimpleTARDISWorkflow
from tardis_tpu.workflows.util import get_tau_integ

logger = logging.getLogger(__name__)


class InnerVelocitySolverWorkflow(SimpleTARDISWorkflow):
    def __init__(self, config, atom_data=None, tau: float = 2.0 / 3.0,
                 mean_optical_depth: str = "rosseland",
                 damping_factor: float = 0.5):
        super().__init__(config, atom_data)
        # get_tau_integ reads the f64 host tau table every iteration — the
        # device line-plasma fast path does not apply to this workflow
        self.sim._device_line_eligible = False
        self.log_tau_target = np.log(tau)
        self.mean_optical_depth = mean_optical_depth
        self.damping_factor = damping_factor
        self.v_inner_history: list[float] = []

    def estimate_v_inner(self) -> float:
        """Velocity where the integrated mean optical depth hits the target
        (reference v_inner_solver.py:148-190)."""
        sim = self.sim
        tau_integ = np.log(
            np.clip(
                get_tau_integ(
                    sim.plasma_state, sim.atom_data, sim.state
                )[self.mean_optical_depth],
                1e-300,
                None,
            )
        )
        v_inner_grid = sim.state.geometry.v_inner
        # tau decreases outward: interpolate v(log tau)
        order = np.argsort(tau_integ)
        est = np.interp(
            self.log_tau_target, tau_integ[order], v_inner_grid[order]
        )
        est = float(
            np.clip(est, v_inner_grid[0], v_inner_grid[-1])
        )
        return est

    def advance_v_inner(self):
        sim = self.sim
        if sim.plasma_state is None:
            self.solve_plasma()
        est = self.estimate_v_inner()
        old = sim.state.geometry.v_inner[0]
        new = old + self.damping_factor * (est - old)
        self.v_inner_history.append(new)
        # rebuild the geometry with a shifted inner edge, same shell count
        geo = sim.state.geometry
        edges = np.linspace(new, geo.v_outer[-1], geo.no_of_shells + 1)
        from tardis_tpu.model.geometry import Radial1DGeometry

        # re-interpolate density/abundances onto the new grid
        v_mid_old = geo.v_middle
        new_geo = Radial1DGeometry.from_velocity_grid(
            edges, geo.time_explosion
        )
        comp = sim.state.composition
        density_new = np.interp(new_geo.v_middle, v_mid_old, comp.density)
        comp.density = density_new
        comp.mass_fractions = np.stack(
            [
                np.interp(new_geo.v_middle, v_mid_old, comp.mass_fractions[i])
                for i in range(comp.mass_fractions.shape[0])
            ]
        )
        sim.state.t_radiative = np.interp(
            new_geo.v_middle, v_mid_old, sim.state.t_radiative
        )
        sim.state.dilution_factor = np.interp(
            new_geo.v_middle, v_mid_old, sim.state.dilution_factor
        )
        sim.state.geometry = new_geo
        # plasma index maps depend only on composition element set: rebuild
        sim.plasma_solver._build_index_maps(sim.state)
        sim.plasma_state = None
        logger.info("v_inner moved %.1f -> %.1f km/s", old / 1e5, new / 1e5)

    def run(self):
        sim = self.sim
        for iteration in range(sim.iterations - 1):
            result = self.solve_montecarlo(sim.no_of_packets, iteration)
            self.solve_simulation_state(result, iteration)
            self.advance_v_inner()
            sim.iterations_executed += 1
        self.solve_spectrum()
        self.completed = True
        return self
