"""Convergence strategy: damped updates + convergence detection.

Mirrors the reference's ``ConvergenceSolver``
(/root/reference/tardis/simulation/convergence.py:4-131) and the
hold-iterations logic in ``Simulation`` (simulation/base.py:235-268).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np


@dataclass
class ConvergenceSolver:
    damping_constant: float = 0.5
    threshold: float = 0.05
    fraction: float = 0.8

    def converge(self, value, estimated):
        """Damped update: value + d * (estimated - value)."""
        return value + self.damping_constant * (estimated - value)

    def get_convergence_status(self, value, estimated, no_of_cells) -> bool:
        """True if >= `fraction` of cells changed by less than `threshold`
        (reference simulation/convergence.py:109-130)."""
        value = np.atleast_1d(np.asarray(value, dtype=np.float64))
        estimated = np.atleast_1d(np.asarray(estimated, dtype=np.float64))
        frac_conv = np.mean(
            np.abs(estimated - value) / np.abs(value) < self.threshold
        )
        if no_of_cells == 1:
            return bool(frac_conv == 1.0)
        return bool(frac_conv > self.fraction)


@dataclass
class ConvergenceState:
    """Tracks consecutive-converged count / hold iterations."""

    hold_iterations: int = 3
    consecutive_converges: int = 0
    converged: bool = False

    def update(self, all_converged: bool) -> bool:
        if all_converged:
            self.consecutive_converges += 1
            self.converged = (
                self.consecutive_converges >= self.hold_iterations + 1
            )
        else:
            self.consecutive_converges = 0
            self.converged = False
        return self.converged


def make_convergence_solvers(strategy: dict):
    """Build per-quantity solvers from the montecarlo.convergence_strategy
    config section."""
    base_d = strategy.get("damping_constant", 1.0)
    thr = strategy.get("threshold", 0.05)
    frac = strategy.get("fraction", 0.8)

    def solver(sub):
        s = strategy.get(sub, {}) or {}
        return ConvergenceSolver(
            damping_constant=s.get("damping_constant", base_d),
            threshold=s.get("threshold", thr),
            fraction=frac,
        )

    return {
        "t_rad": solver("t_rad"),
        "w": solver("w"),
        "t_inner": solver("t_inner"),
    }
