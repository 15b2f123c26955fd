"""Simulation state: geometry + composition + radiation-field state.

TPU-native counterpart of the reference's ``SimulationState``
(/root/reference/tardis/model/base.py:35): holds the ejecta model (shell
velocities/densities/abundances as numpy cgs arrays) plus the mutable
radiation-field state (t_radiative, dilution_factor, t_inner) that the
convergence loop updates each iteration.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from tardis_tpu.atomic.atom_data import SYMBOL_TO_Z
from tardis_tpu.constants import B_WIEN, C, SIGMA_SB
from tardis_tpu.model.density import calculate_density
from tardis_tpu.model.geometry import Radial1DGeometry


@dataclass
class Composition:
    """Elemental mass fractions and derived number densities per shell."""

    atomic_numbers: np.ndarray  # (E,)
    mass_fractions: np.ndarray  # (E, S) normalized
    density: np.ndarray  # (S,) g/cm^3

    def number_density(self, masses_g: np.ndarray) -> np.ndarray:
        """Number density per element per shell [1/cm^3].

        ``masses_g`` must align with ``atomic_numbers``.
        """
        return self.mass_fractions * self.density[None, :] / masses_g[:, None]


@dataclass
class SimulationState:
    geometry: Radial1DGeometry
    composition: Composition
    time_explosion: float  # s
    luminosity_requested: float  # erg/s
    t_inner: float  # K
    t_radiative: np.ndarray  # (S,) K
    dilution_factor: np.ndarray  # (S,)
    extra: dict = field(default_factory=dict)

    @property
    def no_of_shells(self) -> int:
        return self.geometry.no_of_shells

    @property
    def r_inner(self) -> np.ndarray:
        return self.geometry.r_inner

    @property
    def volume(self) -> np.ndarray:
        return self.geometry.volume

    @classmethod
    def from_config(cls, config, atom_data=None) -> "SimulationState":
        """Build the state from a validated config tree.

        Mirrors ``parse_simulation_state``
        (/root/reference/tardis/io/model/parse_simulation_state.py:9) for the
        'specific' structure type with uniform abundances.
        """
        # top-level csvy_model key (reference SimulationState.from_csvy,
        # model/base.py:322) or structure.type 'file' with a filetype
        # (reference parse_geometry_configuration.py) dispatch to readers
        if config.get("csvy_model"):
            from tardis_tpu.io.csvy import simulation_state_from_csvy

            return simulation_state_from_csvy(config.csvy_model, config)
        structure = config.model.structure
        if structure.get("type") == "file":
            return cls._from_file_structure(structure, config)
        vel = structure.velocity
        edges = np.linspace(vel.start, vel.stop, vel.num + 1)
        geometry = Radial1DGeometry.from_velocity_grid(
            edges, config.supernova.time_explosion
        )

        density = calculate_density(
            structure.density, geometry.v_middle, geometry.time_explosion
        )

        abund_cfg = dict(config.model.abundances)
        abund_type = abund_cfg.pop("type", "uniform")
        if abund_type != "uniform":
            raise NotImplementedError(
                f"abundance type '{abund_type}' (only 'uniform' in config; "
                "use CSVY models for per-shell abundances)"
            )
        elements = []
        fractions = []
        for sym, frac in abund_cfg.items():
            z = SYMBOL_TO_Z.get(sym)
            if z is None:
                raise ValueError(f"Unknown element symbol '{sym}'")
            elements.append(z)
            fractions.append(float(frac))
        order = np.argsort(elements)
        elements = np.asarray(elements)[order]
        fractions = np.asarray(fractions)[order]
        norm = fractions.sum()
        if not np.isclose(norm, 1.0, atol=1e-8):
            fractions = fractions / norm
        S = geometry.no_of_shells
        composition = Composition(
            atomic_numbers=elements,
            mass_fractions=np.repeat(fractions[:, None], S, axis=1),
            density=density,
        )

        # --- inner boundary temperature
        L = config.supernova.luminosity_requested
        r_inner0 = geometry.r_inner[0]
        if config.plasma.initial_t_inner > 0:
            t_inner = float(config.plasma.initial_t_inner)
        else:
            # Stefan-Boltzmann from requested luminosity
            t_inner = float((L / (4.0 * np.pi * r_inner0**2 * SIGMA_SB)) ** 0.25)

        # --- radiative temperature profile (Wien-scaled from t_inner,
        # reference io/model/parse_radiation_field_configuration.py:144-168)
        if config.plasma.initial_t_rad > 0:
            t_radiative = np.full(S, float(config.plasma.initial_t_rad))
        else:
            lambda_wien_inner = B_WIEN / t_inner
            t_radiative = B_WIEN / (
                lambda_wien_inner
                * (1.0 + (geometry.v_middle - geometry.v_inner[0]) / C)
            )

        dilution_factor = geometry.geometric_dilution_factor()

        return cls(
            geometry=geometry,
            composition=composition,
            time_explosion=geometry.time_explosion,
            luminosity_requested=L,
            t_inner=t_inner,
            t_radiative=t_radiative,
            dilution_factor=dilution_factor,
        )

    @classmethod
    def _from_file_structure(cls, structure, config) -> "SimulationState":
        """structure: {type: file, filename, filetype} dispatch
        (reference io/model/parse_geometry_configuration.py + readers/)."""
        filetype = structure.get("filetype", "csvy")
        filename = structure.filename
        if filetype == "csvy":
            from tardis_tpu.io.csvy import simulation_state_from_csvy

            return simulation_state_from_csvy(filename, config)
        if filetype in ("artis", "simple_ascii"):
            from tardis_tpu.io.model_readers import (
                simulation_state_from_artis,
            )

            abund = config.model.abundances
            if abund.get("type") != "file":
                raise ValueError(
                    f"{filetype} density files require a file-type "
                    "abundances section"
                )
            return simulation_state_from_artis(
                filename, abund.filename, config
            )
        if filetype in ("cmfgen", "cmfgen_model"):
            from tardis_tpu.io.model_readers import (
                simulation_state_from_cmfgen,
            )

            return simulation_state_from_cmfgen(filename, config)
        if filetype == "blondin_toymodel":
            from tardis_tpu.io.model_readers import (
                simulation_state_from_blondin,
            )

            return simulation_state_from_blondin(filename, config)
        raise ValueError(f"unknown model filetype {filetype!r}")

    def t_inner_from_luminosity(self, emitted_luminosity: float, exponent=-0.5):
        """Updated t_inner estimate from the emitted/requested luminosity ratio
        (reference simulation/base.py:222-232)."""
        ratio = emitted_luminosity / self.luminosity_requested
        return self.t_inner * ratio**exponent
