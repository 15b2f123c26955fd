"""Kinetic-equilibrium (new-generation) NLTE solver.

Counterpart of the reference's ``tardis/plasma/equilibrium`` package
(RateMatrix rate_matrix.py:6-120, LevelPopulationSolver
level_populations.py:5, IonPopulationSolver ion_populations.py:12, rates in
equilibrium/rates/): for each treated element, ALL levels of ALL ion stages
are coupled in one statistical-equilibrium matrix —

  * bound-bound radiative rates (A_ul, B_ul J, B_lu J) from the line list,
  * bound-bound collisional rates (van Regemorter) scaled by n_e,
  * bound-free photoionization (gamma) + collisional ionization (n_e C_I),
  * spontaneous/stimulated radiative recombination and three-body
    collisional recombination into individual levels,

with one conservation row (sum of populations = element number density) per
shell, solved as batched dense linear systems — the TPU-friendly
formulation of the reference's per-(species, shell) sparse solves.  The
free-electron density is iterated to charge-conservation consistency
(reference IonPopulationSolver.solve outer loop).

The bound-free coefficients come from :class:`ContinuumSolver`
(plasma/continuum.py), i.e. the same Milne-relation machinery the IIP mode
uses; elements without photoionization data in the atomic set cannot be
treated kinetically (matching the reference, whose rate solvers require
``photoionization_data``).

The reference's ``ThermalBalanceSolver`` (equilibrium/thermal_balance.py:15)
is exposed here as a thin wrapper over the continuum heating-cooling
balance already used by the Type IIP workflow.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from tardis_tpu.constants import H, K_B
from tardis_tpu.plasma.nlte import _A_COEF, _B_COEF
from tardis_tpu.plasma.lte import intensity_black_body


@dataclass
class ElectronEnergyDistribution:
    """Electron energy distribution (cgs floats; reference
    plasma/electron_energy_distribution/base.py)."""

    energy: np.ndarray  # (S,) erg


@dataclass
class ThermalElectronEnergyDistribution(ElectronEnergyDistribution):
    """Thermal (Maxwellian) electron distribution: mean energy 3/2 k T_e,
    with temperature and number density per shell."""

    temperature: np.ndarray  # (S,) K
    number_density: np.ndarray  # (S,) cm^-3

    @classmethod
    def from_plasma_state(cls, plasma_state):
        t_e = plasma_state.t_electrons
        return cls(
            energy=1.5 * K_B * t_e,
            temperature=t_e,
            number_density=plasma_state.electron_densities,
        )


class KineticEquilibriumSolver:
    """Coupled level+ion statistical equilibrium for selected elements."""

    def __init__(self, atom_data, plasma_solver, elements=None):
        from tardis_tpu.plasma.continuum import ContinuumSolver

        self.atom = atom_data
        self.plasma = plasma_solver
        self.cont = ContinuumSolver(atom_data, plasma_solver)
        pi = atom_data.photo_ion
        if pi is None or pi.n_continua == 0:
            raise ValueError(
                "kinetic equilibrium requires photoionization data "
                "(generate the atomic set with continuum_species)"
            )
        cont_z = set(int(z) for z in pi.cont_z)
        if elements is None:
            elements = sorted(cont_z & set(int(z) for z in
                                           plasma_solver.element_z))
        for z in elements:
            if z not in cont_z:
                raise ValueError(
                    f"no photoionization data for element Z={z}"
                )
        self.elements = list(elements)
        self._build_maps()

    # ------------------------------------------------------------------
    def _build_maps(self):
        atom = self.atom
        pi = atom.photo_ion
        self._elem = {}
        for z in self.elements:
            # all levels of the element, grouped by ion stage
            rows = np.where(atom.level_z == z)[0]
            stages = atom.level_ion[rows]
            order = np.lexsort((atom.level_number[rows], stages))
            rows = rows[order]
            local = {int(r): k for k, r in enumerate(rows)}
            ground_of_stage = {}
            for k, r in enumerate(rows):
                j = int(atom.level_ion[r])
                if j not in ground_of_stage:
                    ground_of_stage[j] = k
            # element lines
            lmask = atom.line_z == z
            lids = np.where(lmask)[0]
            lo = np.array(
                [local[int(i)] for i in atom.line_lower_idx[lids]],
                dtype=np.int64,
            )
            up = np.array(
                [local[int(i)] for i in atom.line_upper_idx[lids]],
                dtype=np.int64,
            )
            # continuum channels of this element
            cmask = pi.cont_z == z
            cids = np.where(cmask)[0]
            c_low = np.array(
                [local[int(i)] for i in pi.level_flat_idx[cids]],
                dtype=np.int64,
            )
            c_up = np.array(
                [ground_of_stage[int(j) + 1] for j in pi.cont_ion[cids]],
                dtype=np.int64,
            )
            e_idx = int(np.where(self.plasma.element_z == z)[0][0])
            self._elem[z] = dict(
                rows=rows, lids=lids, lo=lo, up=up,
                cids=cids, c_low=c_low, c_up=c_up,
                stage_of=atom.level_ion[rows].astype(np.int64),
                e_idx=e_idx,
            )

    # ------------------------------------------------------------------
    def _bb_rates(self, em, t_rad, w, t_electrons, j_blues):
        """Per-line radiative + collisional(per n_e) rates for one element.

        Returns (r_down, r_up, q_down, q_up) each (n_lines, S); the q's are
        collision coefficients [cm^3/s] to be scaled by n_e.
        (reference equilibrium/rates/radiative_rates.py + collisional_rates)
        """
        atom = self.atom
        lids = em["lids"]
        nu = atom.line_nu[lids]
        f_lu = atom.line_f_lu[lids]
        g_l = atom.level_g[atom.line_lower_idx[lids]]
        g_u = atom.level_g[atom.line_upper_idx[lids]]
        a_ul = _A_COEF * nu**2 * (g_l / g_u) * f_lu
        b_lu = _B_COEF / nu * f_lu
        b_ul = b_lu * (g_l / g_u)
        if j_blues is not None:
            jb = j_blues[lids]
        else:
            jb = w[None, :] * intensity_black_body(
                nu[:, None], t_rad[None, :]
            )
        r_down = a_ul[:, None] + b_ul[:, None] * jb
        r_up = b_lu[:, None] * jb

        # van Regemorter collisions (reference collision_strengths.py
        # approximation path)
        i_h = 2.1798724e-11
        de = H * nu
        u0 = np.minimum(de[:, None] / (K_B * t_electrons)[None, :], 500.0)
        g_bar = 0.3
        q_lu = (
            5.465e-11
            * np.sqrt(t_electrons)[None, :]
            * 14.5
            * f_lu[:, None]
            * (i_h / de[:, None]) ** 2
            * u0
            * np.exp(-u0)
            * g_bar
        )
        q_ul = q_lu * (g_l / g_u)[:, None] * np.exp(u0)

        # exact tabulated strengths (Chianti/CMFGEN yg) override the
        # approximation on covered transitions (reference YgData
        # combine_first, plasma/properties/atomic.py:688-696)
        coll = getattr(atom, "collision", None)
        if coll is not None and len(coll) > 0:
            from tardis_tpu.plasma.nlte import BETA_COLL, interp_yg

            pair_key = (
                atom.line_lower_idx[lids].astype(np.int64) << 32
            ) | atom.line_upper_idx[lids].astype(np.int64)
            tab_key = (coll.lower_flat.astype(np.int64) << 32) | (
                coll.upper_flat.astype(np.int64)
            )
            order = np.argsort(tab_key)
            pos = np.searchsorted(tab_key[order], pair_key)
            pos_c = np.clip(pos, 0, len(tab_key) - 1)
            hit = tab_key[order][pos_c] == pair_key
            if hit.any():
                yg_T = interp_yg(coll, t_electrons)  # (Nc, S)
                rows = order[pos_c[hit]]
                pref = BETA_COLL / np.sqrt(t_electrons)[None, :]
                q_lu_tab = pref * yg_T[rows] * np.exp(-u0[hit])
                q_ul_tab = (
                    pref * yg_T[rows] * (g_l[hit] / g_u[hit])[:, None]
                )
                q_lu[hit] = q_lu_tab
                q_ul[hit] = q_ul_tab
        return r_down, r_up, q_ul, q_lu

    # ------------------------------------------------------------------
    def solve(
        self,
        plasma_state,
        estimators=None,
        j_blues: np.ndarray | None = None,
        n_e_iterations: int = 30,
        n_e_threshold: float = 0.01,
        damping: float = 0.5,
        electron_distribution: ThermalElectronEnergyDistribution
        | None = None,
    ):
        """Solve coupled level+ion populations and the electron density.

        Parameters
        ----------
        plasma_state : PlasmaState
            Current state (provides T fields and the non-kinetic species'
            ion populations for the charge budget).
        estimators : ContinuumEstimators, optional
            MC estimators; when given, photoionization/stimulated-recomb
            rates use them instead of the dilute-blackbody approximation.
        j_blues : optional (L, S) line mean intensities for the radiative
            bound-bound rates (defaults to the dilute-Planck field).

        Returns
        -------
        (level_pops, ion_pops, n_e): dicts keyed by element Z ->
        (K_z, S) level populations and (J_z+1, S) per-stage populations,
        plus the converged electron density (S,).
        """
        t_rad, w = plasma_state.t_rad, plasma_state.w
        # optional explicit electron distribution (reference passes a
        # ThermalElectronEnergyDistribution into the equilibrium solvers)
        if electron_distribution is not None:
            t_e = electron_distribution.temperature
            n_e = np.asarray(
                electron_distribution.number_density, np.float64
            ).copy()
        else:
            t_e = plasma_state.t_electrons
            n_e = plasma_state.electron_densities.copy()
        S = len(t_rad)

        # charge contributed by species NOT treated kinetically
        atom = self.atom
        charges_all = np.zeros(plasma_state.ion_number_density.shape[0])
        charges_all[self.plasma.species_ion_row] = atom.species_ion
        kinetic_rows = np.zeros_like(charges_all, dtype=bool)
        for z in self.elements:
            for s, (sz, si) in enumerate(
                zip(atom.species_z, atom.species_ion)
            ):
                if sz == z:
                    kinetic_rows[self.plasma.species_ion_row[s]] = True
        q_static = (
            plasma_state.ion_number_density
            * np.where(kinetic_rows, 0.0, charges_all)[:, None]
        ).sum(axis=0)

        import dataclasses

        level_pops, ion_pops = {}, {}
        for _ in range(n_e_iterations):
            ps = dataclasses.replace(plasma_state, electron_densities=n_e)
            cs = self.cont.update(ps, estimators)
            q_kin = np.zeros(S)
            for z in self.elements:
                em = self._elem[z]
                K = len(em["rows"])
                r_down, r_up, q_ul, q_lu = self._bb_rates(
                    em, t_rad, w, t_e, j_blues
                )
                c_down = q_ul * n_e[None, :]
                c_up = q_lu * n_e[None, :]
                # bound-free channel rates
                cids = em["cids"]
                ion_rate = cs.gamma[cids] + cs.coll_ion_coeff[cids] * n_e
                rec_rate = n_e[None, :] * (
                    cs.alpha_sp[cids]
                    + cs.alpha_stim[cids]
                    + cs.coll_recomb_coeff[cids] * n_e[None, :]
                )

                M = np.zeros((S, K, K))
                sarr = np.arange(S)

                def add(dst, src, rates):
                    np.add.at(M, (slice(None), dst, src),
                              np.moveaxis(rates, -1, 0))

                add(em["lo"], em["up"], r_down + c_down)
                add(em["up"], em["lo"], r_up + c_up)
                add(em["c_up"], em["c_low"], ion_rate)
                add(em["c_low"], em["c_up"], rec_rate)
                # diagonal: total loss from each state
                M[:, np.arange(K), np.arange(K)] -= M.sum(axis=1)
                # conservation row
                M[:, 0, :] = 1.0
                rhs = np.zeros((S, K))
                rhs[:, 0] = self.plasma.number_density[em["e_idx"]]
                try:
                    n = np.linalg.solve(M, rhs[..., None])[..., 0]
                except np.linalg.LinAlgError:
                    n = np.stack(
                        [
                            np.linalg.lstsq(M[s], rhs[s], rcond=None)[0]
                            for s in range(S)
                        ]
                    )
                n = np.clip(n.T, 0.0, None)  # (K, S)
                level_pops[z] = n
                n_stages = em["stage_of"].max() + 1
                ipop = np.zeros((n_stages, S))
                for j in range(n_stages):
                    ipop[j] = n[em["stage_of"] == j].sum(axis=0)
                ion_pops[z] = ipop
                q_kin += (
                    ipop * np.arange(n_stages, dtype=np.float64)[:, None]
                ).sum(axis=0)

            n_e_new = np.maximum(q_static + q_kin, 1e-30)
            if np.all(
                np.abs(n_e_new - n_e) / np.maximum(n_e, 1e-30)
                < n_e_threshold
            ):
                n_e = n_e_new
                break
            n_e = damping * n_e_new + (1.0 - damping) * n_e
        return level_pops, ion_pops, n_e

    # ------------------------------------------------------------------
    def apply_to_state(self, plasma_state, level_pops, ion_pops, n_e):
        """Write the kinetic populations back into a PlasmaState copy
        (level_number_density / ion_number_density rows of the treated
        elements, plus n_e and re-derived Sobolev depths)."""
        import dataclasses

        from tardis_tpu.plasma import lte

        atom = self.atom
        n_level = plasma_state.level_number_density.copy()
        ion_nd = plasma_state.ion_number_density.copy()
        for z in self.elements:
            em = self._elem[z]
            n_level[em["rows"]] = level_pops[z]
            for j in range(ion_pops[z].shape[0]):
                sp = self.plasma._species_lookup.get((int(z), int(j)))
                if sp is not None:
                    ion_nd[self.plasma.species_ion_row[sp]] = ion_pops[z][j]
        n_lower = n_level[atom.line_lower_idx]
        n_upper = n_level[atom.line_upper_idx]
        g_lower = atom.level_g[atom.line_lower_idx]
        g_upper = atom.level_g[atom.line_upper_idx]
        stim = lte.stimulated_emission_factor(
            n_lower, n_upper, g_lower, g_upper
        )
        tau = lte.tau_sobolev(
            atom.line_wavelength_cm,
            atom.line_f_lu,
            self.plasma.time_explosion,
            n_lower,
            stim,
        )
        return dataclasses.replace(
            plasma_state,
            level_number_density=n_level,
            ion_number_density=ion_nd,
            electron_densities=n_e,
            stimulated_emission_factor=stim,
            tau_sobolev=tau,
            beta_sobolev=lte.beta_sobolev(tau),
        )


class ThermalBalanceSolver:
    """Electron-temperature root of heating == cooling
    (reference equilibrium/thermal_balance.py:15; delegates to the
    continuum heating/cooling budget used by the Type IIP workflow)."""

    def __init__(self, continuum_solver):
        self.cont = continuum_solver

    def solve(
        self,
        plasma_state,
        estimators,
        t_e_bounds=(0.3, 2.0),
        n_grid: int = 21,
    ) -> np.ndarray:
        """Per-shell T_e minimizing |heating - cooling| on a scan of
        t_e = factor * t_rad within ``t_e_bounds``."""
        import dataclasses

        factors = np.linspace(t_e_bounds[0], t_e_bounds[1], n_grid)
        best = np.full(len(plasma_state.t_rad), np.inf)
        t_best = plasma_state.t_electrons.copy()
        for f in factors:
            ps = dataclasses.replace(
                plasma_state, t_electrons=f * plasma_state.t_rad
            )
            cs = self.cont.update(ps, estimators)
            balance, frac = self.cont.heating_minus_cooling(
                ps, cs, estimators
            )
            better = np.abs(frac) < best
            best = np.where(better, np.abs(frac), best)
            t_best = np.where(better, ps.t_electrons, t_best)
        return t_best
