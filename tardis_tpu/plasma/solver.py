"""Plasma assembly and per-iteration solve.

The reference assembles a networkx DAG of plasma properties
(/root/reference/tardis/plasma/assembly/base.py:30-340) and re-runs affected
nodes on update.  Here the dependency structure is explicit: ``PlasmaSolver``
precomputes all index maps once, and :meth:`update` recomputes the full LTE /
dilute-LTE / nebular chain as a handful of vectorized array ops (cheap at
shells x levels scale, and trivially correct to re-run wholesale).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from tardis_tpu.atomic.atom_data import AtomData
from tardis_tpu.plasma import lte
from tardis_tpu.model.state import SimulationState


@dataclass
class PlasmaState:
    t_rad: np.ndarray  # (S,)
    w: np.ndarray  # (S,)
    t_electrons: np.ndarray  # (S,)
    electron_densities: np.ndarray  # (S,)
    ion_number_density: np.ndarray  # (I_tot, S)
    level_number_density: np.ndarray  # (N, S)
    partition_function: np.ndarray  # (Sp, S)
    tau_sobolev: np.ndarray  # (L, S)
    stimulated_emission_factor: np.ndarray  # (L, S)
    beta_sobolev: np.ndarray  # (L, S)
    j_blues: np.ndarray  # (L, S)
    # round 5: float32 copies + two-float tau prefix emitted by the fused
    # native pass (bit-identical to astype/prefix_split of the f64 fields;
    # None on the numpy fallback path).  The transport solver consumes
    # these directly, skipping ~0.3 s/iteration of host casts + a second
    # full read of tau at bench scale.
    stim32: np.ndarray | None = None  # (L, S) f32
    beta32: np.ndarray | None = None  # (L, S) f32
    j_blues32: np.ndarray | None = None  # (L, S) f32
    tau_prefix_hi: np.ndarray | None = None  # (S, L+1) f32
    tau_prefix_lo: np.ndarray | None = None  # (S, L+1) f32


class PlasmaSolver:
    """LTE/dilute-LTE/nebular plasma solver over flat atomic arrays."""

    def __init__(
        self,
        atom_data: AtomData,
        simulation_state: SimulationState,
        ionization: str = "lte",
        excitation: str = "lte",
        radiative_rates_type: str = "dilute-blackbody",
        link_t_rad_t_electron: float = 0.9,
        w_epsilon: float = 1e-10,
        electron_densities: np.ndarray | None = None,
        nlte_species: list | None = None,
        nlte_coronal_approximation: bool = False,
        nlte_classical_nebular: bool = False,
        helium_treatment: str = "none",
        heating_rate_data_file: str | None = None,
    ):
        assert ionization in ("lte", "nebular")
        assert excitation in ("lte", "dilute-lte")
        assert helium_treatment in ("none", "recomb-nlte", "numerical-nlte")
        assert radiative_rates_type in (
            "blackbody",
            "dilute-blackbody",
            "detailed",
        )
        self.atom = atom_data
        self.ionization = ionization
        self.excitation = excitation
        self.radiative_rates_type = radiative_rates_type
        self.link_t_rad_t_electron = link_t_rad_t_electron
        self.w_epsilon = w_epsilon
        self.time_explosion = simulation_state.time_explosion
        self._fixed_electron_densities = electron_densities
        self.nlte_species = list(nlte_species or [])
        self.nlte_coronal_approximation = nlte_coronal_approximation
        self.nlte_classical_nebular = nlte_classical_nebular
        self.helium_treatment = helium_treatment
        self.heating_rate_data = (
            np.loadtxt(heating_rate_data_file, unpack=True)
            if heating_rate_data_file
            else None
        )
        if helium_treatment != "none" and (2, 0) in [
            tuple(s) for s in self.nlte_species
        ]:
            raise ValueError(
                "helium_treatment and He in nlte_species are exclusive"
            )
        self._last_n_e = None
        # seed actually consumed by the most recent update's n_e
        # fixpoint (checkpoint/resume re-runs that solve bitwise)
        self._n_e_seed_used = None

        self._build_index_maps(simulation_state)

    # ------------------------------------------------------------------
    def _build_index_maps(self, state: SimulationState):
        atom = self.atom
        n_species = len(atom.species_z)
        # species lookup (Z, ion) -> species id
        self._species_lookup = {
            (int(z), int(i)): s
            for s, (z, i) in enumerate(zip(atom.species_z, atom.species_ion))
        }
        # elements: intersection of composition and atomic data
        comp = state.composition
        present = [
            (e, z)
            for e, z in enumerate(comp.atomic_numbers)
            if np.any(atom.species_z == z)
        ]
        self.element_z = np.array([z for _, z in present], dtype=np.int64)
        comp_rows = np.array([e for e, _ in present], dtype=np.int64)
        masses = np.array(
            [
                atom.masses[np.searchsorted(atom.atomic_numbers, z)]
                for z in self.element_z
            ]
        )
        # (E, S) element number densities, aligned with self.element_z
        self.number_density = (
            comp.mass_fractions[comp_rows]
            * comp.density[None, :]
            / masses[:, None]
        )

        # ionization ladder: for each element, consecutive species pairs
        ion_lookup = {
            (int(z), int(j)): chi
            for z, j, chi in zip(
                atom.ionization_z, atom.ionization_ion, atom.ionization_energy
            )
        }
        pairs_upper, pairs_lower, pair_chi = [], [], []
        block_start = [0]
        species_ion_row = np.full(n_species, -1, dtype=np.int64)
        for e, z in enumerate(self.element_z):
            stages = sorted(
                int(i) for i in atom.species_ion[atom.species_z == z]
            )
            # require a contiguous ladder from the lowest stage
            for j0, j1 in zip(stages[:-1], stages[1:]):
                assert j1 == j0 + 1, f"non-contiguous ion stages for Z={z}"
                pairs_lower.append(self._species_lookup[(int(z), j0)])
                pairs_upper.append(self._species_lookup[(int(z), j1)])
                pair_chi.append(ion_lookup[(int(z), j1)])
            block_start.append(len(pairs_upper))
        self.pair_upper = np.array(pairs_upper, dtype=np.int64)
        self.pair_lower = np.array(pairs_lower, dtype=np.int64)
        self.pair_chi = np.array(pair_chi, dtype=np.float64)
        self.element_block_start = np.array(block_start, dtype=np.int64)

        # ion-density row for each species (stage offset within element block)
        ion_row = {}
        for e, z in enumerate(self.element_z):
            stages = sorted(
                int(i) for i in atom.species_ion[atom.species_z == z]
            )
            base = self.element_block_start[e] + e  # ion_block_start[e]
            for k, j in enumerate(stages):
                ion_row[(int(z), j)] = base + k
        self.species_ion_row = np.array(
            [
                ion_row[(int(z), int(i))]
                for z, i in zip(atom.species_z, atom.species_ion)
            ],
            dtype=np.int64,
        )

        # zeta interpolators per ionization pair (for nebular)
        self._zeta_tables = None
        if self.ionization == "nebular":
            tables = []
            for e, z in enumerate(self.element_z):
                stages = sorted(
                    int(i) for i in atom.species_ion[atom.species_z == z]
                )
                for j in stages[1:]:
                    zd = (atom.zeta_data or {}).get((int(z), j))
                    tables.append(zd)
            self._zeta_tables = tables

    # ------------------------------------------------------------------
    def _zeta(self, t_rad: np.ndarray) -> np.ndarray:
        out = np.ones((len(self.pair_chi), len(t_rad)))
        for i, zd in enumerate(self._zeta_tables):
            if zd is None:
                continue
            ts, vals = zd
            out[i] = np.interp(t_rad, ts, vals, left=np.nan, right=np.nan)
        out[np.isnan(out)] = 1.0
        return out

    # ------------------------------------------------------------------
    def update(
        self,
        t_rad: np.ndarray,
        w: np.ndarray,
        j_blues: np.ndarray | None = None,
        line_mode: str = "host",
    ) -> PlasmaState:
        """Recompute the plasma state for the given radiation field.

        ``j_blues`` (L, S) is only used when radiative_rates_type='detailed'
        (estimator-derived mean intensities at the line blue wings).

        ``line_mode="device"`` (round 5): compute the (L, S) line tables —
        stim/beta/j_blues f32 + the two-float tau prefix — ON the
        accelerator (plasma/device_line.py) and leave the f64 host fields
        (tau_sobolev etc.) as None.  Only valid for the classic transport
        convergence path (blackbody/dilute-blackbody rates, no NLTE
        species); callers needing the f64 fields re-solve with the default
        host mode.
        """
        atom = self.atom
        seed_n_e = self._last_n_e  # fixpoint seed (checkpointed for resume)
        beta = lte.beta_rad(t_rad)
        t_electrons = self.link_t_rad_t_electron * t_rad
        beta_el = lte.beta_rad(t_electrons)

        w_excitation = w if self.excitation == "dilute-lte" else None
        bf = lte.level_boltzmann_factor(
            atom.level_energy, atom.level_g, atom.level_meta, beta, w_excitation
        )
        if self.nlte_species:
            # NLTE rate-equation level populations override the LTE rows
            # (reference LevelBoltzmannFactorNLTE,
            #  plasma/properties/partition_function.py:133-330)
            from tardis_tpu.plasma.nlte import nlte_level_boltzmann_factor

            if j_blues is None:
                jb_for_nlte = lte.dilute_planck_j_blues(
                    atom.line_nu, t_rad, w
                )
            else:
                jb_for_nlte = j_blues
            for species in self.nlte_species:
                idx, bf_rows = nlte_level_boltzmann_factor(
                    atom,
                    species,
                    t_rad,
                    w,
                    jb_for_nlte,
                    electron_densities=self._last_n_e,
                    t_electrons=t_electrons,
                    coronal_approximation=self.nlte_coronal_approximation,
                    classical_nebular=self.nlte_classical_nebular,
                )
                if len(idx):
                    bf[idx] = bf_rows
        z_part = lte.partition_function(
            bf, atom.level_species_id, len(atom.species_z)
        )
        g_el = lte.g_electron(beta)
        phi = lte.phi_saha_lte(
            g_el, beta, z_part, self.pair_chi, self.pair_upper, self.pair_lower
        )
        if self.ionization == "nebular":
            delta = lte.radiation_field_correction(
                self.pair_chi, w, t_rad, t_electrons, beta, beta_el
            )
            zeta = self._zeta(t_rad)
            phi = lte.phi_saha_nebular(phi, w, zeta, delta, t_rad, t_electrons)

        he_override = None
        if self.helium_treatment == "recomb-nlte" and 2 in self.element_z:
            # helium recombination-NLTE populations participate in the n_e
            # fixpoint (reference IonNumberDensityHeNLTE,
            # plasma/properties/ion_population.py:395-533)
            from tardis_tpu.plasma import helium

            e_he = int(np.where(self.element_z == 2)[0][0])
            b0 = self.element_block_start[e_he]
            b1 = self.element_block_start[e_he + 1]
            n_he_pairs = b1 - b0
            chi_he1 = float(self.pair_chi[b0])
            if n_he_pairs > 1:
                chi_he2 = float(self.pair_chi[b0 + 1])
                if self.ionization == "nebular":
                    zeta22, delta22 = zeta[b0 + 1], delta[b0 + 1]
                else:
                    zeta22 = np.ones_like(t_rad)
                    delta22 = np.ones_like(t_rad)
            else:
                chi_he2 = np.inf  # no He III channel in the atomic data
                zeta22 = np.ones_like(t_rad)
                delta22 = np.ones_like(t_rad)
            rows_he, rel_he, he3_rel, stage_he = (
                helium.helium_relative_population(
                    atom, bf, g_el, beta, w, t_rad, t_electrons,
                    chi_he1, chi_he2, zeta22, delta22,
                )
            )
            if n_he_pairs < 2:
                he3_rel = np.zeros_like(he3_rel)
            ion_density, n_e, _, (he_pop, he3_pop) = (
                helium.ion_number_density_he_nlte(
                    phi,
                    self.element_block_start,
                    self.number_density,
                    e_he,
                    rel_he,
                    he3_rel,
                    stage_he,
                    n_electron_init=self._last_n_e,
                    electron_densities=self._fixed_electron_densities,
                )
            )
            he_override = (rows_he, he_pop, he3_pop)
        else:
            ion_density, n_e, _ = lte.ion_number_density(
                phi,
                self.element_block_start,
                self.number_density,
                n_electron_init=self._last_n_e,
                electron_densities=self._fixed_electron_densities,
            )
        self._n_e_seed_used = seed_n_e
        self._last_n_e = n_e
        ion_per_species = ion_density[self.species_ion_row]
        n_level = lte.level_number_density(
            bf, z_part, ion_per_species, atom.level_species_id
        )
        if he_override is not None:
            rows_he, he_pop, he3_pop = he_override
            n_level[rows_he] = he_pop
            he3_sp = self._species_lookup.get((2, 2))
            if he3_sp is not None:
                rows_he3 = np.where(atom.level_species_id == he3_sp)[0]
                if len(rows_he3):
                    n_level[rows_he3] = 0.0
                    n_level[rows_he3[0]] = he3_pop

        if self.helium_treatment == "numerical-nlte" and 2 in self.element_z:
            # in-framework numerical He NLTE (reference HeliumNumericalNLTE,
            # plasma/properties/helium_nlte.py:120-280, which shells out to a
            # non-distributed external solver; solved directly here — see
            # plasma/helium.py helium_numerical_nlte).  Populations are
            # normalized to N_He and override both the level and He ion
            # densities, mirroring the reference's post-hoc update (:275-279).
            from tardis_tpu.plasma import helium

            if j_blues is None:
                jb_he = lte.dilute_planck_j_blues(atom.line_nu, t_rad, w)
            else:
                jb_he = j_blues
            e_he = int(np.where(self.element_z == 2)[0][0])
            rows_he, he_pops, he3_pop, he_ion = (
                helium.helium_numerical_nlte(
                    atom, t_rad, w, t_electrons, n_e, jb_he,
                    self.number_density[e_he],
                    heating_rate_data=self.heating_rate_data,
                )
            )
            n_level[rows_he] = he_pops
            he3_sp = self._species_lookup.get((2, 2))
            if he3_sp is not None:
                rows_he3 = np.where(atom.level_species_id == he3_sp)[0]
                if len(rows_he3):
                    n_level[rows_he3] = 0.0
                    n_level[rows_he3[0]] = he3_pop
            for stage in range(3):
                sp = self._species_lookup.get((2, stage))
                if sp is not None:
                    ion_density[self.species_ion_row[sp]] = he_ion[stage]
            ion_per_species = ion_density[self.species_ion_row]

        # fused native pass for the four (L, S) line tables (one OpenMP
        # sweep instead of ~6 numpy passes over ~30 MB each — this host
        # moves memory at ~200 MB/s); transparent numpy fallback
        from tardis_tpu import native
        from tardis_tpu.constants import C as C_LIGHT
        from tardis_tpu.constants import H, K_B, SOBOLEV_COEFFICIENT

        jb_w = (
            np.ones_like(w)
            if self.radiative_rates_type == "blackbody"
            else w
        )
        if line_mode == "device":
            if self.radiative_rates_type == "detailed" or self.nlte_species:
                raise ValueError(
                    "line_mode='device' requires blackbody/dilute-blackbody "
                    "radiative rates and no NLTE species (those paths read "
                    "the f64 host line tables)"
                )
            from tardis_tpu.plasma.device_line import (
                solve_device_line_state,
            )

            dl = solve_device_line_state(
                atom, n_level, t_rad, jb_w, self.time_explosion
            )
            return PlasmaState(
                t_rad=t_rad,
                w=w,
                t_electrons=t_electrons,
                electron_densities=n_e,
                ion_number_density=ion_density,
                level_number_density=n_level,
                partition_function=z_part,
                tau_sobolev=None,
                stimulated_emission_factor=None,
                beta_sobolev=None,
                j_blues=None,
                stim32=dl.stim32,
                beta32=dl.beta32,
                j_blues32=dl.j_blues32,
                tau_prefix_hi=dl.tau_prefix_hi,
                tau_prefix_lo=dl.tau_prefix_lo,
            )

        extras = {}
        fused = native.line_plasma_tables_full(
            n_level, atom.line_lower_idx, atom.line_upper_idx,
            atom.level_g[atom.line_lower_idx],
            atom.level_g[atom.line_upper_idx],
            atom.line_wavelength_cm * atom.line_f_lu,
            atom.line_nu, t_rad, jb_w,
            SOBOLEV_COEFFICIENT * self.time_explosion,
            H / K_B, 2.0 * H / C_LIGHT**2,
        )
        if fused is not None:
            (stim, tau, beta_sob, jb_planck,
             stim32, beta32, jb32, pref_hi, pref_lo) = fused
            extras = dict(
                stim32=stim32, beta32=beta32, j_blues32=jb32,
                tau_prefix_hi=pref_hi, tau_prefix_lo=pref_lo,
            )
        else:
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
                self.time_explosion,
                n_lower,
                stim,
            )
            beta_sob = lte.beta_sobolev(tau)
            jb_planck = jb_w[None, :] * lte.intensity_black_body(
                atom.line_nu[:, None], t_rad[None, :]
            )

        if self.radiative_rates_type == "detailed" and j_blues is not None:
            planck = lte.dilute_planck_j_blues(atom.line_nu, t_rad, w)
            jb = np.where(j_blues > 0, j_blues, self.w_epsilon * planck)
            # the f32 copy was computed from the Planck field; the
            # estimator-derived j_blues supersede it
            extras.pop("j_blues32", None)
        else:  # blackbody / dilute-blackbody (w baked into jb_planck)
            jb = jb_planck

        return PlasmaState(
            t_rad=t_rad,
            w=w,
            t_electrons=t_electrons,
            electron_densities=n_e,
            ion_number_density=ion_density,
            level_number_density=n_level,
            partition_function=z_part,
            tau_sobolev=tau,
            stimulated_emission_factor=stim,
            beta_sobolev=beta_sob,
            j_blues=jb,
            **extras,
        )
