"""Batched gamma-ray packet transport on device.

TPU-native redesign of the reference's per-packet gamma loop
(/root/reference/tardis/energy_input/transport/gamma_packet_loop.py:34-362):
a lockstep event loop over {Compton scatter, photoabsorption, pair creation,
shell boundary, time-step boundary} with per-(shell,timestep) energy
deposition and an escaping-photon spectrum.

Time dependence is handled with an outer host loop over time steps; within a
step the geometry/densities are frozen at the step midpoint (the reference
does the same distance race against the time boundary).  Homologous motion:
shell radii r_k = v_k * t_mid.

Compton scattering angles are sampled by bilinear lookup in a precomputed
inverse-CDF table of the Klein-Nishina theta distribution (the reference
builds the CDF per event, gamma_ray_interactions.py:23-53 — a table lookup
is the vectorized equivalent).

Opacities per Ambwani & Sutherland (1988) as in the reference
(/root/reference/tardis/opacities/opacities.py:280-440).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from tardis_tpu.constants import SIGMA_THOMSON
from tardis_tpu.utils.search import searchsorted_unrolled

F32 = jnp.float32
I32 = jnp.int32

# electron rest energy in keV, value-matched to the reference's
# (m_e c^2).to(keV) (opacities/opacities.py:23; backed out from its
# kappa_calculation test fixtures: 511.0/1.0000021334560507)
ELECTRON_REST_KEV = 510.9989098062839
# nuclide mass x proton mass, matching the reference's convention
# (/root/reference/tardis/opacities/opacities.py:18-20: Nuclide atomic_mass
# [amu] x const.m_p — NOT x amu; kept for value parity)
_M_P = 1.67262192369e-24
MASS_SI = 27.97692653442 * _M_P  # Si-28
MASS_FE = 55.93493633 * _M_P  # Fe-56


# ---------------------------------------------------------------------------
# opacities (E in keV, vectorized jnp)
# ---------------------------------------------------------------------------


def kappa_e(energy_kev):
    return energy_kev / ELECTRON_REST_KEV


def compton_opacity(energy_kev, electron_density):
    """Klein-Nishina total cross-section x n_e [1/cm].

    The closed form suffers catastrophic cancellation for kappa << 1 (terms
    ~ 1/kappa^3); below kappa = 0.05 use the Thomson-limit series
    sigma = sigma_T (1 - 2k + 26k^2/5).
    """
    k = jnp.maximum(kappa_e(energy_kev), 1e-6)
    a = 1.0 + 2.0 * k
    full = 0.75 * (
        (1.0 + k) / k**3 * (2.0 * k * (1.0 + k) / a - jnp.log(a))
        + jnp.log(a) / (2.0 * k)
        - (1.0 + 3.0 * k) / a**2
    )
    series = 1.0 - 2.0 * k + 5.2 * k * k
    sigma = SIGMA_THOMSON * jnp.where(k < 0.05, series, full)
    return electron_density * sigma


def photoabsorption_opacity(energy_kev, density, iron_group_fraction):
    """Ambwani & Sutherland (1988) Si/Fe-mix photoabsorption [1/cm]."""
    si = (
        1.16e-24
        * (energy_kev / 100.0) ** -3.13
        * density
        / MASS_SI
        * (1.0 - iron_group_fraction)
    )
    fe = (
        25.7e-24
        * (energy_kev / 100.0) ** -3.0
        * density
        / MASS_FE
        * iron_group_fraction
    )
    return si + fe


def pair_creation_opacity(energy_kev, density, iron_group_fraction):
    """Ambwani & Sutherland (1988) pair-production [1/cm]."""
    z_si, z_fe = 14.0, 26.0
    mult = density * (
        z_si**2 / MASS_SI * (1.0 - iron_group_fraction)
        + z_fe**2 / MASS_FE * iron_group_fraction
    )
    low = mult * 1.0063 * (energy_kev / 1000.0 - 1.022) * 1.0e-27
    high = mult * (0.0481 + 0.301 * (energy_kev / 1000.0 - 1.5)) * 1.0e-27
    return jnp.where(
        energy_kev >= 1500.0,
        high,
        jnp.where(energy_kev > 1022.0, low, 0.0),
    )


# fine-structure constant (CODATA), for the Kasen photoabsorption form
FINE_STRUCTURE = 7.2973525693e-3


def photoabsorption_opacity_kasen(energy_kev, kasen_z4_sum):
    """Kasen et al. (2006) photoabsorption [1/cm].

    Reference form (/root/reference/tardis/opacities/opacities.py:363-396,
    photoabsorption_opacity_calculation_kasen):
        sigma_T * alpha^4 * 8 sqrt(2) * kappa^-3.5 * sum_i n_i Z_i^4
    with the composition sum precomputed per shell as ``kasen_z4_sum`` =
    sum over elements of (number density / Z) * Z^5.  The reference
    defines this function but leaves it unwired ("currently not
    functional", transport/gamma_packet_loop.py:164-168); here it is a
    live prescription because the composition data needed is available.
    """
    k = jnp.maximum(kappa_e(energy_kev), 1e-6)
    return (
        SIGMA_THOMSON
        * FINE_STRUCTURE**4
        * 8.0
        * jnp.sqrt(2.0)
        * k**-3.5
        * kasen_z4_sum
    )


def pair_creation_opacity_artis(energy_kev, density, iron_group_fraction):
    """ARTIS variant of the pair-creation opacity [1/cm].

    (/root/reference/tardis/opacities/opacities.py:443-483,
    pair_creation_opacity_artis: energy thresholds in keV without the
    /1000 rescaling of the tardis variant, and Z^2/A ratios expressed
    through 196e-27 (Si) / 784e-27 (Fe) per-proton-mass factors.)
    """
    lo_si = 1.0063 * (energy_kev - 1022.0) * 196.0e-27
    hi_si = (0.0481 + 0.301 * (energy_kev - 1500.0)) * 196.0e-27
    lo_fe = 1.0063 * (energy_kev - 1022.0) * 784.0e-27
    hi_fe = (0.0481 + 0.301 * (energy_kev - 1500.0)) * 784.0e-27
    op_si = jnp.where(energy_kev > 1500.0, hi_si, lo_si) * (
        density / _M_P / 28.0
    )
    op_fe = jnp.where(energy_kev > 1500.0, hi_fe, lo_fe) * (
        density / _M_P / 56.0
    )
    op = op_fe * iron_group_fraction + op_si * (1.0 - iron_group_fraction)
    return jnp.where(energy_kev > 1022.0, op, 0.0)


def average_compton_fraction(energy_kev):
    """Mean retained energy fraction <E'/E> over the KN angle distribution.

    Vectorized port of the reference's ``get_average_compton_fraction``
    (/root/reference/tardis/energy_input/gamma_ray_estimators.py:105-130):
    100-point midpoint quadrature over mu of f(x, mu) weighted by the KN
    differential cross-section, where f = 1/(1 + x(1-mu)).  (The reference
    wraps the ratio as ``1 - (1 - sum/norm)``; this is the same value.)
    """
    x = kappa_e(energy_kev)[..., None]
    mus = jnp.linspace(-1.0, 1.0, 100)
    f = 1.0 / (1.0 + x * (1.0 - mus))
    cs = f**2 * (f + 1.0 / f - (1.0 - mus**2))
    return jnp.sum(cs * f, axis=-1) / jnp.sum(cs, axis=-1)


def deposition_estimator_kasen(energy_kev, electron_density, density,
                               iron_group_fraction):
    """Kasen deposition-opacity estimator [1/cm].

    (/root/reference/tardis/energy_input/gamma_ray_estimators.py:133-138:
    average Compton fraction x Compton opacity + photoabsorption opacity.)
    """
    return average_compton_fraction(energy_kev) * compton_opacity(
        energy_kev, electron_density
    ) + photoabsorption_opacity(energy_kev, density, iron_group_fraction)


# ---------------------------------------------------------------------------
# Klein-Nishina angle inverse-CDF table
# ---------------------------------------------------------------------------


def build_kn_table(n_energy=64, n_quantile=128,
                   e_min=10.0, e_max=5000.0):
    """Inverse CDF of the KN theta distribution: (E_grid, q_grid) -> cos."""
    e_grid = np.logspace(np.log10(e_min), np.log10(e_max), n_energy)
    theta = np.linspace(1e-4, np.pi, 512)
    cos_t = np.cos(theta)
    table = np.empty((n_energy, n_quantile), dtype=np.float32)
    q_grid = np.linspace(0.0, 1.0, n_quantile)
    for i, e in enumerate(e_grid):
        k = e / ELECTRON_REST_KEV
        ratio = 1.0 / (1.0 + k * (1.0 - cos_t))
        # KN differential cross-section (per solid angle) x sin(theta)
        dsigma = ratio**2 * (ratio + 1.0 / ratio - (1.0 - cos_t**2)) * np.sin(
            theta
        )
        cdf = np.cumsum(dsigma)
        cdf = cdf / cdf[-1]
        table[i] = np.interp(q_grid, cdf, cos_t)
    return (
        jnp.asarray(np.log(e_grid), F32),
        jnp.asarray(table),
    )


def sample_kn_cos(log_e_grid, table, energy_kev, u):
    """Bilinear inverse-CDF lookup -> cos(theta)."""
    n_e, n_q = table.shape
    le = jnp.log(jnp.clip(energy_kev, 1.0, None))
    fi = (le - log_e_grid[0]) / (log_e_grid[-1] - log_e_grid[0]) * (n_e - 1)
    i0 = jnp.clip(fi.astype(I32), 0, n_e - 2)
    wi = jnp.clip(fi - i0, 0.0, 1.0)
    fq = u * (n_q - 1)
    q0 = jnp.clip(fq.astype(I32), 0, n_q - 2)
    wq = fq - q0
    t00 = table[i0, q0]
    t01 = table[i0, q0 + 1]
    t10 = table[i0 + 1, q0]
    t11 = table[i0 + 1, q0 + 1]
    return (1 - wi) * ((1 - wq) * t00 + wq * t01) + wi * (
        (1 - wq) * t10 + wq * t11
    )


# ---------------------------------------------------------------------------
# per-time-step transport
# ---------------------------------------------------------------------------


@partial(
    jax.jit,
    static_argnames=(
        "n_shells", "n_ebins", "max_steps", "grey_opacity",
        "photoabsorption_type", "pair_creation_type", "collect_estimators",
    ),
)
def gamma_step_transport(
    r,  # (B,) cm
    mu,
    energy_kev,
    weight,  # (B,) erg carried
    shell,  # (B,) i32
    status,  # (B,) i32: 0 active, 1 escaped, 2 absorbed, 3 time-boundary
    dist_budget,  # (B,) cm distance until the end of this time step
    key,
    r_inner,  # (S,)
    r_outer,
    electron_density,  # (S,)
    density,
    iron_fraction,  # (S,)
    kn_log_e,
    kn_table,
    ebin_edges,  # (n_ebins+1,) keV log-spaced
    n_shells: int,
    n_ebins: int,
    max_steps: int = 10000,
    kasen_z4=None,  # (S,) sum_el n_el Z^4 (kasen photoabsorption only)
    grey_opacity: float = -1.0,
    photoabsorption_type: str = "tardis",
    pair_creation_type: str = "tardis",
    collect_estimators: bool = False,
):
    """Advance all packets to the end of the time step (or death).

    Returns updated state + (deposition per shell [erg],
    escape spectrum histogram [erg per energy bin], estimators dict).

    Options (reference main_gamma_ray_loop.py:153-198 +
    transport/gamma_packet_loop.py:143-199):

    - ``grey_opacity`` >= 0 [cm^2/g]: replaces the physical opacities with
      a grey absorption chi = grey_opacity * rho (Compton and pair
      creation switched off, as in the reference's grey branch).
    - ``photoabsorption_type``: "tardis" (Ambwani & Sutherland) or "kasen"
      (requires ``kasen_z4``).
    - ``pair_creation_type``: "tardis" or "artis".
    - ``collect_estimators``: additionally accumulate the reference's
      per-shell path-length estimators (gamma_ray_estimators.py:19-138):
      Kasen deposition (E * kappa_dep * d), Compton emissivity, and
      pair-creation emissivity.  The Compton emissivity is the 1-D
      spherical adaptation: the reference's 3-D estimator projects the
      CMF direction on a fixed observer axis and carries a malformed
      frequency factor (``1 + x + (1-mu)``, gamma_ray_estimators.py:42 —
      dead code there); here the radial cosine and the standard Compton
      factor ``1 + x (1-mu)`` are used.
    """
    S = n_shells
    deposition = jnp.zeros(S, F32)
    escape_hist = jnp.zeros(n_ebins, F32)
    n_est = S if collect_estimators else 1
    est0 = (jnp.zeros(n_est, F32),) * 3  # kasen_dep, compton_em, pair_em
    if kasen_z4 is None:
        kasen_z4 = jnp.zeros(S, F32)

    def body(state):
        (r, mu, e_kev, w, shell, status, budget, dep, esc, est, it) = state
        active = status == 0
        shell_c = jnp.clip(shell, 0, S - 1)

        k = jax.random.fold_in(key, it)
        u1 = jax.random.uniform(jax.random.fold_in(k, 0), r.shape, dtype=F32,
                                minval=1e-9, maxval=1.0)
        u2 = jax.random.uniform(jax.random.fold_in(k, 1), r.shape, dtype=F32)
        u3 = jax.random.uniform(jax.random.fold_in(k, 2), r.shape, dtype=F32)

        if grey_opacity >= 0.0:
            # grey mode: pure absorption at grey_opacity * rho
            # (reference gamma_packet_loop.py:193-199)
            chi_c = jnp.zeros_like(e_kev)
            chi_pp = jnp.zeros_like(e_kev)
            chi_pa = grey_opacity * density[shell_c]
        else:
            chi_c = compton_opacity(e_kev, electron_density[shell_c])
            if photoabsorption_type == "kasen":
                chi_pa = photoabsorption_opacity_kasen(
                    e_kev, kasen_z4[shell_c]
                )
            elif photoabsorption_type == "tardis":
                chi_pa = photoabsorption_opacity(
                    e_kev, density[shell_c], iron_fraction[shell_c]
                )
            else:
                raise ValueError(
                    f"invalid photoabsorption opacity type "
                    f"{photoabsorption_type!r}"
                )
            if pair_creation_type == "artis":
                chi_pp = pair_creation_opacity_artis(
                    e_kev, density[shell_c], iron_fraction[shell_c]
                )
            elif pair_creation_type == "tardis":
                chi_pp = pair_creation_opacity(
                    e_kev, density[shell_c], iron_fraction[shell_c]
                )
            else:
                raise ValueError(
                    f"invalid pair creation opacity type "
                    f"{pair_creation_type!r}"
                )
        chi_tot = chi_c + chi_pa + chi_pp

        tau = -jnp.log(u1)
        d_int = tau / jnp.maximum(chi_tot, 1e-30)

        # boundary distance
        r_in = r_inner[shell_c]
        r_out = r_outer[shell_c]
        out_d = jnp.sqrt(
            jnp.maximum(r_out**2 + (mu**2 - 1.0) * r**2, 0.0)
        ) - r * mu
        check = r_in**2 + r**2 * (mu**2 - 1.0)
        hits_inner = (mu < 0.0) & (check >= 0.0)
        d_b = jnp.where(
            hits_inner, -r * mu - jnp.sqrt(jnp.maximum(check, 0.0)), out_d
        )
        d_b = jnp.maximum(d_b, 0.0)
        delta = jnp.where(hits_inner, -1, 1)

        d = jnp.minimum(jnp.minimum(d_int, d_b), budget)
        ev_time = budget <= jnp.minimum(d_int, d_b)
        ev_bound = ~ev_time & (d_b < d_int)
        ev_int = ~ev_time & ~ev_bound

        # move
        r_new = jnp.sqrt(
            jnp.maximum(r**2 + d**2 + 2.0 * r * d * mu, 1e-10)
        )
        mu_new = (mu * r + d) / r_new
        budget = budget - d

        # interaction split
        p_c = chi_c / jnp.maximum(chi_tot, 1e-30)
        p_pa = chi_pa / jnp.maximum(chi_tot, 1e-30)
        is_compton = ev_int & (u2 < p_c)
        is_photo = ev_int & ~is_compton & (u2 < p_c + p_pa)
        is_pair = ev_int & ~is_compton & ~is_photo

        # Compton: new energy + deposition of the difference; direction:
        # new mu from scattering angle combined with random azimuth around
        # the old direction — for 1-D spherical symmetry we draw the new
        # lab-frame mu isotropically weighted by the scattering cosine
        cos_t = sample_kn_cos(kn_log_e, kn_table, e_kev, u3)
        e_new = e_kev / (1.0 + kappa_e(e_kev) * (1.0 - cos_t))
        frac = e_new / e_kev
        # combine old direction with scattering angle (random azimuth)
        phi_u = jax.random.uniform(jax.random.fold_in(k, 3), r.shape,
                                   dtype=F32)
        sin_t = jnp.sqrt(jnp.maximum(1.0 - cos_t**2, 0.0))
        sin_old = jnp.sqrt(jnp.maximum(1.0 - mu_new**2, 0.0))
        mu_scat = mu_new * cos_t + sin_old * sin_t * jnp.cos(
            2.0 * jnp.pi * phi_u
        )
        mu_scat = jnp.clip(mu_scat, -1.0, 1.0)

        # pair production: photon destroyed; re-emit 511 keV pair photons —
        # treated as one packet at 511 keV, isotropic, with the remaining
        # energy deposited (reference pair_creation_packet)
        mu_pair = 2.0 * phi_u - 1.0

        # deposition
        dep_compton = jnp.where(is_compton, w * (1.0 - frac), 0.0)
        dep_photo = jnp.where(is_photo, w, 0.0)
        pair_frac = jnp.clip(2.0 * 511.0 / jnp.maximum(e_kev, 511.0), 0.0,
                             1.0)
        dep_pair = jnp.where(is_pair, w * (1.0 - pair_frac), 0.0)
        dep_inc = dep_compton + dep_photo + dep_pair
        onehot = (shell_c[:, None] == jnp.arange(S)[None, :]).astype(F32)
        dep = dep + jnp.sum(
            (jnp.where(active, dep_inc, 0.0))[:, None] * onehot, axis=0
        )

        # path-length estimators (reference gamma_ray_estimators.py:19-138;
        # see the docstring's 1-D adaptation note)
        if collect_estimators:
            live = active.astype(F32)
            kap_dep = deposition_estimator_kasen(
                e_kev, electron_density[shell_c], density[shell_c],
                iron_fraction[shell_c],
            )
            x_c = kappa_e(e_kev)
            ff = 1.0 + x_c * (1.0 - mu)
            pcs = (
                3.0 / (16.0 * jnp.pi) * SIGMA_THOMSON / ff**2
                * (ff + 1.0 / ff + mu**2 - 1.0)
            )
            rows = jnp.stack(
                [
                    live * w * kap_dep * d,
                    live * w * pcs * d / ff,
                    live * chi_pp * (2.0 * 511.0 / jnp.maximum(e_kev, 1.0))
                    * w * d,
                ],
                axis=0,
            )  # (3, B)
            est = tuple(
                e + jnp.sum(rows[i][:, None] * onehot, axis=0)
                for i, e in enumerate(est)
            )

        # apply
        e_kev = jnp.where(active & is_compton, e_new,
                          jnp.where(active & is_pair, 511.0, e_kev))
        w = jnp.where(active & is_compton, w * frac,
                      jnp.where(active & is_pair, w * pair_frac, w))
        mu_out = jnp.where(
            is_compton, mu_scat, jnp.where(is_pair, mu_pair, mu_new)
        )
        new_shell = shell + jnp.where(ev_bound, delta, 0)
        escaped = active & ev_bound & (new_shell >= S)
        absorbed_in = active & ev_bound & (new_shell < 0)  # none (no core)
        dead_abs = active & is_photo

        # escape spectrum
        bins = jnp.clip(
            searchsorted_unrolled(ebin_edges, e_kev, side="right") - 1,
            0, n_ebins - 1,
        )
        esc = esc.at[jnp.where(escaped, bins, n_ebins + 1)].add(
            jnp.where(escaped, w, 0.0), mode="drop"
        )

        status = jnp.where(escaped, 1,
                           jnp.where(dead_abs | absorbed_in, 2,
                                     jnp.where(active & ev_time, 3, status)))
        r = jnp.where(active, r_new, r)
        mu = jnp.where(active, mu_out, mu)
        shell = jnp.where(active & ev_bound & ~escaped & ~absorbed_in,
                          new_shell, shell)
        return (r, mu, e_kev, w, shell, status, budget, dep, esc, est,
                it + 1)

    def cond(state):
        status = state[5]
        it = state[10]
        return jnp.any(status == 0) & (it < max_steps)

    state = (r, mu, energy_kev, weight, shell, status, dist_budget,
             deposition, escape_hist, est0, jnp.zeros((), I32))
    state = jax.lax.while_loop(cond, body, state)
    (r, mu, e_kev, w, shell, status, budget, dep, esc, est, _) = state
    estimators = {
        "kasen_deposition": est[0],
        "compton_emissivity": est[1],
        "pair_creation_emissivity": est[2],
    }
    return r, mu, e_kev, w, shell, status, dep, esc, estimators
