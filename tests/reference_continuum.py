"""Independent float64 per-packet IIP (continuum) transport oracle.

Mirrors the reference's IIP mode (modes/iip/packet_propagation.py: full
relativity, chi_continuum = chi_e + chi_bf + chi_ff, CONTINUUM_PROCESS events
through the absorbing-Markov macro atom) as a direct sequential event loop:

- chi_bf by per-continuum interpolation over each block (the reference's
  chi_bf_interpolator algorithm, opacities/opacities.py:111-180) — validating
  the kernel's merged-grid single-searchsorted redesign;
- continuum estimators accumulated per event per ACTIVE continuum (the
  reference's update_estimators_bound_free) — validating the kernel's
  frequency-grid moment redesign;
- shares ONLY the RNG contract with the kernel (same uniform-matrix columns).
"""

from __future__ import annotations

import numpy as np

from tests.reference_transport import _UniformCache

F32 = np.float32


class HostContinuumTables:
    """Float64 IIP tables in kernel-scaled units."""

    def __init__(self, geometry, plasma_state, atom_data, cont_state,
                 cont_macro):
        from tardis_tpu.constants import C, H, K_B, SIGMA_THOMSON
        from tardis_tpu.plasma.continuum import FF_OPAC_CONST
        from tardis_tpu.transport.device_state import NU_UNIT

        ct = C * geometry.time_explosion
        self.r_inner = geometry.r_inner / ct
        self.r_outer = geometry.r_outer / ct
        self.line_nu = atom_data.line_nu / NU_UNIT
        tau = plasma_state.tau_sobolev
        S = geometry.no_of_shells
        L = atom_data.n_lines
        self.tau_cum = np.zeros((S, L + 1))
        np.cumsum(tau.T, axis=1, out=self.tau_cum[:, 1:])
        self.chi_e = SIGMA_THOMSON * plasma_state.electron_densities * ct
        self.n_shells = S
        self.n_lines = L

        pi = atom_data.photo_ion
        self.C_cont = pi.n_continua
        self.refs = pi.block_references
        self.pt_nu = pi.nu / NU_UNIT
        self.pt_x = pi.x_sect
        self.nu_th = pi.nu_threshold / NU_UNIT
        self.nu_mx = pi.nu_max / NU_UNIT
        self.A = cont_state.level_pop * ct  # (C, S)
        self.B = cont_state.lte_pop_coef * ct
        self.boltz_coef = H * NU_UNIT / (K_B * cont_state.t_electrons)
        self.ff_coef = (
            FF_OPAC_CONST * cont_state.ff_opacity_factor * ct / NU_UNIT**3
        )
        self.fb_cdf = cont_state.fb_emission_cdf  # (P, S)

        cm = cont_macro
        self.cum_B = cm.cum_B.astype(np.float64)  # (S, M, M)
        self.d_start = cm.deact_block_start
        self.d_cum = cm.deact_cum_prob.astype(np.float64)  # (D, S)
        self.d_kind = cm.deact_kind
        self.d_id = cm.deact_id
        self.line2state = cm.line2state
        self.pion_state = cm.photo_ion_state
        self.k_state = cm.k_state

    # per-continuum direct interpolation (reference chi_bf_interpolator)
    def chi_bf_all(self, nu_cmf, shell):
        chi = np.zeros(self.C_cont)
        boltz = np.exp(-nu_cmf * self.boltz_coef[shell])
        for c in range(self.C_cont):
            if not (self.nu_th[c] <= nu_cmf <= self.nu_mx[c]):
                continue
            a, b = self.refs[c], self.refs[c + 1]
            sig = np.interp(nu_cmf, self.pt_nu[a:b], self.pt_x[a:b])
            chi[c] = max(
                sig * (self.A[c, shell] - self.B[c, shell] * boltz), 0.0
            )
        return chi

    def chi_ff(self, nu_cmf, shell):
        boltz = np.exp(-nu_cmf * self.boltz_coef[shell])
        return self.ff_coef[shell] / nu_cmf**3 * (1.0 - boltz)


def propagate_packet_iip(
    pid: int,
    mu0: float,
    nu_cmf0: float,
    T: HostContinuumTables,
    base_key,
    max_events: int = 200000,
):
    """One packet through the IIP loop; returns (status, nu, energy, ests).

    ests = (j (S,), nubar (S,), photo_ion (C,S), stim_recomb (C,S),
            bf_heating (C,S), stim_recomb_cooling (C,S), stats (C,S),
            ff_heat (S,)) — all direct reference-style accumulations.
    """
    S, L, Cn = T.n_shells, T.n_lines, T.C_cont
    est_j = np.zeros(S)
    est_nubar = np.zeros(S)
    photo_ion = np.zeros((Cn, S))
    stim_rec = np.zeros((Cn, S))
    bf_heat = np.zeros((Cn, S))
    st_cool = np.zeros((Cn, S))
    stats = np.zeros((Cn, S))
    ff_heat = np.zeros(S)
    ests = (est_j, est_nubar, photo_ion, stim_rec, bf_heat, st_cool, stats,
            ff_heat)

    draws = _UniformCache(
        base_key, pid, tags=(0, 1, 2, 3, 4, 6, 7, 8, 9)
    )
    beta_inner = T.r_inner[0]
    gamma_in = 1.0 / np.sqrt(1.0 - beta_inner * beta_inner)
    mu_f = float(F32(mu0))
    inv_dop = float((1.0 + F32(mu0) * F32(beta_inner)) * F32(gamma_in))
    nu = float(F32(nu_cmf0) * F32(inv_dop))
    energy = inv_dop
    mu = (mu_f + beta_inner) / (1.0 + beta_inner * mu_f)
    r = beta_inner
    shell = 0
    next_line = int(np.sum(T.line_nu >= F32(nu_cmf0)))

    for event_idx in range(max_events):
        z = mu * r
        gamma = 1.0 / np.sqrt(max(1.0 - r * r, 1e-12))
        dop = (1.0 - z) * gamma
        nu_cmf = nu * dop
        chi_e = T.chi_e[shell]
        chi_c_all = T.chi_bf_all(nu_cmf, shell)
        chi_bf_tot = chi_c_all.sum()
        chi_ff = T.chi_ff(nu_cmf, shell)
        chi_cmf = chi_e + chi_bf_tot + chi_ff
        chi = chi_cmf * dop  # full relativity (iip packet_propagation:142)

        r_in, r_out = T.r_inner[shell], T.r_outer[shell]
        if mu >= 0.0:  # tangential rays graze outward (kernel parity)
            d_b = np.sqrt(r_out**2 + (mu * mu - 1.0) * r * r) - r * mu
            delta = 1
        else:
            check = r_in**2 + r * r * (mu * mu - 1.0)
            if check >= 0.0:
                d_b = -r * mu - np.sqrt(check)
                delta = -1
            else:
                d_b = np.sqrt(r_out**2 + (mu * mu - 1.0) * r * r) - r * mu
                delta = 1
        d_b = max(d_b, 0.0)

        u_tau = draws(event_idx, 0)
        tau_event = -np.log(u_tau)

        # full-relativity resonance distances (calculate_distances.py:198)
        p2 = max(r * r * (1.0 - mu * mu), 0.0)

        def s_of(i):
            a = T.line_nu[i] ** 2
            b = nu * nu
            disc = max(a * (a - (a + b) * p2), 0.0)
            y = (b - np.sqrt(disc)) / (a + b)
            return max(y - z, 0.0)

        event = None
        distance = None
        cum = 0.0
        i = next_line
        while i < L:
            s_i = s_of(i)
            if s_i > d_b:
                break
            d_cont = (tau_event - cum) / chi
            if d_cont < s_i:
                event, distance, end = "cont", max(d_cont, 0.0), i
                break
            cum_after = cum + (T.tau_cum[shell, i + 1] - T.tau_cum[shell, i])
            if cum_after + chi * s_i > tau_event:
                event, distance, end = "line", s_i, i
                break
            cum = cum_after
            i += 1
        if event is None:
            d_cont = max((tau_event - cum) / chi, 0.0)
            if d_cont < d_b:
                event, distance, end = "cont", d_cont, i
            else:
                event, distance, end = "boundary", d_b, i

        # estimators (path length contraction, movement.py:63-71)
        e_com = energy * dop
        path = distance * dop
        est_j[shell] += e_com * path
        est_nubar[shell] += e_com * path * nu_cmf
        # continuum estimators, per active continuum
        # (update_estimators_bound_free, radfield_estimator_calcs.py:57-125)
        w = e_com * path
        boltz = np.exp(-nu_cmf * T.boltz_coef[shell])
        ff_heat[shell] += w * chi_ff
        for c in range(Cn):
            if not (T.nu_th[c] <= nu_cmf <= T.nu_mx[c]):
                continue
            a, b = T.refs[c], T.refs[c + 1]
            sig = np.interp(nu_cmf, T.pt_nu[a:b], T.pt_x[a:b])
            inc = w * sig / nu_cmf
            photo_ion[c, shell] += inc
            stim_rec[c, shell] += inc * boltz
            stats[c, shell] += 1
            hinc = w * sig * (1.0 - T.nu_th[c] / nu_cmf)
            bf_heat[c, shell] += hinc
            st_cool[c, shell] += hinc * boltz

        r_new = np.sqrt(r * r + distance * distance + 2 * r * distance * mu)
        mu_new = (mu * r + distance) / r_new

        if event == "boundary":
            next_line = end
            r, mu = r_new, mu_new
            shell += delta
            if shell >= S:
                return 1, nu, energy, ests
            if shell < 0:
                return 2, nu, energy, ests
            continue

        # interaction: new CMF direction + full-rel aberration
        u_mu = draws(event_idx, 1)
        mu_draw = 2.0 * u_mu - 1.0
        gamma_new = 1.0 / np.sqrt(max(1.0 - r_new * r_new, 1e-12))
        dop_old_pos = (1.0 - mu_new * r_new) * gamma_new
        inv_dop_new = (1.0 + mu_draw * r_new) * gamma_new
        mu_emit = (mu_draw + r_new) / (1.0 + r_new * mu_draw)

        if event == "cont":
            u_esc = draws(event_idx, 2)
            escat_prob = chi_e / chi_cmf
            if u_esc < escat_prob:
                # Thomson
                nu = nu * dop_old_pos * inv_dop_new
                energy = energy * dop_old_pos * inv_dop_new
                r, mu = r_new, mu_emit
                next_line = end
                continue
            # continuum process: pick bf continuum or ff -> k
            u_bfff = draws(event_idx, 3)
            frac_bf = chi_bf_tot / max(chi_bf_tot + chi_ff, 1e-300)
            if u_bfff < frac_bf:
                u_csel = draws(event_idx, 4) * chi_bf_tot
                c_sel = int(
                    np.sum(np.cumsum(chi_c_all) < u_csel)
                )
                c_sel = min(c_sel, Cn - 1)
                state0 = int(T.pion_state[c_sel])
            else:
                state0 = T.k_state
        else:  # line absorption
            state0 = int(T.line2state[end])

        # absorbing-Markov interaction: two categorical draws
        u1 = draws(event_idx, 6)
        row = T.cum_B[shell, state0]
        a_state = int(np.searchsorted(row, u1, side="left"))
        a_state = min(a_state, len(row) - 1)
        u2 = draws(event_idx, 7)
        b0, b1 = T.d_start[a_state], T.d_start[a_state + 1]
        t = b0 + int(
            np.searchsorted(T.d_cum[b0:b1, shell], u2, side="left")
        )
        t = min(max(t, b0), max(b1 - 1, b0))
        kind = int(T.d_kind[t])
        chan = int(T.d_id[t])

        if kind == 4:  # adiabatic cooling: packet destroyed, energy
            # becomes expansion work (zero-energy "reabsorbed" record,
            # matching the kernel's death convention)
            return 2, nu, 0.0, ests

        if kind == 0:  # line emission
            nu_cmf_em = T.line_nu[chan]
            next_line = chan + 1
        elif kind == 1:  # free-bound emission
            zr = draws(event_idx, 8)
            a, b = T.refs[chan], T.refs[chan + 1]
            blk = T.fb_cdf[a:b, shell]
            idx = int(np.searchsorted(blk, zr, side="left"))
            idx = min(max(idx, 1), b - a - 1)
            c_i, c_im = blk[idx], blk[idx - 1]
            nu_i, nu_im = T.pt_nu[a + idx], T.pt_nu[a + idx - 1]
            frac = (c_i - zr) / (c_i - c_im) if c_i > c_im else 0.0
            nu_cmf_em = nu_i - frac * (nu_i - nu_im)
            next_line = int(np.sum(T.line_nu >= nu_cmf_em))
        else:  # free-free emission
            u_ff = draws(event_idx, 9)
            nu_cmf_em = -np.log(u_ff) / T.boltz_coef[shell]
            next_line = int(np.sum(T.line_nu >= nu_cmf_em))

        nu = nu_cmf_em * inv_dop_new
        energy = energy * dop_old_pos * inv_dop_new
        r, mu = r_new, mu_emit
    raise RuntimeError("packet did not finish")
