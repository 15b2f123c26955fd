"""Workflow utilities: integrated mean optical depths.

Re-implements the reference's ``get_tau_integ``
(/root/reference/tardis/workflows/util.py:7-97): bin the sorted line list,
build the expansion opacity kappa_exp = (nu/dnu)/(ct) * sum(1-e^-tau),
combine with Thomson opacity into Planck- and Rosseland-mean opacities, and
integrate outward-in to per-shell mean optical depths.
"""

from __future__ import annotations

import numpy as np

from tardis_tpu.constants import C, H, K_B, SIGMA_THOMSON


def get_tau_integ(plasma_state, atom_data, sim_state, bin_size: int = 10):
    """Integrated Rosseland/Planck mean optical depth per shell."""
    order = np.argsort(atom_data.line_nu)  # ascending
    freqs = atom_data.line_nu[order]
    taus = plasma_state.tau_sobolev[order]

    extra = bin_size - len(freqs) % bin_size
    extra_freqs = np.arange(extra + 1) + 1.0
    extra_taus = np.zeros((extra + 1, taus.shape[1]))
    freqs = np.hstack((extra_freqs, freqs))
    taus = np.vstack((extra_taus, taus))

    bins_low = freqs[:-bin_size:bin_size]
    bins_high = freqs[bin_size::bin_size]
    delta_nu = bins_high - bins_low
    n_bins = len(delta_nu)
    delta_nu = np.where(delta_nu == 0, 1.0, delta_nu)

    taus = taus[1 : n_bins * bin_size + 1]

    ct = sim_state.time_explosion * C
    t_rad = plasma_state.t_rad

    def planck(nu, t):
        return (
            2.0 * H * nu**3 / C**2
            / np.expm1(np.minimum(H * nu / (K_B * t), 500.0))
        )

    def u_weight(nu, t):
        b = planck(nu, t)
        return b**2 * (C / nu) ** 2 / (2.0 * K_B * t**2)

    kappa_exp = (
        (bins_low / delta_nu).reshape(-1, 1)
        / ct
        * (-np.expm1(-taus.reshape(n_bins, bin_size, -1))).sum(axis=1)
    )
    kappa_thom = plasma_state.electron_densities * SIGMA_THOMSON

    b_dnu = planck(bins_low.reshape(-1, 1), t_rad.reshape(1, -1)) * (
        delta_nu.reshape(-1, 1)
    )
    kappa_planck = kappa_thom + (b_dnu * kappa_exp).sum(axis=0) / b_dnu.sum(
        axis=0
    )

    u_dnu = u_weight(bins_low.reshape(-1, 1), t_rad.reshape(1, -1)) * (
        delta_nu.reshape(-1, 1)
    )
    kappa_tot = kappa_thom + kappa_exp
    kappa_rosseland = u_dnu.sum(axis=0) / (u_dnu / kappa_tot).sum(axis=0)

    dr = sim_state.geometry.r_outer - sim_state.geometry.r_inner
    dtau = kappa_planck * dr
    planck_integ_tau = np.cumsum(dtau[::-1])[::-1]
    rosseland_integ_tau = np.cumsum((kappa_rosseland * dr)[::-1])[::-1]
    return {"rosseland": rosseland_integ_tau, "planck": planck_integ_tau}
