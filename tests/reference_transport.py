"""Independent float64 per-packet transport implementation (tests only).

This is the analogue of the reference suite's NUMBA_DISABLE_JIT pure-Python
mode (SURVEY.md §4): a sequential, direct per-line event loop in float64 used
to validate the batched binary-search kernel.  It shares ONLY the RNG contract
with the kernel — each event's draws are the columns of
uniform(fold_in(fold_in(base_key, pid), event_idx), (N_RNG_COLS,)) — so
per-packet trajectories are comparable event by event.
"""

from __future__ import annotations

import jax
import numpy as np

F32 = np.float32


_CHUNK = 512


def _draw_chunk(base_key, pid, start, tags=(0, 1)):
    """Vectorized draw of uniforms for events [start, start+_CHUNK).

    ``tags`` are COLUMN indices of the kernel's per-event uniform matrix
    (kernel.N_RNG_COLS columns from one threefry pass)."""
    from tardis_tpu.transport.kernel import N_RNG_COLS

    cols = jax.numpy.asarray(tags)

    def one(eidx):
        k = jax.random.fold_in(
            jax.random.fold_in(base_key, np.uint32(pid)), eidx
        )
        return jax.random.uniform(
            k, (N_RNG_COLS,), jax.numpy.float32, minval=1e-9, maxval=1.0
        )[cols]

    eidx = jax.numpy.arange(start, start + _CHUNK, dtype=jax.numpy.uint32)
    return np.asarray(jax.vmap(one)(eidx), dtype=np.float64)


class _UniformCache:
    def __init__(self, base_key, pid, tags=(0, 1)):
        self.base_key = base_key
        self.pid = pid
        self.tags = tuple(tags)
        self.tag_col = {t: i for i, t in enumerate(self.tags)}
        self.chunks = {}

    def __call__(self, event_idx, tag):
        c = event_idx // _CHUNK
        if c not in self.chunks:
            self.chunks[c] = _draw_chunk(
                self.base_key, self.pid, c * _CHUNK, tags=self.tags
            )
        return float(self.chunks[c][event_idx % _CHUNK, self.tag_col[tag]])


class HostTables:
    """Float64 versions of the kernel tables, built from the same inputs."""

    def __init__(self, geometry, plasma_state, atom_data,
                 disable_electron_scattering=False):
        from tardis_tpu.constants import C, SIGMA_THOMSON
        from tardis_tpu.transport.device_state import NU_UNIT

        ct = C * geometry.time_explosion
        self.r_inner = geometry.r_inner / ct
        self.r_outer = geometry.r_outer / ct
        self.line_nu = atom_data.line_nu / NU_UNIT  # descending
        tau = plasma_state.tau_sobolev  # (L, S)
        S = geometry.no_of_shells
        L = atom_data.n_lines
        self.tau_cum = np.zeros((S, L + 1))
        np.cumsum(tau.T, axis=1, out=self.tau_cum[:, 1:])
        sigma = 1e-200 if disable_electron_scattering else SIGMA_THOMSON
        self.chi_e = sigma * plasma_state.electron_densities * ct
        self.n_shells = S
        self.n_lines = L


def propagate_packet(
    pid: int,
    mu0: float,
    nu_cmf0: float,
    tables: HostTables,
    base_key,
    max_events: int = 100000,
):
    """Propagate one packet; returns (status, nu_lab, energy, estimators).

    status: 1 emitted, 2 reabsorbed.
    Estimator dict: j (S,), nubar (S,), j_blue {(line, shell): val},
    edot {(line, shell): val} — direct per-line accumulation (the
    reference algorithm), for validating the kernel's difference-array trick.
    """
    T = tables
    S, L = T.n_shells, T.n_lines
    est_j = np.zeros(S)
    est_nubar = np.zeros(S)
    jblue = {}
    edot = {}

    draws = _UniformCache(base_key, pid)
    beta_inner = T.r_inner[0]
    # emulate the kernel's f32 rounding at birth
    mu = float(F32(mu0))
    inv_dop = float(F32(1.0) / (F32(1.0) - F32(mu0) * F32(beta_inner)))
    nu = float(F32(nu_cmf0) * F32(inv_dop))
    energy = inv_dop
    r = beta_inner
    shell = 0
    # birth line: count of lines with nu_line >= nu_cmf
    next_line = int(np.sum(T.line_nu >= F32(nu_cmf0)))

    for event_idx in range(max_events):
        z = mu * r
        dop = 1.0 - z
        nu_cmf = nu * dop
        chi = T.chi_e[shell]
        r_in, r_out = T.r_inner[shell], T.r_outer[shell]

        # boundary distance
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
        u_mu = draws(event_idx, 1)
        tau_event = -np.log(u_tau)

        # walk lines directly (the reference algorithm,
        # homologous_rad_packet_transport.py:102-161)
        event = None
        distance = None
        cum = 0.0
        i = next_line
        while i < L:
            zeta = 1.0 - T.line_nu[i] / nu
            s_i = max(zeta - z, 0.0)
            if s_i > d_b:
                break
            d_cont = (tau_event - cum) / chi
            if d_cont < s_i:
                event, distance, end = "escat", max(d_cont, 0.0), i
                break
            cum_after = cum + (T.tau_cum[shell, i + 1] - T.tau_cum[shell, i])
            # line estimator for every reached line
            e_at = energy * T.line_nu[i] / nu
            jblue[(i, shell)] = jblue.get((i, shell), 0.0) + e_at / nu
            edot[(i, shell)] = edot.get((i, shell), 0.0) + e_at
            if cum_after + chi * s_i > tau_event:
                event, distance, end = "line", s_i, i
                break
            cum = cum_after
            i += 1
        if event is None:
            d_cont = max((tau_event - cum) / chi, 0.0)
            if d_cont < d_b:
                event, distance, end = "escat", d_cont, i
            else:
                event, distance, end = "boundary", d_b, i

        # bulk estimators
        e_com = energy * dop
        est_j[shell] += e_com * distance
        est_nubar[shell] += e_com * distance * nu_cmf

        # move
        r_new = np.sqrt(r * r + distance * distance + 2 * r * distance * mu)
        mu_new = (mu * r + distance) / r_new

        if event == "boundary":
            next_line = end
            r, mu = r_new, mu_new
            shell += delta
            if shell >= S:
                return 1, nu, energy, (est_j, est_nubar, jblue, edot)
            if shell < 0:
                return 2, nu, energy, (est_j, est_nubar, jblue, edot)
        elif event == "escat":
            dop_old = 1.0 - mu_new * r_new
            mu_s = 2.0 * u_mu - 1.0
            inv_new = 1.0 / (1.0 - mu_s * r_new)
            nu = nu * dop_old * inv_new
            energy = energy * dop_old * inv_new
            r, mu = r_new, mu_s
            next_line = end
        else:  # line (scatter mode)
            dop_old = 1.0 - mu_new * r_new
            mu_s = 2.0 * u_mu - 1.0
            inv_new = 1.0 / (1.0 - mu_s * r_new)
            energy = energy * dop_old * inv_new
            nu = T.line_nu[end] * inv_new
            r, mu = r_new, mu_s
            next_line = end + 1
    raise RuntimeError("packet did not finish")
