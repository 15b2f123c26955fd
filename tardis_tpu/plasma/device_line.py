"""Device-resident per-iteration line tables (round 5).

The convergence loop's (L, S)-sized plasma outputs — stimulated-emission
factor, Sobolev tau/beta, dilute-Planck j_blues, and the two-float
per-shell tau prefix — exist only to feed the DEVICE transport pipeline
(the macro-chain build + the packed-search tables).  Computing them on the
host (native ``line_plasma_tables2``) and shipping ~75 MB per iteration
over the accelerator tunnel costs ~0.4-0.5 s of host+transfer time at
bench scale; this module computes them ON the accelerator in one jitted
program from the small host inputs (level populations + per-shell
scalars).

Numerics: element arithmetic runs in f32 (the consumers are f32 anyway);
level populations travel in LOG space so the stimulated-emission ratio
survives the f32 exponent range; the prefix sum uses a blocked two-float
(hi, lo) compensated cumsum, preserving the compensated-precision
contract of the host path's exact f64-split (utils/twofloat.py) for
prefix DIFFERENCES.  Results differ from the host path only at the f32
last-ulp level, far below Monte Carlo noise; runs remain bitwise
reproducible for a fixed mode.

The classic convergence loop opts in (simulation/base.py); paths that
consume the f64 host fields — the formal integral, IIP continuum, NLTE,
detailed radiative rates, nonhomologous transport — keep the host solve.

Reference counterparts: plasma/properties/radiative_properties.py
(StimulatedEmissionFactor/TauSobolev/BetaSobolev) and the dilute-Planck
JBluesDiluteBlackBody; the reference has no device analogue (numba gets
f64 for free on CPU).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from tardis_tpu.constants import C as C_LIGHT
from tardis_tpu.constants import H, K_B, SOBOLEV_COEFFICIENT


@dataclass
class DeviceLineState:
    """Device (L, S) line tables + (S, L+1) two-float tau prefix."""

    stim32: object
    beta32: object
    j_blues32: object
    tau_prefix_hi: object
    tau_prefix_lo: object


_JIT_CACHE = {}


def _line_static(atom_data):
    """Iteration-invariant device inputs, cached on the AtomData."""
    import jax

    cached = atom_data.__dict__.get("_dev_line_plasma_static")
    if cached is None:
        wl_flu = atom_data.line_wavelength_cm * atom_data.line_f_lu
        nu = atom_data.line_nu
        cached = jax.device_put(
            dict(
                lower_idx=np.asarray(atom_data.line_lower_idx, np.int32),
                upper_idx=np.asarray(atom_data.line_upper_idx, np.int32),
                log_g_ratio=np.asarray(
                    np.log(
                        atom_data.level_g[atom_data.line_lower_idx]
                        / atom_data.level_g[atom_data.line_upper_idx]
                    ),
                    np.float32,
                ),
                wl_flu=np.asarray(wl_flu, np.float32),
                nu3=np.asarray(
                    2.0 * H / C_LIGHT**2 * nu**3, np.float32
                ),
                x_nu=np.asarray(H / K_B * nu, np.float32),
            )
        )
        atom_data.__dict__["_dev_line_plasma_static"] = cached
    return cached


def _two_float_cumsum(tau_t, block: int = 128):
    """Two-float inclusive prefix sum along the last axis.

    (S, L) f32 -> ((S, L) hi, (S, L) lo) with hi+lo tracking the exact
    f32-element sum to ~48 bits.  Fully vectorized blocked formulation
    (an associative_scan over L ~ 2e5 elements with a custom combine does
    not compile on this TPU stack, and per-element lax.scans pay ~ms loop
    overhead per step): compensated cumsums within ``block``-sized blocks
    and across the block totals, combined with a two-float add.
    """
    import jax.numpy as jnp

    from tardis_tpu.utils.twofloat import two_sum

    def comp_cumsum(x, lo_in=None):
        """Compensated inclusive cumsum along the last axis (vectorized).

        c = f32 cumsum(x); the rounding error of step i is reconstructed
        EXACTLY elementwise — two_sum(c_{i-1}, x_i) re-performs the very
        f32 add the cumsum did, so its error term is the true per-step
        error — and the errors (plus any incoming low parts) accumulate
        in a second f32 cumsum, whose own error is second-order.
        Returns (hi, lo).
        """
        c = jnp.cumsum(x, axis=-1)
        c_excl = jnp.concatenate(
            [jnp.zeros_like(c[..., :1]), c[..., :-1]], axis=-1
        )
        _, e = two_sum(c_excl, x)
        if lo_in is not None:
            e = e + lo_in
        return c, jnp.cumsum(e, axis=-1)

    S, L = tau_t.shape
    B = -(-L // block)
    pad = B * block - L
    x = jnp.concatenate(
        [tau_t, jnp.zeros((S, pad), jnp.float32)], axis=1
    ).reshape(S, B, block)

    # within-block compensated prefix (values bounded by block sums)
    whi, wlo = comp_cumsum(x)  # (S, B, K)
    tot_hi, tot_lo = whi[..., -1], wlo[..., -1]  # (S, B)

    # exclusive block prefix over the block totals, compensated again
    bh_inc, bl_inc = comp_cumsum(tot_hi, tot_lo)
    bh = jnp.concatenate(
        [jnp.zeros_like(bh_inc[..., :1]), bh_inc[..., :-1]], axis=-1
    )[..., None]
    bl = jnp.concatenate(
        [jnp.zeros_like(bl_inc[..., :1]), bl_inc[..., :-1]], axis=-1
    )[..., None]

    # inclusive(i) = block_exclusive + within_inclusive, two-float
    s, e = two_sum(bh, whi)
    hi, lo = two_sum(s, bl + wlo + e)
    return (
        hi.reshape(S, B * block)[:, :L],
        lo.reshape(S, B * block)[:, :L],
    )


def solve_device_line_state(
    atom_data,
    level_number_density: np.ndarray,  # (Nlev, S) f64 host
    t_rad: np.ndarray,  # (S,)
    jb_w: np.ndarray,  # (S,) dilution factor (ones for blackbody mode)
    time_explosion: float,
) -> DeviceLineState:
    """One jitted program: stim/tau/beta/j_blues + two-float tau prefix."""
    import jax
    import jax.numpy as jnp

    static = _line_static(atom_data)
    fn = _JIT_CACHE.get("fn")
    if fn is None:

        def impl(st, n_log, t_rad_d, w_d, coeff_texp):
            # populations arrive as LOG values: within a shell they span
            # hundreds of decades (Boltzmann factors), far beyond the f32
            # exponent range, and the stimulated-emission RATIO n_u/n_l
            # must stay O(1)-accurate even when both populations underflow
            # f32 — so the ratio is formed in log space.  exp(ln_l) for
            # the absolute population may underflow to 0, which only
            # zeroes tau for lines that could never interact anyway.
            ln_l = n_log[st["lower_idx"]]  # (L, S)
            ln_u = n_log[st["upper_idx"]]
            ratio = jnp.exp(st["log_g_ratio"][:, None] + ln_u - ln_l)
            stim = jnp.where(
                jnp.isfinite(ratio), jnp.maximum(1.0 - ratio, 0.0), 0.0
            )
            n_l = jnp.exp(ln_l)
            tau = coeff_texp * st["wl_flu"][:, None] * stim * n_l
            beta = jnp.where(
                tau > 1e3,
                1.0 / jnp.maximum(tau, 1e-30),
                jnp.where(
                    tau < 1e-4,
                    1.0 - 0.5 * tau,
                    -jnp.expm1(-tau) / jnp.maximum(tau, 1e-30),
                ),
            )
            x = jnp.minimum(st["x_nu"][:, None] / t_rad_d[None, :], 700.0)
            jb = w_d[None, :] * st["nu3"][:, None] / jnp.expm1(x)
            hi, lo = _two_float_cumsum(tau.T)  # (S, L)
            S = hi.shape[0]
            z = jnp.zeros((S, 1), jnp.float32)
            return (
                stim, beta, jb,
                jnp.concatenate([z, hi], axis=1),
                jnp.concatenate([z, lo], axis=1),
            )

        fn = jax.jit(impl)
        _JIT_CACHE["fn"] = fn

    with np.errstate(divide="ignore"):
        n_log = np.log(
            np.asarray(level_number_density, np.float64)
        ).astype(np.float32)
    stim, beta, jb, hi, lo = fn(
        static,
        jax.device_put(n_log),
        jnp.asarray(np.asarray(t_rad, np.float32)),
        jnp.asarray(np.asarray(jb_w, np.float32)),
        jnp.float32(SOBOLEV_COEFFICIENT * time_explosion),
    )
    return DeviceLineState(
        stim32=stim, beta32=beta, j_blues32=jb,
        tau_prefix_hi=hi, tau_prefix_lo=lo,
    )
