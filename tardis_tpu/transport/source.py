"""Blackbody packet source — device-side, counter-based RNG.

Re-implements the Bjorkman & Wood (2001) blackbody frequency sampling and the
zero-limb-darkening mu distribution of the reference's
``BlackBodySimpleSource``
(/root/reference/tardis/transport/montecarlo/packet_source/black_body.py:140-205)
as a vectorized JAX function.  Each packet's draws derive only from
(base_key, packet_id), so sampling is reproducible regardless of device count
or batch layout (the TPU analogue of the reference's per-packet seeds,
packet_source/base.py:221-225).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from tardis_tpu.constants import H, K_B
from tardis_tpu.utils.search import searchsorted_unrolled
from tardis_tpu.transport.device_state import NU_UNIT

_L_SAMPLES = 1000
_L_ARRAY = np.cumsum(np.arange(1, _L_SAMPLES, dtype=np.float64) ** -4)
_L_COEF = np.pi**4 / 90.0


from functools import partial


@partial(jax.jit, static_argnames=("n_packets",))
def sample_blackbody_packets(key, n_packets: int, t_inner: float):
    """Sample (mu, nu_cmf) for n_packets; nu in NU_UNIT units, f32.

    Returns
    -------
    mu : (N,) f32 in (0, 1]   (outward, mu = sqrt(xi))
    nu_cmf : (N,) f32 comoving-frame frequency / NU_UNIT
    """
    l_array = jnp.asarray(_L_ARRAY, dtype=jnp.float32)

    def one(pid):
        k = jax.random.fold_in(key, pid)
        xis = jax.random.uniform(k, (6,), dtype=jnp.float32)
        l_min = (
            searchsorted_unrolled(l_array, xis[0] * jnp.float32(_L_COEF)) + 1
        ).astype(jnp.float32)
        x = -jnp.log(jnp.prod(xis[1:5]).clip(1e-37)) / l_min
        nu = x * (K_B * t_inner / H) / NU_UNIT
        mu = jnp.sqrt(xis[5])
        return mu, nu

    ids = jnp.arange(n_packets, dtype=jnp.uint32)
    mu, nu = jax.vmap(one)(ids)
    return mu.astype(jnp.float32), nu.astype(jnp.float32)


@partial(jax.jit, static_argnames=("n_packets",))
def sample_blackbody_packets_weighted(
    key, n_packets: int, t_inner: float, nu_min=1e13, nu_max=5e16
):
    """Uniform-in-log-frequency importance sampling of the blackbody
    (reference BlackBodyWeightedSource, packet_source/black_body_weighted.py:9):
    returns (mu, nu_cmf, weight) with per-packet statistical weights
    w = B_nu(sampled) / pdf, normalized so sum(w) ~ n_packets.
    """
    from tardis_tpu.constants import C as _C, H as _H, K_B as _KB

    log_lo = jnp.log(nu_min / NU_UNIT)
    log_hi = jnp.log(nu_max / NU_UNIT)

    def one(pid):
        k = jax.random.fold_in(key, pid)
        xis = jax.random.uniform(k, (2,), dtype=jnp.float32)
        log_nu = log_lo + xis[0] * (log_hi - log_lo)
        nu = jnp.exp(log_nu)
        mu = jnp.sqrt(xis[1])
        return mu, nu

    ids = jnp.arange(n_packets, dtype=jnp.uint32)
    mu, nu = jax.vmap(one)(ids)
    # weight ~ nu * B_nu(T) (log-uniform pdf ~ 1/nu)
    x = jnp.clip(_H * nu * NU_UNIT / (_KB * t_inner), 1e-6, 80.0)
    w = nu**4 / jnp.expm1(x)
    w = w / jnp.mean(w)
    return mu.astype(jnp.float32), nu.astype(jnp.float32), w.astype(jnp.float32)


@partial(jax.jit, static_argnames=("n_packets",))
def sample_blackbody_packets_relativistic(
    key, n_packets: int, t_inner: float, beta_inner: float
):
    """Relativistic inner-boundary source (reference
    BlackBodySimpleSourceRelativistic, black_body_relativistic.py:125-179):

    - mu drawn from the static-boundary distribution
      mu = -beta + sqrt(beta^2 + 2 beta z + z)  (inverse CDF of the
      relativistically transformed emission pdf);
    - per-packet weight = (2 beta + 1)/(1 - beta^2)/gamma — the
      static-boundary -> CMF energy factor with time dilation absorbed
      (uniform across packets).

    Returns (mu_cmf, nu_cmf, weight); the kernel's full-relativity birth
    transform applies the per-packet (1 + beta mu) gamma Doppler factors
    and aberration on top.
    """
    beta = jnp.float32(beta_inner)
    _, nu = sample_blackbody_packets(key, n_packets, t_inner)

    def one(pid):
        k = jax.random.fold_in(jax.random.fold_in(key, pid), 7)
        z = jax.random.uniform(k, (), dtype=jnp.float32)
        return -beta + jnp.sqrt(beta * beta + 2.0 * beta * z + z)

    ids = jnp.arange(n_packets, dtype=jnp.uint32)
    mu = jax.vmap(one)(ids)
    gamma = 1.0 / jnp.sqrt(1.0 - beta * beta)
    w_factor = (2.0 * beta + 1.0) / (1.0 - beta * beta) / gamma
    w = jnp.full((n_packets,), w_factor, jnp.float32)
    return mu.astype(jnp.float32), nu, w
