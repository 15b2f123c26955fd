"""tardis_tpu: TPU-native Monte Carlo radiative transfer.

On import, point JAX at a persistent compilation cache: the batched
linear-algebra programs in the macro-atom chain build and the transport
kernel cost tens to hundreds of seconds to compile on the TPU stack, and
every fresh process (CLI run, benchmark, driver) would otherwise pay that
again.  Opt out (or redirect) with TARDIS_TPU_JAX_CACHE=0 / =<dir>.
"""

import os


def _enable_compilation_cache():
    cache_dir = os.environ.get(
        "TARDIS_TPU_JAX_CACHE",
        os.path.expanduser("~/.cache/tardis_tpu/jax"),
    )
    if cache_dir in ("0", ""):
        return
    try:
        import jax

        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:  # pragma: no cover - cache is best-effort
        pass


_enable_compilation_cache()
