"""Global numeric configuration for mrcal_tpu.

mrcal is a metrology toolkit: calibration solves and uncertainty propagation
need float64 end-to-end (the reference C implementation is double-precision
throughout).  We therefore enable JAX x64 mode at import time, before any
arrays are created.  Set MRCAL_TPU_NO_X64=1 to opt out (e.g. for pure-f32
throughput experiments on TPU, where f64 is software-emulated).

The hot TPU compute path (Jacobian accumulation, Schur products) is written
dtype-polymorphic so it can run in f32/bf16 with f64 reductions when speed
matters; see mrcal_tpu.optimize.
"""

import os

import jax

# Honor JAX_PLATFORMS even when a site preload already initialized jax with
# a different platform default (this environment's sitecustomize registers
# the axon TPU backend and swallows the env var): tools and subprocess tests
# that export JAX_PLATFORMS=cpu must actually get the CPU backend.  The
# config update only works before the backend is touched; if it is too late
# we leave things as they are.
_plat = os.environ.get("JAX_PLATFORMS")
if _plat:
    try:
        jax.config.update("jax_platforms", _plat)
    except Exception:
        pass

if not os.environ.get("MRCAL_TPU_NO_X64"):
    jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: the full device-resident LM while_loop graph
# takes minutes to compile through the remote TPU compile helper; caching the
# executable makes every later process start (tests, bench, tools) fast.
if not os.environ.get("MRCAL_TPU_NO_COMPILE_CACHE"):
    _cache_dir = os.environ.get(
        "MRCAL_TPU_COMPILE_CACHE",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache"))
    try:
        os.makedirs(_cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", _cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # cache is best-effort; never block import


def default_dtype():
    import jax.numpy as jnp
    return jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
