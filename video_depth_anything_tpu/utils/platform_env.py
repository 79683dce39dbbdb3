"""Make the JAX_PLATFORMS env var effective on sitecustomize'd images.

This build image pre-imports jax from a sitecustomize to register its TPU
plugin; by the time an entry point runs, the env var snapshot jax took at
import no longer reflects the caller's environment, so
``JAX_PLATFORMS=cpu python run.py`` silently lands on the TPU — and, when
the RPC tunnel is down, hangs forever in device discovery. (Observed:
subprocess-spawning tests contending with live TPU benchmarks.)

`honor_jax_platforms_env()` re-applies the env var through jax.config
before the first backend touch. Safe to call unconditionally: a no-op
when the var is unset, and if a backend is already initialized the
config update raises and the process keeps its existing platform.

Every process-level entry point calls this first: run.py, bench.py,
training/train.py, tools/*. In-process callers (tests' conftest) keep
setting jax.config directly.
"""
import os


def honor_jax_platforms_env():
    """Apply JAX_PLATFORMS from the environment; returns it (or None)."""
    want = os.environ.get("JAX_PLATFORMS")
    if not want:
        return None
    import jax

    try:
        jax.config.update("jax_platforms", want)
    except RuntimeError:
        return None  # backend already live — too late to switch
    return want
