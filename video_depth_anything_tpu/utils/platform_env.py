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


def backend_unreachable(timeout_s, _probe=None):
    """Probe device acquisition + one tiny execute under a deadline.

    A dead RPC tunnel makes jax.devices() (or the first dispatch) retry
    refused connections forever; a wedged remote executor accepts device
    discovery but never completes an op — both observed on this image.
    The probe runs in a daemon thread so a hang cannot take the caller
    with it. Returns None when healthy, else an error string; callers
    should fail fast with it (bench.py emits an error record, run.py
    exits with a message). The deadline only covers backend bring-up +
    one trivial op, never real compiles — generous values are fine.
    """
    import threading

    result = {}

    def probe():
        try:
            if _probe is not None:
                _probe()
            else:
                import jax
                import jax.numpy as jnp
                result["devices"] = [str(d) for d in jax.devices()]
                float(jnp.zeros((), jnp.float32) + 1.0)
            result["ok"] = True
        except Exception as e:  # noqa: BLE001 — report, don't crash
            result["error"] = repr(e)

    t = threading.Thread(target=probe, daemon=True)
    t.start()
    t.join(timeout_s)
    if t.is_alive():
        return (f"backend probe exceeded {timeout_s:.0f}s "
                "(device tunnel down or executor wedged?)")
    return result.get("error")
