"""Persistent XLA compilation cache (serving cold-start mitigation).

The reference pays CUDA-kernel JIT/cuDNN autotune costs per process; the
TPU analogue is XLA compilation of the jitted window/train programs
(~20-40 s for the 518^2 vitl window on first run). JAX's persistent
compilation cache keys the serialized HLO + compile options + backend
fingerprint and stores the compiled executable on disk, so every process
after the first loads the binary in O(100 ms) instead of recompiling.

Safe by construction: the cache key includes the program, so shape/flag/
version changes miss (and recompile) rather than serving a stale binary.
Entries are written only for compiles slower than `min_compile_time_secs`
to keep tiny programs out of the cache.

Used by `run.py --compile_cache [DIR]`, `training/train.py
--compile_cache`, and honored globally via the `VDA_COMPILE_CACHE` env
var (any entry point that calls `maybe_enable_from_env`).

Caveat (CPU backend only): XLA:CPU AOT entries embed the compile host's
CPU feature list and warn on load when the detected host features differ
(execution still proceeds; worst case across truly different hosts is
SIGILL). Share a cache dir across machines only for TPU programs, where
the key includes the exact device fingerprint.
"""
import os

DEFAULT_DIR = os.path.join(
    os.path.expanduser("~"), ".cache", "video_depth_anything_tpu", "xla")

_ENV_VAR = "VDA_COMPILE_CACHE"


def enable_compile_cache(cache_dir=None, min_compile_time_secs=1.0):
    """Turn on JAX's persistent compilation cache.

    Applies to every compile after this call (call before the pipeline is
    built for full effect; enabling later only caches later compiles).

    Args:
      cache_dir: directory for cache entries (created if absent). None or
        "" selects ``DEFAULT_DIR``.
      min_compile_time_secs: only compiles slower than this are persisted.

    Returns the resolved cache directory.
    """
    import jax

    d = os.path.abspath(os.path.expanduser(cache_dir or DEFAULT_DIR))
    os.makedirs(d, exist_ok=True)
    jax.config.update("jax_enable_compilation_cache", True)
    jax.config.update("jax_compilation_cache_dir", d)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      float(min_compile_time_secs))
    # Default entry-size floor would skip small-but-slow programs; the
    # compile-time floor above is the meaningful gate.
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return d


def maybe_enable_from_env():
    """Enable the cache iff VDA_COMPILE_CACHE is set (path or "1").

    Returns the cache dir when enabled, else None.
    """
    val = os.environ.get(_ENV_VAR)
    if not val:
        return None
    return enable_compile_cache(None if val == "1" else val)
