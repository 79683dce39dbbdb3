"""Persistent compilation cache: entries written, then hit (not rewritten).

Verifies the serving cold-start path (utils/compile_cache.py): a compiled
program lands in the cache directory, and after the in-memory executable
cache is dropped the SAME program is served from disk without writing a
new entry. Runs on the CPU backend like the rest of the suite — the cache
machinery is backend-generic (key includes the backend fingerprint).
"""
import os

import jax
import jax.numpy as jnp
import numpy as np

from video_depth_anything_tpu.utils import compile_cache


def _entries(d):
    return sorted(
        f for f in os.listdir(d) if os.path.isfile(os.path.join(d, f)))


def test_cache_write_then_hit(tmp_path):
    d = compile_cache.enable_compile_cache(str(tmp_path / "xla"),
                                           min_compile_time_secs=0.0)
    try:
        assert os.path.isdir(d)

        @jax.jit
        def fn(x):
            return jnp.tanh(x @ x.T).sum(axis=1)

        x = jnp.arange(64.0, dtype=jnp.float32).reshape(8, 8)
        first = np.asarray(fn(x))
        written = _entries(d)
        assert written, "no cache entry persisted for the compiled program"

        # Drop the in-memory executable cache; the recompile must be served
        # from the persistent cache — same result, no new entry written.
        # (The HLO module name is part of the key, so re-jit the SAME
        # function rather than a differently-named clone.)
        jax.clear_caches()
        second = np.asarray(fn(x))
        np.testing.assert_array_equal(first, second)
        assert _entries(d) == written, "cache hit rewrote/added entries"
    finally:
        jax.config.update("jax_compilation_cache_dir", None)


def test_env_var_opt_in(tmp_path, monkeypatch):
    monkeypatch.delenv("VDA_COMPILE_CACHE", raising=False)
    assert compile_cache.maybe_enable_from_env() is None

    target = str(tmp_path / "envcache")
    monkeypatch.setenv("VDA_COMPILE_CACHE", target)
    try:
        assert compile_cache.maybe_enable_from_env() == os.path.abspath(target)
        assert os.path.isdir(target)
    finally:
        jax.config.update("jax_compilation_cache_dir", None)
