"""CPU smoke tests for the round-5 measurement tools.

These tools produced the round-5 deployment/precision records
(tools/bench_compile_cache.py, tools/bench_drift_518.py,
tools/bench_serving_artifact.py — results in PARITY.md/README). They are
subprocess-driven CLIs, so a refactor of the APIs they touch
(compile_cache, precision, serving_export, pipeline) could silently break
them between rounds; each runs here once at toy size and must emit its
JSON record.
"""
import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(args, timeout=1500):
    env = {**os.environ, "JAX_PLATFORMS": "cpu"}
    env.pop("XLA_FLAGS", None)  # tools don't need the 8-device mesh
    res = subprocess.run([sys.executable] + args, capture_output=True,
                         text=True, env=env, cwd=ROOT, timeout=timeout)
    assert res.returncode == 0, f"{args}:\n{res.stdout}\n{res.stderr}"
    lines = [ln for ln in res.stdout.splitlines() if ln.startswith("{")]
    assert lines, res.stdout
    return json.loads(lines[-1])


def test_bench_compile_cache_smoke(tmp_path):
    rec = _run(["tools/bench_compile_cache.py", "--encoder", "vits",
                "--size", "70", "--cache_dir", str(tmp_path)])
    assert rec["cold_s"] > 0 and rec["warm_s"] > 0
    # The warm child must actually hit the cache (cold wrote one entry).
    # Measured margin is ~12x at this size; 0.8 leaves room for scheduler
    # noise on the contended single-core CI box without masking a real
    # cache miss (which would make warm ≈ cold).
    assert rec["warm_s"] < rec["cold_s"] * 0.8, rec
    assert os.listdir(tmp_path), "no cache entry persisted"


def test_bench_drift_smoke():
    rec = _run(["tools/bench_drift_518.py", "--encoder", "vits",
                "--frames", "8", "--src_hw", "70", "70",
                "--input_size", "56"])
    for k in ("bf16_max_err_frac", "bf16_mean_err_frac",
              "int8_max_err_frac", "int8_mean_err_frac"):
        assert 0 <= rec[k] < 0.5, (k, rec)


def test_bench_serving_artifact_smoke():
    rec = _run(["tools/bench_serving_artifact.py", "--encoder", "vits",
                "--src_hw", "70", "70", "--input_size", "56",
                "--iters", "2"])
    assert rec["artifact_bit_exact_vs_live"] is True, rec
    assert rec["artifact_ms_per_frame"] > 0
