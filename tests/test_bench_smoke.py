"""bench.py end-to-end smoke test (CPU, tiny shapes).

The driver runs `python bench.py` on the real TPU at the end of every
round and records its single JSON line as BENCH_r{N}.json — a top-level
crash there loses the round's perf record. The per-section guards in
bench.py only protect the *optional* sections (e2e / steady / int8), so
this test executes the full default flow — headline timing + all three
optional sections — at toy size on CPU and asserts the record is complete
and error-free.

Reference regime being benchmarked: /root/reference/README.md:49-64
(A100 ms/frame at 1x32x518x518); here shrunk to 70 px for CI.
"""
import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_bench_full_record_smoke():
    env = {**os.environ, "JAX_PLATFORMS": "cpu"}
    env.pop("XLA_FLAGS", None)
    res = subprocess.run(
        [sys.executable, os.path.join(ROOT, "bench.py"),
         "--encoder", "vits", "--size", "70", "--iters", "1",
         "--warmup", "0", "--chain", "1", "--e2e_frames", "54",
         # 0 = skip the probe (round-4 advisor: join(0) used to return
         # immediately and emit an 'exceeded 0s' error record on a HEALTHY
         # backend) — a full record with rc 0 proves the skip semantics.
         "--device_timeout", "0"],
        capture_output=True, text=True, env=env, cwd=ROOT, timeout=1800)
    assert res.returncode == 0, f"bench.py failed:\n{res.stdout}\n{res.stderr}"

    # Exactly one JSON line on stdout (the driver parses stdout as the record).
    lines = [ln for ln in res.stdout.strip().splitlines() if ln.strip()]
    assert len(lines) == 1, f"expected 1 stdout line, got: {lines}"
    record = json.loads(lines[0])

    # Headline keys the driver contract requires.
    for key in ("metric", "value", "unit", "vs_baseline"):
        assert key in record, (key, record)
    assert record["metric"] == "vits_ms_per_frame_70"
    assert record["unit"] == "ms/frame"
    assert record["value"] > 0

    # Every optional section completed (no <section>_error recorded).
    errs = {k: v for k, v in record.items() if k.endswith("_error")}
    assert not errs, errs

    # e2e section: floor calibration ships pre AND post plus the duplex
    # (overlapped-pipeline) floor.
    for key in ("e2e_ms_per_frame", "e2e_transfer_ms_per_frame",
                "e2e_transfer_pre_ms_per_frame",
                "e2e_transfer_post_ms_per_frame",
                "e2e_transfer_duplex_ms_per_frame"):
        assert key in record and record[key] > 0, (key, record)

    # steady-state sections (sequential cache + batched dedup-encode).
    for key in ("steady_state_ms_per_frame", "steady_state_batched_ms_per_frame"):
        assert key in record and record[key] > 0, (key, record)
    assert record["steady_state_batched_windows"] >= 2

    # int8 fold-in (second headline).
    assert record["vits_ms_per_frame_70_int8"] > 0


def test_device_watchdog():
    """A wedged backend RPC must yield an error record, not a hang.

    Observed failure mode: a dead tunnel makes jax.devices() retry refused
    connections forever. The watchdog (bench._device_unreachable) probes in
    a daemon thread under a deadline; here the probe is stubbed."""
    import time

    sys.path.insert(0, ROOT)
    import bench

    assert bench._device_unreachable(30.0, _probe=lambda: None) is None
    err = bench._device_unreachable(0.2, _probe=lambda: time.sleep(60))
    assert err and "exceeded" in err
    err = bench._device_unreachable(
        30.0, _probe=lambda: (_ for _ in ()).throw(OSError("tunnel reset")))
    assert err and "tunnel reset" in err


def test_probe_retry_and_fresh_process():
    """Round-5 hardening: the probe budget is spent as 3 slices with
    backoff (a tunnel wedge that clears mid-budget still yields a record)
    and a fresh-subprocess probe distinguishes 'tunnel dead' from 'this
    process wedged' so bench.py can re-exec instead of forfeiting the
    round (VERDICT r4 weak #1)."""
    import time

    from video_depth_anything_tpu.utils.platform_env import (
        backend_unreachable_retry, fresh_process_probe)

    # Healthy: first slice succeeds, no backoff sleeps taken.
    t0 = time.perf_counter()
    assert backend_unreachable_retry(60.0, _probe=lambda: None,
                                     log=lambda m: None) is None
    assert time.perf_counter() - t0 < 5.0

    # Recovers mid-budget: slice 1 times out, slice 2+ succeeds — the old
    # single-join behavior also recovered here, but the retry path must
    # not turn a recovery into a failure.
    state = {"n": 0}

    def flaky():
        state["n"] += 1
        if state["n"] == 1:
            time.sleep(30)

    assert backend_unreachable_retry(6.0, _probe=flaky,
                                     log=lambda m: None) is None

    # Dead the whole budget: error string survives to the caller.
    err = backend_unreachable_retry(1.0, _probe=lambda: time.sleep(30),
                                    log=lambda m: None)
    assert err and "exceeded" in err

    # Fresh-process probe: healthy CPU backend in a clean subprocess.
    env = os.environ.get("JAX_PLATFORMS")
    os.environ["JAX_PLATFORMS"] = "cpu"
    try:
        assert fresh_process_probe(timeout_s=240.0)
    finally:
        if env is None:
            os.environ.pop("JAX_PLATFORMS", None)
        else:
            os.environ["JAX_PLATFORMS"] = env
