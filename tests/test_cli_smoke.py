"""CLI-layer smoke: run.py end to end on CPU (tiny shapes, random init).

The pipeline/model layers have their own parity suites; this covers the
arg plumbing + writer wiring of the CLI itself (reference run.py:22-77
surface), including the --streaming and --metric paths, so a flag
regression cannot hide until a manual TPU drive. All three modes run in
ONE subprocess so the (dominant) CPU compile of the vits graph is paid
once; --fp32 because bf16 is software-emulated on CPU.
"""
import os
import subprocess
import sys

import numpy as np
import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_DRIVER = """
import sys, json
import run

base = ["run.py", "--encoder", "vits", "--random_init",
        "--input_video", {video!r}, "--input_size", "28",
        "--max_res", "64", "--save_npz", "--fp32"]
for name, extra in [("default", []), ("streaming", ["--streaming"]),
                    ("metric", ["--metric"])]:
    sys.argv = base + ["--output_dir", {out!r} + "/" + name] + extra
    run.main()
    print("DONE", name, flush=True)
"""


def test_cli_all_modes(tmp_path):
    cv2 = pytest.importorskip("cv2")
    from video_depth_anything_tpu.utils.precision import synthetic_video

    video = str(tmp_path / "clip.mp4")
    frames = synthetic_video(n=12, hw=(48, 64))
    w = cv2.VideoWriter(video, cv2.VideoWriter_fourcc(*"mp4v"), 10, (64, 48))
    for f in frames:
        w.write(cv2.cvtColor(f, cv2.COLOR_RGB2BGR))
    w.release()

    env = {**os.environ, "JAX_PLATFORMS": "cpu"}
    env.pop("XLA_FLAGS", None)
    res = subprocess.run(
        [sys.executable, "-c", _DRIVER.format(video=video,
                                              out=str(tmp_path))],
        capture_output=True, text=True, env=env, cwd=ROOT, timeout=900)
    assert res.returncode == 0, f"CLI failed:\n{res.stdout}\n{res.stderr}"
    for name in ("default", "streaming", "metric"):
        assert f"DONE {name}" in res.stdout

    depths = {}
    for name in ("default", "streaming", "metric"):
        out = os.path.join(str(tmp_path), name)
        d = np.load(os.path.join(out, "clip_depths.npz"))["depths"]
        assert d.shape == (12, 48, 64) and np.isfinite(d).all(), name
        for suffix in ("_src.mp4", "_vis.mp4"):
            p = os.path.join(out, "clip" + suffix)
            assert os.path.exists(p) and os.path.getsize(p) > 0, p
        depths[name] = d
    # streaming is bit-identical to the batch pipeline through the CLI too
    np.testing.assert_array_equal(depths["default"], depths["streaming"])
