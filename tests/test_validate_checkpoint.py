"""Keep the real-checkpoint on-arrival path warm.

Real weights cannot be downloaded in this image (network-blocked; see
checkpoints/README.md), so the one-command validator
(tools/validate_checkpoint.py) is the path that MUST work the day a real
`.pth` lands. These tests exercise that chain against a reference-format
`.pth` produced by the inverse converter (utils/torch_convert.py::
export_torch_state_dict):

1. the exported state_dict satisfies the reference's OWN strict=True load
   contract (run.py:46) on the live upstream torch module — i.e. the file
   is indistinguishable in format from a real released checkpoint;
2. the validator subprocess (same invocation the on-arrival instructions
   give) passes end to end: load -> converter -> .npz roundtrip ->
   pipeline -> bf16 drift budget.
"""
import json
import os
import subprocess
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402

from video_depth_anything_tpu.config import get_model_config  # noqa: E402
from video_depth_anything_tpu.models.video_depth import init_params  # noqa: E402
from video_depth_anything_tpu.utils import torch_convert  # noqa: E402

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_exported_pth_loads_strict_into_reference_module():
    from reference_oracle import build_torch_model

    cfg = get_model_config("vits")
    params = init_params(jax.random.PRNGKey(0), cfg)
    sd = torch_convert.export_torch_state_dict(params, cfg)
    model = build_torch_model("vits", num_frames=32)
    missing, unexpected = model.load_state_dict(
        {k: torch.from_numpy(np.array(v)) for k, v in sd.items()},
        strict=True)
    assert not missing and not unexpected


def test_torch_export_roundtrip_identity():
    cfg = get_model_config("vits")
    params = init_params(jax.random.PRNGKey(1), cfg)
    sd = torch_convert.export_torch_state_dict(params, cfg)
    back = torch_convert.convert_torch_state_dict(sd, cfg)
    la, lb = jax.tree.leaves(params), jax.tree.leaves(back)
    assert len(la) == len(lb)
    for a, b in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_validator_tool_passes_on_reference_format_pth(tmp_path):
    cfg = get_model_config("vits")
    params = init_params(jax.random.PRNGKey(0), cfg)
    path = str(tmp_path / "video_depth_anything_vits.pth")
    torch_convert.save_torch_checkpoint(path, params, cfg)

    out = subprocess.run(
        [sys.executable, "tools/validate_checkpoint.py", path],
        capture_output=True, text=True, cwd=ROOT, timeout=1800)
    assert out.returncode == 0, f"stdout:\n{out.stdout}\nstderr:\n{out.stderr}"
    rep = json.loads(out.stdout)
    assert rep["ok"], rep
    assert rep["checks"]["load"] == "ok"
    assert rep["checks"]["npz_roundtrip"] == "ok"
    assert rep["checks"]["bf16_budget"] == "ok"
    # the converted .npz the validator wrote loads through run.py's loader
    npz = os.path.splitext(path)[0] + ".npz"
    assert os.path.exists(npz)
