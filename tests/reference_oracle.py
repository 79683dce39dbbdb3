"""Import helpers for the PyTorch reference used as a golden parity oracle.

We import the *pristine upstream* model tree (/root/reference/metric_depth/
video_depth_anything) — the fork's top-level tree hard-codes a torch.hub
DINOv2 download (video_depth.py:60) that would require network access and
breaks vitl (SURVEY.md preamble). The metric tree is byte-identical
otherwise and self-contained.

NOTE: the reference is read-only public content used strictly as a numeric
oracle; nothing from it is copied into the framework.
"""
import sys

_REF = "/root/reference/metric_depth"


def load_reference():
    if _REF not in sys.path:
        sys.path.insert(0, _REF)
    import torch  # noqa: F401
    from video_depth_anything.video_depth import VideoDepthAnything  # type: ignore
    return VideoDepthAnything


def build_torch_model(encoder="vits", num_frames=8, seed=0):
    import torch

    VideoDepthAnything = load_reference()
    cfgs = {
        "vits": dict(encoder="vits", features=64, out_channels=[48, 96, 192, 384]),
        "vitl": dict(encoder="vitl", features=256, out_channels=[256, 512, 1024, 1024]),
    }
    torch.manual_seed(seed)
    model = VideoDepthAnything(num_frames=num_frames, **cfgs[encoder])
    model.eval()
    # Randomize select zero-init / constant params so parity tests exercise
    # every code path (zero proj_out would hide temporal-module bugs).
    with torch.no_grad():
        for name, p in model.named_parameters():
            if "proj_out" in name or "cls_token" in name:
                p.add_(0.02 * torch.randn_like(p))
    return model
