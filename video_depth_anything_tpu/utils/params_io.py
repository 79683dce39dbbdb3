"""Native parameter serialization (flat-key .npz) + checkpoint resolution.

The reference loads torch .pth state_dicts strict=True (run.py:46). This
framework's native format is a flat .npz keyed by '/'-joined tree paths;
torch checkpoints are converted on the fly via utils/torch_convert. Training
state uses orbax (training/checkpoint.py).
"""
from __future__ import annotations

import os

import numpy as np

from ..config import ModelConfig


def flatten_tree(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        key = f"{prefix}/{k}" if prefix else str(k)
        if isinstance(v, dict):
            out.update(flatten_tree(v, key))
        else:
            out[key] = np.asarray(v)
    return out


def unflatten_tree(flat):
    tree: dict = {}
    for key, v in flat.items():
        parts = key.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return tree


def save_params(path: str, params) -> None:
    np.savez_compressed(path, **flatten_tree(params))


def load_params(path: str):
    import jax.numpy as jnp

    with np.load(path) as data:
        flat = {k: jnp.asarray(data[k]) for k in data.files}
    return unflatten_tree(flat)


def load_checkpoint(path: str, cfg: ModelConfig):
    """Load .npz (native) or .pth (torch reference format)."""
    if path.endswith(".pth") or path.endswith(".pt"):
        from .torch_convert import load_torch_checkpoint
        return load_torch_checkpoint(path, cfg)
    return load_params(path)


def resolve_checkpoint(encoder: str, metric: bool = False,
                       checkpoint_dir: str = "./checkpoints"):
    """Reference layout: checkpoints/video_depth_anything_{encoder}.pth
    (run.py:46) / metric_video_depth_anything_{encoder}.pth
    (metric_depth/run.py:43). Native .npz takes precedence if present."""
    prefix = "metric_video_depth_anything" if metric else "video_depth_anything"
    for ext in (".npz", ".pth"):
        p = os.path.join(checkpoint_dir, f"{prefix}_{encoder}{ext}")
        if os.path.exists(p):
            return p
    return None
