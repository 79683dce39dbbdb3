"""PyTorch checkpoint -> JAX parameter-tree converter.

The reference ships plain `state_dict` checkpoints with keys `pretrained.*`
(DINOv2 encoder) and `head.*` (DPT-temporal decoder), loaded strict=True
(run.py:46). This module maps those keys 1:1 onto the functional param tree
used by models/ (see models/dinov2.py docstring for the layout):

  - 2-D `weight` (linear)        -> transposed to [in, out] under "w"
  - 4-D `weight` (conv)          -> OIHW -> HWIO under "w"
  - 4-D ConvTranspose `weight`   -> IOHW -> HWOI (head.resize_layers.{0,1})
  - 1-D `weight`/`bias` (norms)  -> "scale"/"bias"
  - encoder fused `attn.qkv`     -> split into separate q/k/v projections
  - `blocks.{i}.*`               -> stacked along a leading depth axis (scan)

The inverse (export_torch_state_dict) regenerates a reference-compatible
checkpoint from a JAX tree, for interop and round-trip tests.
"""
from __future__ import annotations

import re
from typing import Dict

import numpy as np

from ..config import ModelConfig

_CONVT_RE = re.compile(r"^head\.resize_layers\.[01]\.weight$")


def _set(tree: dict, path: list[str], value):
    node = tree
    for k in path[:-1]:
        node = node.setdefault(k, {})
    node[path[-1]] = value


def convert_torch_state_dict(state_dict: Dict[str, np.ndarray],
                             cfg: ModelConfig) -> dict:
    """Convert a reference state_dict (numpy values) to the JAX param tree."""
    import jax.numpy as jnp

    tree: dict = {}
    depth = cfg.vit.depth
    embed_dim = cfg.vit.embed_dim

    for key, val in state_dict.items():
        v = np.asarray(val)
        parts = key.split(".")
        leaf = parts[-1]

        if key.endswith("attn.qkv.weight"):
            # [3D, D] -> three [D, D] transposed
            q, k, vv = np.split(v, 3, axis=0)
            base = parts[:-2]
            _set(tree, base + ["q", "w"], q.T)
            _set(tree, base + ["k", "w"], k.T)
            _set(tree, base + ["v", "w"], vv.T)
            continue
        if key.endswith("attn.qkv.bias"):
            q, k, vv = np.split(v, 3, axis=0)
            base = parts[:-2]
            _set(tree, base + ["q", "b"], q)
            _set(tree, base + ["k", "b"], k)
            _set(tree, base + ["v", "b"], vv)
            continue

        if leaf == "weight":
            if v.ndim == 4:
                if _CONVT_RE.match(key):
                    v = v.transpose(2, 3, 1, 0)  # IOHW -> HWOI
                else:
                    v = v.transpose(2, 3, 1, 0)  # OIHW -> HWIO... see note
                # NOTE: OIHW -> HWIO is transpose(2,3,1,0); IOHW -> HWOI is
                # also transpose(2,3,1,0). Same permutation, different
                # interpretation downstream (conv2d vs conv_transpose2d).
                _set(tree, parts[:-1] + ["w"], v)
            elif v.ndim == 2:
                _set(tree, parts[:-1] + ["w"], v.T)
            elif v.ndim == 1:
                _set(tree, parts[:-1] + ["scale"], v)
            else:
                raise ValueError(f"unexpected weight ndim for {key}: {v.shape}")
            continue
        if leaf == "bias":
            _set(tree, parts[:-1] + [("bias" if v.ndim == 1 and _is_norm(parts) else "b")], v)
            continue
        if leaf == "gamma":     # LayerScale
            _set(tree, parts[:-1] + ["gamma"], v)
            continue
        if leaf == "pe":        # sinusoidal APE buffer
            _set(tree, parts[:-1] + ["pe"], v)
            continue
        if leaf == "running_mean":   # BatchNorm buffers (use_bn heads)
            _set(tree, parts[:-1] + ["mean"], v)
            continue
        if leaf == "running_var":
            _set(tree, parts[:-1] + ["var"], v)
            continue
        if leaf == "num_batches_tracked":
            continue
        if leaf in ("cls_token", "pos_embed", "mask_token", "register_tokens"):
            _set(tree, parts, v)
            continue
        raise ValueError(f"unmapped checkpoint key: {key}")

    # Stack encoder blocks {'0': .., '1': ..} -> leaves [L, ...] for lax.scan.
    blocks = tree["pretrained"]["blocks"]
    stacked = _stack_blocks([blocks[str(i)] for i in range(depth)])
    tree["pretrained"]["blocks"] = stacked

    # Shape sanity.
    assert tree["pretrained"]["pos_embed"].shape[-1] == embed_dim
    return jax_tree(tree)


def _is_norm(parts: list[str]) -> bool:
    """Norm layers (LayerNorm/GroupNorm/BatchNorm) use scale/bias leaves."""
    name = parts[-2]
    if name in ("norm", "norm1", "norm2", "ff_norm", "bn1", "bn2"):
        return True
    # motion norms ModuleList: ...norms.{i}.bias
    return len(parts) >= 3 and parts[-3] == "norms"


def _stack_blocks(block_list):
    out = {}
    for k in block_list[0]:
        sub = [b[k] for b in block_list]
        if isinstance(sub[0], dict):
            out[k] = _stack_blocks(sub)
        else:
            out[k] = np.stack(sub)
    return out


def jax_tree(tree):
    import jax.numpy as jnp
    if isinstance(tree, dict):
        return {k: jax_tree(v) for k, v in tree.items()}
    return jnp.asarray(np.asarray(tree, dtype=np.float32))


def export_torch_state_dict(params, cfg: ModelConfig) -> Dict[str, np.ndarray]:
    """JAX param tree -> reference-format state_dict (numpy values).

    Exact inverse of convert_torch_state_dict: encoder blocks unstack from
    the leading scan axis back to `blocks.{i}.*`, q/k/v re-fuse into
    `attn.qkv.{weight,bias}`, linears transpose back to [out, in], convs to
    OIHW (resize_layers 0/1 to IOHW), norm scale/bias to weight/bias, and
    BatchNorm's `num_batches_tracked` (a counter the functional tree has no
    use for) regenerates as zeros so the reference's strict=True load
    contract (run.py:46) holds. Round-trip pinned by
    tests/test_params_io.py; the torch-module strict-load contract by
    tests/test_validate_checkpoint.py.
    """
    depth = cfg.vit.depth
    sd: Dict[str, np.ndarray] = {}

    def emit(key: str, leaf: str, v: np.ndarray):
        if leaf == "w":
            if v.ndim == 4:
                sd[key[: -len("w")] + "weight"] = v.transpose(3, 2, 0, 1)
            else:
                sd[key[: -len("w")] + "weight"] = np.ascontiguousarray(v.T)
        elif leaf == "b":
            sd[key[: -len("b")] + "bias"] = v
        elif leaf == "scale":
            sd[key[: -len("scale")] + "weight"] = v
        elif leaf == "mean":
            base = key[: -len("mean")]
            sd[base + "running_mean"] = v
            sd[base + "num_batches_tracked"] = np.zeros((), np.int64)
        elif leaf == "var":
            sd[key[: -len("var")] + "running_var"] = v
        else:  # bias (norms), gamma, pe, cls_token, pos_embed, mask_token...
            sd[key] = v

    def walk(node, prefix: str):
        for k, v in node.items():
            key = f"{prefix}.{k}" if prefix else str(k)
            if isinstance(v, dict):
                walk(v, key)
            else:
                if k in ("w_i8", "ws") or "/qs/" in f"/{key.replace('.', '/')}/":
                    raise ValueError(
                        f"cannot export int8-quantized leaf {key}; export "
                        "the float tree")
                emit(key, k, np.asarray(v, np.float32)
                     if np.asarray(v).dtype != np.int64 else np.asarray(v))

    def to_host(node):
        # One device->host conversion per stacked leaf; unstack_blocks then
        # takes numpy views, instead of re-downloading every full stacked
        # encoder tensor once per block (depth x the encoder's bytes).
        return {k: to_host(v) if isinstance(v, dict) else np.asarray(v)
                for k, v in node.items()}

    def unstack_blocks(stacked, i):
        out = {}
        for k, v in stacked.items():
            out[k] = unstack_blocks(v, i) if isinstance(v, dict) else v[i]
        return out

    for top, sub in params.items():
        if top == "pretrained":
            for k, v in sub.items():
                if k == "blocks":
                    v = to_host(v)
                    for i in range(depth):
                        blk = unstack_blocks(v, i)
                        # re-fuse q/k/v -> qkv ([3D, D] weight, [3D] bias)
                        attn = blk["attn"]
                        sd[f"pretrained.blocks.{i}.attn.qkv.weight"] = \
                            np.ascontiguousarray(np.concatenate(
                                [attn[n]["w"].T for n in "qkv"], axis=0))
                        if "b" in attn["q"]:
                            sd[f"pretrained.blocks.{i}.attn.qkv.bias"] = \
                                np.concatenate([attn[n]["b"] for n in "qkv"])
                        blk["attn"] = {n: p for n, p in attn.items()
                                       if n not in ("q", "k", "v")}
                        walk(blk, f"pretrained.blocks.{i}")
                else:
                    if isinstance(v, dict):
                        walk(v, f"pretrained.{k}")
                    else:
                        emit(f"pretrained.{k}", k, np.asarray(v, np.float32))
        else:
            walk({top: sub}, "")
    return sd


def save_torch_checkpoint(path: str, params, cfg: ModelConfig) -> None:
    """Write a reference-loadable .pth from a JAX tree (host-side torch)."""
    import torch

    # np.array (not ascontiguousarray): always copies, so torch never sees
    # a non-writable JAX-exported buffer (from_numpy warns on those).
    sd = {k: torch.from_numpy(np.array(v))
          for k, v in export_torch_state_dict(params, cfg).items()}
    torch.save(sd, path)


def load_torch_checkpoint(path: str, cfg: ModelConfig) -> dict:
    """Load a reference .pth state_dict and convert (host-side torch CPU)."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if "model" in sd and isinstance(sd["model"], dict):
        sd = sd["model"]
    sd_np = {k: t.detach().cpu().numpy() for k, t in sd.items()}
    return convert_torch_state_dict(sd_np, cfg)


def from_torch_module(module, cfg: ModelConfig) -> dict:
    """Convert a live torch VideoDepthAnything module (used by parity tests)."""
    sd = {k: t.detach().cpu().numpy() for k, t in module.state_dict().items()}
    return convert_torch_state_dict(sd, cfg)
