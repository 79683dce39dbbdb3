"""Device mesh + sharding rules (pjit/GSPMD, scaling-book style).

The reference is single-process single-GPU (its only parallelism is
torch DataParallel, test_train.py:386-388). The TPU-native replacement:

- mesh axes ("data", "model");
- batch (and the window axis at inference) sharded over "data";
- optional tensor parallelism over "model": encoder attention heads and MLP
  hidden dims, temporal-module qkv/ff hidden dims — all annotated as
  NamedShardings on the parameter tree, with XLA GSPMD inserting the
  all-reduces over ICI;
- no explicit collective calls in model code: shardings are data, the
  compiler owns the communication schedule.
"""
from __future__ import annotations

import re
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: Optional[int] = None, n_model: int = 1,
              devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if n_data is None:
        n_data = n // n_model
    assert n_data * n_model <= n, (n_data, n_model, n)
    devs = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(devs, ("data", "model"))


# (regex on '/'-joined tree path, PartitionSpec) — first match wins.
# Paths refer to the parameter tree of models/ (encoder blocks are stacked
# with a leading depth axis, hence the extra None).
_RULES = [
    # --- encoder tensor parallelism: heads / mlp hidden over "model"
    (r"pretrained/blocks/attn/[qkv]/w$", P(None, None, "model")),
    (r"pretrained/blocks/attn/[qkv]/b$", P(None, "model")),
    (r"pretrained/blocks/attn/proj/w$", P(None, "model", None)),
    (r"pretrained/blocks/mlp/fc1/w$", P(None, None, "model")),
    (r"pretrained/blocks/mlp/fc1/b$", P(None, "model")),
    (r"pretrained/blocks/mlp/fc2/w$", P(None, "model", None)),
    # fused SwiGLU (vitg): w12 column-sharded (GSPMD reshards the x1/x2
    # mid-split with a collective — correct, and the [d, 2H] matmul still
    # tiles over "model"), w3 row-sharded like fc2.
    (r"pretrained/blocks/mlp/w12/w$", P(None, None, "model")),
    (r"pretrained/blocks/mlp/w12/b$", P(None, "model")),
    (r"pretrained/blocks/mlp/w3/w$", P(None, "model", None)),
    # --- temporal modules: qkv/ff hidden over "model"
    (r"head/motion_modules/.*/to_[qkv]/w$", P(None, "model")),
    (r"head/motion_modules/.*/to_out/0/w$", P("model", None)),
    (r"head/motion_modules/.*/ff/net/0/proj/w$", P(None, "model")),
    (r"head/motion_modules/.*/ff/net/2/w$", P("model", None)),
    # --- everything else replicated
    (r".*", P()),
]


def param_sharding_rules(path: str) -> P:
    # int8-quantized sites (ops/quant.py): w_i8 shards like the float w it
    # replaces; its per-out-channel scale ws = absmax over w's contraction
    # axis (-2), so ws's spec is w's spec with that axis dropped. Activation
    # scales ("qs" leaves) are tiny and fall through to replicated.
    if path.endswith("/w_i8"):
        return param_sharding_rules(path[:-3])  # ".../w"
    if path.endswith("/ws"):
        spec = tuple(param_sharding_rules(path[:-1]))  # ".../w"
        return P(*(spec[:-2] + spec[-1:])) if len(spec) >= 2 else P()
    for pattern, spec in _RULES:
        if re.search(pattern, path):
            return spec
    return P()


def _tree_paths(tree, prefix=""):
    for k, v in tree.items():
        path = f"{prefix}/{k}" if prefix else str(k)
        if isinstance(v, dict):
            yield from _tree_paths(v, path)
        else:
            yield path, v


def param_shardings(params, mesh: Mesh):
    """Pytree of NamedShardings matching `params`."""
    def build(tree, prefix=""):
        out = {}
        for k, v in tree.items():
            path = f"{prefix}/{k}" if prefix else str(k)
            if isinstance(v, dict):
                out[k] = build(v, path)
            else:
                spec = param_sharding_rules(path)
                # Drop specs that don't divide the dim evenly -> replicate axis.
                fixed = []
                for dim, axis in zip(v.shape, tuple(spec) + (None,) * v.ndim):
                    if axis is not None and dim % mesh.shape[axis] != 0:
                        axis = None
                    fixed.append(axis)
                out[k] = NamedSharding(mesh, P(*fixed[: v.ndim]))
        return out
    return build(params)


def shard_params(params, mesh: Mesh):
    return jax.device_put(params, param_shardings(params, mesh))


def shard_batch(batch, mesh: Mesh):
    """Leading axis over "data", rest replicated."""
    def put(x):
        spec = P("data", *([None] * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))
    return jax.tree.map(put, batch)
