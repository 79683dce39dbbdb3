"""Training state + jittable train/eval steps.

Parity with the reference training semantics (train.py:140-513):
frozen DINOv2 encoder (train.py:218-219), AdamW(wd=1e-4) over the head,
cosine-annealing LR to 1e-6 (train.py:221-222), SSI(+TGM) disparity loss
(train.py:304-320). TPU-native: bf16 forward with fp32 master params and
fp32 loss, grads over the head subtree only, pjit-shardable (parallel/mesh
rules) — no GradScaler needed on TPU (bf16 keeps fp32 exponent range).
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import optax

from ..config import ModelConfig
from ..models import video_depth
from . import losses


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Mirrors configs/config.yaml:1-11."""
    learning_rate: float = 1e-4
    weight_decay: float = 1e-4
    epochs: int = 500
    steps_per_epoch: int = 100
    clip_len: int = 20
    ratio_ssi: float = 1.0
    ratio_tgm: float = 10.0
    ratio_ssi_image: float = 0.5
    ssi_variant: str = "lstsq"
    eta_min: float = 1e-6
    compute_dtype: str = "bfloat16"


def make_optimizer(tc: TrainConfig) -> optax.GradientTransformation:
    schedule = optax.cosine_decay_schedule(
        init_value=tc.learning_rate,
        decay_steps=max(tc.epochs * tc.steps_per_epoch, 1),
        alpha=tc.eta_min / tc.learning_rate,
    )
    return optax.adamw(schedule, weight_decay=tc.weight_decay)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class TrainState:
    step: jax.Array
    params: Any           # full tree: {"pretrained": frozen, "head": trained}
    opt_state: Any        # over params["head"] only

    def tree_flatten(self):
        return (self.step, self.params, self.opt_state), None

    @classmethod
    def tree_unflatten(cls, _, children):
        return cls(*children)


def create_train_state(params, tc: TrainConfig) -> TrainState:
    tx = make_optimizer(tc)
    return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                      opt_state=tx.init(params["head"]))


def shard_train_state(state: TrainState, mesh) -> TrainState:
    """Device-put an existing state onto a mesh WITHOUT rebuilding it, so
    resume + mesh compose (restored step/opt_state survive). Adam mu/nu
    follow the head parameter shardings; counts/scalars replicate."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..parallel import param_shardings

    sh = param_shardings(state.params, mesh)
    repl = NamedSharding(mesh, P())
    params = jax.device_put(state.params, sh)
    head_sh = sh["head"]

    def put_piece(piece):
        if hasattr(piece, "mu") and hasattr(piece, "nu"):  # ScaleByAdamState
            return piece._replace(
                count=jax.device_put(piece.count, repl),
                mu=jax.device_put(piece.mu, head_sh),
                nu=jax.device_put(piece.nu, head_sh))
        return jax.tree.map(lambda x: jax.device_put(x, repl), piece)

    opt_state = state.opt_state
    if isinstance(opt_state, tuple) and not hasattr(opt_state, "_fields"):
        opt_state = tuple(put_piece(p) for p in opt_state)
    else:
        opt_state = put_piece(opt_state)
    return TrainState(step=jax.device_put(state.step, repl),
                      params=params, opt_state=opt_state)


def loss_fn(head_params, enc_params, batch, cfg: ModelConfig, tc: TrainConfig):
    params = {"pretrained": enc_params, "head": head_params}
    dtype = jnp.bfloat16 if tc.compute_dtype == "bfloat16" else jnp.float32
    cast = jax.tree.map(lambda a: a.astype(dtype)
                        if a.dtype == jnp.float32 else a, params)
    pred = video_depth.forward(cast, batch["video"].astype(dtype), cfg,
                               train=True)
    total, aux = losses.combined_loss(
        pred.astype(jnp.float32), batch["gt"], batch["mask"],
        ratio_ssi=tc.ratio_ssi, ratio_tgm=tc.ratio_tgm,
        ssi_variant=tc.ssi_variant)
    if "image_video" in batch:
        # Single-image SSI branch from the CombinedDataset
        # (train.py:279,320 loss_ssi_val_image with ratio_ssi_image).
        ipred = video_depth.forward(cast, batch["image_video"].astype(dtype),
                                    cfg, train=True)
        im = batch["image_mask"].astype(jnp.float32)
        ssi_fn = (losses.ssi_loss_lstsq if tc.ssi_variant == "lstsq"
                  else losses.ssi_loss_median)
        l_img = ssi_fn(ipred.astype(jnp.float32) * im,
                       batch["image_gt"] * im, batch["image_mask"])
        total = total + tc.ratio_ssi_image * l_img
        aux = {**aux, "ssi_image": l_img}
    return total, aux


@partial(jax.jit, static_argnames=("cfg", "tc"))
def train_step(state: TrainState, batch, cfg: ModelConfig, tc: TrainConfig):
    """One optimization step. batch: video [B,T,H,W,3] normalized,
    gt [B,T,H,W] disparity, mask [B,T,H,W]."""
    tx = make_optimizer(tc)
    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
    (loss, aux), grads = grad_fn(state.params["head"], state.params["pretrained"],
                                 batch, cfg, tc)
    updates, opt_state = tx.update(grads, state.opt_state, state.params["head"])
    head = optax.apply_updates(state.params["head"], updates)
    new_state = TrainState(step=state.step + 1,
                           params={"pretrained": state.params["pretrained"],
                                   "head": head},
                           opt_state=opt_state)
    metrics = {"loss": loss, **aux}
    return new_state, metrics


@partial(jax.jit, static_argnames=("cfg", "tc"))
def eval_step(state: TrainState, batch, cfg: ModelConfig, tc: TrainConfig):
    loss, aux = loss_fn(state.params["head"], state.params["pretrained"],
                        batch, cfg, tc)
    return {"loss": loss, **aux}
