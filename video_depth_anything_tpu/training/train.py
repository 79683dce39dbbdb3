"""Training driver — parity with the reference train loop (train.py:140-513).

yaml config -> VKITTI (+optional GoogleLandmarks) loaders -> frozen-encoder
AdamW + cosine LR -> bf16 train steps (no GradScaler needed on TPU) ->
per-epoch validation (clip lstsq AbsRel/delta1/TAE, train.py:340-479) ->
best/latest checkpointing with early-stop patience.

TPU-native: the step is one jitted graph (training/train_state.py), batches
stream through a prefetching host loader, and params/batches can be sharded
over a mesh (parallel/mesh.py) for multi-chip DP/TP.
"""
from __future__ import annotations

import argparse
import json
import os

import numpy as np


class MetricsLogger:
    """wandb-equivalent: stdout + JSONL file (wandb is not in this image)."""

    def __init__(self, log_dir: str):
        os.makedirs(log_dir, exist_ok=True)
        self.path = os.path.join(log_dir, "metrics.jsonl")

    def log(self, metrics: dict, step: int):
        rec = {"step": step, **{k: float(v) for k, v in metrics.items()}}
        with open(self.path, "a") as f:
            f.write(json.dumps(rec) + "\n")
        print(" ".join(f"{k}={v:.5f}" if isinstance(v, float) else f"{k}={v}"
                       for k, v in rec.items()))


def train(config_path: str = "configs/config.yaml", data_root: str = None,
          google_image_root: str = None, google_depth_root: str = None,
          out_dir: str = "./train_out", max_steps: int = -1,
          resume: bool = False, mesh=None, model_cfg=None,
          resize_size: int = 518, distributed: bool = False):
    import yaml

    import jax
    import jax.numpy as jnp

    from ..config import get_model_config
    from ..data import CombinedDataset, DataLoader, VKITTIVideoDataset
    from ..models.video_depth import init_params
    from ..training import checkpoint as ckpt
    from ..training.train_state import (TrainConfig, create_train_state,
                                        eval_step, train_step)
    from ..training.validate import metric_val

    if distributed:
        # Multi-host: join the cluster, one mesh over every host's chips,
        # per-host input feeding (parallel/distributed.py).
        from ..parallel import distributed as dist
        dist.initialize()
        if mesh is None:
            mesh = dist.global_mesh()
    nproc = jax.process_count()
    proc0 = jax.process_index() == 0
    if nproc > 1 and mesh is not None:
        # The global batch (nproc * per-host batch_size) shards over the
        # mesh "data" axis; an indivisible batch fails at the first step
        # with an opaque sharding error — fail early and clearly instead.
        ndata = mesh.shape["data"]
        per_host = ndata // nproc
        def _check_batch(bs):
            gb = bs * nproc
            if gb % ndata != 0:
                raise ValueError(
                    f"per-host batch_size={bs} gives a global batch of {gb} "
                    f"which does not divide over the {ndata}-chip data axis "
                    f"({nproc} hosts x {per_host} chips/host); use a "
                    f"batch_size that is a multiple of {per_host}")
    else:
        def _check_batch(bs):
            pass

    with open(config_path) as f:
        hp = yaml.safe_load(f)["hyper_parameter"]

    clip_len = int(hp.get("clip_len", 20))
    cfg = model_cfg or get_model_config(hp.get("encoder", "vits"),
                                        num_frames=clip_len)
    clip_len = cfg.num_frames
    batch_size = int(hp.get("batch_size", 1))
    _check_batch(batch_size)
    patience = int(hp.get("patient", 5))

    train_ds = VKITTIVideoDataset(data_root, clip_len=clip_len, split="train",
                                  resize_size=resize_size)
    val_ds = VKITTIVideoDataset(data_root, clip_len=clip_len, split="val",
                                resize_size=resize_size)
    if google_image_root:
        train_ds = CombinedDataset(train_ds, google_image_root, google_depth_root)
    # Each process loads batch_size rows; the global batch is nproc x that.
    train_loader = DataLoader(train_ds, batch_size=batch_size, shuffle=True,
                              num_shards=nproc, shard_id=jax.process_index())
    # Validation is NOT sharded: every process walks the same sequences and
    # computes identical (replicated) metrics, so control flow stays in sync.
    val_loader = DataLoader(val_ds, batch_size=1, shuffle=False)

    # Cosine horizon = epochs * real optimizer steps per epoch, matching the
    # reference's per-epoch annealing over T_max=epochs (train.py:222).
    tc = TrainConfig(
        learning_rate=float(hp.get("learning_rate", 1e-4)),
        epochs=int(hp.get("epochs", 500)),
        steps_per_epoch=max(len(train_loader), 1),
        ratio_ssi=float(hp.get("ratio_ssi", 1.0)),
        ratio_tgm=float(hp.get("ratio_tgm", 10.0)),
        ratio_ssi_image=float(hp.get("ratio_ssi_image", 0.5)),
        ssi_variant=hp.get("ssi_variant", "lstsq"),
        compute_dtype=hp.get("compute_dtype", "bfloat16"),
    )

    params = init_params(0, cfg)
    state = create_train_state(params, tc)
    logger = MetricsLogger(out_dir)

    start_epoch, best_val, trial = 0, float("inf"), 0
    if resume:
        restored = ckpt.load_checkpoint(out_dir, "latest_checkpoint", template=state)
        if restored is not None:
            from ..training.train_state import TrainState
            state = TrainState(step=jnp.asarray(restored["step"]),
                               params=restored["params"],
                               opt_state=restored["opt_state"])
            extra = restored["extra"]
            start_epoch = int(extra["epoch"]) + 1
            best_val = float(extra["best_val_loss"])
            trial = int(extra["trial"])
            print(f"resumed from epoch {start_epoch}")

    if mesh is not None:
        # device_put the existing state (fresh OR resumed) onto the mesh —
        # restored step/opt_state must survive sharding.
        from ..training.train_state import shard_train_state
        state = shard_train_state(state, mesh)

    from ..models.video_depth import forward
    val_dtype = jnp.bfloat16 if tc.compute_dtype == "bfloat16" else jnp.float32
    _val_fwd = jax.jit(lambda p, v: forward(p, v.astype(val_dtype), cfg))

    step_count = 0
    for epoch in range(start_epoch, tc.epochs):
        step_losses = []  # device scalars; fetched once per epoch so the
        nb = 0            # loop never blocks on a per-step host sync
        for batch in train_loader:
            batch = {k: v for k, v in batch.items()
                     if k in ("video", "gt", "mask", "image_video",
                              "image_gt", "image_mask")}
            if nproc > 1:
                from ..parallel.distributed import host_local_batch_to_global
                batch = host_local_batch_to_global(batch, mesh)
            elif mesh is not None:
                from ..parallel import shard_batch
                batch = shard_batch(batch, mesh)
            else:
                batch = {k: jnp.asarray(v) for k, v in batch.items()}
            state, metrics = train_step(state, batch, cfg, tc)
            step_losses.append(metrics["loss"])
            nb += 1
            step_count += 1
            if max_steps > 0 and step_count >= max_steps:
                break
        epoch_loss = float(np.sum(jax.device_get(step_losses))) \
            if step_losses else 0.0
        if proc0:
            logger.log({"train_loss": epoch_loss / max(nb, 1), "epoch": epoch},
                       step_count)

        # -- validation (train.py:340-479) --
        val_losses, absrels, delta1s, taes = [], [], [], []
        first_val = True
        # Loop-invariant: cast the params once per epoch; _val_fwd is one
        # jitted function reused across epochs (defined before the loop).
        cast = jax.tree.map(lambda a: a.astype(val_dtype)
                            if a.dtype == jnp.float32 else a, state.params)
        for batch in val_loader:
            jb = {k: v for k, v in batch.items()
                  if k in ("video", "gt", "mask")}
            if nproc > 1:
                from ..parallel.distributed import host_replicated_to_global
                jb = host_replicated_to_global(jb, mesh)
            else:
                jb = {k: jnp.asarray(v) for k, v in jb.items()}
            val_losses.append(float(eval_step(state, jb, cfg, tc)["loss"]))
            pred = np.asarray(_val_fwd(cast, jb["video"]))
            a, d1, t = metric_val(pred[0], batch["depth"][0],
                                  batch["extrinsics"][0], batch["intrinsics"][0])
            absrels.append(a), delta1s.append(d1), taes.append(t)
            if first_val and proc0:  # visual regression dump (train.py:387-435)
                from ..training.visualize import dump_val_frames
                dump_val_frames(os.path.join(out_dir, "val_vis"), epoch,
                                batch["video"][0], batch["gt"][0],
                                batch["mask"][0], pred[0])
            first_val = False
        val_loss = float(np.mean(val_losses)) if val_losses else float("inf")
        if proc0:
            logger.log({"val_loss": val_loss, "absrel": np.mean(absrels),
                        "delta1": np.mean(delta1s), "tae": np.mean(taes),
                        "epoch": epoch}, step_count)

        # Update best/trial BEFORE writing latest_checkpoint so a resume
        # restores this epoch's post-val state (test_train.py:402-420
        # resume contract); saving first would restore a stale best_val
        # that lets a later, worse epoch overwrite best_checkpoint.
        improved = val_loss < best_val
        if improved:
            best_val, trial = val_loss, 0
        else:
            trial += 1
        extra = {"epoch": epoch, "best_val_loss": best_val, "trial": trial}
        ckpt.save_checkpoint(out_dir, "latest_checkpoint", state, extra)
        if improved:
            ckpt.save_checkpoint(out_dir, "best_checkpoint", state, extra)
        elif trial >= patience:
            print(f"early stop at epoch {epoch} (patience {patience})")
            break
        if max_steps > 0 and step_count >= max_steps:
            break
    return state


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", default="configs/config.yaml")
    parser.add_argument("--data_root", required=True)
    parser.add_argument("--google_image_root", default=None)
    parser.add_argument("--google_depth_root", default=None)
    parser.add_argument("--out_dir", default="./train_out")
    parser.add_argument("--max_steps", type=int, default=-1)
    parser.add_argument("--resume", action="store_true")
    parser.add_argument("--distributed", action="store_true",
                        help="multi-host: jax.distributed.initialize + "
                             "global mesh + per-host data feeding")
    parser.add_argument("--compile_cache", type=str, nargs="?", const="",
                        default=None, metavar="DIR",
                        help="persist XLA-compiled train/val programs to DIR "
                             "(default ~/.cache/video_depth_anything_tpu/xla)"
                             "; also enabled via VDA_COMPILE_CACHE")
    args = parser.parse_args(argv)
    from ..utils.platform_env import honor_jax_platforms_env
    honor_jax_platforms_env()
    from ..utils import compile_cache
    if args.compile_cache is not None:
        print("compilation cache:",
              compile_cache.enable_compile_cache(args.compile_cache or None))
    else:
        compile_cache.maybe_enable_from_env()
    train(args.config, args.data_root, args.google_image_root,
          args.google_depth_root, args.out_dir, args.max_steps, args.resume,
          distributed=args.distributed)


if __name__ == "__main__":
    main()
