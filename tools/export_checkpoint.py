#!/usr/bin/env python3
"""Export a training checkpoint (orbax, training/checkpoint.py layout) to a
plain inference .npz parameter file loadable by run.py --checkpoint.

Usage:
  python tools/export_checkpoint.py train_out --name best_checkpoint \
      --encoder vits --out checkpoints/video_depth_anything_vits.npz
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("train_dir")
    parser.add_argument("--name", default="best_checkpoint",
                        choices=["best_checkpoint", "latest_checkpoint"])
    parser.add_argument("--encoder", required=True)
    parser.add_argument("--clip_len", type=int, default=20)
    parser.add_argument("--out", required=True)
    args = parser.parse_args()

    from video_depth_anything_tpu.config import get_model_config
    from video_depth_anything_tpu.models.video_depth import init_params
    from video_depth_anything_tpu.training import checkpoint as ckpt
    from video_depth_anything_tpu.training.train_state import (TrainConfig,
                                                               create_train_state)
    from video_depth_anything_tpu.utils.params_io import save_params

    cfg = get_model_config(args.encoder, num_frames=args.clip_len)
    template = create_train_state(init_params(0, cfg), TrainConfig())
    restored = ckpt.load_checkpoint(args.train_dir, args.name, template=template)
    if restored is None:
        sys.exit(f"no {args.name} under {args.train_dir}")
    save_params(args.out, restored["params"])
    print(f"wrote {args.out} (epoch {restored['extra']['epoch']})")


if __name__ == "__main__":
    main()
