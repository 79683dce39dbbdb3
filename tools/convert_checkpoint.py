#!/usr/bin/env python3
"""Convert reference torch checkpoints (.pth) to the native .npz format.

Usage:
  python tools/convert_checkpoint.py checkpoints/video_depth_anything_vitl.pth
  python tools/convert_checkpoint.py ckpt.pth --encoder vits --out ckpt.npz
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("checkpoint")
    parser.add_argument("--encoder", default=None,
                        help="vits/vitl (inferred from filename if omitted)")
    parser.add_argument("--out", default=None)
    args = parser.parse_args()

    from video_depth_anything_tpu.config import get_model_config
    from video_depth_anything_tpu.utils.params_io import save_params
    from video_depth_anything_tpu.utils.torch_convert import load_torch_checkpoint

    enc = args.encoder
    if enc is None:
        for cand in ("vits", "vitb", "vitl", "vitg"):
            if cand in os.path.basename(args.checkpoint):
                enc = cand
                break
    if enc is None:
        sys.exit("cannot infer encoder from filename; pass --encoder")
    try:
        cfg = get_model_config(enc)
    except KeyError:
        sys.exit(f"no model config for encoder '{enc}' "
                 f"(supported: vits, vitl); pass --encoder")
    params = load_torch_checkpoint(args.checkpoint, cfg)
    out = args.out or os.path.splitext(args.checkpoint)[0] + ".npz"
    save_params(out, params)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
