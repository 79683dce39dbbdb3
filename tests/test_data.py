"""Dataset parity vs reference data/VKITTI.py + loader behavior."""
import os
import random
import sys

import numpy as np
import pytest


def _make_vkitti(root, scenes=("Scene01", "Scene20"), frames=6, hw=(40, 60)):
    from PIL import Image

    rng = np.random.default_rng(0)
    for scene in scenes:
        for cam in ("Camera_0",):
            rgb_dir = os.path.join(root, "vkitti_2.0.3_rgb", scene, "clone",
                                   "frames", "rgb", cam)
            dep_dir = os.path.join(root, "vkitti_2.0.3_depth", scene, "clone",
                                   "frames", "depth", cam)
            txt_dir = os.path.join(root, "vkitti_2.0.3_textgt", scene, "clone")
            os.makedirs(rgb_dir), os.makedirs(dep_dir), os.makedirs(txt_dir)
            for i in range(frames):
                img = rng.integers(0, 255, (*hw, 3), np.uint8)
                Image.fromarray(img).save(os.path.join(rgb_dir, f"rgb_{i:05d}.jpg"))
                depth_cm = rng.integers(200, 60000, hw).astype(np.uint16)
                Image.fromarray(depth_cm).save(
                    os.path.join(dep_dir, f"depth_{i:05d}.png"))
            with open(os.path.join(txt_dir, "intrinsic.txt"), "w") as f:
                f.write("frame cameraID K[0,0] K[1,1] K[0,2] K[1,2]\n")
                for i in range(frames):
                    f.write(f"{i} 0 725.0 725.0 620.5 187.0\n")
            with open(os.path.join(txt_dir, "extrinsic.txt"), "w") as f:
                f.write("frame cameraID r1,1 ...\n")
                for i in range(frames):
                    vals = " ".join(str(v) for v in np.eye(4).ravel())
                    f.write(f"{i} 0 {vals}\n")


@pytest.fixture(scope="module")
def vkitti_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("vkitti"))
    _make_vkitti(root)
    return root


def test_vkitti_parity_with_reference(vkitti_root):
    import torch

    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    from data.VKITTI import KITTIVideoDataset

    from video_depth_anything_tpu.data import VKITTIVideoDataset

    random.seed(123)
    ref_ds = KITTIVideoDataset(root_dir=vkitti_root, clip_len=4,
                               resize_size=28, split="train")
    ref_x, ref_y, ref_m = ref_ds[0]

    ours = VKITTIVideoDataset(vkitti_root, clip_len=4, resize_size=28,
                              split="train")
    ours.rng = random  # share the reference's global-RNG stream
    random.seed(123)
    item = ours[0]

    np.testing.assert_allclose(item["video"].transpose(0, 3, 1, 2),
                               ref_x.numpy(), rtol=1e-5, atol=1e-5)
    # reference disparity is 3-channel (RGB-converted "L"); ours is 1-channel
    np.testing.assert_allclose(item["gt"], ref_y.numpy()[:, 0], atol=1e-6)
    # reference masks are 0/255 floats consumed via .bool() (train.py:248);
    # ours are 0/1 — compare boolean semantics
    np.testing.assert_array_equal(item["mask"] > 0, ref_m.numpy()[:, 0] > 0)


def test_vkitti_val_split_and_camera_params(vkitti_root):
    from video_depth_anything_tpu.data import VKITTIVideoDataset

    ds = VKITTIVideoDataset(vkitti_root, clip_len=4, resize_size=28, split="val")
    assert len(ds) == 1  # Scene20 only
    item = ds[0]
    assert item["extrinsics"].shape == (4, 4, 4)
    assert item["intrinsics"].shape == (4, 3, 3)
    assert item["depth"].shape == (4, 28, 28)


def test_loader_batching(vkitti_root):
    from video_depth_anything_tpu.data import DataLoader, VKITTIVideoDataset

    ds = VKITTIVideoDataset(vkitti_root, clip_len=2, resize_size=28,
                            split="train")
    loader = DataLoader(ds, batch_size=1, shuffle=True, seed=0)
    batches = list(loader)
    assert len(batches) == len(ds)
    assert batches[0]["video"].shape == (1, 2, 28, 28, 3)
    assert batches[0]["mask"].dtype == np.float32
