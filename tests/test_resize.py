"""Resize ops vs torch/cv2 golden semantics."""
import numpy as np
import pytest

import jax.numpy as jnp

from video_depth_anything_tpu.ops.resize import (
    cubic_resize_matrix,
    linear_resize_matrix,
    resize_bicubic_half_pixel,
    resize_bilinear_align_corners,
)


def _torch_resize(x_nchw, size=None, scale=None, mode="bilinear", align_corners=False):
    import torch
    import torch.nn.functional as F

    t = torch.from_numpy(x_nchw)
    y = F.interpolate(t, size=size, scale_factor=scale, mode=mode,
                      align_corners=align_corners)
    return y.numpy()


@pytest.mark.parametrize("in_hw,out_hw", [((37, 37), (74, 74)), ((19, 19), (37, 37)),
                                          ((148, 148), (518, 518)), ((10, 14), (31, 9))])
def test_bilinear_align_corners_matches_torch(in_hw, out_hw):
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 3, *in_hw), dtype=np.float32)
    ref = _torch_resize(x, size=out_hw, mode="bilinear", align_corners=True)
    x_nhwc = jnp.asarray(x.transpose(0, 2, 3, 1))
    for use_matmul in (True, False):
        got = np.asarray(resize_bilinear_align_corners(x_nhwc, out_hw, use_matmul))
        got = got.transpose(0, 3, 1, 2)
        np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("grid,out,offset", [(37, 8, 0.1), (37, 26, 0.1), (7, 19, 0.1)])
def test_bicubic_scale_factor_matches_torch(grid, out, offset):
    """The DINOv2 pos-embed interpolation quirk (dinov2.py:194-205)."""
    rng = np.random.default_rng(1)
    x = rng.standard_normal((1, 5, grid, grid), dtype=np.float32)
    s = (out + offset) / grid
    ref = _torch_resize(x, scale=(s, s), mode="bicubic", align_corners=False)
    assert ref.shape[-1] == out
    x_nhwc = jnp.asarray(x.transpose(0, 2, 3, 1))
    got = np.asarray(resize_bicubic_half_pixel(x_nhwc, (out, out), (s, s)))
    got = got.transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("in_hw,out_hw", [((100, 160), (56, 84)), ((50, 40), (126, 112))])
def test_bicubic_matches_cv2(in_hw, out_hw):
    """Frame preprocessing resize (util/transform.py:113, INTER_CUBIC)."""
    import cv2

    rng = np.random.default_rng(2)
    x = rng.random((*in_hw, 3), dtype=np.float32)
    ref = cv2.resize(x, (out_hw[1], out_hw[0]), interpolation=cv2.INTER_CUBIC)
    got = np.asarray(resize_bicubic_half_pixel(jnp.asarray(x), out_hw))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=2e-5)


def test_matrices_partition_of_unity():
    for m in (cubic_resize_matrix(37, 74), linear_resize_matrix(19, 37, True)):
        np.testing.assert_allclose(m.sum(axis=1), 1.0, atol=1e-5)
