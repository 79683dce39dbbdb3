"""Loss parity vs the reference torch implementations."""
import sys

import numpy as np
import pytest

import jax.numpy as jnp
import torch

from video_depth_anything_tpu.training import losses


@pytest.fixture(scope="module")
def ref_losses():
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    import utils.loss as ref_loss
    import utils.loss_MiDas as ref_midas
    return ref_loss, ref_midas


@pytest.fixture(scope="module")
def batch():
    rng = np.random.default_rng(0)
    b, t, h, w = 2, 5, 12, 16
    pred = rng.random((b, t, h, w)).astype(np.float32)
    gt = rng.random((b, t, h, w)).astype(np.float32)
    mask = (rng.random((b, t, h, w)) > 0.25).astype(np.float32)
    mask[0, 0] = 0.0  # an all-invalid frame must not NaN
    return pred, gt, mask


def _t(x):
    return torch.from_numpy(x)


def test_ssi_lstsq_parity(ref_losses, batch):
    _, ref_midas = ref_losses
    pred, gt, mask = batch
    ref = ref_midas.Loss_ssi()(_t(pred), _t(gt), _t(mask)).item()
    got = float(losses.ssi_loss_lstsq(jnp.asarray(pred), jnp.asarray(gt),
                                      jnp.asarray(mask)))
    np.testing.assert_allclose(got, ref, rtol=1e-5)


def test_ssi_median_parity(ref_losses, batch):
    ref_loss, _ = ref_losses
    pred, gt, mask = batch
    ref = ref_loss.Loss_ssi()(_t(pred), _t(gt), _t(mask)).item()
    got = float(losses.ssi_loss_median(jnp.asarray(pred), jnp.asarray(gt),
                                       jnp.asarray(mask)))
    np.testing.assert_allclose(got, ref, rtol=1e-4)


def test_tgm_parity(ref_losses, batch):
    ref_loss, _ = ref_losses
    pred, gt, mask = batch
    ref = ref_loss.Loss_tgm()(_t(pred), _t(gt), _t(mask)).item()
    got = float(losses.tgm_loss(jnp.asarray(pred), jnp.asarray(gt),
                                jnp.asarray(mask)))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-7)


def test_ssi_mse_parity(ref_losses, batch):
    _, ref_midas = ref_losses
    pred, gt, mask = batch
    ref = ref_midas.Loss_ssi_mse()(_t(pred)[:, :, None], _t(gt)[:, :, None],
                                   _t(mask)).item()
    got = float(losses.ssi_mse_loss(jnp.asarray(pred), jnp.asarray(gt),
                                    jnp.asarray(mask)))
    np.testing.assert_allclose(got, ref, rtol=1e-5)


def test_losses_finite_and_grad():
    import jax

    rng = np.random.default_rng(1)
    pred = jnp.asarray(rng.random((1, 4, 8, 8)).astype(np.float32))
    gt = jnp.asarray(rng.random((1, 4, 8, 8)).astype(np.float32))
    mask = jnp.ones((1, 4, 8, 8))

    def f(p):
        total, _ = losses.combined_loss(p, gt, mask)
        return total

    g = jax.grad(f)(pred)
    assert np.isfinite(np.asarray(g)).all()
