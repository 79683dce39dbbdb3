"""Training losses — vectorized JAX versions of the reference losses.

The reference implements these with per-index Python loops
(utils/loss.py:25-43 median/MAD; utils/loss.py:101-139 TGM batch loops);
here every loss is a fused masked reduction (vmap-free, pure broadcasting)
that XLA compiles to a handful of kernels.

Conventions match the reference call sites (train.py:304-320):
  pred, gt: [B, T, H, W] disparity;  mask: [B, T, H, W] bool/0-1.
"""
from __future__ import annotations

import jax.numpy as jnp


def _masked_median(x_flat, mask_flat):
    """Per-row median over masked entries, torch.median semantics
    (lower median: sorted[(count-1)//2]). x_flat, mask_flat: [R, M]."""
    big = jnp.asarray(jnp.inf, x_flat.dtype)
    vals = jnp.where(mask_flat, x_flat, big)
    vals = jnp.sort(vals, axis=1)
    count = mask_flat.sum(axis=1)
    idx = jnp.maximum(count - 1, 0) // 2
    med = jnp.take_along_axis(vals, idx[:, None], axis=1)[:, 0]
    return jnp.where(count > 0, med, 0.0), count


def ssi_loss_median(pred, gt, mask, eps: float = 1e-8):
    """Loss_ssi, median/MAD variant (utils/loss.py:7-77).

    Both pred and gt are normalized per frame by masked median and mean
    absolute deviation; squared difference, masked per-row mean over the
    *last axis* (W) — faithfully reproducing loss.py:71-73 which averages
    rho over W per (B,T,H) row, then means everything.
    """
    b, t, h, w = pred.shape
    m = mask.astype(bool)

    def _norm(d):
        flat = d.reshape(b * t, h * w)
        mflat = m.reshape(b * t, h * w)
        med, count = _masked_median(flat, mflat)
        absdiff = jnp.abs(flat - med[:, None]) * mflat
        denom = jnp.maximum(count, 1)
        scale = absdiff.sum(axis=1) / denom + eps
        scale = jnp.where(count > 0, scale, eps)
        return ((flat - med[:, None]) / scale[:, None]).reshape(b, t, h, w)

    rho = (_norm(pred) - _norm(gt)) ** 2
    rho = jnp.where(m, rho, 0.0)
    valid_w = jnp.maximum(m.sum(axis=-1), 1.0)          # [B,T,H]
    loss_per_row = rho.sum(axis=-1) / valid_w
    return loss_per_row.mean()


def ssi_loss_lstsq(pred, gt, mask, eps: float = 1e-8):
    """Loss_ssi, per-frame lstsq variant (utils/loss_MiDas.py:7-81) — the
    loss actually used by the live training loop (train.py:16,308-320)."""
    b, t, h, w = pred.shape
    m = mask.astype(pred.dtype)
    flat_d = pred.reshape(b * t, h * w)
    flat_g = gt.reshape(b * t, h * w)
    flat_m = m.reshape(b * t, h * w)
    count = jnp.clip(flat_m.sum(axis=1, keepdims=True), 1.0, None)
    mu_d = (flat_d * flat_m).sum(axis=1, keepdims=True) / count
    mu_g = (flat_g * flat_m).sum(axis=1, keepdims=True) / count
    dd = flat_d - mu_d
    gg = flat_g - mu_g
    num = ((dd * gg) * flat_m).sum(axis=1, keepdims=True)
    den = ((dd * dd) * flat_m).sum(axis=1, keepdims=True)
    s = num / (den + eps)
    tshift = mu_g - s * mu_d
    aligned = (s * flat_d + tshift).reshape(b, t, h, w)
    rho = jnp.where(mask.astype(bool), (aligned - gt) ** 2, 0.0)
    valid = jnp.clip(mask.reshape(b, t, -1).sum(axis=2), 1.0, None)
    return (rho.reshape(b, t, -1).sum(axis=2) / valid).mean()


def ssi_mse_loss(pred, gt, mask, eps: float = 1e-7):
    """Loss_ssi_mse sequence-level MAE variant (utils/loss_MiDas.py:167-240)."""
    b = pred.shape[0]
    m = mask.astype(pred.dtype).reshape(b, -1)
    d = pred.reshape(b, -1)
    g = gt.reshape(b, -1)
    count = jnp.clip(m.sum(axis=1, keepdims=True), 1.0, None)
    mu_d = (d * m).sum(axis=1, keepdims=True) / count
    mu_g = (g * m).sum(axis=1, keepdims=True) / count
    num = (((d - mu_d) * (g - mu_g)) * m).sum(axis=1, keepdims=True)
    den = (((d - mu_d) ** 2) * m).sum(axis=1, keepdims=True)
    s = num / (den + eps)
    tshift = mu_g - s * mu_d
    residual = jnp.abs(s * d + tshift - g) * m
    return (residual.sum(axis=1, keepdims=True) / (2.0 * count)).mean()


def tgm_loss(pred, gt, mask, static_thresh: float = 0.05):
    """Loss_tgm temporal gradient matching on static regions
    (utils/loss.py:79-145 / loss_MiDas.py:83-149), vectorized over (B, T-1)
    frame pairs. Pairs with no static pixels contribute 0 (the reference's
    `continue`)."""
    m = mask.astype(bool)
    d_diff = jnp.abs(pred[:, 1:] - pred[:, :-1])
    g_raw = gt[:, 1:] - gt[:, :-1]
    g_diff = jnp.abs(g_raw)
    valid = m[:, 1:] & m[:, :-1]
    static = (g_diff < static_thresh) & valid
    diff = jnp.abs(d_diff - g_diff)
    diff = jnp.where(static, diff, 0.0)
    b, tm1 = diff.shape[0], diff.shape[1]
    num_static = static.reshape(b, tm1, -1).sum(axis=2)
    pair_sum = diff.reshape(b, tm1, -1).sum(axis=2)
    pair_loss = jnp.where(num_static > 0, pair_sum / jnp.maximum(num_static, 1), 0.0)
    return (pair_loss.sum(axis=1) / tm1).mean()


def combined_loss(pred, gt, mask, ratio_ssi=1.0, ratio_tgm=10.0,
                  ssi_variant: str = "lstsq"):
    """ratio_ssi * SSI + ratio_tgm * TGM (configs/config.yaml weights).

    Matches the masking convention at train.py:304-320: SSI consumes
    pred*mask / gt*mask."""
    m = mask.astype(pred.dtype)
    ssi_fn = ssi_loss_lstsq if ssi_variant == "lstsq" else ssi_loss_median
    l_ssi = ssi_fn(pred * m, gt * m, mask)
    l_tgm = tgm_loss(pred * m, gt * m, mask)
    return ratio_ssi * l_ssi + ratio_tgm * l_tgm, {"ssi": l_ssi, "tgm": l_tgm}
