"""AOT serving artifacts: the jitted window program as serialized StableHLO.

`jax.export` captures the exact program `VideoDepthPipeline._window_fn`
compiles — device-side preprocess (cv2-exact cubic resize + normalize),
the full model forward, and the bilinear upsample back to source
resolution — as a versioned, self-describing StableHLO artifact. A serving
host deserializes and calls it WITHOUT the model code (only jax + weights),
pinning the served program byte-for-byte across framework versions; with
`platforms=["tpu"]` the artifact can be produced on a CPU-only CI box and
deployed to TPU servers (lowering is platform-targeted, backend compilation
happens on the serving host and composes with the persistent compilation
cache, utils/compile_cache.py).

The reference has no counterpart (torch serving re-traces per process);
this is the TPU-native deployment story for the pipeline's hot program.

Artifact layout: `<path>` holds `Exported.serialize()` bytes; `<path>.json`
holds human-readable metadata (encoder, shapes, dtype, calling convention).
"""
from __future__ import annotations

import json
import os

import jax
import jax.numpy as jnp

from ..config import INFER_LEN, ModelConfig
from ..models import video_depth
from ..ops.resize import resize_bilinear_align_corners
from ..pipeline import preprocess

_FORMAT = "vda-tpu-window-program-v1"


def cast_params(params, fp32: bool = False):
    """Cast fp32 leaves to the serving dtype (pipeline `_params_in` rule)."""
    if fp32:
        return params
    return jax.tree.map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a,
        params)


def build_window_fn(cfg: ModelConfig, net_hw, src_hw, dtype, c: int,
                    use_pallas: bool = False):
    """The window program body (`VideoDepthPipeline._window_fn` semantics):
    `(params, win_u8 [c,32,src_h,src_w,3] u8) -> [c,32,src_h,src_w] f32`.
    Shared by the exporter and by verification oracles."""
    src_h, src_w = src_hw

    def fn(params, win_u8):
        x = preprocess.preprocess_frames(win_u8, net_hw, dtype=dtype)
        depth = video_depth.forward(params, x, cfg, use_pallas=use_pallas)
        d = depth.reshape(c * INFER_LEN, *depth.shape[2:], 1)
        d = resize_bilinear_align_corners(d.astype(jnp.float32),
                                          (src_h, src_w))
        return d[..., 0].reshape(c, INFER_LEN, src_h, src_w)

    return fn


def quantize_for_serving(params, calib_win_u8, cfg: ModelConfig,
                         net_hw, fp32: bool = False,
                         use_pallas: bool = False):
    """Build the int8 param tree an int8 artifact expects.

    Mirrors the pipeline's first-window calibration: preprocess the uint8
    calibration window to `net_hw`, run the stat-collecting forward, and
    quantize. `calib_win_u8`: [c, 32, H, W, 3] uint8 at source resolution.

    Pass the SAME `use_pallas` the artifact was exported with: activation
    absmaxes differ slightly between the Pallas and XLA attention paths,
    so calibrating with a mismatched kernel yields int8 scales that
    diverge from the pipeline's persisted `<ckpt>.int8calib.npz` (round-4
    advisor finding).
    """
    dtype = jnp.float32 if fp32 else jnp.bfloat16
    p = cast_params(params, fp32=fp32)
    x = preprocess.preprocess_frames(jnp.asarray(calib_win_u8), net_hw,
                                     dtype=dtype)
    stats = jax.device_get(
        jax.jit(lambda pp, xx: video_depth.calibrate_stats(
            pp, xx, cfg, use_pallas=use_pallas))(p, x))
    return video_depth.quantize_model(p, stats, cfg)


def export_window_program(cfg: ModelConfig, src_hw, input_size: int = 518,
                          fp32: bool = False, windows_per_batch: int = 1,
                          platforms=None, use_pallas: bool = False,
                          quant: str | None = None):
    """Export the window program for fixed source geometry.

    Mirrors `VideoDepthPipeline._window_fn` exactly: the exported callable
    is `(params, win_u8 [C, 32, src_h, src_w, 3] uint8) ->
    depth [C, 32, src_h, src_w] float32`, with the network resolution
    derived from (src_hw, input_size) by the reference's lower-bound
    multiple-of-14 rule (pipeline/preprocess.py).

    Args:
      cfg: model config (`get_model_config(encoder)`).
      src_hw: (height, width) of the serving video frames.
      input_size: the reference CLI's --input_size (default 518).
      fp32: float32 compute (default bf16 with the fp32 output island).
      windows_per_batch: leading window-batch dim C of the artifact.
      platforms: lowering platforms, e.g. ["tpu"] or ["tpu", "cpu"]
        (default: the current backend).
      use_pallas: include the Pallas attention kernel (TPU-only custom
        call; requires serving jax to accept `tpu_custom_call`). Off by
        default for maximal artifact portability — XLA attention is
        numerically interchangeable.
      quant: "int8" exports the program over the int8-quantized param
        tree (w8a8 encoder/temporal matmuls, ops/quant.py); the serving
        host builds that tree once via calibrate_stats + quantize_model
        (or the pipeline's persisted `<ckpt>.int8calib.npz`) and passes
        it as the params argument.

    Returns a `jax.export.Exported`.
    """
    assert quant in (None, "int8"), quant
    src_h, src_w = int(src_hw[0]), int(src_hw[1])
    eff = preprocess.effective_input_size(src_h, src_w, input_size)
    net_hw = preprocess.network_input_hw(src_h, src_w, eff)
    dtype = jnp.float32 if fp32 else jnp.bfloat16
    c = int(windows_per_batch)
    fn = build_window_fn(cfg, net_hw, (src_h, src_w), dtype, c,
                         use_pallas=use_pallas)

    p_avals = jax.tree.map(
        lambda s: jax.ShapeDtypeStruct(
            s.shape, dtype if s.dtype == jnp.float32 else s.dtype),
        video_depth.param_shapes(cfg))
    if quant == "int8":
        # Abstract-shape the quantized pytree: calibration stats and the
        # w_i8/ws leaves are pure shape functions of the fp tree.
        x_aval = jax.ShapeDtypeStruct((c, INFER_LEN, *net_hw, 3), dtype)
        stats_avals = jax.eval_shape(
            lambda p, xx: video_depth.calibrate_stats(p, xx, cfg,
                                                      use_pallas=False),
            p_avals, x_aval)
        p_avals = jax.eval_shape(
            lambda p, s: video_depth.quantize_model(p, s, cfg),
            p_avals, stats_avals)
    win_aval = jax.ShapeDtypeStruct((c, INFER_LEN, src_h, src_w, 3),
                                    jnp.uint8)

    kwargs = {}
    if platforms is not None:
        kwargs["platforms"] = tuple(platforms)
    if use_pallas:
        kwargs["disabled_checks"] = [
            jax.export.DisabledSafetyCheck.custom_call("tpu_custom_call")]
    return jax.export.export(jax.jit(fn), **kwargs)(p_avals, win_aval)


def save_exported(exported, path: str, extra_meta: dict | None = None) -> str:
    """Serialize to `path` (+ `path`.json metadata). Returns `path`."""
    blob = exported.serialize()
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(blob)
    os.replace(tmp, path)
    meta = {
        "format": _FORMAT,
        "fn_name": exported.fun_name,
        "platforms": list(exported.platforms),
        "calling_convention_version": exported.calling_convention_version,
        "bytes": len(blob),
        "input": "win_u8 [C, 32, H, W, 3] uint8 (source resolution)",
        "output": "depth [C, 32, H, W] float32",
    }
    meta.update(extra_meta or {})
    with open(path + ".json", "w") as f:
        json.dump(meta, f, indent=1)
    return path


def load_exported(path: str):
    """Deserialize an artifact; invoke via `loaded.call(params, win_u8)`."""
    with open(path, "rb") as f:
        return jax.export.deserialize(f.read())
