#!/usr/bin/env python3
"""Benchmark: ViT-L 1x32x518x518 window latency on the local accelerator.

Prints ONE JSON line:
  {"metric": "vitl_ms_per_frame_518", "value": ..., "unit": "ms/frame",
   "vs_baseline": ...}

Baseline: 14 ms/frame — A100 fp16 ViT-L (reference README.md:58), the
north-star target from BASELINE.md. vs_baseline > 1 means faster than
baseline (baseline_ms / our_ms).
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# A100 fp16 ms/frame (reference README.md:51,58); vitl is the north star.
# vitb/vitg have no published reference latency (no released VDA
# checkpoints) — their records carry vs_baseline: null.
BASELINES_MS_PER_FRAME = {"vits": 7.5, "vitl": 14.0}


def _device_unreachable(timeout_s, _probe=None):
    """Probe the backend under a deadline (utils/platform_env.py): a dead
    tunnel or wedged remote executor would otherwise hang the whole
    benchmark and lose the round's record."""
    from video_depth_anything_tpu.utils.platform_env import backend_unreachable
    return backend_unreachable(timeout_s, _probe=_probe)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--encoder", default="vitl",
                        choices=["vits", "vitb", "vitl", "vitg"])
    parser.add_argument("--frames", type=int, default=32)
    parser.add_argument("--batch", type=int, default=1,
                        help="windows per step (throughput mode; windows are "
                             "embarrassingly parallel, SURVEY.md §5)")
    parser.add_argument("--size", type=int, default=518)
    parser.add_argument("--iters", type=int, default=10)
    parser.add_argument("--warmup", type=int, default=3)
    parser.add_argument("--chain", type=int, default=3,
                        help="window forwards per dispatch (lax.fori_loop). "
                             "Each timed call dispatches once and runs the "
                             "forward CHAIN times with a data dependency "
                             "between iterations, so per-call host dispatch "
                             "latency (~26 ms over this dev tunnel; ~0 on a "
                             "real TPU host) amortizes out of the ms/frame "
                             "number, matching how the reference's A100 "
                             "figures were taken (local, no RPC). --chain 1 "
                             "restores the raw single-dispatch measurement")
    parser.add_argument("--fp32", action="store_true")
    parser.add_argument("--int8", action="store_true",
                        help="int8 encoder matmuls (w8a8, ops/quant.py); "
                             "reported as a separate metric name")
    parser.add_argument("--no_int8", action="store_true",
                        help="skip the int8 second-metric measurement "
                             "folded into the default (bf16) run")
    parser.add_argument("--no_pallas", action="store_true")
    parser.add_argument("--no_e2e", action="store_true",
                        help="skip the end-to-end pipeline measurement")
    parser.add_argument("--no_steady", action="store_true",
                        help="skip the steady-state cached-window metric")
    parser.add_argument("--e2e_frames", type=int, default=76,
                        help="host-RAM frames for the e2e mode (3 windows)")
    parser.add_argument("--transfer_fp16", action="store_true",
                        help="e2e mode: fp16 depth transport (pipeline "
                             "transfer_fp16; floor measurement matches)")
    parser.add_argument("--e2e_detail", action="store_true",
                        help="e2e mode: per-span timing breakdown "
                             "(collect_timings) + separate upload/download "
                             "floor components, printed to stderr")
    parser.add_argument("--steady_batch_windows", type=int, default=0,
                        help="windows per step for the batched steady-state "
                             "metric (0 = auto: 2 for vitl, 4 for vits — "
                             "vitl's head at 4x32 frames/518^2 exceeds a "
                             "16 GiB chip's HBM)")
    parser.add_argument("--device_timeout", type=float, default=600.0,
                        help="total seconds allowed for backend/device "
                             "acquisition before emitting an error record "
                             "instead of hanging (dead RPC tunnels retry "
                             "forever). Spent as 3 probe slices with backoff "
                             "so a tunnel wedge that clears mid-budget still "
                             "yields a record; on failure a fresh-subprocess "
                             "rescue probe may add up to 90s beyond the "
                             "budget before the record is emitted; 0 = skip "
                             "the probe entirely")
    args = parser.parse_args()

    from video_depth_anything_tpu.utils.platform_env import (
        backend_unreachable_retry, fresh_process_probe,
        honor_jax_platforms_env)
    honor_jax_platforms_env()

    if args.device_timeout > 0:
        err = backend_unreachable_retry(args.device_timeout)
        if err is not None and not os.environ.get("VDA_BENCH_REEXECED"):
            # The in-process probe is stuck, but is the TUNNEL dead or just
            # this process's backend connection? A fresh subprocess probe
            # decides: if it succeeds, re-exec for a clean connection (one
            # attempt, env-guarded against loops) instead of forfeiting the
            # round's record to a wedged executor handle.
            if fresh_process_probe(min(90.0, args.device_timeout)):
                print("[bench] backend healthy from a fresh process but "
                      "wedged in this one; re-exec'ing for a clean "
                      "connection", file=sys.stderr, flush=True)
                os.environ["VDA_BENCH_REEXECED"] = "1"
                sys.stdout.flush()
                os.execv(sys.executable, [sys.executable] + sys.argv)
        if err is not None:
            print(json.dumps({
                "metric": f"{args.encoder}_ms_per_frame_{args.size}"
                          + ("_int8" if args.int8 else ""),
                "value": None, "unit": "ms/frame", "vs_baseline": None,
                "error": err,
            }))
            # Threads may be wedged inside the backend RPC — leave no chance
            # for interpreter shutdown to block on them.
            sys.stdout.flush()
            os._exit(1)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from video_depth_anything_tpu.config import get_model_config
    from video_depth_anything_tpu.models.video_depth import forward, init_params

    cfg = get_model_config(args.encoder)
    dtype = jnp.float32 if args.fp32 else jnp.bfloat16
    params = init_params(jax.random.PRNGKey(0), cfg)
    params = jax.tree.map(lambda a: a.astype(dtype)
                          if a.dtype == jnp.float32 else a, params)
    use_pallas = (not args.no_pallas) and jax.default_backend() != "cpu"

    x = jnp.asarray(
        np.random.default_rng(0).standard_normal(
            (args.batch, args.frames, args.size, args.size, 3)), dtype)

    def make_int8_params():
        from video_depth_anything_tpu.models.video_depth import (
            calibrate_stats, quantize_model)

        @jax.jit
        def calib(p, xx):
            return calibrate_stats(p, xx, cfg, use_pallas=use_pallas)

        stats = jax.device_get(calib(params, x))
        return quantize_model(params, stats, cfg)

    params_fwd = make_int8_params() if args.int8 else params

    chain = max(args.chain, 1)

    @jax.jit
    def fn(p, x):
        # Scalar readout: timing fetches it to host, which is robust against
        # backends where block_until_ready returns before compute finishes.
        # The carry feeds back into the input (numerically negligible at
        # 1e-12 of a bf16 activation) so XLA cannot hoist the loop-invariant
        # forward out of the chain.
        def body(i, acc):
            out = forward(p, x + (acc * 1e-12).astype(x.dtype), cfg,
                          use_pallas=use_pallas)
            return jnp.sum(out)

        return jax.lax.fori_loop(0, chain, body, jnp.float32(0.0))

    # Compile + warmup.
    float(fn(params_fwd, x))
    for _ in range(args.warmup):
        float(fn(params_fwd, x))

    times = []
    for _ in range(args.iters):
        t0 = time.perf_counter()
        float(fn(params_fwd, x))
        times.append(time.perf_counter() - t0)

    p50 = sorted(times)[len(times) // 2]
    ms_per_frame = p50 * 1000.0 / (args.frames * args.batch * chain)
    baseline = BASELINES_MS_PER_FRAME.get(args.encoder)
    suffix = "_int8" if args.int8 else ""
    record = {
        "metric": f"{args.encoder}_ms_per_frame_{args.size}{suffix}",
        "value": round(ms_per_frame, 3),
        "unit": "ms/frame",
        "vs_baseline": (round(baseline / ms_per_frame, 3)
                        if baseline else None),
        "batch_windows": args.batch,
        "chain": chain,
        "fps_per_chip": round(1000.0 / ms_per_frame, 2),
    }

    import contextlib

    @contextlib.contextmanager
    def section(name):
        """Optional sections must never lose the JSON record: a crashed
        section (e.g. HBM exhaustion on a smaller chip) records its error
        and the bench moves on (round-4 fix: an OOM in the batched
        steady-state section used to kill the whole run unprinted)."""
        try:
            yield
        except Exception as e:  # noqa: BLE001 — deliberate catch-all
            record[f"{name}_error"] = f"{type(e).__name__}: {e}"[:200]
            print(f"[bench] section {name} failed: "
                  f"{type(e).__name__}: {e}", file=sys.stderr, flush=True)

    def transfer_floor(frames, n_iters=4):
        """Raw host->device + device->host floor for the e2e byte volume.
        The download program is jitted once so compile time never lands in
        a timed iteration."""
        down_dt = jnp.float16 if args.transfer_fp16 else jnp.float32

        @jax.jit
        def to_depth(dev):
            return jnp.zeros((args.e2e_frames, args.size, args.size),
                             down_dt) + dev[..., 0].astype(down_dt)

        np.asarray(to_depth(jnp.asarray(frames)))  # compile + warm path
        tt, t_up, t_down = [], [], []
        for _ in range(n_iters):
            t0 = time.perf_counter()
            dev = jnp.asarray(frames)
            dev.block_until_ready()
            t1 = time.perf_counter()
            np.asarray(to_depth(dev))
            t2 = time.perf_counter()
            tt.append(t2 - t0)
            t_up.append(t1 - t0)
            t_down.append(t2 - t1)
        med = lambda s: sorted(s)[len(s) // 2]  # noqa: E731
        return (med(tt) * 1e3 / args.e2e_frames,
                med(t_up) * 1e3 / args.e2e_frames,
                med(t_down) * 1e3 / args.e2e_frames)

    if not args.no_e2e:
      with section("e2e"):
        # End-to-end regime the reference's 14 ms/frame actually competes
        # with (video_depth.py:166-254): frames in host RAM -> preprocess ->
        # window forwards -> stitch -> depths in host RAM, keyframe cache on.
        # Measured FIRST (before the int8/steady sections). Round 3 blamed
        # a "device program residue" for a 2.2x e2e skew when int8 ran
        # first; the round-4 controlled experiment (tools/bench_residue.py)
        # refuted both candidate mechanisms (memory residency and live
        # compiled programs each move a probe <0.5%) — the skew was the
        # tunnel's raw transfer rate drifting ~2x over time, which the
        # pre/post floor calibration below now quantifies per record.
        # e2e-first ordering is kept so the floor samples bracket the
        # measurement as tightly as possible.
        from video_depth_anything_tpu.pipeline import VideoDepthPipeline
        frames = np.random.default_rng(1).integers(
            0, 255, (args.e2e_frames, args.size, args.size, 3), np.uint8)
        pipe = VideoDepthPipeline(cfg, params, use_pallas=use_pallas,
                          quant="int8" if args.int8 else None,
                          transfer_fp16=args.transfer_fp16)
        kw = dict(input_size=args.size, fp32=args.fp32,
                  collect_timings=args.e2e_detail)
        # Floor measured BEFORE and AFTER the e2e timing: this tunneled
        # box's raw transfer rate drifts up to ~2x between sessions and
        # even within one (round-4 finding), so a single-point floor makes
        # the e2e/floor ratio meaningless. Both points ship in the record;
        # a large pre/post spread says "ratio unreliable this session".
        fl_pre = transfer_floor(frames)
        pipe.infer_video_depth(frames, **kw)  # compile
        e2e = []
        for _ in range(max(args.iters // 3, 2)):
            t0 = time.perf_counter()
            depths, _ = pipe.infer_video_depth(frames, **kw)
            np.asarray(depths)
            e2e.append(time.perf_counter() - t0)
        e2e_ms = sorted(e2e)[len(e2e) // 2] * 1000.0 / args.e2e_frames
        record["e2e_ms_per_frame"] = round(e2e_ms, 3)
        record["e2e_frames"] = args.e2e_frames
        if args.e2e_detail and pipe.timer is not None:
            print(f"e2e span breakdown (last iter, total "
                  f"{e2e[-1]*1e3:.1f} ms): {pipe.timer.summary()}",
                  file=sys.stderr, flush=True)
        fl_post = transfer_floor(frames)
        record["e2e_transfer_ms_per_frame"] = round(
            (fl_pre[0] + fl_post[0]) / 2, 3)
        record["e2e_transfer_pre_ms_per_frame"] = round(fl_pre[0], 3)
        record["e2e_transfer_post_ms_per_frame"] = round(fl_post[0], 3)
        # The pipeline overlaps uploads (issued one chunk ahead), downloads
        # (copy_to_host_async + late drain) and compute, so the SERIAL
        # up+down sum above is not a lower bound for it — the achievable
        # floor for an overlapped pipeline is the slower single direction.
        record["e2e_transfer_duplex_ms_per_frame"] = round(
            (max(fl_pre[1], fl_pre[2]) + max(fl_post[1], fl_post[2])) / 2, 3)
        if args.e2e_detail:
            print(f"transfer floor pre/post: up {fl_pre[1]:.2f}/{fl_post[1]:.2f}"
                  f" down {fl_pre[2]:.2f}/{fl_post[2]:.2f} ms/frame; "
                  f"e2e/floor "
                  f"{e2e_ms/record['e2e_transfer_ms_per_frame']:.3f}",
                  file=sys.stderr, flush=True)
        del pipe, frames

    if not args.no_steady and args.batch == 1 and args.frames == 32:
      with section("steady"):
        # Steady-state long-video regime: each new window re-uses the
        # previous window's encoder features at the KEYFRAMES positions
        # (bit-identical, pipeline/infer.py::_cached_fns), so the device
        # work per window is encode(FRAME_STEP new frames) + head — and a
        # window emits FRAME_STEP new video frames. The reference recomputes
        # the full 32-frame forward every window (video_depth.py:195-209),
        # so its steady-state cost is window_time / FRAME_STEP; this metric
        # is the cache's apples-to-apples counterpart.
        from video_depth_anything_tpu.config import (FRAME_STEP, INFER_LEN,
                                                     KEYFRAMES)
        from video_depth_anything_tpu.models import dinov2, video_depth

        ph = pw = args.size // cfg.vit.patch_size
        kf = jnp.asarray(KEYFRAMES)

        @jax.jit
        def encode_full(p, xx):
            feats = dinov2.get_intermediate_layers(
                p["pretrained"], xx, cfg.vit, cfg.intermediate_layer_idx,
                use_pallas=use_pallas)
            return [list(f) for f in feats]

        @jax.jit
        def steady(p, feats_prev, new_x):
            def body(i, carry):
                feats_prev, acc = carry
                nf = dinov2.get_intermediate_layers(
                    p["pretrained"], new_x + (acc * 1e-12).astype(new_x.dtype),
                    cfg.vit, cfg.intermediate_layer_idx,
                    use_pallas=use_pallas)
                feats = jax.tree.map(
                    lambda a, n: jnp.concatenate([a[kf], n], axis=0),
                    feats_prev, [list(f) for f in nf])
                depth = video_depth._head_forward(
                    p["head"], [tuple(f) for f in feats], ph, pw, 1,
                    INFER_LEN, cfg)
                return feats, jnp.sum(depth).astype(jnp.float32)

            _, acc = jax.lax.fori_loop(0, chain, body,
                                       (feats_prev, jnp.float32(0.0)))
            return acc

        feats0 = encode_full(params_fwd, x[0])
        new_x = x[0, :FRAME_STEP]
        float(steady(params_fwd, feats0, new_x))
        for _ in range(args.warmup):
            float(steady(params_fwd, feats0, new_x))
        ts = []
        for _ in range(args.iters):
            t0 = time.perf_counter()
            float(steady(params_fwd, feats0, new_x))
            ts.append(time.perf_counter() - t0)
        steady_ms = sorted(ts)[len(ts) // 2] * 1000.0 / (FRAME_STEP * chain)
        record["steady_state_ms_per_frame"] = round(steady_ms, 3)
        record["steady_state_fps_per_chip"] = round(1000.0 / steady_ms, 2)

      with section("steady_batched"):
        # Batched steady state: CB windows per device step through the
        # dedup-encode + gather path (pipeline/infer.py::_batched_cached_fns
        # — the cache composed with window batching, VERDICT r3 item 5).
        # Device work per step = encode(22*CB new frames) + CB heads; a
        # step emits 22*CB new video frames. The resident keyframe features
        # thread through the fori_loop (a real data dependency), and the
        # frame batch is perturbed by the carry so XLA cannot hoist the
        # loop-invariant encode.
        from video_depth_anything_tpu.config import (FRAME_STEP, INFER_LEN,
                                                     KEYFRAMES)
        from video_depth_anything_tpu.pipeline import (VideoDepthPipeline,
                                                       windows)

        # vitl's head on 4x32 frames at 518^2 plans ~6 GiB single buffers
        # (128x296x296x256 bf16 refinenet activations) and exhausts a
        # 16 GiB chip; 2 windows/step fits and already amortizes dispatch.
        cb = args.steady_batch_windows or (
            2 if args.encoder in ("vitl", "vitg") else 4)
        n_res = len(KEYFRAMES)
        # Steady-state bucket (round 5): mid-stream chunks encode exactly
        # 22*CB new frames — the worst-case 22*CB+10 shape is only ever
        # compiled for chunk 0, so the steady measurement uses the steady
        # bucket the pipeline now pads to (pipeline/infer.py).
        m_steady = cb * FRAME_STEP
        pipe_b = VideoDepthPipeline(cfg, params_fwd, use_pallas=use_pallas)
        net_hw = (args.size, args.size)
        encode_b, head_gather = pipe_b._batched_cached_fns(
            net_hw, net_hw, dtype, cb)
        # Mid-stream chunk geometry (windows cb..2cb-1 of a long video):
        # slot map = 10 resident + the chunk's deduplicated new frames.
        # With a large enough video this is exactly 22*cb new ids; a cb
        # big enough that window 2cb-1 gets tail-clamped (repeated ids)
        # dedups to fewer — the encode batch stays m_steady rows with
        # dummy tail rows, like the pipeline's own bucket padding.
        idx_all = windows.window_indices(400)
        sel = idx_all[cb:2 * cb]
        res_ids = idx_all[cb - 1][np.asarray(KEYFRAMES)]
        new_ids = np.setdiff1d(np.unique(sel), res_ids)
        assert len(new_ids) <= m_steady, (len(new_ids), m_steady)
        slot = {int(f): j for j, f in enumerate(res_ids)}
        slot.update({int(f): n_res + j for j, f in enumerate(new_ids)})
        rel = jnp.asarray([slot[int(f)] for f in sel.reshape(-1)], jnp.int32)
        res_rel = jnp.asarray([slot[int(f)] for f in sel[-1][np.asarray(KEYFRAMES)]],
                              jnp.int32)
        frames_b = jnp.asarray(
            np.random.default_rng(2).random((m_steady, args.size, args.size,
                                             3)), jnp.float32)

        @jax.jit
        def steady_batched(p, resident, fb):
            def body(i, carry):
                resident, acc = carry
                feats = encode_b(p, fb + (acc * 1e-12).astype(fb.dtype))
                depths, resident = head_gather(p, resident, feats, rel,
                                               res_rel)
                return resident, jnp.sum(depths).astype(jnp.float32)

            _, acc = jax.lax.fori_loop(0, chain, body,
                                       (resident, jnp.float32(0.0)))
            return acc

        feats0 = encode_b(params_fwd, frames_b)
        resident0 = jax.tree.map(
            lambda a: jnp.zeros((n_res,) + a.shape[1:], a.dtype), feats0)
        float(steady_batched(params_fwd, resident0, frames_b))
        for _ in range(args.warmup):
            float(steady_batched(params_fwd, resident0, frames_b))
        tb = []
        for _ in range(args.iters):
            t0 = time.perf_counter()
            float(steady_batched(params_fwd, resident0, frames_b))
            tb.append(time.perf_counter() - t0)
        sb_ms = (sorted(tb)[len(tb) // 2] * 1000.0
                 / (FRAME_STEP * cb * chain))
        record["steady_state_batched_ms_per_frame"] = round(sb_ms, 3)
        record["steady_state_batched_windows"] = cb
        record["steady_state_batched_fps_per_chip"] = round(1000.0 / sb_ms, 2)
        del pipe_b, frames_b, feats0, resident0

    if not args.int8 and not args.no_int8 and not args.fp32:
      with section("int8"):
        # Second headline: the int8 fast mode, measured in the same run so
        # BENCH_r{N}.json always carries both numbers. Same timed fn, the
        # quantized param tree (new pytree structure) triggers a fresh
        # compile. Measured LAST so the transfer-bound e2e section sits as
        # close as possible to its floor calibration (the once-suspected
        # "program residue" was refuted by tools/bench_residue.py — the
        # real confound is tunnel transfer-rate drift over minutes, so
        # section order matters only for transfer-bound measurements).
        params_q = make_int8_params()
        float(fn(params_q, x))
        for _ in range(args.warmup):
            float(fn(params_q, x))
        t8 = []
        for _ in range(args.iters):
            t0 = time.perf_counter()
            float(fn(params_q, x))
            t8.append(time.perf_counter() - t0)
        ms8 = (sorted(t8)[len(t8) // 2] * 1000.0
               / (args.frames * args.batch * chain))
        record[f"{args.encoder}_ms_per_frame_{args.size}_int8"] = round(ms8, 3)
        record["int8_vs_baseline"] = (round(baseline / ms8, 3)
                                      if baseline else None)
        record["int8_fps_per_chip"] = round(1000.0 / ms8, 2)
        del params_q

    print(json.dumps(record))


if __name__ == "__main__":
    main()
