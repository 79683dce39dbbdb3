#!/usr/bin/env python3
"""Isolate the post-int8 'program residue' e2e slowdown (VERDICT r3 weak #6).

Observed (round 3): after running int8 calibration + the quantized forward
in-process, a subsequently measured e2e pipeline ran ~2.2x slower (135 vs
61 ms/frame) on this tunneled backend, even though the re-measured program
itself was unchanged. Two candidate mechanisms:

  A. program-cache thrash — the extra compiled executables evict/contend
     with the probe program in the device/tunnel program cache;
  B. device-memory state — the extra materialized parameter trees (the
     quantized tree duplicates the encoder) fragment/haunt HBM.

This tool separates them on the SAME probe within one process:

  phase 0  probe warm + baseline timing   (vits window forward, chain-
           differenced scalar readout)
  phase 1  MEMORY arm: materialize vitl-scale dummy trees (no new
           programs), re-time probe, free them, re-time
  phase 2  PROGRAM arm: compile+run K distinct large programs (vitl
           window forwards with different static chain counts — distinct
           executables of production size), re-time probe
  phase 3  release the executables (del + gc), re-time

If phase 2 regresses but phase 1 doesn't, it's the program cache (A). A
recovery in phase 3 implicates cache capacity; no recovery implicates
server-side (tunnel) state, supporting the tunnel-specific reading.

Run (real TPU): python tools/bench_residue.py [--iters 6]
Prints one JSON line per phase.
"""
import argparse
import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--chain", type=int, default=3)
    ap.add_argument("--size", type=int, default=518)
    ap.add_argument("--dummy_programs", type=int, default=4)
    ap.add_argument("--dummy_trees", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from video_depth_anything_tpu.config import get_model_config
    from video_depth_anything_tpu.models.video_depth import forward, init_params

    use_pallas = jax.default_backend() != "cpu"

    def timed(fn, *a):
        ts = []
        for _ in range(args.iters):
            t0 = time.perf_counter()
            float(fn(*a))
            ts.append(time.perf_counter() - t0)
        return sorted(ts)[len(ts) // 2]

    def report(phase, t, base=None):
        rec = {"phase": phase, "probe_ms": round(t * 1e3, 2)}
        if base is not None:
            rec["vs_baseline"] = round(t / base, 3)
        print(json.dumps(rec), flush=True)

    # --- probe: vits window forward (chain-differenced scalar readout)
    cfg_s = get_model_config("vits")
    p_s = init_params(jax.random.PRNGKey(0), cfg_s)
    p_s = jax.tree.map(lambda a: a.astype(jnp.bfloat16)
                       if a.dtype == jnp.float32 else a, p_s)
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (1, 32, args.size, args.size, 3)), jnp.bfloat16)

    @jax.jit
    def probe(p, xx):
        def body(i, acc):
            out = forward(p, xx + (acc * 1e-12).astype(xx.dtype), cfg_s,
                          use_pallas=use_pallas)
            return jnp.sum(out)
        return jax.lax.fori_loop(0, args.chain, body, jnp.float32(0.0))

    float(probe(p_s, x))
    float(probe(p_s, x))
    base = timed(probe, p_s, x)
    report("0_baseline", base)

    # --- phase 1: MEMORY arm — vitl-scale trees, no new programs
    cfg_l = get_model_config("vitl")
    trees = []
    for i in range(args.dummy_trees):
        t = init_params(jax.random.PRNGKey(10 + i), cfg_l)
        t = jax.tree.map(lambda a: jax.device_put(a.astype(jnp.bfloat16)
                                                  if a.dtype == jnp.float32
                                                  else a), t)
        jax.block_until_ready(t)
        trees.append(t)
    report("1_memory_loaded", timed(probe, p_s, x), base)
    del trees
    gc.collect()
    report("1_memory_freed", timed(probe, p_s, x), base)

    # --- phase 2: PROGRAM arm — K distinct vitl-size executables
    p_l = init_params(jax.random.PRNGKey(1), cfg_l)
    p_l = jax.tree.map(lambda a: a.astype(jnp.bfloat16)
                       if a.dtype == jnp.float32 else a, p_l)
    xl = x

    def make_big(k):
        @jax.jit
        def big(p, xx):
            def body(i, acc):
                out = forward(p, xx + (acc * 1e-12).astype(xx.dtype), cfg_l,
                              use_pallas=use_pallas)
                return jnp.sum(out)
            # distinct static trip count -> distinct executable
            return jax.lax.fori_loop(0, k + 1, body, jnp.float32(0.0))
        return big

    bigs = []
    for k in range(args.dummy_programs):
        b = make_big(k)
        float(b(p_l, xl))  # compile + run once (mimics calibration usage)
        bigs.append(b)
    report("2_programs_live", timed(probe, p_s, x), base)

    # --- phase 3: drop the executables
    for b in bigs:
        try:
            b.clear_cache()
        except AttributeError:
            pass
    del bigs
    del p_l
    gc.collect()
    report("3_programs_freed", timed(probe, p_s, x), base)


if __name__ == "__main__":
    main()
