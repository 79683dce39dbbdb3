#!/usr/bin/env python3
"""Measure compile-cache cold vs warm process wall-clock (VERDICT r4 #5b).

The deployment claim for `utils/compile_cache.py` is "repeat processes
skip the ~20-40 s window compile"; until round 5 that was quantified only
by a CPU toy-config hit/miss test. This tool measures the real thing: two
fresh subprocesses compile the SAME window program against a shared cache
directory — the first cold (empty cache), the second warm — and each
reports its program-build wall-clock (jit lower+compile, no execution, so
tunnel transfer noise stays out of the number).

  python tools/bench_compile_cache.py --encoder vits --size 518

Prints one JSON line: {"cold_s": ..., "warm_s": ..., "speedup": ...,
"backend": ...}.
"""
import argparse
import json
import os
import subprocess
import sys
import tempfile
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def child(encoder: str, size: int, cache_dir: str) -> None:
    from video_depth_anything_tpu.utils.platform_env import (
        honor_jax_platforms_env)
    honor_jax_platforms_env()
    from video_depth_anything_tpu.utils import compile_cache
    compile_cache.enable_compile_cache(cache_dir)

    import jax
    import jax.numpy as jnp

    from video_depth_anything_tpu.config import get_model_config
    from video_depth_anything_tpu.models.video_depth import (forward,
                                                             param_shapes)

    cfg = get_model_config(encoder)
    use_pallas = jax.default_backend() != "cpu"

    def fn(params, x):
        return forward(params, x, cfg, use_pallas=use_pallas)

    # Abstract lower+compile: measures exactly the program-build path the
    # cache short-circuits, with no weight init or data transfer noise.
    p_avals = jax.tree.map(
        lambda s: jax.ShapeDtypeStruct(
            s.shape, jnp.bfloat16 if s.dtype == jnp.float32 else s.dtype),
        param_shapes(cfg))
    x_aval = jax.ShapeDtypeStruct((1, 32, size, size, 3), jnp.bfloat16)
    t0 = time.perf_counter()
    jax.jit(fn).lower(p_avals, x_aval).compile()
    dt = time.perf_counter() - t0
    print(json.dumps({"compile_s": round(dt, 3),
                      "backend": jax.default_backend()}))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--encoder", default="vits",
                    choices=["vits", "vitb", "vitl", "vitg"])
    ap.add_argument("--size", type=int, default=518)
    ap.add_argument("--cache_dir", default=None,
                    help="default: a fresh temp dir (true cold start)")
    ap.add_argument("--timeout", type=float, default=1800.0)
    ap.add_argument("--_child", action="store_true", help=argparse.SUPPRESS)
    args = ap.parse_args()

    if args._child:
        child(args.encoder, args.size, args.cache_dir)
        return

    cache_dir = args.cache_dir or tempfile.mkdtemp(prefix="vda_xla_cache_")
    results = []
    for phase in ("cold", "warm"):
        cmd = [sys.executable, os.path.abspath(__file__), "--_child",
               "--encoder", args.encoder, "--size", str(args.size),
               "--cache_dir", cache_dir]
        r = subprocess.run(cmd, capture_output=True, text=True, cwd=ROOT,
                           timeout=args.timeout)
        if r.returncode != 0:
            sys.stderr.write(r.stderr)
            sys.exit(f"{phase} child failed rc={r.returncode}")
        line = [ln for ln in r.stdout.splitlines() if ln.startswith("{")][-1]
        rec = json.loads(line)
        rec["phase"] = phase
        results.append(rec)
        entries = len(os.listdir(cache_dir))
        print(f"[{phase}] compile {rec['compile_s']}s "
              f"({entries} cache entries)", file=sys.stderr, flush=True)

    cold, warm = results[0]["compile_s"], results[1]["compile_s"]
    print(json.dumps({
        "metric": f"{args.encoder}_window_compile_{args.size}",
        "cold_s": cold, "warm_s": warm,
        "speedup": round(cold / warm, 2) if warm > 0 else None,
        "backend": results[0]["backend"], "cache_dir": cache_dir,
    }))


if __name__ == "__main__":
    main()
