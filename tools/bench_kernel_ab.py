"""A/B the production packed flash-attention kernel against targeted edits.

Round-3 kernel project, step 2 (after tools/bench_kernel_phases.py): the
variant sweep there measured its local "base" re-implementation 12% faster
than the production `flash_attention_packed` at the identical schedule —
the only structural differences are the `cost_estimate` passed to
pallas_call and the dims of the out BlockSpec slice writes. This tool A/Bs
the REAL production entry point against single-knob edits so the winner
can be adopted with confidence:

  prod        — flash_attention_packed as shipped
  no-cost     — identical call with cost_estimate stripped
  exp2        — exp2=True (log2-domain scores; skips exp's internal mul)
  no-cost+exp2

It also re-runs the dh=64-vs-128 QK probe in a DCE-PROOF form: the phase
probes in bench_kernel_phases.py sliced `s[:, :128]`, which lets Mosaic
narrow the dot to 128 rhs columns (11x fewer MACs — the "3261 TF/s"
reading). Here every score column feeds a reduction written to the output,
so nothing can be dead-code-eliminated; the reduction sweep is identical
across variants and cancels in the ratio.

Run (real TPU): python tools/bench_kernel_ab.py [probes|variants|all]

RESULTS (v5e, 2026-08-19 session, marginal-chain timing):
  qk64 x2heads  16.22 us/step  |  qk128 x1  8.89 us/step  -> ratio 1.83
    (2.0 would be dh=64 at FULL MXU rate; 1.0 = half wasted). dh=64
    contractions run at ~92% of the dh=128 rate per useful FLOP — the
    round-2 "QK at 50% MXU / ~131 TF/s cap" phase analysis is RETRACTED
    (its probes were DCE-narrowed and dispatch-noise-dominated), and the
    head-dim restructure is a dead end.
  prod 3.655 ms/call | no-cost 3.535 (+3.3%) | exp2 3.793 (slower) |
  no-cost+exp2 4.543 (slower). Adopted: cost_estimate dropped from all
  attention kernels (ops/pallas_attention.py); exp2 stays off-by-default.

RESULTS 'others' mode (v5e, 2026-08-20 session — ADVICE r3 #4, the
removal re-measured on the three previously-extrapolated entry points;
'shipped' = no estimate, '+cost' = historical estimate injected):
  qkv_fused  4.511 ms shipped | 4.509 +cost  (-0.1%, neutral)
  qk8        3.147 ms shipped | 3.258 +cost  (+3.5% slower WITH cost —
             the int8 headline path benefits like the packed kernel)
  plain      5.354 ms shipped | 5.345 +cost  (-0.2%, neutral)
The blanket removal stands: one path measurably faster, two neutral,
none regressed.
"""
import functools
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import video_depth_anything_tpu.ops.pallas_attention as pa  # noqa: E402

B, S, H, DH = 32, 1370, 16, 64
S_PAD = 1408
TARGET_MARGIN_S = 0.25
ITERS = 5


def chain_fn(call, n):
    @jax.jit
    def fn(*args):
        def body(i, acc):
            perturbed = (args[0] + (acc * 1e-12).astype(args[0].dtype),
                         *args[1:])
            return jnp.sum(call(*perturbed).astype(jnp.float32))

        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    return fn


def _once(fn, args):
    t0 = time.perf_counter()
    float(fn(*args))
    return time.perf_counter() - t0


def timed(call, *args, est_call_s=4e-3):
    c1 = max(4, int(TARGET_MARGIN_S / est_call_s / 8))
    c2 = c1 + max(8, int(TARGET_MARGIN_S / est_call_s))
    f1, f2 = chain_fn(call, c1), chain_fn(call, c2)
    float(f1(*args)), float(f2(*args))
    t1 = np.median([_once(f1, args) for _ in range(ITERS)])
    t2 = np.median([_once(f2, args) for _ in range(ITERS)])
    return (t2 - t1) / (c2 - c1)


# -------------------------------------------------------------------------
# DCE-proof QK probes: the full score tile reduces into the output.
# -------------------------------------------------------------------------

def _qk64_probe(q_ref, k_ref, o_ref, *, dh):
    acc = None
    for i in range(2):
        sl = slice(i * dh, (i + 1) * dh)
        s = jax.lax.dot_general(q_ref[0, :, sl], k_ref[0, :, sl],
                                (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        r = jnp.sum(s.reshape(s.shape[0], -1, 128), axis=1)  # all cols live
        acc = r if acc is None else acc + r
    o_ref[0] = acc.astype(o_ref.dtype)


def _qk128_probe(q_ref, k_ref, o_ref, *, dh):
    del dh
    s = jax.lax.dot_general(q_ref[0], k_ref[0], (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    # same output area as ONE dh=64 head; reduction sweep identical to the
    # qk64 probe's per-head sweep so it cancels in the ratio
    o_ref[0] = jnp.sum(s.reshape(s.shape[0], -1, 128), axis=1
                       ).astype(o_ref.dtype)


def probes():
    rng = np.random.default_rng(0)
    nb = 64
    bq = S_PAD
    shapes = [(bq, 2 * DH), (S_PAD, 2 * DH)]
    arrs = [jnp.asarray(
        (rng.random(int(np.prod(s)) * nb, dtype=np.float32)
         .reshape(nb, *s) - 0.5), jnp.bfloat16) for s in shapes]
    specs = [pl.BlockSpec((1, *s), (lambda i: (i, 0, 0)),
                          memory_space=pltpu.VMEM) for s in shapes]

    def bench(kernel, name, flops):
        call = pl.pallas_call(
            functools.partial(kernel, dh=DH),
            out_shape=jax.ShapeDtypeStruct((nb, bq, 128), jnp.float32),
            grid=(nb,), in_specs=specs,
            out_specs=pl.BlockSpec((1, bq, 128), (lambda i: (i, 0, 0)),
                                   memory_space=pltpu.VMEM),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=pa._VMEM_LIMIT))
        t = timed(lambda *a: call(*a), *arrs, est_call_s=nb * 4e-6)
        print(f"{name:14s} {t/nb*1e6:7.2f} us/step  {flops*nb/t/1e12:6.1f} "
              f"TF/s", flush=True)
        return t

    # qk64: two dh=64 dots (2 heads) -> 2 score tiles. qk128: one dh=128
    # dot -> 1 score tile, same MACs as the two dh=64 dots COMBINED if the
    # MXU runs dh=64 at half rate; half the MACs if it doesn't.
    t64 = bench(_qk64_probe, "qk64 x2heads", 2 * 2 * bq * S_PAD * DH)
    t128 = bench(_qk128_probe, "qk128 x1", 2 * bq * S_PAD * 2 * DH)
    # Per score tile produced: t64/2 vs t128. Equal MAC count per tile
    # would predict t64 == 2*t128 IF dh=64 ran at full MXU rate (half the
    # MACs per tile); t64 == t128 means dh=64 pays the full 128-deep pass.
    print(f"t(qk64 2-tile) / t(qk128 1-tile) = {t64/t128:.2f} "
          f"(2.0 => dh=64 at FULL rate; 1.0 => dh=64 wastes half the MXU)")


# -------------------------------------------------------------------------
# Production-kernel single-knob variants
# -------------------------------------------------------------------------

def variants():
    rng = np.random.default_rng(0)
    c = H * DH
    q, k, v = (jnp.asarray(rng.standard_normal((B, S, c)) * 0.3, jnp.bfloat16)
               for _ in range(3))
    flops = 4 * B * H * S_PAD * S_PAD * DH
    scale = DH ** -0.5

    ref = np.asarray(pa.flash_attention_packed(
        q, k, v, num_heads=H, scale=scale)).astype(np.float32)

    def report(name, fn):
        got = np.asarray(fn(q, k, v)).astype(np.float32)
        err = np.abs(got - ref).max()
        t = timed(fn, q, k, v)
        print(f"{name:14s} {t*1e3:8.3f} ms/call  {flops/t/1e12:6.1f} TF/s  "
              f"max|err| {err:.2e}", flush=True)
        return t

    report("prod", lambda q, k, v: pa.flash_attention_packed(
        q, k, v, num_heads=H, scale=scale))
    report("exp2", lambda q, k, v: pa.flash_attention_packed(
        q, k, v, num_heads=H, scale=scale, exp2=True))

    # cost_estimate OFF: monkey-patch pallas_call to drop the kwarg, then
    # re-jit (new wrapper closure -> fresh trace & compile).
    real_pallas_call = pl.pallas_call

    def no_cost_pallas_call(*a, **kw):
        kw.pop("cost_estimate", None)
        return real_pallas_call(*a, **kw)

    pa.pl.pallas_call = no_cost_pallas_call
    try:
        nocost = jax.jit(functools.partial(
            pa.flash_attention_packed.__wrapped__, num_heads=H, scale=scale))
        nocost2 = jax.jit(functools.partial(
            pa.flash_attention_packed.__wrapped__, num_heads=H, scale=scale,
            exp2=True))
        report("no-cost", lambda q, k, v: nocost(q, k, v))
        report("no-cost+exp2", lambda q, k, v: nocost2(q, k, v))
    finally:
        pa.pl.pallas_call = real_pallas_call


def variants_other():
    """A/B the OTHER three attention entry points with/without the
    historical cost_estimate (ADVICE r3: the removal was measured only on
    flash_attention_packed; qkv_fused / qk8 / plain flash were
    extrapolated). 'shipped' = current code (no estimate); '+cost' =
    pallas_call monkey-patched to inject the exact estimate removed in
    commit 1cc3ebf."""
    rng = np.random.default_rng(0)
    c = H * DH
    scale = DH ** -0.5
    real_pallas_call = pl.pallas_call

    def with_cost(est):
        def patched(*a, **kw):
            kw["cost_estimate"] = est
            return real_pallas_call(*a, **kw)
        return patched

    def ab(name, make_fn, est, args, flops):
        t_ship = timed(make_fn(), *args)
        pa.pl.pallas_call = with_cost(est)
        try:
            t_cost = timed(make_fn(), *args)
        finally:
            pa.pl.pallas_call = real_pallas_call
        d = (t_cost - t_ship) / t_ship * 100
        print(f"{name:12s} shipped {t_ship*1e3:8.3f} ms  +cost "
              f"{t_cost*1e3:8.3f} ms  ({d:+.1f}% with cost_estimate)  "
              f"{flops/t_ship/1e12:5.1f} TF/s", flush=True)

    # qkv_fused: one packed [B,S,3c] input (encoder fused-QKV path)
    qkv = jnp.asarray(rng.standard_normal((B, S, 3 * c)) * 0.3, jnp.bfloat16)
    q_pad = s_pad = S_PAD
    est_fused = pl.CostEstimate(
        flops=4 * B * H * q_pad * s_pad * DH,
        bytes_accessed=2 * B * q_pad * 3 * c * qkv.dtype.itemsize,
        transcendentals=B * H * q_pad * s_pad)
    ab("qkv_fused",
       lambda: jax.jit(functools.partial(
           pa.flash_attention_qkv_fused.__wrapped__, num_heads=H)),
       est_fused, (qkv,), 4 * B * H * q_pad * s_pad * DH)

    # qk8: int8 Q/K + bf16 V (the int8 headline path)
    q8 = jnp.asarray(rng.integers(-127, 128, (B, S, c)), jnp.int8)
    k8 = jnp.asarray(rng.integers(-127, 128, (B, S, c)), jnp.int8)
    v = jnp.asarray(rng.standard_normal((B, S, c)) * 0.3, jnp.bfloat16)
    scales = jnp.asarray([0.01, 0.01], jnp.float32)
    est_qk8 = pl.CostEstimate(
        flops=4 * B * H * q_pad * s_pad * DH,
        bytes_accessed=B * q_pad * c * (2 + 2 * 1 + 2),
        transcendentals=B * H * q_pad * s_pad)
    ab("qk8",
       lambda: jax.jit(functools.partial(
           pa.flash_attention_packed_qk8.__wrapped__, num_heads=H)),
       est_qk8, (q8, k8, v, scales), 4 * B * H * q_pad * s_pad * DH)

    # plain flash: already-split [B,H,S,D]
    q4 = jnp.asarray(rng.standard_normal((B, H, S, DH)) * 0.3, jnp.bfloat16)
    k4 = jnp.asarray(rng.standard_normal((B, H, S, DH)) * 0.3, jnp.bfloat16)
    v4 = jnp.asarray(rng.standard_normal((B, H, S, DH)) * 0.3, jnp.bfloat16)
    est_plain = pl.CostEstimate(
        flops=4 * B * H * q_pad * s_pad * DH,
        bytes_accessed=(B * H * (q_pad + 2 * s_pad) * DH * 2
                        + B * H * q_pad * DH * 2),
        transcendentals=B * H * q_pad * s_pad)
    ab("plain",
       lambda: jax.jit(functools.partial(
           pa.flash_attention.__wrapped__, scale=scale)),
       est_plain, (q4, k4, v4), 4 * B * H * q_pad * s_pad * DH)


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "all"
    print("backend:", jax.default_backend(), flush=True)
    if mode in ("probes", "all"):
        probes()
    if mode in ("variants", "all"):
        variants()
    if mode in ("others", "all"):
        variants_other()
