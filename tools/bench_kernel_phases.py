"""Phase probes + schedule variants for the packed flash-attention kernel.

Round-3 "deep project" (DESIGN.md round-2 outcomes): the packed kernel
delivers ~72 TF/s against a ~131 TF/s phase-limit estimate. Before
restructuring, measure the actual phase costs in isolation on this chip:

  probe qk64   — pure [bq,64]x[64,S] score matmuls (the dh=64 contraction)
  probe qk128  — same output area with a 128-deep contraction
                 (if qk64 ~= half the TF/s of qk128, the 50%-MXU claim
                 holds; if equal, the cap estimate was wrong)
  probe sm     — pure softmax sweeps (max + exp + cast) on a resident tile
  probe pv     — pure [bq,S]x[S,128] probability matmuls

Then A/B full-kernel schedule variants at the vitl shape:

  base     — production `_packed_kernel` (2 heads x 2 row-halves,
             phase-grouped: all QKs, all softmaxes, all PVs)
  stagger  — same chains, manually software-pipelined order:
             qk0 qk1 sm0 qk2 pv0 sm1 qk3 pv1 sm2 pv2 sm3 pv3
  kchunk   — K split in 2 column chunks: per chain, qk_c0 qk_c1 overlap
             max_c0; exp/pv per chunk accumulate into [bq,128]

Run (real TPU): python tools/bench_kernel_phases.py [probes|variants|all]

RESULTS + CAVEAT (v5e, 2026-08-19): variants measured base 3.698 /
stagger 3.667 / kchunk 3.979 / prod 4.185 ms/call — the base-vs-prod gap
was isolated by tools/bench_kernel_ab.py to the `cost_estimate` prod
passed (dropped in round 3). The PHASE PROBES here are flawed: slicing
`s[:, :128]` lets Mosaic narrow the QK dot to 128 rhs columns, so qk64
"3261 TF/s" readings are DCE artifacts — use bench_kernel_ab.py's
DCE-proof probes (every score column feeds the output) instead.
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

from video_depth_anything_tpu.ops.pallas_attention import (  # noqa: E402
    _VMEM_LIMIT, flash_attention_packed)

B, S, H, DH = 32, 1370, 16, 64
S_PAD = 1408
# Two chain lengths; the reported time is (T(C2) - T(C1)) / (C2 - C1),
# which cancels the constant per-dispatch cost. Round-2 kernel microbenches
# used a single CHAIN=8 and divided by 8 — on this tunnel the ~27 ms
# dispatch constant swamped per-iteration compute (a 16-step probe
# "measured" 3.4 ms/iter of pure dispatch), which is how the 50%-MXU /
# 131 TF/s cap misread happened. Chains are sized per call so the MARGINAL
# compute between them is >= ~0.25 s — hundreds of dispatch-jitter sigmas
# (short fixed chains measured impossible >peak rates on this tunnel).
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


def timed(call, *args, est_call_s=2e-3):
    """Marginal seconds per chain iteration, dispatch constant removed."""
    c1 = max(4, int(TARGET_MARGIN_S / est_call_s / 8))
    c2 = c1 + max(8, int(TARGET_MARGIN_S / est_call_s))
    f1, f2 = chain_fn(call, c1), chain_fn(call, c2)
    float(f1(*args)), float(f2(*args))
    t1 = np.median([_once(f1, args) for _ in range(ITERS)])
    t2 = np.median([_once(f2, args) for _ in range(ITERS)])
    return (t2 - t1) / (c2 - c1)


def _once(fn, args):
    t0 = time.perf_counter()
    float(fn(*args))
    return time.perf_counter() - t0


# --------------------------------------------------------------------------
# Phase probes: each is a pallas kernel doing ONLY that phase per grid step,
# same grid (B, H/2) as the real kernel so per-step overheads match.
# --------------------------------------------------------------------------

def _qk_probe_kernel(q_ref, k_ref, o_ref, *, dh):
    acc = jnp.zeros((q_ref.shape[1], 128), jnp.float32)
    for i in range(2):
        sl = slice(i * dh, (i + 1) * dh)
        s = jax.lax.dot_general(q_ref[0, :, sl], k_ref[0, :, sl],
                                (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        acc += s[:, :128]  # force materialization, tiny epilogue
    o_ref[0] = acc.astype(o_ref.dtype)


def _qk128_probe_kernel(q_ref, k_ref, o_ref):
    s = jax.lax.dot_general(q_ref[0], k_ref[0], (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    o_ref[0] = s[:, :128].astype(o_ref.dtype)


def _sm_probe_kernel(q_ref, k_ref, o_ref, *, dh):
    # scores via ONE qk (to have realistic data), then softmax TWICE —
    # subtracting the qk64 probe time leaves ~2x softmax sweeps.
    acc = jnp.zeros((q_ref.shape[1], 128), jnp.float32)
    for i in range(2):
        sl = slice(i * dh, (i + 1) * dh)
        s = jax.lax.dot_general(q_ref[0, :, sl], k_ref[0, :, sl],
                                (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m).astype(jnp.bfloat16)
        acc += e[:, :128].astype(jnp.float32)
    o_ref[0] = acc.astype(o_ref.dtype)


def _pv_probe_kernel(p_ref, p2_ref, v_ref, o_ref, *, dh):
    # p/p2: [bq, S] bf16 resident, v: [S, 128]; two DIFFERENT lhs so the
    # two dots cannot be CSE'd into one.
    o1 = jax.lax.dot_general(p_ref[0], v_ref[0], (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    o2 = jax.lax.dot_general(p2_ref[0], v_ref[0], (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    o_ref[0] = (o1 + o2).astype(o_ref.dtype)


def probes():
    rng = np.random.default_rng(0)
    bq = S_PAD

    def bench_k(kernel, shapes, flops_per_step, name, nb):
        arrs = [jnp.asarray(
            (rng.random(int(np.prod(s)) * nb, dtype=np.float32)
             .reshape(nb, *s) - 0.5), jnp.bfloat16) for s in shapes]
        specs = [pl.BlockSpec((1, *s), (lambda i: (i, 0, 0)),
                              memory_space=pltpu.VMEM) for s in shapes]
        out = jax.ShapeDtypeStruct((nb, bq, 128), jnp.bfloat16)
        call = pl.pallas_call(
            kernel, out_shape=out, grid=(nb,), in_specs=specs,
            out_specs=pl.BlockSpec((1, bq, 128), (lambda i: (i, 0, 0)),
                                   memory_space=pltpu.VMEM),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=_VMEM_LIMIT))
        t = timed(lambda *a: call(*a), *arrs, est_call_s=nb * 3e-6)
        us = t / nb * 1e6
        print(f"{name:9s} {us:7.2f} us/step  {flops_per_step*nb/t/1e12:7.1f} "
              f"TF/s", flush=True)
        return t / nb

    q2s, k2s = (bq, 2 * DH), (S_PAD, 2 * DH)
    t64 = bench_k(functools.partial(_qk_probe_kernel, dh=DH), [q2s, k2s],
                  2 * 2 * bq * S_PAD * DH, "qk64x2", 64)
    t128 = bench_k(_qk128_probe_kernel, [q2s, k2s],
                   2 * bq * S_PAD * 2 * DH, "qk128", 64)
    tsm = bench_k(functools.partial(_sm_probe_kernel, dh=DH), [q2s, k2s],
                  2 * 2 * bq * S_PAD * DH, "qk+sm x2", 64)
    tpv = bench_k(functools.partial(_pv_probe_kernel, dh=DH),
                  [(bq, S_PAD), (bq, S_PAD), (S_PAD, 128)],
                  2 * 2 * bq * S_PAD * 128, "pv128x2", 24)
    print(f"derived softmax-only: {(tsm - t64)*1e6:.2f} us/step (2 heads)")
    print(f"phase sum qk+sm+pv: {(tsm + tpv)*1e6:.2f} us/step vs kernel "
          f"step from variants below")
    print(f"qk64 vs qk128 per useful flop: {t64 / t128:.2f}x "
          f"(2.0 => 50% MXU at dh=64, 1.0 => full rate)")


# --------------------------------------------------------------------------
# Schedule variants of the full kernel
# --------------------------------------------------------------------------

def _variant_kernel(q_ref, k_ref, v_ref, o_ref, *, s_actual, dh, schedule):
    bq = q_ref.shape[1]
    half = bq // 2
    chains = [(i, r) for i in range(2) for r in ((0, half), (half, bq))]

    lane = jax.lax.broadcasted_iota(jnp.int32, (k_ref.shape[1], dh), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (k_ref.shape[1], dh), 0)
    mcol = ((lane == 0) & (row < s_actual)).astype(v_ref.dtype)
    rhs = [jnp.concatenate([v_ref[0, :, i * dh:(i + 1) * dh], mcol], axis=1)
           for i in range(2)]

    def qk(i, rows):
        sl = slice(i * dh, (i + 1) * dh)
        return jax.lax.dot_general(
            q_ref[0, rows[0]:rows[1], sl], k_ref[0, :, sl],
            (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)

    def sm(s):
        m = jnp.max(s, axis=-1, keepdims=True)
        return jnp.exp(s - m).astype(v_ref.dtype)

    def pv(i, rows, p):
        o = jax.lax.dot_general(p, rhs[i], (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        inv = 1.0 / jnp.maximum(o[:, dh:dh + 1], 1e-30)
        o_ref[0, rows[0]:rows[1], i * dh:(i + 1) * dh] = (
            o[:, :dh] * inv).astype(o_ref.dtype)

    n = len(chains)
    if schedule == "base":
        scores = [qk(i, r) for i, r in chains]
        probs = [sm(s) for s in scores]
        for (i, r), p in zip(chains, probs):
            pv(i, r, p)
    elif schedule == "stagger":
        # software-pipeline: keep one QK in flight ahead of each softmax,
        # and one softmax ahead of each PV.
        scores = [None] * n
        probs = [None] * n
        scores[0] = qk(*chains[0])
        scores[1] = qk(*chains[1])
        for c in range(n):
            probs[c] = sm(scores[c])
            if c + 2 < n:
                scores[c + 2] = qk(*chains[c + 2])
            if c >= 1:
                pv(*chains[c - 1], probs[c - 1])
        pv(*chains[n - 1], probs[n - 1])
    elif schedule == "kchunk":
        spad = k_ref.shape[1]
        ck = spad // 2
        for i, r in chains:
            sl = slice(i * dh, (i + 1) * dh)
            qrows = q_ref[0, r[0]:r[1], sl]
            s0 = jax.lax.dot_general(qrows, k_ref[0, :ck, sl],
                                     (((1,), (1,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            m0 = jnp.max(s0, axis=-1, keepdims=True)
            s1 = jax.lax.dot_general(qrows, k_ref[0, ck:, sl],
                                     (((1,), (1,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            m = jnp.maximum(m0, jnp.max(s1, axis=-1, keepdims=True))
            e0 = jnp.exp(s0 - m).astype(v_ref.dtype)
            o0 = jax.lax.dot_general(e0, rhs[i][:ck],
                                     (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            e1 = jnp.exp(s1 - m).astype(v_ref.dtype)
            o1 = jax.lax.dot_general(e1, rhs[i][ck:],
                                     (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            o = o0 + o1
            inv = 1.0 / jnp.maximum(o[:, dh:dh + 1], 1e-30)
            o_ref[0, r[0]:r[1], i * dh:(i + 1) * dh] = (
                o[:, :dh] * inv).astype(o_ref.dtype)
    else:
        raise ValueError(schedule)


@functools.partial(jax.jit, static_argnames=("schedule",))
def variant_attention(q, k, v, schedule: str):
    scale = DH ** -0.5
    q = q * jnp.asarray(scale, q.dtype)
    q_pad = S_PAD
    q = jnp.pad(q, [(0, 0), (0, q_pad - S), (0, 0)])
    k = jnp.pad(k, [(0, 0), (0, S_PAD - S), (0, 0)])
    v = jnp.pad(v, [(0, 0), (0, S_PAD - S), (0, 0)])
    hp = H // 2
    out = pl.pallas_call(
        functools.partial(_variant_kernel, s_actual=S, dh=DH,
                          schedule=schedule),
        out_shape=jax.ShapeDtypeStruct((B, q_pad, H * DH), q.dtype),
        grid=(B, hp, 1),
        in_specs=[
            pl.BlockSpec((1, q_pad, 2 * DH), lambda bi, hi, qi: (bi, qi, hi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S_PAD, 2 * DH), lambda bi, hi, qi: (bi, 0, hi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S_PAD, 2 * DH), lambda bi, hi, qi: (bi, 0, hi),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, q_pad, 2 * DH),
                               lambda bi, hi, qi: (bi, qi, hi),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
    )(q, k, v)
    return out[:, :S]


def variants():
    rng = np.random.default_rng(0)
    c = H * DH
    q, k, v = (jnp.asarray(rng.standard_normal((B, S, c)) * 0.3, jnp.bfloat16)
               for _ in range(3))
    flops = 4 * B * H * S * S * DH

    # numeric cross-check vs production kernel
    ref = np.asarray(flash_attention_packed(q, k, v, num_heads=H,
                                            scale=DH ** -0.5)).astype(np.float32)
    results = {}
    for sched in ("base", "stagger", "kchunk"):
        got = np.asarray(variant_attention(q, k, v, sched)).astype(np.float32)
        err = np.abs(got - ref).max()
        t = timed(lambda q, k, v, s=sched: variant_attention(q, k, v, s),
                  q, k, v)
        results[sched] = t
        print(f"{sched:8s} {t*1e3:8.3f} ms/call  {flops/t/1e12:7.1f} TF/s  "
              f"({t/(B*H//2)*1e6:5.2f} us/step)  max|err| {err:.2e}",
              flush=True)

    tprod = timed(
        lambda q, k, v: flash_attention_packed(q, k, v, num_heads=H,
                                               scale=DH ** -0.5), q, k, v)
    print(f"{'prod':8s} {tprod*1e3:8.3f} ms/call  {flops/tprod/1e12:7.1f} TF/s")


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "all"
    print("backend:", jax.default_backend())
    if mode in ("probes", "all"):
        probes()
    if mode in ("variants", "all"):
        variants()
