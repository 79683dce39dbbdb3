"""Pallas TPU attention kernel for the spatial ViT regime.

Regime (reference dinov2_layers/attention.py:65-81 replaced): seq S ~= 1370
(518px / patch 14 -> 37^2 + cls) up to ~8.3k (1280px), head_dim 64, batch =
windows * frames. Keys/values for one (batch, head) fit comfortably in VMEM
(S=8448: k+v bf16 ~2.1MB, fp32 scores for a 256-row q block ~8.4MB), so the
kernel is a *one-pass* softmax over the full key range per q block — no
online-softmax rescaling, which is only needed when K can't be resident.
Faster than textbook flash attention in this range and still O(S) memory
(never materializes [S, S] in HBM).

Layout: [B, H, S, D] head-major (see ops/attention.py) — Mosaic requires
the block's trailing dims to tile (sublane x lane), so S and D must be the
last two axes. The K/V block index map is constant in the q-block axis, so
Pallas keeps K/V resident in VMEM across q blocks of one (batch, head).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128
_MAX_S_PAD = 66 * 128   # 8448 keys: covers 1280px inputs (91^2+1 tokens)
_SCORE_VMEM = 8_200_000  # fp32 scores block budget (block_q * S_pad * 4)
_VMEM_LIMIT = 100 * 1024 * 1024  # cap only; Mosaic allocates what the
# blocks need (~14MB at bq=1408). The default limit rejects the large
# single-step score tiles that measured fastest.


def _fit_block_q(block_q: int, s_pad: int, itemsize: int = 2) -> int:
    """Pick the q-block height: the largest *equal split* of s_pad whose
    fp32 score tile fits the VMEM budget (halved for fp32 operands — the
    probability tiles and IO blocks double with them).

    Equal splits (s_pad % block_q == 0) mean q_pad == s_pad — zero dead
    rows — and maximal blocks mean the fewest grid steps per (batch, head),
    keeping K/V resident and amortizing per-step overhead. Measured on v5e
    at S=1370 (518px vitl): bq=1408 single-step runs 12% faster than the
    padded bq=512 three-step split. The caller's block_q acts as an upper
    bound only. Blocks must be sublane-aligned (16 rows for bf16 operands).
    """
    budget = _SCORE_VMEM if itemsize == 2 else _SCORE_VMEM // 2
    max_bq = min(block_q, max(128, budget // (s_pad * 4)), s_pad)
    if s_pad % max_bq == 0 and max_bq % 16 == 0:
        return max_bq
    for n in range(-(-s_pad // max_bq), s_pad // 16):
        if s_pad % n == 0 and (s_pad // n) % 16 == 0:
            return s_pad // n
    return max(128, max_bq // 128 * 128)  # 128-granular fallback (pads q)


_LOG2E = 1.4426950408889634  # exp(x) == exp2(x * log2(e))


def _packed_kernel(q_ref, k_ref, v_ref, o_ref, *, s_actual: int, dh: int,
                   mxu_denom: bool = True, exp2: bool = False):
    """Two heads per grid step, operands in the NATURAL [B, S, H*dh] layout
    of the projection matmuls — Mosaic's (8,128) tiling forbids dh=64 as a
    block's last dim, but a 2-head 128-lane block satisfies it, and in-VMEM
    64-lane slices per head are cheap. This removes the [B,H,S,dh] layout
    copies XLA otherwise inserts between each projection and the kernel.

    The two heads' chains are written interleaved (both QK matmuls first,
    then both softmaxes, then both PV matmuls) — independent chains give
    the Mosaic scheduler room to overlap one head's VPU softmax with the
    other's MXU matmul instead of serializing the phases."""
    bq = q_ref.shape[1]
    half = bq // 2
    chains = [(i, r) for i in range(2) for r in ((0, half), (half, bq))
              ] if half % 8 == 0 and half > 0 else [(i, (0, bq)) for i in range(2)]

    if mxu_denom:
        # Masked ones-column appended to V: the PV matmul's natural output
        # is dh=64 of the MXU's 128 lanes, so widening the rhs to 128 lanes
        # costs zero extra MXU passes — and lane dh of the widened output
        # becomes sum_real_keys(e) with fp32 MXU accumulation. This deletes
        # two full-width VPU sweeps from the softmax: the fp32 sum sweep
        # AND the key-pad select sweep (pads get weight 0 in the column;
        # their V rows are zero-padded so the PV lanes never see them).
        lane = jax.lax.broadcasted_iota(jnp.int32, (k_ref.shape[1], dh), 1)
        row = jax.lax.broadcasted_iota(jnp.int32, (k_ref.shape[1], dh), 0)
        mcol = ((lane == 0) & (row < s_actual)).astype(v_ref.dtype)
        # One widened rhs per head, shared by both row-half chains.
        rhs = [jnp.concatenate([v_ref[0, :, i * dh:(i + 1) * dh], mcol],
                               axis=1) for i in range(2)]

    def qk(i, rows):
        sl = slice(i * dh, (i + 1) * dh)
        # NOTE: fp32 scores are forced — Mosaic requires 32-bit matmul
        # accumulators ('Expected matmul acc to be 32-bit'), and a separate
        # fp32->bf16 cast sweep before max/exp costs what it saves.
        return jax.lax.dot_general(
            q_ref[0, rows[0]:rows[1], sl], k_ref[0, :, sl],
            (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)

    def softmax(s):
        # Unnormalized: the 1/denom multiply runs on the tiny [rows, dh] PV
        # output instead of the [rows, S] probability tile, and exp writes
        # the kernel dtype directly — one fewer full-width VPU sweep and
        # half the exp-output bytes (measured ~5-8% kernel time on v5e; the
        # denom from rounded e differs from fp32 by <2^-8 relative, below
        # the p-tile cast rounding the normalized form already had).
        # exp2: the wrapper folded log2(e) into the q pre-scale, so the
        # scores are already in the log2 domain and the softmax is the
        # SAME function (2^(s*log2e) == e^s; the max subtraction commutes)
        # — but the VPU sweep skips the multiply jnp.exp would need if it
        # lowers to mul+exp2.
        m = jnp.max(s, axis=-1, keepdims=True)
        e = (jnp.exp2(s - m) if exp2 else jnp.exp(s - m)).astype(v_ref.dtype)
        if mxu_denom:
            return e, None
        if s_actual < k_ref.shape[1]:
            key_ids = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            e = jnp.where(key_ids < s_actual, e, 0.0)
        denom = jnp.sum(e.astype(jnp.float32), axis=-1, keepdims=True)
        return e, 1.0 / jnp.maximum(denom, 1e-30)

    def pv(i, rows, p, inv):
        sl = slice(i * dh, (i + 1) * dh)
        if mxu_denom:
            o = jax.lax.dot_general(
                p, rhs[i], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            inv = 1.0 / jnp.maximum(o[:, dh:dh + 1], 1e-30)
            o = o[:, :dh]
        else:
            o = jax.lax.dot_general(
                p, v_ref[0, :, sl], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        o_ref[0, rows[0]:rows[1], sl] = (o * inv).astype(o_ref.dtype)

    scores = [qk(i, rows) for i, rows in chains]
    probs = [softmax(s) for s in scores]
    for (i, rows), (p, inv) in zip(chains, probs):
        pv(i, rows, p, inv)


@functools.partial(jax.jit,
                   static_argnames=("num_heads", "block_q", "interpret",
                                    "mxu_denom"))
def flash_attention_qkv_fused(qkv, *, num_heads: int, block_q: int = 4096,
                              interpret: bool = False, mxu_denom: bool = True):
    """Attention on a fused projection output qkv: [B, S, 3C]
    (C = num_heads * dh, layout [q | k | v], q already scaled).

    The kernel reads q/k/v as column-block slices of the single fused
    matmul output — one projection matmul, zero slicing copies. Falls back
    to flash_attention_packed when the column blocks don't tile.
    """
    b, s_len, c3 = qkv.shape
    c = c3 // 3
    dh = c // num_heads
    s_pad = -(-s_len // _LANES) * _LANES
    if (s_pad > _MAX_S_PAD or num_heads % 2 or (2 * dh) % _LANES
            or c % _LANES):
        q, k, v = (qkv[..., :c], qkv[..., c:2 * c], qkv[..., 2 * c:])
        return flash_attention_packed(q, k, v, num_heads=num_heads, scale=1.0,
                                      block_q=block_q, interpret=interpret,
                                      mxu_denom=mxu_denom)
    block_q = _fit_block_q(block_q, s_pad, qkv.dtype.itemsize)
    q_pad = -(-s_pad // block_q) * block_q
    if q_pad != s_len:
        qkv_q = jnp.pad(qkv, [(0, 0), (0, q_pad - s_len), (0, 0)]) \
            if q_pad != s_len else qkv
    else:
        qkv_q = qkv
    kv_src = qkv_q if q_pad == s_pad else (
        jnp.pad(qkv, [(0, 0), (0, s_pad - s_len), (0, 0)])
        if s_pad != s_len else qkv)

    hp = num_heads // 2
    kcol = c // _LANES       # column-block offset of K within the fused array
    vcol = 2 * c // _LANES
    grid = (b, hp, q_pad // block_q)
    out = pl.pallas_call(
        functools.partial(_packed_kernel, s_actual=s_len, dh=dh,
                          mxu_denom=mxu_denom),
        out_shape=jax.ShapeDtypeStruct((b, q_pad, c), qkv.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, 2 * dh), lambda bi, hi, qi: (bi, qi, hi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s_pad, 2 * dh),
                         lambda bi, hi, qi: (bi, 0, kcol + hi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s_pad, 2 * dh),
                         lambda bi, hi, qi: (bi, 0, vcol + hi),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, 2 * dh),
                               lambda bi, hi, qi: (bi, qi, hi),
                               memory_space=pltpu.VMEM),
        # No cost_estimate: see flash_attention_packed.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(qkv_q, kv_src, kv_src)
    if q_pad != s_len:
        out = out[:, :s_len]
    return out


@functools.partial(jax.jit,
                   static_argnames=("num_heads", "scale", "block_q", "interpret",
                                    "mxu_denom", "exp2"))
def flash_attention_packed(q, k, v, *, num_heads: int, scale: float,
                           block_q: int = 4096, interpret: bool = False,
                           mxu_denom: bool = True, exp2: bool = False):
    """Attention on [B, S, C] (C = num_heads * dh, heads contiguous).

    Zero-layout-change variant of flash_attention: inputs/outputs are the
    projection matmuls' natural layouts. num_heads must be even.
    """
    b, s_len, c = q.shape
    dh = c // num_heads
    s_pad = -(-s_len // _LANES) * _LANES
    if s_pad > _MAX_S_PAD or num_heads % 2 or (2 * dh) % _LANES:
        # generic fallback through the head-split path
        qh = q.reshape(b, s_len, num_heads, dh).transpose(0, 2, 1, 3)
        kh = k.reshape(b, s_len, num_heads, dh).transpose(0, 2, 1, 3)
        vh = v.reshape(b, s_len, num_heads, dh).transpose(0, 2, 1, 3)
        o = flash_attention(qh, kh, vh, scale=scale, block_q=block_q,
                            interpret=interpret, mxu_denom=mxu_denom)
        return o.transpose(0, 2, 1, 3).reshape(b, s_len, c)
    if exp2:
        scale = scale * _LOG2E  # scores land in the log2 domain
    q = q * jnp.asarray(scale, q.dtype)
    block_q = _fit_block_q(block_q, s_pad, q.dtype.itemsize)
    q_pad = -(-s_pad // block_q) * block_q
    if q_pad != s_len:
        q = jnp.pad(q, [(0, 0), (0, q_pad - s_len), (0, 0)])
    if s_pad != s_len:
        k = jnp.pad(k, [(0, 0), (0, s_pad - s_len), (0, 0)])
        v = jnp.pad(v, [(0, 0), (0, s_pad - s_len), (0, 0)])

    hp = num_heads // 2
    grid = (b, hp, q_pad // block_q)
    out = pl.pallas_call(
        functools.partial(_packed_kernel, s_actual=s_len, dh=dh,
                          mxu_denom=mxu_denom, exp2=exp2),
        out_shape=jax.ShapeDtypeStruct((b, q_pad, c), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, 2 * dh), lambda bi, hi, qi: (bi, qi, hi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s_pad, 2 * dh), lambda bi, hi, qi: (bi, 0, hi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s_pad, 2 * dh), lambda bi, hi, qi: (bi, 0, hi),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, 2 * dh),
                               lambda bi, hi, qi: (bi, qi, hi),
                               memory_space=pltpu.VMEM),
        # Deliberately NO cost_estimate: passing one measured the kernel
        # 3.3% SLOWER in a same-session A/B (3.655 -> 3.535 ms/call at the
        # vitl shape, tools/bench_kernel_ab.py) — the estimate's huge
        # transcendental count skews XLA's latency-hiding scheduler for no
        # benefit (numerics identical either way).
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(q, k, v)
    if q_pad != s_len:
        out = out[:, :s_len]
    return out


def _packed_qk8_kernel(q_ref, k_ref, v_ref, sc_ref, o_ref, *, s_actual: int,
                       dh: int):
    """int8-QK variant of _packed_kernel (--int8 mode): q/k arrive int8
    (per-tensor static scales, ops/quant.py), QK contracts int8->int32 at
    v5e's doubled int8 MXU rate, and the score scale folds into the one
    exp sweep: e = exp(c * (s_i32 - m_i32)) with c = sq_eff * sk from SMEM
    — the same sweep count as the bf16 kernel. Measured 1.049x the bf16
    kernel at the vitl shape (tools/bench_attn_kernel.py --int8): the fp32
    score tile + softmax sweeps bound the kernel, so doubling the QK MXU
    rate is a small win. PV and the MXU denominator/pad fold are identical
    to _packed_kernel."""
    bq = q_ref.shape[1]
    half = bq // 2
    chains = [(i, r) for i in range(2) for r in ((0, half), (half, bq))
              ] if half % 8 == 0 and half > 0 else [(i, (0, bq)) for i in range(2)]
    c = sc_ref[0, 0] * sc_ref[0, 1]
    lane = jax.lax.broadcasted_iota(jnp.int32, (k_ref.shape[1], dh), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (k_ref.shape[1], dh), 0)
    mcol = ((lane == 0) & (row < s_actual)).astype(v_ref.dtype)
    rhs = [jnp.concatenate([v_ref[0, :, i * dh:(i + 1) * dh], mcol],
                           axis=1) for i in range(2)]

    def qk(i, rows):
        sl = slice(i * dh, (i + 1) * dh)
        return jax.lax.dot_general(
            q_ref[0, rows[0]:rows[1], sl], k_ref[0, :, sl],
            (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32)

    def softmax(s):
        m = jnp.max(s, axis=-1, keepdims=True)
        return jnp.exp((s - m).astype(jnp.float32) * c).astype(v_ref.dtype)

    def pv(i, rows, p):
        o = jax.lax.dot_general(
            p, rhs[i], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        inv = 1.0 / jnp.maximum(o[:, dh:dh + 1], 1e-30)
        o_ref[0, rows[0]:rows[1], i * dh:(i + 1) * dh] = (
            o[:, :dh] * inv).astype(o_ref.dtype)

    scores = [qk(i, rows) for i, rows in chains]
    probs = [softmax(s) for s in scores]
    for (i, rows), p in zip(chains, probs):
        pv(i, rows, p)


@functools.partial(jax.jit,
                   static_argnames=("num_heads", "block_q", "interpret"))
def flash_attention_packed_qk8(q_i8, k_i8, v, scales, *, num_heads: int,
                               block_q: int = 4096, interpret: bool = False):
    """Packed attention with int8 QK (--int8 encoder mode).

    q_i8, k_i8: [B, S, C] int8 (C = num_heads * dh, heads contiguous);
    v: [B, S, C] float; scales: [2] fp32 = (sq_eff, sk) where
    sq_eff already folds the attention scale (amax_q/127 * dh**-0.5) and
    sk = amax_k/127. Scores are (q_i8 @ k_i8^T) * sq_eff * sk. Falls back
    to dequantized bf16 attention when the packed geometry doesn't apply,
    so all backends share the quantization semantics.
    """
    b, s_len, cdim = q_i8.shape
    dh = cdim // num_heads
    s_pad = -(-s_len // _LANES) * _LANES
    scales = scales.astype(jnp.float32).reshape(2)
    if s_pad > _MAX_S_PAD or num_heads % 2 or (2 * dh) % _LANES:
        qf = q_i8.astype(v.dtype) * scales[0].astype(v.dtype)
        kf = k_i8.astype(v.dtype) * scales[1].astype(v.dtype)
        return flash_attention_packed(qf, kf, v, num_heads=num_heads,
                                      scale=1.0, block_q=block_q,
                                      interpret=interpret)
    block_q = _fit_block_q(block_q, s_pad, 2)
    q_pad = -(-s_pad // block_q) * block_q

    def pad(x, n):
        return jnp.pad(x, [(0, 0), (0, n - s_len), (0, 0)]) \
            if n != s_len else x

    q_i8, k_i8, v = pad(q_i8, q_pad), pad(k_i8, s_pad), pad(v, s_pad)
    hp = num_heads // 2
    grid = (b, hp, q_pad // block_q)
    out = pl.pallas_call(
        functools.partial(_packed_qk8_kernel, s_actual=s_len, dh=dh),
        out_shape=jax.ShapeDtypeStruct((b, q_pad, cdim), v.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, 2 * dh), lambda bi, hi, qi: (bi, qi, hi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s_pad, 2 * dh), lambda bi, hi, qi: (bi, 0, hi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s_pad, 2 * dh), lambda bi, hi, qi: (bi, 0, hi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2), lambda bi, hi, qi: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, 2 * dh),
                               lambda bi, hi, qi: (bi, qi, hi),
                               memory_space=pltpu.VMEM),
        # No cost_estimate: see flash_attention_packed.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(q_i8, k_i8, v, scales.reshape(1, 2))
    if q_pad != s_len:
        out = out[:, :s_len]
    return out


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, s_actual: int,
                 mxu_denom: bool = True):
    """One-pass softmax, minimized VPU sweeps over the [bq, S_pad] scores
    (the kernel is VPU-issue-bound, not MXU-bound): the query is pre-scaled
    outside, the stabilizer max runs over raw scores (zero-padded keys give
    score 0 >= nothing real needs excluding for *stability*), and the pad
    mask is folded into the single exp sweep. With mxu_denom, the pad mask
    and denominator sum move into idle MXU lanes of the PV matmul instead
    (see _packed_kernel)."""
    q = q_ref[0, 0]                  # [bq, D], already scaled
    k = k_ref[0, 0]                  # [S_pad, D]
    v = v_ref[0, 0]                  # [S_pad, D]
    d = v.shape[1]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )                                 # [bq, S_pad] fp32
    m = jnp.max(s, axis=-1, keepdims=True)
    # Unnormalized probabilities in the kernel dtype; the 1/denom multiply
    # moves to the [bq, D] PV output (see _packed_kernel.softmax for why).
    e = jnp.exp(s - m).astype(v.dtype)
    if mxu_denom and 2 * d <= _LANES:
        # [S, 2d] rhs stays within one 128-lane MXU tile — the widened dot
        # costs no extra passes and yields the masked denominator at lane d.
        lane = jax.lax.broadcasted_iota(jnp.int32, (k.shape[0], d), 1)
        row = jax.lax.broadcasted_iota(jnp.int32, (k.shape[0], d), 0)
        mcol = ((lane == 0) & (row < s_actual)).astype(v.dtype)
        o = jax.lax.dot_general(
            e, jnp.concatenate([v, mcol], axis=1), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        inv = 1.0 / jnp.maximum(o[:, d:d + 1], 1e-30)
        o_ref[0, 0] = (o[:, :d] * inv).astype(o_ref.dtype)
        return
    if s_actual < k.shape[0]:
        key_ids = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        e = jnp.where(key_ids < s_actual, e, 0.0)
    denom = jnp.sum(e.astype(jnp.float32), axis=-1, keepdims=True)
    # denom can only underflow if every real score is << the padded 0s —
    # pathological inputs; the epsilon keeps the kernel NaN-free there.
    inv = 1.0 / jnp.maximum(denom, 1e-30)
    o = jax.lax.dot_general(
        e, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    o_ref[0, 0] = (o * inv).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "block_q", "interpret",
                                             "mxu_denom"))
def flash_attention(q, k, v, *, scale: float, block_q: int = 4096,
                    interpret: bool = False, mxu_denom: bool = True):
    """Attention on [B, H, S, D]; returns [B, H, S, D]."""
    b, h, s_len, d = q.shape
    s_pad = -(-s_len // _LANES) * _LANES
    if s_pad > _MAX_S_PAD:
        from .attention import _xla_mha
        return _xla_mha(q, k, v, scale)
    q = q * jnp.asarray(scale, q.dtype)  # folded here; fuses with the producer
    block_q = _fit_block_q(block_q, s_pad, q.dtype.itemsize)
    # Pad seq so both the q-block grid and K/V tiles are lane-aligned.
    q_pad = -(-s_pad // block_q) * block_q
    if q_pad != s_len:
        q = jnp.pad(q, [(0, 0), (0, 0), (0, q_pad - s_len), (0, 0)])
    if s_pad != s_len:
        k = jnp.pad(k, [(0, 0), (0, 0), (0, s_pad - s_len), (0, 0)])
        v = jnp.pad(v, [(0, 0), (0, 0), (0, s_pad - s_len), (0, 0)])

    grid = (b, h, q_pad // block_q)
    out = pl.pallas_call(
        functools.partial(_attn_kernel, s_actual=s_len, mxu_denom=mxu_denom),
        out_shape=jax.ShapeDtypeStruct((b, h, q_pad, d), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, block_q, d), lambda bi, hi, qi: (bi, hi, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, s_pad, d), lambda bi, hi, qi: (bi, hi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, s_pad, d), lambda bi, hi, qi: (bi, hi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, block_q, d),
                               lambda bi, hi, qi: (bi, hi, qi, 0),
                               memory_space=pltpu.VMEM),
        # No cost_estimate: see flash_attention_packed.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(q, k, v)
    if q_pad != s_len:
        out = out[:, :, :s_len]
    return out
