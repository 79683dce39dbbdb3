"""Fused ResidualConvUnit Pallas kernel (implicit-GEMM, halo-DMA).

Fuses the DPT RefineNet RCU chain
relu -> conv3x3 -> relu -> conv3x3 -> (+skip)   (reference util/blocks.py:37-91)
into ONE kernel per feature map: both 3x3 convolutions run as 9 shifted
[M, C] @ [C, C] matmuls each over a row-tile flattened to an implicit-GEMM
M dimension, the ReLU sweeps and the inter-conv intermediate never leave
VMEM, and the residual add is the kernel epilogue.

MEASURED NEGATIVE RESULT (kept as an opt-in experiment, not routed by
default): on v5e at 32x148x148x256 bf16 this runs at ~80 TF/s vs XLA's
~110 TF/s for the same chain (tools/bench_rcu.py). XLA's conv emitter
overlaps its epilogue with the MXU; here the 18 fp32 tap-accumulation
adds and the +-1-shift operand copies serialize against the matmuls
(the same Mosaic phase-serialization plateau the flash-attention kernel
hits). Estimated ceiling after K-stacking taps into one matmul and
two-tile interleaving is ~125 TF/s — not worth the complexity over XLA.

Layout: rows are padded to a sublane-aligned stride WP with >= 1 dead zero
column, then flattened, so a 3x3 conv becomes 9 slices of the (rows*WP, C)
plane at offsets (2+dr)*WP + dw. The dead columns double as the conv's
zero padding (a dw=+-1 shift at a row edge lands on a dead zero instead of
leaking into the neighbor row), and the +-1 column shifts are materialized
ONCE as two shifted operand copies — after which all 18 matmul slices are
tile-aligned, the layout-change sweeps that dominated the naive version
(measured 0.73x vs XLA) disappear, and the VPU cost drops to a handful of
full-buffer copies per ~37us of MXU work.

The tile halo (2 rows per conv) comes from a manual async_copy out of HBM
(BlockSpec tiles cannot overlap); the input is pre-padded by 3 zero rows
on top / >=3 on the bottom so every slice is in bounds.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128
_VMEM_LIMIT = 100 * 1024 * 1024


def _shifted_variants(z, length: int):
    """(z, z shifted down one element, z shifted up one element), all
    `length` rows, zero-filled at the open end. zm[i] = z[i-1]; zp[i] =
    z[i+1]. The two concats are the only layout-change copies the 9 taps
    of one conv need — their slices then start at multiples of the padded
    row stride, which is sublane-aligned."""
    c = z.shape[-1]
    zero = jnp.zeros((1, c), z.dtype)
    zm = jnp.concatenate([zero, jax.lax.slice_in_dim(z, 0, length - 1)], 0)
    zp = jnp.concatenate([jax.lax.slice_in_dim(z, 1, length), zero], 0)
    return z, zm, zp


def _shift_matmul_3x3(variants, w_ref, wp: int, m_out: int, bias):
    """sum_{dr,dw} V_dw[(2+dr)*WP : (2+dr)*WP + m_out] @ K[dr,dw] + bias.

    variants = (center, minus, plus) shifted copies; w_ref is the [9, C, C]
    filter; accumulation is fp32 on the MXU. Returns [m_out, C] fp32.
    """
    zc, zm, zp = variants
    acc = jnp.broadcast_to(bias.astype(jnp.float32), (m_out, zc.shape[-1]))
    for dr in range(-1, 2):
        for dw in range(-1, 2):
            src = zm if dw == -1 else (zp if dw == 1 else zc)
            start = (2 + dr) * wp
            sl = jax.lax.slice_in_dim(src, start, start + m_out, axis=0)
            k = w_ref[(dr + 1) * 3 + (dw + 1)]
            acc = acc + jax.lax.dot_general(
                sl, k, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
    return acc


def _rcu_kernel(x_hbm, w1_ref, b1_ref, w2_ref, b2_ref, o_ref,
                xt, sem, *, tr: int, wp: int, w: int, h: int):
    """One (frame, row-tile) grid step of the fused RCU."""
    ni = pl.program_id(0)
    ti = pl.program_id(1)
    m = tr * wp
    m2 = (tr + 2) * wp          # intermediate rows incl. 1-row halo

    cp = pltpu.make_async_copy(
        x_hbm.at[ni, pl.ds(ti * m, (tr + 6) * wp)], xt, sem)
    cp.start()
    cp.wait()

    x = xt[:]
    zv = _shifted_variants(jnp.maximum(x, 0), (tr + 6) * wp)
    a = _shift_matmul_3x3(zv, w1_ref, wp, m2, b1_ref[0])

    # conv2 zero-pads the *intermediate* at the image boundary — halo rows
    # of `a` outside [0, H) must be zeros, not conv1 evaluated on padded x
    # (which would leak conv1's bias through relu). The dead columns that
    # conv1 filled with bias-garbage get zeroed by the same mask so they
    # keep acting as zero padding for conv2's column shifts.
    idx = jax.lax.broadcasted_iota(jnp.int32, (m2, 1), 0)
    arow = ti * tr - 1 + idx // wp
    valid = jnp.logical_and(jnp.logical_and(arow >= 0, arow < h),
                            idx % wp < w)
    bval = jnp.where(valid, jnp.maximum(a, 0), 0).astype(x.dtype)
    # One leading zero row puts conv2's taps at the same (2+dr)*WP offsets.
    zero_row = jnp.zeros((wp, x.shape[-1]), x.dtype)
    bc = jnp.concatenate([zero_row, bval], 0)
    bv = _shifted_variants(bc, (tr + 3) * wp)
    y = _shift_matmul_3x3(bv, w2_ref, wp, m, b2_ref[0])

    resid = jax.lax.slice_in_dim(x, 3 * wp, 3 * wp + m, axis=0)
    o_ref[0] = (y + resid.astype(jnp.float32)).astype(o_ref.dtype)


def _pick_rows(h: int, wp: int, itemsize: int) -> int:
    """Rows per tile: target a ~2.4k-row implicit-GEMM M (fp32 halves it
    to bound VMEM), spread evenly over H so the last tile wastes little."""
    target = 2432 if itemsize == 2 else 1216
    n_tiles = max(1, -(-h * wp // target))
    return -(-h // n_tiles)


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_rcu(p, x, *, interpret: bool = False):
    """y = x + conv2(relu(conv1(relu(x)))) for 3x3 same-padding convs.

    p: {"conv1": {"w": [3,3,C,C], "b": [C]}, "conv2": {...}}; x: [N,H,W,C].
    Drop-in for models/dpt.py::residual_conv_unit (use_bn=False). C must be
    a multiple of 128 (vitl features=256; vits' 64-lane maps fall back).
    """
    n, h, w, c = x.shape
    align = 16 if x.dtype.itemsize == 2 else 8
    wp = -(-(w + 1) // align) * align
    tr = _pick_rows(h, wp, x.dtype.itemsize)
    n_tiles = -(-h // tr)
    h_pad = n_tiles * tr
    xp = jnp.pad(x, [(0, 0), (3, 3 + h_pad - h), (0, wp - w), (0, 0)])
    xp = xp.reshape(n, (h_pad + 6) * wp, c)
    w1 = p["conv1"]["w"].astype(x.dtype).reshape(9, c, c)
    w2 = p["conv2"]["w"].astype(x.dtype).reshape(9, c, c)
    b1 = p["conv1"]["b"].reshape(1, c)
    b2 = p["conv2"]["b"].reshape(1, c)

    m = tr * wp
    out = pl.pallas_call(
        functools.partial(_rcu_kernel, tr=tr, wp=wp, w=w, h=h),
        out_shape=jax.ShapeDtypeStruct((n, h_pad * wp, c), x.dtype),
        grid=(n, n_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((9, c, c), lambda ni, ti: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda ni, ti: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9, c, c), lambda ni, ti: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda ni, ti: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, m, c), lambda ni, ti: (ni, ti, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM(((tr + 6) * wp, c), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * n * h_pad * wp * 9 * c * c,
            bytes_accessed=2 * n * h_pad * wp * c * x.dtype.itemsize,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(xp, w1, b1, w2, b2)
    return out.reshape(n, h_pad, wp, c)[:, :h, :w]


def rcu_supported(x, use_bn: bool) -> bool:
    """Shapes/modes the fused kernel covers (caller falls back to XLA)."""
    return (not use_bn and x.ndim == 4 and x.shape[-1] % _LANES == 0
            and x.shape[1] >= 3 and x.shape[2] >= 8
            and x.dtype in (jnp.bfloat16, jnp.float32))
