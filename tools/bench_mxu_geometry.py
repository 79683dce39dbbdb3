"""Plain-XLA GEMM rates on this chip (robust chain-differenced timing).

Chip: TPU v5 lite (v5e) — 197 TF/s bf16 / 394 TOP/s int8 peak, 128x128 MXU,
~819 GB/s HBM. The tunneled dispatch costs ~3-30 ms with high jitter, so a
naive (t_chain / n) or a short-chain difference measures noise: this tool
sizes each chain so the MARGINAL compute between the two chain lengths is
>= ~0.25 s (hundreds of dispatch-jitter sigmas) and reports
(T(c2)-T(c1))/(c2-c1) with medians over repeats.

Run (real TPU): python tools/bench_mxu_geometry.py

RESULTS (v5e, 2026-08-19, abs-sum epilogue version): dense bf16
4096^3/2048^3 both 192 TF/s (97.5% of the 197 nominal peak — the harness
is sound); int8 4096^3 325 TOP/s. Encoder-shaped (M=45056): qkv 193.8,
mlp-up 191.1 TF/s — the ViT's big GEMMs run at ~98% of peak in isolation,
so the encoder segment is at speed-of-light and there is no Pallas-GEMM
headroom; mlp-dn (K=4096 reduction) 122.5 TF/s is the one emitter that
lags. CAVEATS: a single "proj 939 TF/s" reading exceeded peak — chain
medians can still catch a box-throttle edge; rerun when a shape reads
>peak. The attention-shaped section (1408-row tiles, 4-13 us/call) is
dispatch-overhead-bound under XLA and NOT an MXU-geometry measurement —
use tools/bench_kernel_ab.py's in-kernel DCE-proof probes for that
(those measured dh=64 at ~92% of dh=128 per-flop rate).
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

EST_TF = 120e12          # initial rate guess for chain sizing
TARGET_MARGIN_S = 0.25   # marginal compute between the two chains
REPEATS = 5


def timed_matmul(m, k, n, dtype=jnp.bfloat16, acc=jnp.float32):
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.standard_normal((m, k)) * 0.1, dtype)
    b = jnp.asarray(rng.standard_normal((k, n)) * 0.1, dtype)
    flops = 2.0 * m * k * n
    est_iter = flops / EST_TF
    c1 = max(4, int(TARGET_MARGIN_S / est_iter / 8))
    c2 = c1 + max(8, int(TARGET_MARGIN_S / est_iter))

    def chain(nit):
        @jax.jit
        def fn(a, b):
            def body(i, carry):
                s, a = carry
                o = jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                                        preferred_element_type=acc)
                # Full-output dependency THROUGH A NONLINEARITY: a slice
                # like o[0,0] lets XLA narrow the dot to one row, and a
                # plain sum is algebraically rewritable — sum(A@B) ==
                # (1^T A)(B 1), two matvecs, O(mk+kn) not O(mkn) (that
                # rewrite produced the impossible ">5000 TF/s" readings of
                # the first version of this tool). abs() blocks the
                # rewrite, so every MAC must execute; the abs+sum epilogue
                # fuses into the dot and costs O(mn).
                s = s + jnp.sum(jnp.abs(o).astype(jnp.float32)) * 1e-30
                a = (a + (s * 1e-20).astype(a.dtype))
                return s, a

            s, _ = jax.lax.fori_loop(0, nit, body, (jnp.float32(0.0), a))
            return s

        return fn

    f1, f2 = chain(c1), chain(c2)
    float(f1(a, b)), float(f2(a, b))

    def once(f):
        t0 = time.perf_counter()
        float(f(a, b))
        return time.perf_counter() - t0

    t1 = np.median([once(f1) for _ in range(REPEATS)])
    t2 = np.median([once(f2) for _ in range(REPEATS)])
    dt = (t2 - t1) / (c2 - c1)
    return dt, flops / dt / 1e12


def main():
    print("backend:", jax.default_backend(), jax.devices()[0].device_kind,
          flush=True)

    print("\n-- dense peaks --")
    for m, k, n, dt_, unit in ((4096, 4096, 4096, jnp.bfloat16, "TF/s"),
                               (2048, 2048, 2048, jnp.bfloat16, "TF/s")):
        dt, tf = timed_matmul(m, k, n, dt_)
        print(f"bf16 {m}x{k}x{n}  {dt*1e6:9.1f} us  {tf:7.1f} {unit}",
              flush=True)
    dt, tf = timed_matmul(4096, 4096, 4096, jnp.int8, jnp.int32)
    print(f"int8 4096^3        {dt*1e6:9.1f} us  {tf:7.1f} TOP/s", flush=True)

    print("\n-- encoder-shaped (B=32 folded into M) --")
    for m, k, n, tag in ((32 * 1408, 1024, 3 * 1024, "qkv"),
                         (32 * 1408, 1024, 4096, "mlp-up"),
                         (32 * 1408, 4096, 1024, "mlp-dn"),
                         (32 * 1408, 1024, 1024, "proj")):
        dt, tf = timed_matmul(m, k, n)
        print(f"{tag:7s} {m:6d}x{k}x{n}  {dt*1e6:9.1f} us  {tf:7.1f} TF/s",
              flush=True)

    print("\n-- attention-shaped --")
    for m, k, n, tag in ((1408, 64, 1408, "qk64"),
                         (1408, 128, 1408, "qk128"),
                         (1408, 1408, 128, "pv128"),
                         (1408, 1408, 256, "pv256"),
                         (1408, 1408, 512, "pv512")):
        dt, tf = timed_matmul(m, k, n)
        print(f"{tag:7s} {m:6d}x{k}x{n}  {dt*1e6:9.1f} us  {tf:7.1f} TF/s",
              flush=True)


if __name__ == "__main__":
    sys.exit(main())
