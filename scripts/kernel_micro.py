"""Per-kernel micro-benchmarks at production shapes (real chip).

Times each Pallas kernel of the inference path in isolation at the shapes
the 256-image batch-64 forward actually uses, with the remote-backend-safe
scan-chain methodology (docs/PERF.md): the kernel runs N_SCAN times inside
one jitted lax.scan with a data dependency, and one dependent scalar is
fetched. Per-call ms = wall / N_SCAN. Roofline columns: HBM ms at 819 GB/s
(v5e) for bytes in+out, MXU ms at 175 measured bf16 TFLOPS.

Run (real TPU): python scripts/kernel_micro.py [batch]
"""
from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from depgan_tpu.ops.conv_s2d_pallas import (
    conv3x3_s2d_fused,
    conv3x3_s2d_fused2,
    deconv_s2d_pallas,
    entry_pack,
    pool_s2d_pallas,
    pool_to_s2d_pallas,
)

B = int(sys.argv[1]) if len(sys.argv) > 1 else 64
N_SCAN = 16
HBM_GBPS = 819.0
MXU_TFLOPS = 175.0


def timed(name, fn, x, *args, flops=0):
    """fn(x, *args) -> array; x is the chained operand."""

    @jax.jit
    def run(x, args):
        def body(carry, _):
            out = fn(carry, *args)
            # Chain: feed a degenerate function of the output back into the
            # carry so scan iterations serialise; shapes must match x.
            return carry + 1e-30 * jnp.sum(out).astype(carry.dtype), ()

        c, _ = jax.lax.scan(body, x, None, length=N_SCAN)
        return jnp.sum(c.astype(jnp.float32))

    float(run(x, args))  # compile
    reps = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(run(x, args))
        reps.append(time.perf_counter() - t0)
    ms = min(reps) / N_SCAN * 1e3

    out = jax.eval_shape(lambda x, a: fn(x, *a), x, args)
    nbytes = x.size * x.dtype.itemsize + out.size * jnp.dtype(out.dtype).itemsize
    for a in args:
        nbytes += a.size * a.dtype.itemsize
    hbm_ms = nbytes / (HBM_GBPS * 1e6)
    mxu_ms = flops / (MXU_TFLOPS * 1e9)
    util = f"{mxu_ms / ms:5.0%}" if flops else "    -"
    print(f"{name:34s} {ms:7.3f} ms   hbm {hbm_ms:6.3f}  mxu {mxu_ms:6.3f}"
          f"  util {util}", flush=True)
    return ms


def conv_args(n, c4, co4, seed):
    k = jax.random.key(seed)
    ks = jax.random.split(k, 3)
    x = jax.random.normal(ks[0], (B, n + 2, n + 2, c4), jnp.bfloat16)
    w = jax.random.normal(ks[1], (2, 2, c4, co4), jnp.bfloat16) * 0.05
    b = jax.random.normal(ks[2], (co4,), jnp.float32) * 0.1
    return x, w, b


def main():
    float(jax.jit(lambda v: (v @ v).sum())(jnp.ones((128, 128))))
    print(f"backend: {jax.default_backend()}  batch={B}  n_scan={N_SCAN}",
          flush=True)

    # Level 1: n=128, c4=128 (32ch) -- the hot level.
    x, w, b = conv_args(128, 128, 128, 0)
    flops = 2 * B * 128 * 128 * 4 * 128 * 128
    timed("conv3 L1 relu (128, 128->128)",
          lambda x, w, b: conv3x3_s2d_fused(x, w, b, mode="relu", strip=16),
          x, w, b, flops=flops)
    gamma = jnp.ones((B, 128), jnp.float32)
    timed("conv3 L1 film (128, 128->128)",
          lambda x, w, b, g: conv3x3_s2d_fused(x, w, b, g, g, "film", 16),
          x, w, b, gamma, flops=flops)
    x2, w2, _ = conv_args(128, 128, 128, 1)
    timed("conv3 L1 fused2 (128, 2x128->128)",
          lambda x, x2, w, w2, b: conv3x3_s2d_fused2(x, x2, w, w2, b, 16),
          x, x2, w, w2, b, flops=2 * flops)
    # Entry conv: c4=32 (pad 8) -> 128.
    xe, we, be = conv_args(128, 32, 128, 2)
    timed("conv3 entry (128, 32->128)",
          lambda x, w, b: conv3x3_s2d_fused(x, w, b, mode="relu", strip=16),
          xe, we, be, flops=flops // 4)

    # Level 2: n=64, c4=256 (64ch).
    xl2, wl2, bl2 = conv_args(64, 256, 256, 3)
    flops2 = 2 * B * 64 * 64 * 4 * 256 * 256
    timed("conv3 L2 relu (64, 256->256)",
          lambda x, w, b: conv3x3_s2d_fused(x, w, b, mode="relu", strip=16),
          xl2, wl2, bl2, flops=flops2)

    # Pools.
    timed("pool_s2d L2->3 (64, c4=256)", pool_s2d_pallas, xl2)
    timed("pool_to_s2d L1->2 (128, c4=128)", pool_to_s2d_pallas, x)

    # Deconv into L1: m=64 (L2 interior), c=64ch, out 32ch.
    xd = jax.random.normal(jax.random.key(7), (B, 66, 66, 256), jnp.bfloat16)
    wd = jax.random.normal(jax.random.key(8), (64, 128), jnp.bfloat16) * 0.05
    bd = jnp.zeros((128,), jnp.float32)
    timed("deconv L2->L1 (66, 64ch->32ch)",
          lambda x, w, b: deconv_s2d_pallas(x, w, b), xd, wd, bd,
          flops=2 * B * 64 * 64 * 64 * 128)

    # Entry pack (XLA transform, 1-channel).
    x1 = jax.random.uniform(jax.random.key(9), (B, 256, 256, 1))
    timed("entry_pack (256, 1ch, pad 8)", lambda x: entry_pack(x, 8), x1)


if __name__ == "__main__":
    main()
