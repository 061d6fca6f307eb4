"""A/B the current round's inference-kernel knobs on the real chip.

Round-4b matrix (round-4a settled fuse_pool=1 as a +0.5% winner and
head_bf16 as a wash — docs/PERF.md):

  stream_out — streaming output stores (conv output in ANY/HBM, strip
               results DMA'd from a 2-slot VMEM ring while the next
               strip's matmuls run; the kernel-anatomy finding that the
               whole-plane store serializes against the MXU);
  fuse_pool  — encoder pools emitted from the conv kernels' epilogues
               (conv3x3_s2d_fused_pool) instead of separate relayout
               kernels re-reading HBM.

Same scan-with-dependency-chain methodology as bench.py (docs/PERF.md
remote-backend rules) — winners are chosen on numbers, not intuition.

Run (real TPU): python scripts/ab_inference.py
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from depgan_tpu.config import ModelConfig
from depgan_tpu.models import init_generator
from depgan_tpu.ops import conv_s2d_pallas as csp
from depgan_tpu.ops.fast_gen import FastGenerator

N_SCAN = 32
BATCH = 256


def measure(variables, fuse_pool: bool = False, head_bf16: bool = False,
            fuse_head: bool = False, strip: int = 16,
            stream_out: bool | None = None, fuse_chain: bool = False,
            batch: int = BATCH) -> float:
    if stream_out is not None:
        csp.STREAM_OUT = stream_out
    cfg = ModelConfig(
        image_size=256, first_fm=32, n_input_channels=1,
        compute_dtype="bfloat16",
    )
    fast = FastGenerator(cfg, variables, s2d_levels=(), pallas_levels=(1, 2))
    fast.fuse_head = fuse_head
    fast.fuse_pool = fuse_pool
    fast.head_bf16 = head_bf16
    fast.fuse_chain = fuse_chain
    fast.strip = strip
    BATCH_ = batch

    @jax.jit
    def forward_scan(weights, x, zs):
        def body(carry, z):
            y = fast._forward(weights, carry, z)
            return jnp.tanh(carry + 1e-12 * y), jnp.sum(y)

        _, sums = jax.lax.scan(body, x, zs)
        return jnp.sum(sums)

    x = jax.random.uniform(jax.random.key(0), (BATCH_, 256, 256, 1))
    zs = jax.random.normal(jax.random.key(1), (N_SCAN, BATCH_, 32, 1))
    float(forward_scan(fast.weights, x, zs))  # compile + first run
    reps = []
    for _ in range(4):
        t0 = time.perf_counter()
        float(forward_scan(fast.weights, x, zs))
        reps.append(time.perf_counter() - t0)
    return N_SCAN * BATCH_ / min(reps)


def main():
    float(jax.jit(lambda v: (v @ v).sum())(jnp.ones((128, 128))))  # warm up
    cfg = ModelConfig(
        image_size=256, first_fm=32, n_input_channels=1,
        compute_dtype="bfloat16",
    )
    _, variables = init_generator(cfg, jax.random.key(0))
    # Round-5 matrix: whole-site chain kernels (fuse_chain,
    # conv3x3_s2d_chain3 — HBM boundary elimination after the overlap
    # family measured rejected) x pool fusion. stream_out settled
    # REJECTED in round 4 and is dropped from the matrix.
    for fuse_chain in (False, True):
        for fuse_pool in (False, True):
            try:
                v = measure(variables, fuse_pool=fuse_pool,
                            fuse_chain=fuse_chain)
                print(f"fuse_chain={int(fuse_chain)} "
                      f"fuse_pool={int(fuse_pool)}"
                      f" -> {v:8.1f} slices/s", flush=True)
            except Exception as e:
                print(f"fuse_chain={int(fuse_chain)} "
                      f"fuse_pool={int(fuse_pool)}"
                      f" FAILED {type(e).__name__}: "
                      f"{str(e).splitlines()[0][:120]}", flush=True)
    # batch sweep at the WINNER config (fuse_chain measured rejected:
    # 2468-2480 vs 2848 at batch 256; batch>256 was only ever measured
    # under rejected variants — aligned staging r3, chain r5).
    for batch in (384, 512, 768):
        try:
            v = measure(variables, fuse_pool=True, fuse_chain=False,
                        batch=batch)
            print(f"fuse_chain=0 fuse_pool=1 batch={batch}"
                  f" -> {v:8.1f} slices/s", flush=True)
        except Exception as e:
            print(f"batch={batch} FAILED {type(e).__name__}: "
                  f"{str(e).splitlines()[0][:120]}", flush=True)


if __name__ == "__main__":
    main()
