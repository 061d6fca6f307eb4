"""A/B the round-3 kernel changes on the real chip, one process.

Round 3 changed three things in the inference path at once (interleaved
staging, ring-only zeroing, fused tanh head) and the first bench after
showed 2572 vs round 2's 2780 slices/s. This measures the staging schedule
and head fusion independently — same scan-with-dependency-chain
methodology as bench.py (docs/PERF.md remote-backend rules) — so the
winner is chosen on numbers, not intuition.

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


def measure(variables, interleaved: bool, fuse_head: bool,
            aligned: bool = True, strip: int = 16) -> float:
    csp.INTERLEAVED_STAGING = interleaved
    csp.ALIGNED_STAGING = aligned
    cfg = ModelConfig(
        image_size=256, first_fm=32, n_input_channels=1,
        compute_dtype="bfloat16",
    )
    fast = FastGenerator(cfg, variables, s2d_levels=(), pallas_levels=(1, 2))
    fast.fuse_head = fuse_head
    fast.strip = strip

    @jax.jit
    def forward_scan(weights, x, zs):
        def body(carry, z):
            y = fast._forward(weights, carry, z)
            return jnp.tanh(carry + 1e-12 * y), jnp.sum(y)

        _, sums = jax.lax.scan(body, x, zs)
        return jnp.sum(sums)

    x = jax.random.uniform(jax.random.key(0), (BATCH, 256, 256, 1))
    zs = jax.random.normal(jax.random.key(1), (N_SCAN, BATCH, 32, 1))
    float(forward_scan(fast.weights, x, zs))  # compile + first run
    reps = []
    for _ in range(4):
        t0 = time.perf_counter()
        float(forward_scan(fast.weights, x, zs))
        reps.append(time.perf_counter() - t0)
    return N_SCAN * BATCH / min(reps)


def main():
    float(jax.jit(lambda v: (v @ v).sum())(jnp.ones((128, 128))))  # warm up
    cfg = ModelConfig(
        image_size=256, first_fm=32, n_input_channels=1,
        compute_dtype="bfloat16",
    )
    # Module flags are mutated per measurement; restore the settled
    # defaults on exit so later phases in the same process (onchip_session
    # runs roofline after this) see the production configuration.
    defaults = (csp.INTERLEAVED_STAGING, csp.ALIGNED_STAGING)
    _, variables = init_generator(cfg, jax.random.key(0))
    global BATCH
    prev_batch = BATCH
    # try/finally: onchip_session runs roofline/anatomy AFTER this phase in
    # the same process and its runner swallows exceptions — a failed
    # measure() (e.g. a Mosaic rejection of an experimental codegen) must
    # not leave the module flags on a non-default configuration.
    try:
        # Round-3 settled knobs: interleaved staging on, head fusion off.
        # Current A/B: lane-aligned staging (weight row-block reversal) vs
        # the classic lane-rotating staged-u2s, under both schedules.
        for aligned in (False, True):
            for interleaved in (False, True):
                v = measure(variables, interleaved, False, aligned=aligned)
                print(
                    f"aligned={int(aligned)} interleaved={int(interleaved)}"
                    f" -> {v:8.1f} slices/s",
                    flush=True,
                )
        # strip sweep under the aligned+interleaved config (the round-2
        # optimum was 16 with rotating staging; aligned may shift it).
        for strip in (8, 32):
            v = measure(variables, True, False, aligned=True, strip=strip)
            print(f"aligned=1 interleaved=1 strip={strip} -> {v:8.1f} "
                  f"slices/s", flush=True)
        # batch sweep: 256 was the round-2 optimum; check the amortisation
        # curve hasn't moved past it.
        for batch in (512,):
            BATCH = batch
            v = measure(variables, True, False, aligned=True)
            print(f"aligned=1 interleaved=1 batch={batch} -> {v:8.1f} "
                  f"slices/s", flush=True)
    finally:
        BATCH = prev_batch
        csp.INTERLEAVED_STAGING, csp.ALIGNED_STAGING = defaults


if __name__ == "__main__":
    main()
