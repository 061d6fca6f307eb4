"""Benchmark: generator inference throughput (256x256 slices/sec/chip).

Measures the flagship DEP-GAN generator forward (the reference's hot
inference path, `DEP-GAN_testing_4fold.py:616-628`) through the optimised
FastGenerator (folded BatchNorm, bfloat16 trunk, matmul deconvs —
ops/fast_gen.py) against the BASELINE.json north-star target of 5,000
slices/sec/chip.

Methodology: the iteration loop runs ON DEVICE via lax.scan with a
data-dependency chain and the result is fetched to host (the only operation
the remote runtime genuinely blocks on), so dispatch latency cannot fake
throughput. Single-dispatch overhead (~20 ms) is amortised over the scan.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import time

BASELINE_SLICES_PER_SEC = 5000.0  # BASELINE.json north_star target
N_SCAN = 8
BATCH = 64


def main() -> None:
    import jax
    import jax.numpy as jnp

    from depgan_tpu.config import ModelConfig
    from depgan_tpu.models import init_generator
    from depgan_tpu.ops.fast_gen import FastGenerator

    # First jit in a fresh process absorbs the backend/session init (can be
    # minutes through a remote tunnel); do it on a trivial graph so the real
    # compile below is fast.
    float(jax.jit(lambda v: (v @ v).sum())(jnp.ones((128, 128))))

    cfg = ModelConfig(
        image_size=256, first_fm=32, n_input_channels=1,
        compute_dtype="bfloat16",
    )
    _, variables = init_generator(cfg, jax.random.key(0))
    # Fused Pallas s2d path at the two highest-resolution levels: conv+FiLM
    # epilogues and the pool/concat relayouts all run in VMEM, and the pool
    # between levels 1 and 2 emits the next level's layout directly
    # (see docs/PERF.md).
    fast = FastGenerator(cfg, variables, s2d_levels=(), pallas_levels=(1, 2))

    @jax.jit
    def forward_scan(weights, x, zs):
        def body(carry, z):
            y = fast._forward(weights, carry, z)
            # tanh keeps the chain algebraically irreducible and forces
            # sequential execution of the scan steps.
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
    dt = min(reps)

    slices_per_sec = N_SCAN * BATCH / dt
    print(
        json.dumps(
            {
                "metric": "gen_inference_throughput",
                "value": round(slices_per_sec, 1),
                "unit": "256x256_slices/sec/chip",
                "vs_baseline": round(slices_per_sec / BASELINE_SLICES_PER_SEC, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
