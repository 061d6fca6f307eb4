"""Benchmark: generator inference throughput (256x256 slices/sec/chip).

Measures the flagship DEP-GAN generator forward (the reference's hot
inference path, `DEP-GAN_testing_4fold.py:616-628`) against the
BASELINE.json north-star target of 5,000 slices/sec/chip.

Methodology: the iteration loop runs ON DEVICE via lax.scan with a
data-dependency chain (each step consumes the previous carry), so remote
dispatch latency cannot fake throughput; per-iteration time is the
difference of two scan lengths, cancelling the single-dispatch overhead.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import time

BASELINE_SLICES_PER_SEC = 5000.0  # BASELINE.json north_star target


def main() -> None:
    import jax
    import jax.numpy as jnp

    from depgan_tpu.config import ModelConfig
    from depgan_tpu.models import init_generator

    from depgan_tpu.ops.fast_gen import FastGenerator

    cfg = ModelConfig(
        image_size=256, first_fm=32, n_input_channels=1,
        compute_dtype="bfloat16",
    )
    model, variables = init_generator(cfg, jax.random.key(0))
    fast = FastGenerator(cfg, variables)  # folded BN + s2d convs, bf16

    batch = 64

    def forward_scan(weights, x, zs):
        def body(carry, z):
            y = fast._forward(weights, carry, z)
            # tanh keeps the chain algebraically irreducible; the final
            # scalar is fetched to host, which is the only operation the
            # remote runtime genuinely blocks on.
            return jnp.tanh(carry + 1e-12 * y), jnp.sum(y)

        _, sums = jax.lax.scan(body, x, zs)
        return jnp.sum(sums)

    variables = fast.weights

    fns = {n: jax.jit(forward_scan) for n in (4, 24)}
    x = jax.random.uniform(jax.random.key(0), (batch, 256, 256, 1))
    times = {}
    for n, fn in fns.items():
        zs = jax.random.normal(jax.random.key(1), (n, batch, 32, 1))
        float(fn(variables, x, zs))  # compile + execute
        reps = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(fn(variables, x, zs))
            reps.append(time.perf_counter() - t0)
        times[n] = min(reps)

    per_iter = (times[24] - times[4]) / 20.0
    slices_per_sec = batch / per_iter
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
