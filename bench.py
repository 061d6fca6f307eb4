"""Benchmark: generator stochastic-ensemble inference throughput.

Measures 256x256 slices/sec/chip through the flagship DEP-GAN generator
(the reference's hot inference path, `DEP-GAN_testing_4fold.py:616-628`),
against the BASELINE.json north-star target of 5,000 slices/sec/chip.

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

    cfg = ModelConfig(
        image_size=256, first_fm=32, n_input_channels=1,
        compute_dtype="bfloat16",
    )
    model, variables = init_generator(cfg, jax.random.key(0))

    batch = 64

    @jax.jit
    def forward(variables, x, z):
        return model.apply(variables, x, z, train=False)

    x = jnp.ones((batch, 256, 256, 1), jnp.float32)
    z = jax.random.normal(jax.random.key(1), (batch, 32, 1))

    # Warm-up / compile.
    forward(variables, x, z).block_until_ready()

    n_iters = 30
    t0 = time.perf_counter()
    for i in range(n_iters):
        out = forward(variables, x, z)
    out.block_until_ready()
    dt = time.perf_counter() - t0

    slices_per_sec = batch * n_iters / dt
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
