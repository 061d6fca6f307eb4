"""Benchmark workloads behind ``depgan bench`` and the repo-root bench.py.

Measures the two hot paths of the reference on the current backend:

- ``gen_inference_bench`` — the stochastic-ensemble generator forward
  (reference `DEP-GAN_testing_4fold.py:616-628`) through the fused
  FastGenerator, in 256x256 slices/sec/chip against the BASELINE.json
  north-star target.
- ``gan_step_bench`` — the full two-critic WGAN-GP superstep
  (reference `...twoCritics_training_4fold.py:780-894`), in ms/superstep.

Remote-backend measurement rules (docs/PERF.md): the iteration loop runs on
device; timings only ever bracket the fetch of a *dependent scalar* — the
one operation the tunnel genuinely blocks on.
"""

from __future__ import annotations

import time

BASELINE_SLICES_PER_SEC = 5000.0  # BASELINE.json north_star target


def _warmup_backend():
    """Absorb the one-time backend/session init (can be minutes through a
    remote tunnel) on a trivial graph so the real compile below is fast."""
    import jax
    import jax.numpy as jnp

    float(jax.jit(lambda v: (v @ v).sum())(jnp.ones((128, 128))))


def gen_inference_bench(n_scan: int = 32, batch: int = 512) -> dict:
    import jax
    import jax.numpy as jnp

    from .config import ModelConfig
    from .models import init_generator
    from .ops.fast_gen import FastGenerator

    _warmup_backend()

    cfg = ModelConfig(
        image_size=256, first_fm=32, n_input_channels=1,
        compute_dtype="bfloat16",
    )
    _, variables = init_generator(cfg, jax.random.key(0))
    # Fused Pallas s2d path at the two highest-resolution levels: conv+FiLM
    # epilogues and the pool/concat relayouts all run in VMEM, and the pool
    # between levels 1 and 2 emits the next level's layout directly
    # (see docs/PERF.md). Batch: 64 -> 256 amortises per-kernel overheads
    # ~18% (measured round 2); 256 -> 512 is a further +1.4% (round-5
    # ab_inference: 2884 vs 2844 slices/s) and is the default. A single
    # subject's ensemble supplies 420 slices (42 slices x 10 noise
    # repeats), so batch 512 corresponds to a server batching two
    # in-flight subjects; the per-subject-batch (256) number is within
    # 1.4% — both are recorded in docs/PERF.md.
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

    x = jax.random.uniform(jax.random.key(0), (batch, 256, 256, 1))
    zs = jax.random.normal(jax.random.key(1), (n_scan, batch, 32, 1))
    float(forward_scan(fast.weights, x, zs))  # compile + first run

    reps = []
    for _ in range(4):
        t0 = time.perf_counter()
        float(forward_scan(fast.weights, x, zs))
        reps.append(time.perf_counter() - t0)
    dt = min(reps)

    slices_per_sec = n_scan * batch / dt
    return {
        "metric": "gen_inference_throughput",
        "value": round(slices_per_sec, 1),
        "unit": "256x256_slices/sec/chip",
        "vs_baseline": round(slices_per_sec / BASELINE_SLICES_PER_SEC, 3),
    }


def uresnet_inference_bench(n_scan: int = 32, batch: int = 256) -> dict:
    """Serving throughput of the supervised DEP-UResNet (4-class softmax
    head) through the same FastGenerator path and measurement methodology
    as gen_inference_bench — VERDICT r4 item 9. Reference hot loop:
    DEP-UResNet_testing_4fold.py:552-564 (10x stochastic ensemble of
    model.predict over each subject's slices)."""
    import jax
    import jax.numpy as jnp

    from .config import ModelConfig
    from .models import init_generator
    from .ops.fast_gen import FastGenerator

    _warmup_backend()

    cfg = ModelConfig(
        image_size=256, first_fm=32, n_input_channels=1, n_out=4,
        dropout_mode="uresnet", compute_dtype="bfloat16",
    )
    _, variables = init_generator(cfg, jax.random.key(0))
    fast = FastGenerator(cfg, variables, s2d_levels=(), pallas_levels=(1, 2))

    @jax.jit
    def forward_scan(weights, x, zs):
        def body(carry, z):
            y = fast._forward(weights, carry, z)
            return jnp.tanh(carry + 1e-12 * y[..., :1]), jnp.sum(y)

        _, sums = jax.lax.scan(body, x, zs)
        return jnp.sum(sums)

    x = jax.random.uniform(jax.random.key(0), (batch, 256, 256, 1))
    zs = jax.random.normal(jax.random.key(1), (n_scan, batch, 32, 1))
    float(forward_scan(fast.weights, x, zs))

    reps = []
    for _ in range(4):
        t0 = time.perf_counter()
        float(forward_scan(fast.weights, x, zs))
        reps.append(time.perf_counter() - t0)
    dt = min(reps)

    slices_per_sec = n_scan * batch / dt
    return {
        "metric": "uresnet_inference_throughput",
        "value": round(slices_per_sec, 1),
        "unit": "256x256_slices/sec/chip",
        "vs_baseline": round(slices_per_sec / BASELINE_SLICES_PER_SEC, 3),
    }


def gan_step_bench(batch: int = 16, d_iters: int = 5, k_noise: int = 10,
                   image_size: int = 256, use_pallas: bool = False) -> dict:
    """Wall time of one jitted two-critic superstep (D critic updates per
    critic + best-of-k probe + generator update), bf16 trunk.
    ``use_pallas`` routes all generator passes (critic loops, probe, and
    the generator's own gradient) through the fused folded-BN s2d path."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from .config import DataConfig, GanTrainConfig, ModelConfig
    from .train import GanTrainer

    _warmup_backend()

    model_cfg = ModelConfig(
        image_size=image_size, first_fm=32, n_input_channels=1,
        compute_dtype="bfloat16", use_pallas=use_pallas,
    )
    train_cfg = GanTrainConfig(
        batch_size=batch, d_iters=d_iters, warmup_d_iters=d_iters,
        k_noise=k_noise, validate_every=10_000,
    )
    trainer = GanTrainer(model_cfg, train_cfg, DataConfig())
    state = trainer.init_state(jax.random.key(0))

    rng = np.random.default_rng(0)
    n = 8 * batch
    x_all = jnp.asarray(rng.uniform(0, 1, (n, image_size, image_size, 1)), jnp.float32)
    y_all = jnp.asarray(rng.uniform(0, 1, (n, image_size, image_size, 1)), jnp.float32)
    idx = np.arange(d_iters * batch, dtype=np.int32).reshape(d_iters, batch)

    def run(s, key):
        s, metrics = trainer.superstep(s, x_all, y_all, idx, d_iters, key)
        # dependent scalar fetch = the only genuine completion barrier
        float(jnp.asarray(metrics["gen"]["errG"]))
        return s

    state = run(state, jax.random.key(1))  # compile + first run
    reps = []
    for i in range(3):
        t0 = time.perf_counter()
        state = run(state, jax.random.key(2 + i))
        reps.append(time.perf_counter() - t0)
    ms = min(reps) * 1e3
    return {
        "metric": "gan_superstep_wall",
        "value": round(ms, 1),
        "unit": "ms/superstep",
        # PERF.md round-1 measurement on this hardware (922 ms, bf16 b16).
        "vs_baseline": round(922.0 / ms, 3),
    }
