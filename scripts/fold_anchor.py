"""Measured 4-fold training anchor on the real chip (VERDICT r2 item 9).

Runs the REAL GanTrainer.fit_fold (use_pallas, bf16) on a synthetic fold of
reference size — 4,800 train slices at 256x256 (SURVEY §6; reference
`...twoCritics_training_4fold.py:36-43` trains 200 epochs x 4 folds, batch
16, D=5, warm-up D=100) — for two epochs, and extrapolates the full
schedule from measured quantities only:

- epoch 2 wall => steady-state superstep cost s5 (all D=5),
- epoch 1 wall => warm-up superstep cost s100 (its first 25 supersteps run
  D=100, reference :792-797),
- the exact warm-up recurrence (every 500 gen iters) is counted over the
  200-epoch schedule.

Completion is forced per epoch by fetching a dependent scalar from the
state (docs/PERF.md: block_until_ready lies on this backend).

Run (real TPU): python scripts/fold_anchor.py [n_slices] [epochs_total]
"""
from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from depgan_tpu.config import DataConfig, GanTrainConfig, ModelConfig
from depgan_tpu.train import Counters, GanTrainer

N_SLICES = int(sys.argv[1]) if len(sys.argv) > 1 else 4800
EPOCHS_TOTAL = int(sys.argv[2]) if len(sys.argv) > 2 else 200
IMG = 256


def main():
    float(jax.jit(lambda v: (v @ v).sum())(jnp.ones((128, 128))))
    print(f"backend: {jax.default_backend()}  n={N_SLICES}", flush=True)

    mcfg = ModelConfig(image_size=IMG, first_fm=32, n_input_channels=1,
                      compute_dtype="bfloat16", use_pallas=True)
    tcfg = GanTrainConfig(batch_size=16, d_iters=5, warmup_d_iters=100,
                          warmup_until=25, warmup_every=500,
                          validate_every=100_000, checkpoint_every=10 ** 9)
    trainer = GanTrainer(mcfg, tcfg, DataConfig())
    state = trainer.init_state(jax.random.key(0))
    counters = Counters()

    rng = np.random.default_rng(0)
    x = rng.uniform(0, 1, (N_SLICES, IMG, IMG, 1)).astype(np.float32)
    y = rng.uniform(0, 1, (N_SLICES, IMG, IMG, 1)).astype(np.float32)
    xv = x[:64]
    yv = y[:64]

    def fetch(state):
        return float(jnp.sum(jax.tree.leaves(state.g_params)[0]))

    walls = []
    for epoch in (1, 2):
        t0 = time.time()
        state, counters = trainer.fit_fold(
            state, counters, x, y, xv, yv, n_epochs=1, fold=1, seed=7)
        fetch(state)
        walls.append(time.time() - t0)
        print(f"epoch {epoch}: {walls[-1]:.1f}s "
              f"(gen_iters={counters.gen_iterations})", flush=True)

    n_batches = N_SLICES // 16
    steps_per_epoch = (n_batches + 4) // 5  # D=5 supersteps (+ tail)
    warm_e1 = min(25, steps_per_epoch)
    e1, e2 = walls
    s5 = e2 / steps_per_epoch
    s100 = (e1 - (steps_per_epoch - warm_e1) * s5) / warm_e1
    # NOTE epoch 1's wall includes the two superstep compiles (D=100, D=5);
    # s100 therefore overestimates — the projection is conservative.

    total_steps = EPOCHS_TOTAL * steps_per_epoch
    # warm-up recurrence: gen iters 0..24, plus every multiple of 500.
    rewarms = sum(1 for gi in range(25, total_steps) if gi % 500 == 0)
    warm_steps = 25 + rewarms
    fold_s = (total_steps - warm_steps) * s5 + warm_steps * s100
    print(f"\nsteady superstep s5 = {s5 * 1e3:.0f} ms; warm (D=100, incl. "
          f"compile) s100 = {s100:.1f} s", flush=True)
    print(f"per-fold {EPOCHS_TOTAL}-epoch projection: {fold_s / 3600:.2f} h",
          flush=True)
    print(f"4-fold sequential (1 chip): {4 * fold_s / 3600:.2f} h", flush=True)
    print(f"4-fold fold-parallel (4 chips): {fold_s / 3600:.2f} h", flush=True)
    print(f"4-fold fold+2-way-data-parallel (v4-8, measured DP overhead "
          f"curve docs/PERF.md): ~{fold_s / 2 / 3600:.2f} h", flush=True)


if __name__ == "__main__":
    main()
