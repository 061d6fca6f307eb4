"""Measured 4-fold training anchor on the real chip (VERDICT r2 item 9).

Runs the REAL GanTrainer.fit_fold (use_pallas, bf16) on a synthetic fold of
reference size — 4,800 train slices at 256x256 (SURVEY §6; reference
`...twoCritics_training_4fold.py:36-43` trains 200 epochs x 4 folds, batch
16, D=5, warm-up D=100) — and extrapolates the full schedule from measured
quantities only. Two measurement phases, each 2 epochs (epoch 1 absorbs
that phase's superstep compile, epoch 2 is the measurement):

- steady phase: counters seeded PAST warm-up (gen_iterations = warmup_until)
  so every superstep runs D=5  => s5 = epoch2_wall / supersteps_per_epoch;
- warm phase: fresh counters, so the epoch is D=100 supersteps (at the
  default sizes warm-up spans ~8 epochs: 300 batches/epoch at 100 batches
  per warm superstep = 3 supersteps, gen_iterations reaches only 6 by the
  end of epoch 2) => s100 solved from epoch2_wall with the exact per-epoch
  warm/steady step counts (schedule simulator below), using s5 for any
  steady steps that slip into the epoch at non-default sizes.

The projection then prices the reference's EXACT schedule — warm-up while
gen_iterations < 25 plus the every-500-gen-iters re-warm, epoch tails
masked — by simulating the counter evolution over all 200 epochs.

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


def epoch_schedule(tcfg, n_batches: int, gi0: int, n_epochs: int):
    """Simulate the counter evolution (gan_trainer._d_iters_for + the
    while-i<n_batches superstep loop of fit_fold) and return per-epoch
    (n_warm, n_steady) superstep counts. A masked epoch-tail superstep
    still executes its full D iterations (lax.scan with a valid mask), so
    it is priced as a full superstep of its class."""
    gi = gi0
    out = []
    for _ in range(n_epochs):
        warm = steady = 0
        i = 0
        while i < n_batches:
            if gi < tcfg.warmup_until or gi % tcfg.warmup_every == 0:
                d, cls = tcfg.warmup_d_iters, "warm"
            else:
                d, cls = tcfg.d_iters, "steady"
            i += min(d, n_batches - i)
            gi += 1
            if cls == "warm":
                warm += 1
            else:
                steady += 1
        out.append((warm, steady))
    return out, gi


def main():
    float(jax.jit(lambda v: (v @ v).sum())(jnp.ones((128, 128))))
    print(f"backend: {jax.default_backend()}  n={N_SLICES}", flush=True)

    mcfg = ModelConfig(image_size=IMG, first_fm=32, n_input_channels=1,
                      compute_dtype="bfloat16", use_pallas=True)
    tcfg = GanTrainConfig(batch_size=16, d_iters=5, warmup_d_iters=100,
                          warmup_until=25, warmup_every=500,
                          validate_every=100_000, checkpoint_every=10 ** 9)
    trainer = GanTrainer(mcfg, tcfg, DataConfig())
    n_batches = N_SLICES // tcfg.batch_size

    rng = np.random.default_rng(0)
    x = rng.uniform(0, 1, (N_SLICES, IMG, IMG, 1)).astype(np.float32)
    y = rng.uniform(0, 1, (N_SLICES, IMG, IMG, 1)).astype(np.float32)
    # Device-put ONCE: fit_fold's jnp.asarray is then a no-op, matching the
    # production call pattern (one fit_fold call for all 200 epochs = one
    # upload). Per-epoch host->device re-transfer of the 2.5 GB fold through
    # the tunnel costs ~116 s/epoch and inflated the round-4 first anchor to
    # 2.51 s/superstep vs the true 575 ms (wall_gap_probe agreement).
    t_up = time.time()
    x = jax.device_put(jnp.asarray(x))
    y = jax.device_put(jnp.asarray(y))
    float(jnp.sum(x[0]) + jnp.sum(y[0]))  # force the transfer (PERF.md rules)
    print(f"fold upload (2x{x.nbytes / 1e9:.2f} GB): {time.time() - t_up:.1f}s",
          flush=True)
    xv, yv = x[:64], y[:64]

    def fetch(state):
        return float(jnp.sum(jax.tree.leaves(state.g_params)[0]))

    def run_phase(name, gi0: int):
        """Two epochs from gen_iterations=gi0; returns epoch-2 wall and the
        epoch-2 (n_warm, n_steady) counts."""
        state = trainer.init_state(jax.random.key(0))
        counters = Counters(gen_iterations=gi0)
        sched, _ = epoch_schedule(tcfg, n_batches, gi0, 2)
        walls = []
        for epoch in (1, 2):
            t0 = time.time()
            state, counters = trainer.fit_fold(
                state, counters, x, y, xv, yv, n_epochs=1, fold=1, seed=7)
            fetch(state)
            walls.append(time.time() - t0)
            w, s = sched[epoch - 1]
            print(f"{name} epoch {epoch}: {walls[-1]:.1f}s "
                  f"({w} warm + {s} steady supersteps, "
                  f"gen_iters={counters.gen_iterations})", flush=True)
        return walls[1], sched[1]

    # Steady phase first: its s5 feeds the warm phase's solve. Seeding
    # gen_iterations=warmup_until skips warm-up; no re-warm is crossed in
    # 2 epochs at the default sizes (25 + 120 supersteps < 500).
    e2_steady, (w_s, s_s) = run_phase("steady", tcfg.warmup_until)
    if w_s:
        print(f"WARNING: steady phase crossed {w_s} re-warm steps — "
              f"s5 slightly overestimated", flush=True)
    s5 = e2_steady / (w_s * (tcfg.warmup_d_iters / tcfg.d_iters) + s_s)

    e2_warm, (w_w, s_w) = run_phase("warm", 0)
    if w_w == 0:
        raise SystemExit("warm phase epoch 2 ran no warm supersteps — "
                         "increase n_slices or lower warmup_until")
    s100 = max(e2_warm - s_w * s5, 0.0) / w_w

    # Price the full reference schedule by exact simulation.
    sched, gi_end = epoch_schedule(tcfg, n_batches, 0, EPOCHS_TOTAL)
    n_warm = sum(w for w, _ in sched)
    n_steady = sum(s for _, s in sched)
    fold_s = n_warm * s100 + n_steady * s5
    print(f"\nsteady superstep s5 = {s5 * 1e3:.0f} ms; warm superstep "
          f"(D=100) s100 = {s100:.2f} s", flush=True)
    print(f"schedule: {n_warm} warm + {n_steady} steady supersteps over "
          f"{EPOCHS_TOTAL} epochs ({gi_end} gen iters)", flush=True)
    print(f"per-fold {EPOCHS_TOTAL}-epoch projection: {fold_s / 3600:.2f} h",
          flush=True)
    # Sequential 4-fold keeps the counters running across folds (the
    # faithful reference quirk, config.py reset_counters_per_fold=False),
    # so folds 2-4 skip the initial warm-up; fold-parallel resets per fold.
    sched4, _ = epoch_schedule(tcfg, n_batches, 0, 4 * EPOCHS_TOTAL)
    seq_s = (sum(w for w, _ in sched4) * s100
             + sum(s for _, s in sched4) * s5)
    print(f"4-fold sequential (1 chip, continuous counters): "
          f"{seq_s / 3600:.2f} h", flush=True)
    print(f"4-fold fold-parallel (4 chips): {fold_s / 3600:.2f} h", flush=True)
    print(f"4-fold fold+2-way-data-parallel (v4-8, measured DP overhead "
          f"curve docs/PERF.md): ~{fold_s / 2 / 3600:.2f} h", flush=True)


if __name__ == "__main__":
    main()
