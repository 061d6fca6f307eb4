"""Measured UResNet training-epoch anchor on the real chip (VERDICT r3
item 6).

Runs the REAL UResNetTrainer.fit on a synthetic fold of reference size —
4,800 train slices at 256x256, batch 16 (the reference trains 200 epochs
x 4 folds, `DEP-UResNet-wNoises-training-4fold.py:434-626`) — for 3
epochs: epoch 1 absorbs the chunk-program compiles, epochs 2-3 are the
measurement. Extrapolates the 200-epoch fold wall and the 4-fold
projections from the measured steady epoch only.

Run (real TPU): python scripts/uresnet_anchor.py [n_slices] [epochs]
"""
from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

import jax
import numpy as np

from depgan_tpu.config import ModelConfig, UResNetTrainConfig
from depgan_tpu.train.uresnet_trainer import UResNetTrainer

N_SLICES = int(sys.argv[1]) if len(sys.argv) > 1 else 4800
EPOCHS = int(sys.argv[2]) if len(sys.argv) > 2 else 3
IMG = 256


def main():
    import jax.numpy as jnp

    float(jax.jit(lambda v: (v @ v).sum())(jnp.ones((128, 128))))
    print(f"backend: {jax.default_backend()}  n={N_SLICES}", flush=True)

    mcfg = ModelConfig(image_size=IMG, first_fm=32, n_input_channels=1,
                       n_out=4, dropout_mode="uresnet",
                       compute_dtype="bfloat16")
    tcfg = UResNetTrainConfig(batch_size=16, checkpoint_every=10 ** 9)
    trainer = UResNetTrainer(mcfg, tcfg)

    rng = np.random.default_rng(0)
    x = rng.uniform(0, 1, (N_SLICES, IMG, IMG, 1)).astype(np.float32)
    labels = rng.integers(0, 4, (N_SLICES, IMG, IMG, 1)).astype(np.int32)
    xv, yv = x[:64], labels[:64]

    state = trainer.init_state(jax.random.key(0))
    # ONE fit call (per-epoch calls would re-transfer the 2.5 GB fold
    # through the tunnel each time); per-epoch walls parsed from fit's own
    # cumulative "EPOCH k/N ... (T s)" prints.
    import io
    import re
    from contextlib import redirect_stdout

    buf = io.StringIO()

    class Tee(io.TextIOBase):
        def write(self, s):
            buf.write(s)
            sys.__stdout__.write(s)
            sys.__stdout__.flush()
            return len(s)

    with redirect_stdout(Tee()):
        trainer.fit(state, x, labels, xv, yv, n_epochs=EPOCHS)
    cum = [float(m) for m in re.findall(r"\((\d+\.\d)s\)$", buf.getvalue(),
                                        re.MULTILINE)]
    walls = [b - a for a, b in zip([0.0] + cum[:-1], cum)]
    steady = min(walls[1:]) if len(walls) > 1 else walls[0]
    n_batches = N_SLICES // tcfg.batch_size
    print(f"\nsteady epoch: {steady:.1f}s  ({steady / n_batches * 1e3:.0f} "
          f"ms/batch over {n_batches} batches)", flush=True)
    fold_h = steady * 200 / 3600
    print(f"200-epoch fold: {fold_h:.2f} h; 4-fold sequential (1 chip): "
          f"{4 * fold_h:.2f} h; 4-fold fold-parallel (4 chips): "
          f"{fold_h:.2f} h", flush=True)


if __name__ == "__main__":
    main()
