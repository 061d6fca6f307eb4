"""Find the fit_fold wall gap: superstep cost vs fold-array size.

Round-4 anchor finding (fold_anchor.py, post-chunking): the steady
superstep costs ~2.8 s/step even when 25 of them run inside ONE jitted
scan dispatch — so the round-3 attribution of the 3.3 s wall to dispatch
MARSHALING was wrong; the cost is on-device and scales with the critic
iteration count (warm D=100 pays ~22 s extra vs steady's ~2.2 s, i.e.
~0.2 s per critic iteration). The only structural difference from the
607 ms isolated bench (benchmarks.gan_step_bench) is the fold array the
batch gathers index: 128 slices (33 MB) in the bench vs 4,800 slices
(1.26 GB f32) in training.

This probe holds EVERYTHING else fixed and varies:
  - n_slices: 128 vs 4800
  - storage dtype of the fold arrays: f32 vs bf16
  - index pattern: arange rows vs shuffled rows
  - dispatch: single superstep vs chunk scan (L=10, all active)
  - gather style: fold-array indexing (production) vs PRE-GATHERED
    batches passed directly (no on-device gather at all)

Run (real TPU): python scripts/wall_gap_probe.py [n_slices,n_slices,...]
(default "128,4800")
"""
from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from depgan_tpu.config import DataConfig, GanTrainConfig, ModelConfig
from depgan_tpu.train import GanTrainer

B, D, IMG = 16, 5, 256


def fetch_errg(metrics):
    return float(jnp.asarray(metrics["gen"]["errG"]))


def main():
    float(jax.jit(lambda v: (v @ v).sum())(jnp.ones((128, 128))))
    print(f"backend: {jax.default_backend()}", flush=True)

    model_cfg = ModelConfig(image_size=IMG, first_fm=32, n_input_channels=1,
                            compute_dtype="bfloat16", use_pallas=True)
    train_cfg = GanTrainConfig(batch_size=B, d_iters=D, warmup_d_iters=D,
                               k_noise=10, validate_every=10_000)
    trainer = GanTrainer(model_cfg, train_cfg, DataConfig())
    rng = np.random.default_rng(0)

    def one(tag, state, x_all, y_all, idx):
        state, m = trainer.superstep(state, x_all, y_all, idx, D,
                                     jax.random.key(1))
        fetch_errg(m)
        reps = []
        for i in range(3):
            t0 = time.perf_counter()
            state, m = trainer.superstep(state, x_all, y_all, idx, D,
                                         jax.random.key(2 + i))
            fetch_errg(m)
            reps.append(time.perf_counter() - t0)
        print(f"{tag:58s} {min(reps) * 1e3:8.1f} ms/superstep", flush=True)
        return state

    def chunked(tag, state, x_all, y_all, idx, L=10):
        idxs = jnp.asarray(np.broadcast_to(idx, (L,) + idx.shape).copy())
        nv = jnp.full((L,), D, jnp.int32)
        act = jnp.ones((L,), bool)
        step = trainer._chunk_step(D, L)

        def run(state, key):
            state, key, vecs = step(state, x_all, y_all, idxs, nv, act, key)
            float(jnp.sum(vecs))
            return state

        state = run(state, jax.random.key(1))
        reps = []
        for i in range(3):
            t0 = time.perf_counter()
            state = run(state, jax.random.key(2 + i))
            reps.append(time.perf_counter() - t0)
        print(f"{tag:58s} {min(reps) / L * 1e3:8.1f} ms/superstep "
              f"(chunk of {L})", flush=True)
        return state

    n_list = (tuple(int(s) for s in sys.argv[1].split(","))
              if len(sys.argv) > 1 else (128, 4800))
    for n in n_list:
        x = rng.uniform(0, 1, (n, IMG, IMG, 1)).astype(np.float32)
        y = rng.uniform(0, 1, (n, IMG, IMG, 1)).astype(np.float32)
        idx_seq = np.arange(D * B, dtype=np.int32).reshape(D, B)
        idx_rand = rng.permutation(n)[: D * B].astype(np.int32).reshape(D, B)
        xj, yj = jnp.asarray(x), jnp.asarray(y)
        # fresh state per n: the superstep DONATES argnum 0, so a state
        # from a previous leg is a deleted buffer.
        state = trainer.init_state(jax.random.key(0))
        state = one(f"n={n} f32 arange-idx single", state, xj, yj, idx_seq)
        state = one(f"n={n} f32 shuffled-idx single", state, xj, yj, idx_rand)
        state = chunked(f"n={n} f32 shuffled-idx", state, xj, yj, idx_rand)
        xb, yb = jnp.asarray(x, jnp.bfloat16), jnp.asarray(y, jnp.bfloat16)
        try:
            state = one(f"n={n} bf16 shuffled-idx single", state, xb, yb,
                        idx_rand)
        except Exception as e:
            print(f"bf16 storage variant failed: {e}", flush=True)

    # No-gather reference: batches pre-gathered on host, fold array tiny.
    xg = jnp.asarray(rng.uniform(0, 1, (D * B, IMG, IMG, 1)), jnp.float32)
    yg = jnp.asarray(rng.uniform(0, 1, (D * B, IMG, IMG, 1)), jnp.float32)
    one("pre-gathered (n=D*B, arange)", trainer.init_state(jax.random.key(0)),
        xg, yg, np.arange(D * B, dtype=np.int32).reshape(D, B))


if __name__ == "__main__":
    main()
