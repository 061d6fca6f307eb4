"""Diagnose the film_residual hw=128 c=64 b=16 on-chip mismatch.

Hypothesis: the 0.0625 max err is a 1-ulp bf16 rounding difference at
|value| in [8, 16) — the kernel rounds per elementwise op while XLA fuses
the reference chain at f32 — not a Mosaic miscompile. Decide by comparing
BOTH against the f32 ground truth: a miscompile shows structured error far
above 1-2 ulp on one side only.

Run (real TPU): python scripts/debug_film.py
"""
from __future__ import annotations

import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from depgan_tpu.ops.film_pallas import film_residual, film_residual_reference

DT = jnp.bfloat16


def main():
    b, hw, c = 16, 128, 64
    ks = jax.random.split(jax.random.key(14), 4)
    h = jax.random.normal(ks[0], (b, hw, hw, c), jnp.float32).astype(DT)
    trunk = jax.random.normal(ks[1], (b, hw, hw, c), jnp.float32).astype(DT)
    gamma = jax.random.normal(ks[2], (b, c), jnp.float32)
    beta = jax.random.normal(ks[3], (b, c), jnp.float32)
    gb, bb = gamma.astype(DT), beta.astype(DT)

    got = np.asarray(jax.jit(film_residual)(h, gb, bb, trunk), np.float32)
    ref = np.asarray(jax.jit(film_residual_reference)(h, gb, bb, trunk),
                     np.float32)

    # f32 ground truth with bf16 inputs (the exact math both approximate).
    f32 = lambda a: np.asarray(a, np.float32)
    truth = f32(trunk) + np.maximum(
        f32(h) * f32(gb)[:, None, None, :] + f32(bb)[:, None, None, :], 0.0)

    for name, out in (("kernel", got), ("xla_ref", ref)):
        err = np.abs(out - truth)
        mag = np.abs(truth)
        ulp = np.maximum(2.0 ** (np.floor(np.log2(np.maximum(mag, 1e-6))) - 7),
                         2.0 ** -133)
        rel_ulp = err / ulp
        i = np.unravel_index(np.argmax(err), err.shape)
        print(f"{name}: max abs err {err.max():.5f} at {i} "
              f"(truth {truth[i]:.4f}), max err/ulp {rel_ulp.max():.2f}, "
              f"n>1.5ulp {(rel_ulp > 1.5).sum()}", flush=True)

    d = np.abs(got - ref)
    i = np.unravel_index(np.argmax(d), d.shape)
    print(f"kernel vs ref: max {d.max():.5f} at {i}, n>0.02 {(d > 0.02).sum()}"
          f" of {d.size}", flush=True)
    # structured? count mismatches per batch element and per row tile
    per_b = (d > 0.02).reshape(b, -1).sum(1)
    print("mismatches per batch:", per_b.tolist(), flush=True)


if __name__ == "__main__":
    main()
