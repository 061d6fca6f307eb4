"""Stochastic-ensemble inference engine.

The reference runs 10 forward passes per subject with fresh noise, masks each
with the 2tp ICV∧¬SL mask, and averages (`DEP-GAN_testing_4fold.py:616-628`,
`DEP-UResNet_testing_4fold.py:552-564`) — ten separate ``predict`` calls,
each a host->device round trip. Here the whole ensemble is one jitted call:
``vmap`` over the repeat axis, mask+mean fused on device, so a subject costs
one dispatch regardless of ensemble size.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


class EnsemblePredictor:
    """n_repeat stochastic forward passes, averaged on device.

    ``model.apply(variables, x, z, train=False)`` with x (Z, H, W, C) and
    per-repeat noise z (Z, noise_size, 1); output (Z, H, W, C_out).
    """

    def __init__(self, model, variables, n_repeat: int = 10, noise_size: int = 32,
                 seed: int = 0, fast: bool = False, model_cfg=None):
        self.model = model
        self.variables = variables
        self.n_repeat = n_repeat
        self.noise_size = noise_size
        self._key = jax.random.key(seed)

        if fast:
            # MXU-optimised inference path: folded BN + space-to-depth convs
            # (ops/fast_gen.py); numerically ~1e-3 of the reference module.
            from ..ops.fast_gen import FastGenerator

            assert model_cfg is not None, "fast=True requires model_cfg"
            # Same configuration as bench.py: fused Pallas s2d at the two
            # highest-resolution levels (docs/PERF.md).
            fg = FastGenerator(model_cfg, variables, pallas_levels=(1, 2))
            # The folded weights become the jit ARGUMENT (self.variables),
            # never a closure capture: closure-captured arrays are inlined
            # into the compile payload (remote-backend HTTP 413 risk — the
            # repo's own rule, docs/PERF.md "measurement pitfalls") and the
            # raw Flax variables would otherwise ship as dead traffic too.
            self.variables = fg.weights

            def apply_fn(variables, x, z):
                return fg.forward(variables, x, z)
        else:
            def apply_fn(variables, x, z):
                return self.model.apply(variables, x, z, train=False)

        @partial(jax.jit, static_argnums=())
        def _ensemble(variables, x, noises, mask):
            # lax.map over repeats: one device call, but peak activation
            # memory of a single forward (a vmap would materialise all R
            # forwards' intermediates at 256^2 resolution).
            def single(z):
                return apply_fn(variables, x, z)

            preds = jax.lax.map(single, noises)  # (R, Z, H, W, C_out)
            preds = preds * mask[None, ..., None]
            return jnp.mean(preds, axis=0)  # (Z, H, W, C_out)

        self._ensemble = _ensemble

    def predict(self, x: np.ndarray, mask: np.ndarray) -> np.ndarray:
        """Returns the masked ensemble mean, shape (Z, H, W, C_out).

        ``mask`` is (Z, H, W) — the ICV∧¬SL mask at the 2nd time point.
        """
        n_slices = x.shape[0]
        self._key, sub = jax.random.split(self._key)
        noises = jax.random.normal(
            sub, (self.n_repeat, n_slices, self.noise_size, 1), dtype=jnp.float32
        )
        out = self._ensemble(
            self.variables, jnp.asarray(x), noises, jnp.asarray(mask)
        )
        return np.asarray(out)


def reconstruct_follow_up(y1: np.ndarray, dem: np.ndarray) -> np.ndarray:
    """Fake follow-up = baseline + DEM, clipped to [-1, 1]
    (reference :675-677)."""
    return np.clip(y1 + dem, -1.0, 1.0)
