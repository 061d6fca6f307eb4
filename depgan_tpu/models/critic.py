"""Dis_C2D_FCN1 — the WGAN-GP critic (`...twoCritics_training_4fold.py:316-345`).

Fully-convolutional, deliberately BatchNorm-free (a WGAN-GP requirement: the
gradient penalty is computed per-example and BN would couple examples),
plain ReLU activations:

conv5x5(16)x2 -> pool -> conv5x5(32)x2 -> pool -> conv3x3(64)x2 -> pool ->
conv3x3(128)x2 -> pool -> conv3x3(256)x3 -> conv1x1(1) -> flatten ->
dense(1) scalar score.

Two independent instances are trained: one judging fake follow-up images
(Y2), one judging fake disease evolution maps (DEM) — reference :513-517.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from ..config import ModelConfig
from .blocks import ConvRelu, he_normal, max_pool_2x2


class DisC2DFCN1(nn.Module):
    """Critic: (B, H, W, 1) -> (B, 1) unnormalised Wasserstein score."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        dt = self.dtype
        x = x.astype(dt)
        x = ConvRelu(16, 5, "dis_0a", dt, name="block_dis_0a")(x)
        x = ConvRelu(16, 5, "dis_0b", dt, name="block_dis_0b")(x)
        x = max_pool_2x2(x)
        x = ConvRelu(32, 5, "dis_1a", dt, name="block_dis_1a")(x)
        x = ConvRelu(32, 5, "dis_1b", dt, name="block_dis_1b")(x)
        x = max_pool_2x2(x)
        x = ConvRelu(64, 3, "dis_2", dt, name="block_dis_2")(x)
        x = ConvRelu(64, 3, "dis_3", dt, name="block_dis_3")(x)
        x = max_pool_2x2(x)
        x = ConvRelu(128, 3, "dis_4", dt, name="block_dis_4")(x)
        x = ConvRelu(128, 3, "dis_5", dt, name="block_dis_5")(x)
        x = max_pool_2x2(x)
        x = ConvRelu(256, 3, "dis_6", dt, name="block_dis_6")(x)
        x = ConvRelu(256, 3, "dis_7", dt, name="block_dis_7")(x)
        x = ConvRelu(256, 3, "dis_8", dt, name="block_dis_8")(x)
        # 1x1 conv with he_normal init, Keras layer name 'dis_9'
        # (reference :339).
        x = nn.Conv(1, (1, 1), kernel_init=he_normal, dtype=dt, name="dis_9")(x)
        x = x.reshape(x.shape[0], -1)  # Flatten (reference :341)
        score = nn.Dense(1, kernel_init=he_normal, dtype=dt, name="dis_dense")(x)
        return score.astype(jnp.float32)


def make_critic(cfg: ModelConfig) -> DisC2DFCN1:
    return DisC2DFCN1(dtype=jnp.dtype(cfg.compute_dtype))


def init_critic(cfg: ModelConfig, rng, batch: int = 1):
    model = make_critic(cfg)
    x = jnp.zeros((batch, cfg.image_size, cfg.image_size, 1))
    variables = model.init({"params": rng}, x)
    return model, variables
