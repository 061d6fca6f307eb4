"""Pallas relayout kernels (pool / entry-pack / deconv) vs XLA refs."""

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from depgan_tpu.ops import s2d_conv as S
from depgan_tpu.ops.conv_s2d_pallas import (
    deconv_s2d_pallas,
    entry_pack,
    pad_s2d,
    pool_s2d_pallas,
    unpad_s2d,
)


def test_pool_matches_max_pool(rng):
    x = jnp.asarray(rng.normal(size=(2, 16, 16, 8)).astype(np.float32))
    padded = pad_s2d(S.s2d_unshifted(x))
    out = pool_s2d_pallas(padded)
    ref = nn.max_pool(x, (2, 2), (2, 2))
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_entry_pack(rng):
    x = jnp.asarray(rng.normal(size=(2, 16, 16, 2)).astype(np.float32))
    out = entry_pack(x, c_pad=4)
    # Reference: zero-pad channels to 4 per group, s2d, pad ring.
    xp = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, 2)))
    ref = pad_s2d(S.s2d_unshifted(xp))
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_pool_to_s2d_emits_next_level_layout(rng):
    from depgan_tpu.ops.conv_s2d_pallas import pool_to_s2d_pallas

    x = jnp.asarray(rng.normal(size=(2, 16, 16, 8)).astype(np.float32))
    padded = pad_s2d(S.s2d_unshifted(x))  # level-L layout, N=8
    out = pool_to_s2d_pallas(padded)      # level-(L+1) layout, N=4
    pooled = nn.max_pool(x, (2, 2), (2, 2))  # (2, 8, 8, 8) pixel
    ref = pad_s2d(S.s2d_unshifted(pooled))
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_deconv_s2d_matches_deconv2x2(rng):
    """deconv_s2d_pallas on the padded-s2d input == Deconv2x2 + ReLU in the
    pixel domain, re-laid-out to the upsampled level's padded s2d."""
    from depgan_tpu.ops.fast_gen import _deconv_matmul

    c_in, o = 6, 3
    x_px = jnp.asarray(rng.normal(size=(2, 8, 8, c_in)).astype(np.float32))
    kernel = jnp.asarray(0.3 * rng.normal(size=(2, 2, o, c_in)).astype(np.float32))
    bias = jnp.asarray(0.1 * rng.normal(size=(o,)).astype(np.float32))

    x_padded = pad_s2d(S.s2d_unshifted(x_px))  # (2, 6, 6, 4*c_in)
    w2 = jnp.transpose(kernel, (3, 0, 1, 2)).reshape(c_in, 4 * o)
    out = deconv_s2d_pallas(x_padded, w2, jnp.tile(bias, 4))

    ref_s2d = jax.nn.relu(_deconv_matmul(x_px, kernel, bias))  # unshifted s2d
    np.testing.assert_allclose(
        np.asarray(unpad_s2d(out)), np.asarray(ref_s2d), atol=1e-5
    )
    np.testing.assert_array_equal(np.asarray(out[:, 0]), 0.0)  # zero ring
