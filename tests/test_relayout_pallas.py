"""Pallas relayout kernels (pool / entry-pack / pad-concat) vs XLA refs."""

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from depgan_tpu.ops import s2d_conv as S
from depgan_tpu.ops.conv_s2d_pallas import (
    entry_pack,
    pad_concat_pallas,
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


def test_pad_concat(rng):
    up = jnp.asarray(rng.normal(size=(2, 8, 8, 12)).astype(np.float32))
    skip_px = jnp.asarray(rng.normal(size=(2, 16, 16, 2)).astype(np.float32))
    skip = pad_s2d(S.s2d_unshifted(skip_px))
    out = pad_concat_pallas(up, skip)
    ref = S.concat_s2d(pad_s2d(up), skip)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
    # And semantically: d2s of interior == pixel concat.
    px = S.d2s(unpad_s2d(out))
    ref_px = jnp.concatenate([S.d2s(up), skip_px], axis=-1)
    np.testing.assert_array_equal(np.asarray(px), np.asarray(ref_px))
