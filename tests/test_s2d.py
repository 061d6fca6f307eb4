"""Brute-force correctness tests for the space-to-depth conv path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax

from depgan_tpu.ops import s2d_conv as S


def plain_conv3x3(x, w, bias=None):
    y = lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    return y if bias is None else y + bias


class TestLayouts:
    def test_s2d_d2s_roundtrip(self, rng):
        x = jnp.asarray(rng.normal(size=(2, 8, 8, 3)).astype(np.float32))
        np.testing.assert_array_equal(np.asarray(S.d2s(S.s2d_unshifted(x))), np.asarray(x))

    def test_u2s_matches_shifted(self, rng):
        """u2s(unshifted(x)) == shifted(x) — including the zero borders."""
        x = jnp.asarray(rng.normal(size=(2, 8, 8, 3)).astype(np.float32))
        a = S.u2s(S.s2d_unshifted(x))
        b = S.s2d_shifted(x)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_pool_matches_reduce_window(self, rng):
        from flax import linen as nn

        x = jnp.asarray(rng.normal(size=(2, 8, 8, 5)).astype(np.float32))
        ref = nn.max_pool(x, (2, 2), (2, 2))
        out = S.pool2x2_s2d(S.s2d_unshifted(x))
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))

    def test_concat_s2d(self, rng):
        x = jnp.asarray(rng.normal(size=(1, 4, 4, 2)).astype(np.float32))
        y = jnp.asarray(rng.normal(size=(1, 4, 4, 3)).astype(np.float32))
        cat = S.concat_s2d(S.s2d_unshifted(x), S.s2d_unshifted(y))
        ref = S.s2d_unshifted(jnp.concatenate([x, y], axis=-1))
        np.testing.assert_array_equal(np.asarray(cat), np.asarray(ref))

    def test_tile_channel_params(self):
        v = jnp.asarray([1.0, 2.0])
        np.testing.assert_array_equal(
            np.asarray(S.tile_channel_params(v)), [1, 2, 1, 2, 1, 2, 1, 2]
        )


class TestS2dConv:
    @pytest.mark.parametrize("ci,co,n", [(3, 5, 4), (1, 4, 8), (8, 8, 6)])
    def test_matches_plain_conv(self, rng, ci, co, n):
        x = jnp.asarray(rng.normal(size=(2, 2 * n, 2 * n, ci)).astype(np.float32))
        w = rng.normal(size=(3, 3, ci, co)).astype(np.float32)
        b = rng.normal(size=(co,)).astype(np.float32)
        ref = plain_conv3x3(x, jnp.asarray(w), jnp.asarray(b))
        out = S.conv3x3_same_s2d(x, w, b)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)

    def test_chained_convs_with_u2s(self, rng):
        """conv -> relu -> conv entirely in s2d layout (the production
        pattern: stay in s2d, u2s between convs)."""
        x = jnp.asarray(rng.normal(size=(2, 8, 8, 3)).astype(np.float32))
        w1 = rng.normal(size=(3, 3, 3, 4)).astype(np.float32)
        w2 = rng.normal(size=(3, 3, 4, 2)).astype(np.float32)
        ref = plain_conv3x3(jax.nn.relu(plain_conv3x3(x, jnp.asarray(w1))), jnp.asarray(w2))

        w1_4, _ = S.conv3x3_to_s2d_kernel(w1)
        w2_4, _ = S.conv3x3_to_s2d_kernel(w2)
        h = S.conv2x2_s2d(S.s2d_shifted(x), jnp.asarray(w1_4))
        h = jax.nn.relu(h)
        y = S.conv2x2_s2d(S.u2s(h), jnp.asarray(w2_4))
        np.testing.assert_allclose(np.asarray(S.d2s(y)), np.asarray(ref), atol=1e-4)

    def test_conv1x1_s2d(self, rng):
        x = jnp.asarray(rng.normal(size=(1, 4, 4, 3)).astype(np.float32))
        w = rng.normal(size=(1, 1, 3, 2)).astype(np.float32)
        b = rng.normal(size=(2,)).astype(np.float32)
        ref = lax.conv_general_dilated(
            x, jnp.asarray(w), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + b
        w4, b4 = S.conv1x1_to_s2d_kernel(w, b)
        y = lax.conv_general_dilated(
            S.s2d_unshifted(x), jnp.asarray(w4), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + jnp.asarray(b4)
        np.testing.assert_allclose(np.asarray(S.d2s(y)), np.asarray(ref), atol=1e-5)

    def test_kernel_density(self, rng):
        w = rng.normal(size=(3, 3, 16, 16)).astype(np.float32)
        w4, _ = S.conv3x3_to_s2d_kernel(w)
        # 9*Ci*Co nonzeros of 4*(4Ci)*(4Co) slots per, total density 56.25%.
        assert np.count_nonzero(w4) == pytest.approx(9 * 16 * 16 * 4, rel=0.01)
