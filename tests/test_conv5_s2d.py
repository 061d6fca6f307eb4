"""conv5x5_s2d_fused: the critic's 5x5 conv as a dense 3x3-tap kernel on
the padded unshifted s2d layout (reference critic stack
`...twoCritics_training_4fold.py:319-325`). Pins forward and first-order
gradients against the plain XLA SAME conv (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax

from depgan_tpu.ops import s2d_conv as S
from depgan_tpu.ops.conv_s2d_pallas import conv5x5_s2d_fused, pad_s2d


def _ref(x, w5, b5, relu=True):
    y = lax.conv_general_dilated(
        x, w5, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    ) + b5
    return jax.nn.relu(y) if relu else y


def _fused(x, w5, b5, mode="relu", strip=8):
    xp = pad_s2d(S.s2d_unshifted(x))
    yp = conv5x5_s2d_fused(xp, w5, b5, mode=mode, strip=strip)
    return S.d2s(yp[:, 1:-1, 1:-1, :])


def _data(h=32, ci=3, co=5, b=2, seed=0):
    x = jax.random.normal(jax.random.key(seed), (b, h, h, ci))
    w5 = jax.random.normal(jax.random.key(seed + 1), (5, 5, ci, co)) * 0.2
    b5 = jax.random.normal(jax.random.key(seed + 2), (co,)) * 0.1
    return x, w5, b5


class TestConv5Forward:
    @pytest.mark.parametrize("h,ci,co", [(32, 3, 5), (16, 1, 16), (16, 16, 8)])
    def test_matches_xla_same_conv(self, h, ci, co):
        x, w5, b5 = _data(h, ci, co)
        np.testing.assert_allclose(
            np.asarray(_fused(x, w5, b5)), np.asarray(_ref(x, w5, b5)),
            atol=1e-5,
        )

    def test_mode_none(self):
        x, w5, b5 = _data()
        np.testing.assert_allclose(
            np.asarray(_fused(x, w5, b5, mode="none")),
            np.asarray(_ref(x, w5, b5, relu=False)),
            atol=1e-5,
        )

    def test_strip_fallback_on_indivisible_n(self):
        # n = 8 blocks, strip 16 -> kernel halves it internally
        x, w5, b5 = _data(h=16)
        np.testing.assert_allclose(
            np.asarray(_fused(x, w5, b5, strip=16)),
            np.asarray(_ref(x, w5, b5)),
            atol=1e-5,
        )


class TestConv5Gradients:
    def test_first_order_grads_match_xla(self):
        x, w5, b5 = _data()
        r = jax.random.normal(jax.random.key(7), x.shape[:3] + (5,))
        gr = jax.grad(lambda *a: jnp.sum(_ref(*a) * r), argnums=(0, 1, 2))(
            x, w5, b5)
        gf = jax.grad(lambda *a: jnp.sum(_fused(*a) * r), argnums=(0, 1, 2))(
            x, w5, b5)
        for a, b in zip(gr, gf):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=5e-5)

    def test_weight_transform_placement_is_injective(self):
        # conv5x5_to_s2d_kernel_j places each (dy,dx,p,q) cell exactly once:
        # the total mass of w9 equals 4x the mass of w5 (each of the 4
        # output sub-pixels sees the full 5x5 kernel once).
        _, w5, _ = _data()
        w9, _ = S.conv5x5_to_s2d_kernel_j(w5, jnp.zeros((5,)))
        np.testing.assert_allclose(
            float(jnp.sum(jnp.abs(w9))), 4 * float(jnp.sum(jnp.abs(w5))),
            rtol=1e-5,
        )


class TestConv5Packed:
    def test_packed_codegen_matches_dense(self, monkeypatch):
        """CONV5_PACKED=True (one K=9*4C matmul per strip over a
        lane-concatenated 9-tap staging buffer) is a pure codegen change:
        outputs must match the dense 9-matmul kernel to
        accumulation-order rounding (one wide matmul sums the taps in a
        different order)."""
        from depgan_tpu.ops import conv_s2d_pallas as csp

        x, w5, b5 = _data(h=32, ci=4, co=16)
        outs = []
        for packed in (False, True):
            monkeypatch.setattr(csp, "CONV5_PACKED", packed)
            outs.append(np.asarray(_fused(x, w5, b5)))
        np.testing.assert_allclose(outs[0], outs[1], atol=1e-5)

    def test_packed_gate_leaves_wide_channels_dense(self, monkeypatch):
        """c4 > 64 widths must keep the dense kernel (the 9x staging buffer
        is only VMEM-affordable/profitable below the MXU's native K)."""
        from depgan_tpu.ops import conv_s2d_pallas as csp

        x, w5, b5 = _data(h=32, ci=32, co=8)  # c4 = 128 > 64
        monkeypatch.setattr(csp, "CONV5_PACKED", True)
        np.testing.assert_allclose(
            np.asarray(_fused(x, w5, b5)), np.asarray(_ref(x, w5, b5)),
            atol=1e-5,
        )
