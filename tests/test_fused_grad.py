"""Gradient parity of the fused Pallas ops (custom VJPs) against plain-XLA
references, and of the whole FusedGenerator against the Flax module.

These pin the training-side fused path: with frozen BN the generator's own
update can differentiate straight through the folded-weights fused forward
(ops/fast_gen.FusedGenerator), so every VJP here must match the reference
graph to float tolerance. Kernels run in interpret mode on CPU."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from depgan_tpu.ops import s2d_conv as S
from depgan_tpu.ops.conv_s2d_pallas import (
    conv3x3_s2d_fused,
    conv3x3_s2d_fused2,
    deconv_s2d_pallas,
    _deconv_ref,
    pad_s2d,
    pool_s2d_pallas,
    pool_to_s2d_pallas,
    unpad_s2d,
)

B, N, C = 2, 8, 4  # s2d blocks of a 16x16 image, 4-channel groups


def rand(key, shape):
    return jax.random.normal(jax.random.key(key), shape, jnp.float32)


def padded_s2d(key, b=B, n=N, c4=4 * C):
    return pad_s2d(rand(key, (b, n, n, c4)))


def conv_ref(x_padded, w4, b4, gamma, beta, mode):
    """The same padded-s2d conv in plain XLA."""
    xs = S.u2s(unpad_s2d(x_padded))
    pre = S.conv2x2_s2d(xs, w4) + b4
    if mode == "relu":
        out = jax.nn.relu(pre)
    elif mode == "film":
        trunk = unpad_s2d(x_padded)
        out = trunk + jax.nn.relu(
            pre * gamma[:, None, None, :] + beta[:, None, None, :]
        )
    else:
        out = pre
    return pad_s2d(out)


class TestConvVjp:
    @pytest.mark.parametrize("mode,co", [("relu", 6), ("none", 6), ("film", C)])
    def test_grads_match_xla(self, mode, co):
        w_px = 0.2 * np.asarray(rand(1, (3, 3, C, co)))
        w4, _ = S.conv3x3_to_s2d_kernel(w_px)
        w4 = jnp.asarray(w4)
        b4 = 0.1 * rand(2, (4 * co,))
        gamma = 1.0 + 0.2 * rand(3, (B, 4 * C))
        beta = 0.1 * rand(4, (B, 4 * C))
        x = padded_s2d(5)
        r = rand(6, (B, N + 2, N + 2, 4 * co))

        def loss_fused(x, w4, b4, gamma, beta):
            return jnp.sum(conv3x3_s2d_fused(x, w4, b4, gamma, beta, mode=mode) * r)

        def loss_ref(x, w4, b4, gamma, beta):
            return jnp.sum(conv_ref(x, w4, b4, gamma, beta, mode) * r)

        gf = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4))(x, w4, b4, gamma, beta)
        gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(x, w4, b4, gamma, beta)
        names = ("dx", "dw4", "dbias", "dgamma", "dbeta")
        for a, b_, name in zip(gf, gr, names):
            if mode != "film" and name in ("dgamma", "dbeta"):
                continue  # unused in these modes (zeros vs ref's zeros)
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b_), atol=2e-3, rtol=1e-3,
                err_msg=f"{mode}:{name}",
            )

    def test_value_unchanged_by_vjp_wrapper(self):
        w_px = 0.2 * np.asarray(rand(1, (3, 3, C, C)))
        w4, _ = S.conv3x3_to_s2d_kernel(w_px)
        x = padded_s2d(7)
        b4 = 0.1 * rand(8, (4 * C,))
        out = conv3x3_s2d_fused(x, jnp.asarray(w4), b4, mode="relu")
        ref = conv_ref(x, jnp.asarray(w4), b4, None, None, "relu")
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


class TestRelayoutVjps:
    def test_pool_grad_matches_xla_max(self):
        x = padded_s2d(10)
        r = rand(11, (B, N, N, C))

        def ref(x):
            inter = x[:, 1:-1, 1:-1, :]
            return jnp.max(inter.reshape(B, N, N, 4, C), axis=3)

        gf = jax.grad(lambda x: jnp.sum(pool_s2d_pallas(x) * r))(x)
        gr = jax.grad(lambda x: jnp.sum(ref(x) * r))(x)
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gr), atol=1e-6)

    def test_pool_to_s2d_grad(self):
        x = padded_s2d(12)
        out_shape = pool_to_s2d_pallas(x).shape
        r = rand(13, out_shape)

        def ref(x):
            inter = x[:, 1:-1, 1:-1, :]
            mx = jnp.max(inter.reshape(B, N, N, 4, C), axis=3)
            return pad_s2d(S.s2d_unshifted(mx))

        np.testing.assert_allclose(
            np.asarray(pool_to_s2d_pallas(x)), np.asarray(ref(x)), atol=1e-6
        )
        gf = jax.grad(lambda x: jnp.sum(pool_to_s2d_pallas(x) * r))(x)
        gr = jax.grad(lambda x: jnp.sum(ref(x) * r))(x)
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gr), atol=1e-6)

    def test_deconv_grad(self):
        m = N // 2
        x = pad_s2d(rand(20, (B, m, m, 4 * C)))
        w2 = 0.3 * rand(21, (C, 4 * 3))
        b4 = 0.1 * rand(22, (4 * 3,))
        out = deconv_s2d_pallas(x, w2, b4)
        ref_out = _deconv_ref(x, w2, b4)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out), atol=1e-5)
        r = rand(24, out.shape)
        gf = jax.grad(
            lambda *a: jnp.sum(deconv_s2d_pallas(*a) * r), argnums=(0, 1, 2)
        )(x, w2, b4)
        gr = jax.grad(
            lambda *a: jnp.sum(_deconv_ref(*a) * r), argnums=(0, 1, 2)
        )(x, w2, b4)
        for a, b_ in zip(gf, gr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-5)

    def test_two_operand_conv_matches_concat_conv(self):
        """conv3x3_s2d_fused2(up, skip, W_up, W_skip) == relu-conv of the
        materialised concat — values and gradients."""
        c_up, c_skip, co = 3, 2, 5
        w_px = 0.2 * np.asarray(rand(31, (3, 3, c_up + c_skip, co)))
        w4u, _ = S.conv3x3_to_s2d_kernel(w_px[:, :, :c_up, :])
        w4s, _ = S.conv3x3_to_s2d_kernel(w_px[:, :, c_up:, :])
        b4 = 0.1 * rand(32, (4 * co,))
        up = padded_s2d(33, c4=4 * c_up)
        skip = padded_s2d(34, c4=4 * c_skip)
        r = rand(35, (B, N + 2, N + 2, 4 * co))

        def ref(up, skip, w4u, w4s, b4):
            # concat per sub-pixel group, then the single-operand reference
            ur = unpad_s2d(up).reshape(B, N, N, 4, c_up)
            sr = unpad_s2d(skip).reshape(B, N, N, 4, c_skip)
            cat = pad_s2d(
                jnp.concatenate([ur, sr], axis=-1).reshape(
                    B, N, N, 4 * (c_up + c_skip)
                )
            )
            w4, _ = S.conv3x3_to_s2d_kernel(w_px)
            return conv_ref(cat, jnp.asarray(w4), b4, None, None, "relu")

        out = conv3x3_s2d_fused2(up, skip, jnp.asarray(w4u), jnp.asarray(w4s), b4)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref(up, skip, None, None, b4)), atol=1e-5
        )

        def loss_fused(up, skip, w4u, w4s, b4):
            return jnp.sum(conv3x3_s2d_fused2(up, skip, w4u, w4s, b4) * r)

        def loss_ref(up, skip, w4u, w4s, b4):
            return jnp.sum(ref(up, skip, w4u, w4s, b4) * r)

        args = (up, skip, jnp.asarray(w4u), jnp.asarray(w4s), b4)
        gf = jax.grad(loss_fused, argnums=(0, 1, 4))(*args)
        gr = jax.grad(loss_ref, argnums=(0, 1, 4))(*args)
        for a, b_, name in zip(gf, gr, ("dup", "dskip", "dbias")):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b_), atol=1e-4, err_msg=name
            )
        # weight grads against jax.vjp of the two-operand XLA composition
        def ref2(up, skip, w4u, w4s, b4):
            xs1 = S.u2s(unpad_s2d(up))
            xs2 = S.u2s(unpad_s2d(skip))
            pre = S.conv2x2_s2d(xs1, w4u) + S.conv2x2_s2d(xs2, w4s) + b4
            return pad_s2d(jax.nn.relu(pre))

        gfw = jax.grad(loss_fused, argnums=(2, 3))(*args)
        grw = jax.grad(lambda *a: jnp.sum(ref2(*a) * r), argnums=(2, 3))(*args)
        for a, b_ in zip(gfw, grw):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-4)


class TestFusedGeneratorGrad:
    def test_grad_matches_flax(self):
        """d loss / d params through build_weights + fused forward must match
        the frozen-BN Flax graph — the contract that lets the generator's
        own WGAN update run on the fused path."""
        from depgan_tpu.config import ModelConfig
        from depgan_tpu.models import init_generator
        from depgan_tpu.ops.fast_gen import FusedGenerator

        cfg = ModelConfig(image_size=32, first_fm=8)
        model, variables = init_generator(cfg, jax.random.key(0))
        rng = np.random.default_rng(3)
        variables = {
            "params": jax.tree.map(
                lambda a: jnp.asarray(rng.normal(0, 0.2, a.shape), jnp.float32),
                variables["params"],
            ),
            "batch_stats": jax.tree.map(
                lambda a: jnp.asarray(
                    np.abs(rng.normal(0.3, 0.2, a.shape)) + 0.05, jnp.float32
                ),
                variables["batch_stats"],
            ),
        }
        stats = variables["batch_stats"]
        fg = FusedGenerator(cfg, pallas_levels=(1, 2), compute_dtype=jnp.float32)
        x = jax.random.uniform(jax.random.key(1), (2, 32, 32, 1))
        z = jax.random.normal(jax.random.key(2), (2, 32, 1))
        r = rand(30, (2, 32, 32, 1))

        def loss_fused(params):
            W = fg.build_weights({"params": params, "batch_stats": stats})
            return jnp.sum(fg.forward(W, x, z) * r)

        def loss_flax(params):
            return jnp.sum(
                model.apply({"params": params, "batch_stats": stats},
                            x, z, train=False) * r
            )

        lf, lr = float(loss_fused(variables["params"])), float(loss_flax(variables["params"]))
        assert lf == pytest.approx(lr, rel=1e-3, abs=1e-3)
        gf = jax.grad(loss_fused)(variables["params"])
        gr = jax.grad(loss_flax)(variables["params"])

        leaves_f, tree_f = jax.tree_util.tree_flatten(gf)
        leaves_r, tree_r = jax.tree_util.tree_flatten(gr)
        assert tree_f == tree_r
        for a, b_ in zip(leaves_f, leaves_r):
            scale = max(1.0, float(jnp.max(jnp.abs(b_))))
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b_), atol=5e-3 * scale,
            )
