"""Shape / wiring / parameter-layout tests for the model subsystem
(SURVEY.md §4b — parity with the reference's model.summary())."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from depgan_tpu.config import ModelConfig
from depgan_tpu.models import (
    Deconv2x2,
    init_critic,
    init_generator,
)

SMALL = ModelConfig(image_size=32, first_fm=8, noise_size=32, n_input_channels=1)


def n_params(tree):
    return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(tree))


class TestGenerator:
    def test_forward_shape_tanh(self):
        model, variables = init_generator(SMALL, jax.random.key(0), batch=2)
        x = jnp.ones((2, 32, 32, 1))
        z = jnp.zeros((2, 32, 1))
        y = model.apply(variables, x, z, train=False)
        assert y.shape == (2, 32, 32, 1)
        assert float(jnp.max(jnp.abs(y))) <= 1.0  # tanh head

    def test_forward_shape_softmax(self):
        cfg = ModelConfig(image_size=32, first_fm=8, n_out=4, dropout_mode="uresnet")
        model, variables = init_generator(cfg, jax.random.key(0), batch=2)
        y = model.apply(
            variables, jnp.ones((2, 32, 32, 1)), jnp.zeros((2, 32, 1)), train=False
        )
        assert y.shape == (2, 32, 32, 4)
        np.testing.assert_allclose(np.asarray(jnp.sum(y, -1)), 1.0, rtol=1e-5)

    def test_two_channel_input(self):
        cfg = ModelConfig(image_size=32, first_fm=8, n_input_channels=2)
        model, variables = init_generator(cfg, jax.random.key(0))
        y = model.apply(
            variables, jnp.ones((1, 32, 32, 2)), jnp.zeros((1, 32, 1)), train=False
        )
        assert y.shape == (1, 32, 32, 1)

    def test_noise_changes_output(self):
        model, variables = init_generator(SMALL, jax.random.key(1))
        x = jnp.ones((1, 32, 32, 1))
        y0 = model.apply(variables, x, jax.random.normal(jax.random.key(2), (1, 32, 1)), train=False)
        y1 = model.apply(variables, x, jax.random.normal(jax.random.key(3), (1, 32, 1)), train=False)
        assert float(jnp.max(jnp.abs(y0 - y1))) > 0

    def test_param_layout_matches_keras(self):
        """Spot-check kernel shapes against the reference architecture
        (skip-concat channel counts, FiLM dense fan-ins, deconv layout)."""
        n = 8
        _, variables = init_generator(SMALL, jax.random.key(0))
        p = variables["params"]
        # First conv: 3x3, C_in=1 -> n.
        assert p["block_gen_0"]["conv2d_gen_0"]["kernel"].shape == (3, 3, 1, n)
        # Decoder conv_10 input = concat(deconv 4n, skip 3n) = 7n.
        assert p["block_gen_10"]["conv2d_gen_10"]["kernel"].shape == (3, 3, 7 * n, 3 * n)
        # conv_14 input = concat(3n, 2n) = 5n; conv_16 input = concat(2n, n) = 3n.
        assert p["block_gen_14"]["conv2d_gen_14"]["kernel"].shape == (3, 3, 5 * n, 2 * n)
        assert p["block_gen_16"]["conv2d_gen_16"]["kernel"].shape == (3, 3, 3 * n, n)
        # Noise encoder: Dense over last axis of (B, 32, 1) -> fan-in 1;
        # flatten gives 32 * n features for the per-site FiLM denses.
        enc = p["noise_encoder"]
        assert enc["noise_1_add_f0"]["block_noise_1_add_f0"]["dense_noise_1_add_f0"][
            "kernel"
        ].shape == (1, n)
        assert enc["noise_2_mul_m3"]["dense_noise_2_mul_m3"]["kernel"].shape == (
            32 * n,
            3 * n,
        )
        # Bottleneck FiLM pair uses the bare reference names.
        assert "noise_2_mul" in enc and "noise_2_add" in enc
        assert enc["noise_2_mul"]["dense_noise_2_mul"]["kernel"].shape == (32 * n, 4 * n)
        # Deconv kernels keep Keras Conv2DTranspose (kh, kw, out, in) layout.
        assert p["block_de_gen_9"]["deconv2d_de_gen_9"]["kernel"].shape == (
            2,
            2,
            4 * n,
            4 * n,
        )
        # Head: 1x1 conv n -> nc_out.
        assert p["gen_segmentation"]["kernel"].shape == (1, 1, n, 1)

    def test_film_site_count(self):
        _, variables = init_generator(SMALL, jax.random.key(0))
        enc = variables["params"]["noise_encoder"]
        film_denses = [k for k in enc if k.startswith("noise_2_")]
        assert len(film_denses) == 14  # 7 sites x (mul, add), reference :363-395

    def test_dropout_modes(self):
        x = jnp.ones((1, 32, 32, 1))
        z = jnp.zeros((1, 32, 1))
        for mode, expect_stochastic in [("gan", True), ("uresnet", True), ("none", False)]:
            cfg = ModelConfig(image_size=32, first_fm=8, dropout_mode=mode)
            model, variables = init_generator(cfg, jax.random.key(0))
            y1 = model.apply(variables, x, z, train=True,
                             rngs={"dropout": jax.random.key(1)},
                             mutable=["batch_stats"])[0]
            y2 = model.apply(variables, x, z, train=True,
                             rngs={"dropout": jax.random.key(2)},
                             mutable=["batch_stats"])[0]
            differs = float(jnp.max(jnp.abs(y1 - y2))) > 0
            assert differs == expect_stochastic, mode

    def test_train_mode_updates_batch_stats(self):
        model, variables = init_generator(SMALL, jax.random.key(0))
        x = jax.random.normal(jax.random.key(4), (4, 32, 32, 1))
        z = jax.random.normal(jax.random.key(5), (4, 32, 1))
        _, updates = model.apply(
            variables, x, z, train=True,
            rngs={"dropout": jax.random.key(6)}, mutable=["batch_stats"],
        )
        before = variables["batch_stats"]["block_gen_0"]["bn_gen_0"]["mean"]
        after = updates["batch_stats"]["block_gen_0"]["bn_gen_0"]["mean"]
        assert float(jnp.max(jnp.abs(before - after))) > 0

    def test_eval_mode_deterministic(self):
        model, variables = init_generator(SMALL, jax.random.key(0))
        x = jax.random.normal(jax.random.key(7), (2, 32, 32, 1))
        z = jax.random.normal(jax.random.key(8), (2, 32, 1))
        y1 = model.apply(variables, x, z, train=False)
        y2 = model.apply(variables, x, z, train=False)
        np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))


class TestCritic:
    def test_forward_shape(self):
        cfg = ModelConfig(image_size=64)
        model, variables = init_critic(cfg, jax.random.key(0), batch=3)
        s = model.apply(variables, jnp.ones((3, 64, 64, 1)))
        assert s.shape == (3, 1)

    def test_param_count_matches_keras_summary(self):
        """Total trainable parameters of Dis_C2D_FCN1 at 256x256, computed
        independently from the reference architecture (reference :316-345)."""
        convs = [
            (5, 1, 16), (5, 16, 16), (5, 16, 32), (5, 32, 32),
            (3, 32, 64), (3, 64, 64), (3, 64, 128), (3, 128, 128),
            (3, 128, 256), (3, 256, 256), (3, 256, 256), (1, 256, 1),
        ]
        expected = sum(k * k * cin * cout + cout for k, cin, cout in convs)
        expected += 16 * 16 * 1 * 1 + 1  # Dense(1) on flattened 16x16x1
        cfg = ModelConfig(image_size=256)
        _, variables = init_critic(cfg, jax.random.key(0))
        assert n_params(variables["params"]) == expected

    def test_no_batchnorm(self):
        cfg = ModelConfig(image_size=64)
        _, variables = init_critic(cfg, jax.random.key(0))
        assert "batch_stats" not in variables  # WGAN-GP requirement


class TestDeconv:
    def test_deconv_matches_torch_golden(self):
        """Deconv2x2 must equal ConvTranspose2d(k=2, s=2) — checked against
        torch as an independent implementation. The Keras kernel layout
        (kh, kw, out, in) maps to torch's (in, out, kh, kw)."""
        import torch

        m = Deconv2x2(features=3, suffix="t")
        x = jax.random.normal(jax.random.key(0), (2, 5, 5, 4))
        variables = m.init(jax.random.key(1), x)
        y = m.apply(variables, x)
        assert y.shape == (2, 10, 10, 3)
        kernel = np.asarray(variables["params"]["kernel"])  # (2, 2, O, I)
        bias = np.asarray(variables["params"]["bias"])
        xt = torch.from_numpy(np.asarray(x).transpose(0, 3, 1, 2))
        wt = torch.from_numpy(kernel.transpose(3, 2, 0, 1).copy())  # (I, O, kh, kw)
        ref = torch.nn.functional.conv_transpose2d(
            xt, wt, bias=torch.from_numpy(bias), stride=2
        )
        np.testing.assert_allclose(
            np.asarray(y), ref.numpy().transpose(0, 2, 3, 1), atol=1e-5
        )

    def test_single_pixel_block(self):
        """One input pixel -> one 2x2 output block with the kernel values."""
        m = Deconv2x2(features=1, suffix="t")
        x = jnp.zeros((1, 2, 2, 1)).at[0, 0, 0, 0].set(1.0)
        variables = m.init(jax.random.key(0), x)
        kernel = variables["params"]["kernel"]
        y = m.apply({"params": {"kernel": kernel, "bias": jnp.zeros((1,))}}, x)
        np.testing.assert_allclose(
            np.asarray(y[0, :2, :2, 0]), np.asarray(kernel[:, :, 0, 0]), atol=1e-6
        )
        assert float(jnp.sum(jnp.abs(y[0, 2:, :, 0]))) == 0.0
