"""Pallas kernel + BN-folding correctness tests (CPU interpreter mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from depgan_tpu.config import ModelConfig
from depgan_tpu.models import init_generator
from depgan_tpu.ops import fold_bn
from depgan_tpu.ops.film_pallas import film_residual, film_residual_reference


class TestFilmPallas:
    @pytest.fixture()
    def data(self):
        k = jax.random.key(0)
        k1, k2, k3, k4 = jax.random.split(k, 4)
        b, h, w, c = 2, 8, 16, 128
        return (
            jax.random.normal(k1, (b, h, w, c)),
            jax.random.normal(k2, (b, c)),
            jax.random.normal(k3, (b, c)),
            jax.random.normal(k4, (b, h, w, c)),
        )

    def test_forward_matches_reference(self, data):
        h, gamma, beta, trunk = data
        out = film_residual(h, gamma, beta, trunk)
        ref = film_residual_reference(h, gamma, beta, trunk)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)

    def test_gradients_match_reference(self, data):
        h, gamma, beta, trunk = data

        def loss_pallas(*args):
            return jnp.sum(film_residual(*args) ** 2)

        def loss_ref(*args):
            return jnp.sum(film_residual_reference(*args) ** 2)

        g_p = jax.grad(loss_pallas, argnums=(0, 1, 2, 3))(h, gamma, beta, trunk)
        g_r = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(h, gamma, beta, trunk)
        for a, b in zip(g_p, g_r):
            # Accumulation-order differences in the (B, C) reductions.
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-4
            )

    def test_generator_with_pallas_matches_plain(self):
        cfg = ModelConfig(image_size=32, first_fm=8)
        cfg_p = ModelConfig(image_size=32, first_fm=8, use_pallas=True)
        model, variables = init_generator(cfg, jax.random.key(0))
        model_p, _ = init_generator(cfg_p, jax.random.key(0))
        x = jax.random.normal(jax.random.key(1), (2, 32, 32, 1))
        z = jax.random.normal(jax.random.key(2), (2, 32, 1))
        y = model.apply(variables, x, z, train=False)
        y_p = model_p.apply(variables, x, z, train=False)
        np.testing.assert_allclose(np.asarray(y), np.asarray(y_p), atol=1e-5)


class TestFoldBn:
    def test_folded_generator_output_identical(self):
        cfg = ModelConfig(image_size=32, first_fm=8)
        model, variables = init_generator(cfg, jax.random.key(0))
        # Non-trivial BN stats so the fold actually does something.
        rng = np.random.default_rng(0)
        variables = {
            "params": jax.tree.map(
                lambda a: jnp.asarray(rng.normal(0.1, 0.3, a.shape), jnp.float32),
                variables["params"],
            ),
            "batch_stats": jax.tree.map(
                lambda a: jnp.asarray(np.abs(rng.normal(0.5, 0.2, a.shape)) + 0.1,
                                      jnp.float32),
                variables["batch_stats"],
            ),
        }
        folded = fold_bn.fold_batch_norms(variables)
        x = jax.random.normal(jax.random.key(1), (2, 32, 32, 1))
        z = jax.random.normal(jax.random.key(2), (2, 32, 1))
        y = model.apply(variables, x, z, train=False)
        y_f = model.apply(folded, x, z, train=False)
        np.testing.assert_allclose(np.asarray(y), np.asarray(y_f), atol=2e-4)

    def test_bn_reset_to_identity(self):
        cfg = ModelConfig(image_size=32, first_fm=8)
        _, variables = init_generator(cfg, jax.random.key(0))
        folded = fold_bn.fold_batch_norms(variables)
        bn = folded["params"]["block_gen_0"]["bn_gen_0"]
        np.testing.assert_array_equal(bn["scale"], np.ones_like(bn["scale"]))
        stats = folded["batch_stats"]["block_gen_0"]["bn_gen_0"]
        np.testing.assert_array_equal(stats["mean"], np.zeros_like(stats["mean"]))
