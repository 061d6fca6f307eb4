"""FusedCritic: fused s2d critic path vs the plain Flax critic.

Pins (a) forward equivalence, (b) the hand-chained input gradient vs
jax.grad of the plain critic, and (c) the WGAN-GP double backward — grad
wrt params of a functional of the input gradient — which is the whole
reason score_and_input_grad exists (Pallas custom VJPs cannot be
linearized twice)."""

import jax
import jax.numpy as jnp
from jax.flatten_util import ravel_pytree
import numpy as np
import pytest

from depgan_tpu.config import ModelConfig
from depgan_tpu.models.critic import init_critic
from depgan_tpu.ops.fast_critic import FusedCritic


@pytest.fixture(scope="module")
def setup():
    cfg = ModelConfig(image_size=32, first_fm=4, compute_dtype="float32")
    model, variables = init_critic(cfg, jax.random.key(0))
    fc = FusedCritic(cfg, strip=8, compute_dtype=jnp.float32)
    x = jax.random.uniform(jax.random.key(1), (2, 32, 32, 1))
    return cfg, model, variables["params"], fc, x


class TestFusedCriticForward:
    def test_score_matches_plain(self, setup):
        cfg, model, params, fc, x = setup
        s_plain = model.apply({"params": params}, x)
        s_fused = fc.forward(params, x)
        np.testing.assert_allclose(
            np.asarray(s_fused), np.asarray(s_plain), atol=1e-4,
        )

    def test_param_grads_match_plain(self, setup):
        cfg, model, params, fc, x = setup
        gp_ = jax.grad(lambda p: jnp.sum(model.apply({"params": p}, x)))(params)
        gf = jax.grad(lambda p: jnp.sum(fc.forward(p, x)))(params)
        flat_p, _ = ravel_pytree(gp_)
        flat_f, _ = ravel_pytree(gf)
        np.testing.assert_allclose(
            np.asarray(flat_f), np.asarray(flat_p), atol=5e-4,
        )


class TestInputGradChain:
    def test_input_grad_matches_jax_grad(self, setup):
        cfg, model, params, fc, x = setup
        g_plain = jax.grad(
            lambda x: jnp.sum(model.apply({"params": params}, x))
        )(x)
        score, g_fused = fc.score_and_input_grad(params, x)
        np.testing.assert_allclose(
            np.asarray(g_fused), np.asarray(g_plain), atol=1e-4,
        )
        np.testing.assert_allclose(
            np.asarray(score), np.asarray(model.apply({"params": params}, x)),
            atol=1e-4,
        )

    def test_gp_double_backward_matches_plain(self, setup):
        """grad wrt params of mean((||dD/dx|| - 1)^2) — the WGAN-GP term
        (reference :536-547) — through the hand-written chain equals the
        plain jax.grad-of-jax.grad result."""
        cfg, model, params, fc, x = setup

        def gp_plain(p):
            g = jax.grad(
                lambda m: jnp.sum(model.apply({"params": p}, m))
            )(x)
            n = jnp.sqrt(jnp.sum(jnp.square(g), axis=(1, 2, 3)))
            return jnp.mean(jnp.square(n - 1.0))

        def gp_fused(p):
            _, g = fc.score_and_input_grad(p, x)
            n = jnp.sqrt(jnp.sum(jnp.square(g), axis=(1, 2, 3)))
            return jnp.mean(jnp.square(n - 1.0))

        np.testing.assert_allclose(gp_fused(params), gp_plain(params),
                                   atol=1e-5)
        d_plain = jax.grad(gp_plain)(params)
        d_fused = jax.grad(gp_fused)(params)
        flat_p, _ = ravel_pytree(d_plain)
        flat_f, _ = ravel_pytree(d_fused)
        np.testing.assert_allclose(
            np.asarray(flat_f), np.asarray(flat_p), atol=5e-4,
        )


class TestTailS2d:
    """tail_s2d=True routes dis_2/dis_3 through the conv3 s2d kernel; the
    whole contract (forward, param grads, input-grad chain, GP double
    backward) must be preserved."""

    @pytest.fixture(scope="class")
    def fc2(self, setup):
        cfg = setup[0]
        return FusedCritic(cfg, strip=8, compute_dtype=jnp.float32,
                           tail_s2d=True)

    def test_forward_and_param_grads(self, setup, fc2):
        cfg, model, params, _, x = setup
        np.testing.assert_allclose(
            np.asarray(fc2.forward(params, x)),
            np.asarray(model.apply({"params": params}, x)), atol=1e-4,
        )
        gp_ = jax.grad(lambda p: jnp.sum(model.apply({"params": p}, x)))(params)
        gf = jax.grad(lambda p: jnp.sum(fc2.forward(p, x)))(params)
        flat_p, _ = ravel_pytree(gp_)
        flat_f, _ = ravel_pytree(gf)
        np.testing.assert_allclose(np.asarray(flat_f), np.asarray(flat_p),
                                   atol=5e-4)

    def test_input_grad_and_gp_double_backward(self, setup, fc2):
        cfg, model, params, _, x = setup
        g_plain = jax.grad(
            lambda x: jnp.sum(model.apply({"params": params}, x)))(x)
        score, g_fused = fc2.score_and_input_grad(params, x)
        np.testing.assert_allclose(np.asarray(g_fused), np.asarray(g_plain),
                                   atol=1e-4)

        def gp_fused(p):
            _, g = fc2.score_and_input_grad(p, x)
            n = jnp.sqrt(jnp.sum(jnp.square(g), axis=(1, 2, 3)))
            return jnp.mean(jnp.square(n - 1.0))

        def gp_plain(p):
            g = jax.grad(
                lambda m: jnp.sum(model.apply({"params": p}, m)))(x)
            n = jnp.sqrt(jnp.sum(jnp.square(g), axis=(1, 2, 3)))
            return jnp.mean(jnp.square(n - 1.0))

        d_plain = jax.grad(gp_plain)(params)
        d_fused = jax.grad(gp_fused)(params)
        flat_p, _ = ravel_pytree(d_plain)
        flat_f, _ = ravel_pytree(d_fused)
        np.testing.assert_allclose(np.asarray(flat_f), np.asarray(flat_p),
                                   atol=5e-4)
