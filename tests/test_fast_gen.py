"""FastGenerator must match the reference Flax module bit-for-bit-ish."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from depgan_tpu.config import ModelConfig
from depgan_tpu.models import init_generator
from depgan_tpu.ops.fast_gen import FastGenerator


def _randomized(cfg, seed=0):
    model, variables = init_generator(cfg, jax.random.key(0))
    rng = np.random.default_rng(seed)
    variables = {
        "params": jax.tree.map(
            lambda a: jnp.asarray(rng.normal(0, 0.2, a.shape), jnp.float32),
            variables["params"],
        ),
        "batch_stats": jax.tree.map(
            lambda a: jnp.asarray(np.abs(rng.normal(0.3, 0.2, a.shape)) + 0.05,
                                  jnp.float32),
            variables["batch_stats"],
        ),
    }
    return model, variables


@pytest.mark.parametrize(
    "s2d_levels,pallas_levels",
    [((), ()), ((1,), ()), ((1, 2), ()), ((1, 2, 3), ()),
     ((), (1,)), ((), (1, 2)), ((), (1, 2, 3))],
)
def test_fast_matches_reference_tanh(s2d_levels, pallas_levels):
    cfg = ModelConfig(image_size=32, first_fm=8)
    model, variables = _randomized(cfg)
    fast = FastGenerator(cfg, variables, s2d_levels=s2d_levels,
                         pallas_levels=pallas_levels,
                         compute_dtype=jnp.float32)
    x = jax.random.uniform(jax.random.key(1), (2, 32, 32, 1))
    z = jax.random.normal(jax.random.key(2), (2, 32, 1))
    ref = model.apply(variables, x, z, train=False)
    out = fast(x, z)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4)


def test_fast_matches_reference_softmax():
    cfg = ModelConfig(image_size=32, first_fm=8, n_out=4, dropout_mode="uresnet")
    model, variables = _randomized(cfg, seed=3)
    fast = FastGenerator(cfg, variables, s2d_levels=(1, 2),
                         compute_dtype=jnp.float32)
    x = jax.random.uniform(jax.random.key(1), (2, 32, 32, 1))
    z = jax.random.normal(jax.random.key(2), (2, 32, 1))
    ref = model.apply(variables, x, z, train=False)
    out = fast(x, z)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4)


def test_fast_two_channel_input():
    cfg = ModelConfig(image_size=32, first_fm=8, n_input_channels=2)
    model, variables = _randomized(cfg, seed=4)
    fast = FastGenerator(cfg, variables, s2d_levels=(1, 2),
                         compute_dtype=jnp.float32)
    x = jax.random.uniform(jax.random.key(1), (2, 32, 32, 2))
    z = jax.random.normal(jax.random.key(2), (2, 32, 1))
    ref = model.apply(variables, x, z, train=False)
    out = fast(x, z)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4)


@pytest.mark.parametrize("enc,dec", [(True, False), (False, True)])
def test_pallas_bisection_switches(enc, dec):
    cfg = ModelConfig(image_size=32, first_fm=8)
    model, variables = _randomized(cfg, seed=11)
    fast = FastGenerator(cfg, variables, pallas_levels=(1,),
                         compute_dtype=jnp.float32)
    fast.pallas_encoder = enc
    fast.pallas_decoder = dec
    x = jax.random.uniform(jax.random.key(1), (2, 32, 32, 1))
    z = jax.random.normal(jax.random.key(2), (2, 32, 1))
    ref = model.apply(variables, x, z, train=False)
    out = fast(x, z)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4)


def test_fast_bf16_is_close():
    cfg = ModelConfig(image_size=32, first_fm=8)
    model, variables = _randomized(cfg, seed=5)
    fast = FastGenerator(cfg, variables, s2d_levels=(1, 2))  # bfloat16
    x = jax.random.uniform(jax.random.key(1), (2, 32, 32, 1))
    z = jax.random.normal(jax.random.key(2), (2, 32, 1))
    ref = model.apply(variables, x, z, train=False)
    out = fast(x, z)
    # tanh output in [-1, 1]; bf16 trunk keeps it within a few 1e-2.
    assert float(jnp.max(jnp.abs(out - ref))) < 0.05
