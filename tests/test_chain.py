"""Chained whole-site kernels (round 5): bit-identity with the sequential
kernel composition, in interpret mode.

The chain kernels were measured REJECTED for the production default
(docs/PERF.md: 0.88x end-to-end despite eliminating real HBM round trips)
but are kept as on-chip-validated gated knobs (`DEPGAN_FUSE_CHAIN`); these
tests pin their MATH so the knob stays safe to flip for future A/Bs.
Mosaic codegen is covered by scripts/onchip_validate.py::check_chain3.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from depgan_tpu.ops.conv_s2d_pallas import (
    conv3x3_s2d_chain2,
    conv3x3_s2d_chain3,
    conv3x3_s2d_fused,
    conv3x3_s2d_fused2,
    conv3x3_s2d_fused_pool,
)

DT = jnp.bfloat16


def ring0(x):
    return (x.at[:, 0].set(0).at[:, -1].set(0)
             .at[:, :, 0].set(0).at[:, :, -1].set(0))


def mk(b, n, c4, seed):
    r = np.random.default_rng(seed)
    return ring0(jnp.asarray(r.normal(size=(b, n + 2, n + 2, c4)), DT))


def w(s, *shape):
    return jnp.asarray(
        np.random.default_rng(s).normal(size=shape) * 0.1, jnp.float32)


@pytest.mark.parametrize("n,c4a,c4m,pool", [
    (16, 32, 128, "s2d"),
    (8, 128, 64, "pixel"),
    (16, 64, 64, ""),
])
def test_chain3_enc_bit_identical(n, c4a, c4m, pool):
    B, c4o = 2, c4m
    x = mk(B, n, c4a, 10 + n)
    w1, b1 = w(1, 2, 2, c4a, c4m).astype(DT), w(2, c4m)
    wf, bf = w(3, 2, 2, c4m, c4m).astype(DT), w(4, c4m)
    g, bt = w(5, B, c4m), w(6, B, c4m)
    w3, b3 = w(7, 2, 2, c4m, c4o).astype(DT), w(8, c4o)

    h0 = conv3x3_s2d_fused(x, w1, b1, mode="relu", strip=8)
    s = conv3x3_s2d_fused(h0, wf, bf, g, bt, mode="film", strip=8)
    got = conv3x3_s2d_chain3(x, w1, b1, wf, bf, g, bt, w3, b3,
                             strip=8, pool=pool)
    if pool:
        ref = conv3x3_s2d_fused_pool(s, w3, b3, mode="relu", strip=8,
                                     pool=pool)
        for a, b_ in zip(got, ref):
            assert jnp.array_equal(a, b_)
    else:
        ref = conv3x3_s2d_fused(s, w3, b3, mode="relu", strip=8)
        assert jnp.array_equal(got, ref)


@pytest.mark.parametrize("n,c4a,c4b,c4m", [(16, 256, 128, 128),
                                           (8, 384, 256, 256)])
def test_chain3_dec_bit_identical(n, c4a, c4b, c4m):
    B = 2
    up, skip = mk(B, n, c4a, 20 + n), mk(B, n, c4b, 21 + n)
    w1a = w(11, 2, 2, c4a, c4m).astype(DT)
    w1b = w(12, 2, 2, c4b, c4m).astype(DT)
    b1 = w(13, c4m)
    wf, bf = w(14, 2, 2, c4m, c4m).astype(DT), w(15, c4m)
    g, bt = w(16, B, c4m), w(17, B, c4m)
    w3, b3 = w(18, 2, 2, c4m, c4m).astype(DT), w(19, c4m)

    h0 = conv3x3_s2d_fused2(up, skip, w1a, w1b, b1, strip=8)
    s = conv3x3_s2d_fused(h0, wf, bf, g, bt, mode="film", strip=8)
    ref = conv3x3_s2d_fused(s, w3, b3, mode="relu", strip=8)
    got = conv3x3_s2d_chain3(up, w1a, b1, wf, bf, g, bt, w3, b3,
                             x2_padded=skip, w1b4=w1b, strip=8)
    assert jnp.array_equal(got, ref)


@pytest.mark.parametrize("modes", [("relu", "film"), ("film", "relu"),
                                   ("relu", "relu")])
def test_chain2_bit_identical(modes):
    B, n = 2, 16
    c4i = 128 if modes[0] == "film" else 64
    c4m = c4i if modes[0] == "film" else 128
    c4o = c4m if modes[1] == "film" else 64
    x = mk(B, n, c4i, 30)
    w1, b1 = w(31, 2, 2, c4i, c4m).astype(DT), w(32, c4m)
    w2, b2 = w(33, 2, 2, c4m, c4o).astype(DT), w(34, c4o)
    c4f = c4m if modes[0] == "film" else c4o
    g, bt = w(35, B, c4f), w(36, B, c4f)

    def seq_stage(x_, wk, bk, mode):
        if mode == "film":
            return conv3x3_s2d_fused(x_, wk, bk, g, bt, mode="film", strip=8)
        return conv3x3_s2d_fused(x_, wk, bk, mode=mode, strip=8)

    ref = seq_stage(seq_stage(x, w1, b1, modes[0]), w2, b2, modes[1])
    got = conv3x3_s2d_chain2(x, w1, b1, w2, b2, g, bt, modes=modes, strip=8)
    assert jnp.array_equal(got, ref)


def test_fast_generator_fuse_chain_end_to_end():
    """FastGenerator with fuse_chain on must be bit-identical to off."""
    from depgan_tpu.config import ModelConfig
    from depgan_tpu.models import init_generator
    from depgan_tpu.ops.fast_gen import FastGenerator

    cfg = ModelConfig(image_size=64, first_fm=32, n_input_channels=1,
                      compute_dtype="bfloat16")
    _, variables = init_generator(cfg, jax.random.key(0))
    x = jnp.asarray(np.random.default_rng(0).uniform(-1, 1, (2, 64, 64, 1)),
                    jnp.float32)
    z = jnp.asarray(np.random.default_rng(1).normal(size=(2, 32, 1)),
                    jnp.float32)
    outs = []
    for chain in (False, True):
        fg = FastGenerator(cfg, variables, pallas_levels=(1, 2))
        fg.fuse_chain = chain
        fg.fuse_pool = True
        W = fg.build_weights(variables)
        outs.append(np.asarray(fg.forward(W, x, z)))
    np.testing.assert_array_equal(outs[0], outs[1])
