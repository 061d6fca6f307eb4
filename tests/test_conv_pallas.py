"""Fused Pallas s2d-conv kernel vs plain XLA conv (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax

from depgan_tpu.ops import s2d_conv as S
from depgan_tpu.ops.conv_s2d_pallas import conv3x3_s2d_fused, pad_s2d, unpad_s2d


def plain_conv(x, w, b):
    y = lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    return y + b


def to_padded_s2d(x):
    return pad_s2d(S.s2d_unshifted(x))


def from_padded_s2d(y):
    return S.d2s(unpad_s2d(y))


@pytest.mark.parametrize("ci,co,hw", [(8, 8, 16), (8, 16, 16), (4, 4, 32)])
def test_relu_mode_matches_xla(rng, ci, co, hw):
    x = jnp.asarray(rng.normal(size=(2, hw, hw, ci)).astype(np.float32))
    w = rng.normal(size=(3, 3, ci, co)).astype(np.float32) * 0.2
    b = rng.normal(size=(co,)).astype(np.float32)
    ref = jax.nn.relu(plain_conv(x, jnp.asarray(w), jnp.asarray(b)))

    w4, b4 = S.conv3x3_to_s2d_kernel(w, b)
    y = conv3x3_s2d_fused(to_padded_s2d(x), jnp.asarray(w4), jnp.asarray(b4),
                          mode="relu")
    np.testing.assert_allclose(np.asarray(from_padded_s2d(y)), np.asarray(ref),
                               atol=1e-4)


def test_none_mode(rng):
    x = jnp.asarray(rng.normal(size=(1, 16, 16, 8)).astype(np.float32))
    w = rng.normal(size=(3, 3, 8, 8)).astype(np.float32) * 0.2
    b = rng.normal(size=(8,)).astype(np.float32)
    ref = plain_conv(x, jnp.asarray(w), jnp.asarray(b))
    w4, b4 = S.conv3x3_to_s2d_kernel(w, b)
    y = conv3x3_s2d_fused(to_padded_s2d(x), jnp.asarray(w4), jnp.asarray(b4),
                          mode="none")
    np.testing.assert_allclose(np.asarray(from_padded_s2d(y)), np.asarray(ref),
                               atol=1e-4)


@pytest.mark.parametrize("pool", ["s2d", "pixel"])
def test_fused_pool_matches_separate_kernels(rng, pool):
    """conv3x3_s2d_fused_pool must bit-match conv followed by the separate
    pool kernel (pool_to_s2d_pallas / pool_s2d_pallas) — it pools the same
    stored values from VMEM instead of re-reading them from HBM."""
    from depgan_tpu.ops.conv_s2d_pallas import (
        conv3x3_s2d_fused_pool,
        pool_s2d_pallas,
        pool_to_s2d_pallas,
    )

    ci, co, hw = 8, 8, 32
    x = jnp.asarray(rng.normal(size=(2, hw, hw, ci)).astype(np.float32))
    w = rng.normal(size=(3, 3, ci, co)).astype(np.float32) * 0.2
    b = rng.normal(size=(co,)).astype(np.float32)
    w4, b4 = S.conv3x3_to_s2d_kernel(w, b)
    xp = to_padded_s2d(x)

    ref_conv = conv3x3_s2d_fused(xp, jnp.asarray(w4), jnp.asarray(b4),
                                 mode="relu", strip=4)
    ref_pool = (pool_to_s2d_pallas(ref_conv) if pool == "s2d"
                else pool_s2d_pallas(ref_conv))

    got_conv, got_pool = conv3x3_s2d_fused_pool(
        xp, jnp.asarray(w4), jnp.asarray(b4), mode="relu", strip=4, pool=pool
    )
    np.testing.assert_array_equal(np.asarray(got_conv), np.asarray(ref_conv))
    np.testing.assert_array_equal(np.asarray(got_pool), np.asarray(ref_pool))


def test_fused_pool_end_to_end_forward(rng, monkeypatch):
    """FastGenerator with fuse_pool=1 must reproduce the default fused
    forward exactly (the knob only moves the pools into the conv kernels)."""
    from depgan_tpu.config import ModelConfig
    from depgan_tpu.models import init_generator
    from depgan_tpu.ops.fast_gen import FastGenerator

    cfg = ModelConfig(image_size=32, first_fm=4, n_input_channels=1,
                      compute_dtype="bfloat16")
    _, variables = init_generator(cfg, jax.random.key(0))
    x = jnp.asarray(rng.uniform(0, 1, (2, 32, 32, 1)).astype(np.float32))
    z = jnp.asarray(rng.normal(size=(2, 32, 1)).astype(np.float32))

    monkeypatch.setenv("DEPGAN_FUSE_POOL", "0")
    fg = FastGenerator(cfg, variables, pallas_levels=(1, 2))
    assert not fg.fuse_pool
    base = np.asarray(fg(x, z))

    # Round-4 default: FastGenerator fuses the pools (measured +0.5% on
    # chip, validated tol 0); the env knob still provides the baseline.
    monkeypatch.delenv("DEPGAN_FUSE_POOL")
    fg2 = FastGenerator(cfg, variables, pallas_levels=(1, 2))
    assert fg2.fuse_pool
    np.testing.assert_array_equal(np.asarray(fg2(x, z)), base)


def test_film_mode_matches_site_semantics(rng):
    """mode='film' must equal: trunk + relu(conv(trunk)*gamma + beta)
    (the generator's full FiLM site, reference :401-407)."""
    b_sz, hw, c = 2, 16, 8
    x = jnp.asarray(rng.normal(size=(b_sz, hw, hw, c)).astype(np.float32))
    w = rng.normal(size=(3, 3, c, c)).astype(np.float32) * 0.2
    bias = rng.normal(size=(c,)).astype(np.float32)
    gamma = rng.normal(size=(b_sz, c)).astype(np.float32)
    beta = rng.normal(size=(b_sz, c)).astype(np.float32)

    conv = plain_conv(x, jnp.asarray(w), jnp.asarray(bias))
    ref = x + jax.nn.relu(conv * gamma[:, None, None, :] + beta[:, None, None, :])

    w4, b4 = S.conv3x3_to_s2d_kernel(w, bias)
    g4 = jnp.asarray(np.tile(gamma, (1, 4)))
    be4 = jnp.asarray(np.tile(beta, (1, 4)))
    y = conv3x3_s2d_fused(to_padded_s2d(x), jnp.asarray(w4), jnp.asarray(b4),
                          g4, be4, mode="film")
    np.testing.assert_allclose(np.asarray(from_padded_s2d(y)), np.asarray(ref),
                               atol=1e-4)


def test_border_ring_is_zero(rng):
    x = jnp.asarray(rng.normal(size=(1, 16, 16, 4)).astype(np.float32))
    w = rng.normal(size=(3, 3, 4, 4)).astype(np.float32)
    b = rng.normal(size=(4,)).astype(np.float32)
    w4, b4 = S.conv3x3_to_s2d_kernel(w, b)
    y = conv3x3_s2d_fused(to_padded_s2d(x), jnp.asarray(w4), jnp.asarray(b4))
    y = np.asarray(y)
    assert np.all(y[:, 0] == 0) and np.all(y[:, -1] == 0)
    assert np.all(y[:, :, 0] == 0) and np.all(y[:, :, -1] == 0)


def test_chained_convs(rng):
    """Two fused convs back-to-back with no relayout in between."""
    x = jnp.asarray(rng.normal(size=(1, 16, 16, 8)).astype(np.float32))
    w1 = rng.normal(size=(3, 3, 8, 8)).astype(np.float32) * 0.2
    w2 = rng.normal(size=(3, 3, 8, 8)).astype(np.float32) * 0.2
    b0 = np.zeros(8, np.float32)
    ref = jax.nn.relu(plain_conv(jax.nn.relu(plain_conv(x, jnp.asarray(w1), 0.0)),
                                 jnp.asarray(w2), 0.0))
    w14, _ = S.conv3x3_to_s2d_kernel(w1)
    w24, _ = S.conv3x3_to_s2d_kernel(w2)
    h = conv3x3_s2d_fused(to_padded_s2d(x), jnp.asarray(w14), jnp.asarray(np.tile(b0, 4)))
    y = conv3x3_s2d_fused(h, jnp.asarray(w24), jnp.asarray(np.tile(b0, 4)))
    np.testing.assert_allclose(np.asarray(from_padded_s2d(y)), np.asarray(ref),
                               atol=1e-4)


@pytest.mark.parametrize("mode", ["relu", "none", "film"])
def test_aligned_staging_codegen_matches_rotating(rng, mode, monkeypatch):
    """ALIGNED_STAGING=True (lane-aligned staging + static weight row-block
    reversal) is a pure codegen change: outputs must be bit-comparable to
    the default rotating staging for every epilogue mode."""
    from depgan_tpu.ops import conv_s2d_pallas as csp

    b_sz, hw, c = 2, 16, 8
    x = jnp.asarray(rng.normal(size=(b_sz, hw, hw, c)).astype(np.float32))
    w = rng.normal(size=(3, 3, c, c)).astype(np.float32) * 0.2
    bias = rng.normal(size=(c,)).astype(np.float32)
    w4, b4 = S.conv3x3_to_s2d_kernel(w, bias)
    gm = jnp.asarray(np.tile(rng.normal(size=(b_sz, c)).astype(np.float32),
                             (1, 4)))
    bt = jnp.asarray(np.tile(rng.normal(size=(b_sz, c)).astype(np.float32),
                             (1, 4)))
    args = ((gm, bt) if mode == "film" else (None, None))
    outs = []
    for aligned in (False, True):
        monkeypatch.setattr(csp, "ALIGNED_STAGING", aligned)
        outs.append(np.asarray(conv3x3_s2d_fused(
            to_padded_s2d(x), jnp.asarray(w4), jnp.asarray(b4),
            *args, mode=mode)))
    np.testing.assert_allclose(outs[0], outs[1], atol=1e-5)


def test_aligned_staging_fused2_matches(rng, monkeypatch):
    from depgan_tpu.ops import conv_s2d_pallas as csp
    from depgan_tpu.ops.conv_s2d_pallas import conv3x3_s2d_fused2

    x1 = jnp.asarray(rng.normal(size=(1, 16, 16, 8)).astype(np.float32))
    x2 = jnp.asarray(rng.normal(size=(1, 16, 16, 8)).astype(np.float32))
    w1 = rng.normal(size=(3, 3, 8, 8)).astype(np.float32) * 0.2
    w2 = rng.normal(size=(3, 3, 8, 8)).astype(np.float32) * 0.2
    b = rng.normal(size=(8,)).astype(np.float32)
    w14, b4 = S.conv3x3_to_s2d_kernel(w1, b)
    w24, _ = S.conv3x3_to_s2d_kernel(w2)
    outs = []
    for aligned in (False, True):
        monkeypatch.setattr(csp, "ALIGNED_STAGING", aligned)
        outs.append(np.asarray(conv3x3_s2d_fused2(
            to_padded_s2d(x1), to_padded_s2d(x2),
            jnp.asarray(w14), jnp.asarray(w24), jnp.asarray(b4))))
    np.testing.assert_allclose(outs[0], outs[1], atol=1e-5)


def test_stream_out_matches_plain_all_paths(rng, monkeypatch):
    """STREAM_OUT=True (streaming output stores: out in ANY/HBM, strip
    results DMA'd from a 2-slot VMEM ring while the next strip's matmuls
    run — see _StreamOut) is a pure codegen change: every streamed path
    (relu/film conv, two-operand fused2, both pool fusions) must
    bit-match the whole-plane VMEM-block store it replaces."""
    from depgan_tpu.ops import conv_s2d_pallas as csp
    from depgan_tpu.ops.conv_s2d_pallas import (
        conv3x3_s2d_fused2,
        conv3x3_s2d_fused_pool,
    )

    b_sz, hw, c = 2, 16, 8
    x = jnp.asarray(rng.normal(size=(b_sz, hw, hw, c)).astype(np.float32))
    x2 = jnp.asarray(rng.normal(size=(b_sz, hw, hw, c)).astype(np.float32))
    w = rng.normal(size=(3, 3, c, c)).astype(np.float32) * 0.2
    w2 = rng.normal(size=(3, 3, c, c)).astype(np.float32) * 0.2
    bias = rng.normal(size=(c,)).astype(np.float32)
    w4, b4 = S.conv3x3_to_s2d_kernel(w, bias)
    w24, _ = S.conv3x3_to_s2d_kernel(w2)
    gm = jnp.asarray(np.tile(rng.normal(size=(b_sz, c)).astype(np.float32),
                             (1, 4)))
    bt = jnp.asarray(np.tile(rng.normal(size=(b_sz, c)).astype(np.float32),
                             (1, 4)))
    xp, x2p = to_padded_s2d(x), to_padded_s2d(x2)
    w4j, w24j, b4j = jnp.asarray(w4), jnp.asarray(w24), jnp.asarray(b4)

    def run_all():
        return [
            conv3x3_s2d_fused(xp, w4j, b4j, mode="relu"),
            conv3x3_s2d_fused(xp, w4j, b4j, gm, bt, mode="film"),
            conv3x3_s2d_fused2(xp, x2p, w4j, w24j, b4j),
            *conv3x3_s2d_fused_pool(xp, w4j, b4j, pool="s2d"),
            *conv3x3_s2d_fused_pool(xp, w4j, b4j, pool="pixel"),
        ]

    outs = []
    for streamed in (False, True):
        monkeypatch.setattr(csp, "STREAM_OUT", streamed)
        outs.append([np.asarray(o) for o in run_all()])
    for plain, streamed in zip(*outs):
        # Streamed padded-s2d outputs carry their column dim padded to a
        # multiple of 8 (_stream_cols) with constant-zero pad columns;
        # cropped to the plain width they must BIT-match.
        cols = plain.shape[2]
        np.testing.assert_array_equal(plain, streamed[:, :, :cols])
        if streamed.shape[2] > cols:
            np.testing.assert_array_equal(
                streamed[:, :, cols:], np.zeros_like(streamed[:, :, cols:])
            )


def test_stream_out_chained_consumers_match_plain(rng, monkeypatch):
    """A streamed conv's COLUMN-PADDED output must be consumed correctly by
    every downstream kernel (conv/film/fused2/pools/deconv derive N from
    rows and read cols [0, N+2) only) — a two-kernel chain plus the
    relayout kernels must match the plain-store chain exactly."""
    from depgan_tpu.ops import conv_s2d_pallas as csp
    from depgan_tpu.ops.conv_s2d_pallas import (
        deconv_s2d_pallas,
        pool_s2d_pallas,
        pool_to_s2d_pallas,
    )

    b_sz, hw, c = 2, 16, 8
    x = jnp.asarray(rng.normal(size=(b_sz, hw, hw, c)).astype(np.float32))
    w = rng.normal(size=(3, 3, c, c)).astype(np.float32) * 0.2
    w2c = rng.normal(size=(3, 3, c, c)).astype(np.float32) * 0.2
    bias = rng.normal(size=(c,)).astype(np.float32)
    w4, b4 = S.conv3x3_to_s2d_kernel(w, bias)
    w24, b24 = S.conv3x3_to_s2d_kernel(w2c, bias)
    # deconv takes (C, 4O) with C = conv-out channels per s2d group (= c
    # here) — pick O = 2.
    wd = rng.normal(size=(c, 8)).astype(np.float32) * 0.2
    bd = rng.normal(size=(8,)).astype(np.float32)
    xp = to_padded_s2d(x)
    w4j, b4j = jnp.asarray(w4), jnp.asarray(b4)
    w24j, b24j = jnp.asarray(w24), jnp.asarray(b24)
    wdj, bdj = jnp.asarray(wd), jnp.asarray(bd)

    def chain():
        h = conv3x3_s2d_fused(xp, w4j, b4j, mode="relu")
        h2 = conv3x3_s2d_fused(h, w24j, b24j, mode="relu")
        return [
            h2,
            pool_s2d_pallas(h),
            pool_to_s2d_pallas(h),
            deconv_s2d_pallas(h, wdj, bdj),
        ]

    outs = []
    for streamed in (False, True):
        monkeypatch.setattr(csp, "STREAM_OUT", streamed)
        outs.append([np.asarray(o) for o in chain()])
    for plain, streamed in zip(*outs):
        cols = plain.shape[2]
        np.testing.assert_array_equal(plain, streamed[:, :, :cols])


def test_stream_out_gradients_match_plain(rng, monkeypatch):
    """The custom VJPs run their backward convs through the same streamed
    impls — gradients with STREAM_OUT on must equal the plain-store path."""
    from depgan_tpu.ops import conv_s2d_pallas as csp
    from depgan_tpu.ops.conv_s2d_pallas import conv3x3_s2d_fused2

    b_sz, hw, c = 1, 16, 8
    x = jnp.asarray(rng.normal(size=(b_sz, hw, hw, c)).astype(np.float32))
    x2 = jnp.asarray(rng.normal(size=(b_sz, hw, hw, c)).astype(np.float32))
    w = rng.normal(size=(3, 3, c, c)).astype(np.float32) * 0.2
    w2 = rng.normal(size=(3, 3, c, c)).astype(np.float32) * 0.2
    bias = rng.normal(size=(c,)).astype(np.float32)
    w4, b4 = S.conv3x3_to_s2d_kernel(w, bias)
    w24, _ = S.conv3x3_to_s2d_kernel(w2)
    xp, x2p = to_padded_s2d(x), to_padded_s2d(x2)
    w4j, w24j, b4j = jnp.asarray(w4), jnp.asarray(w24), jnp.asarray(b4)

    def loss1(xp_, w4_, b4_):
        return jnp.sum(conv3x3_s2d_fused(xp_, w4_, b4_, mode="relu") ** 2)

    def loss2(x1_, x2_, wa_, wb_, b_):
        return jnp.sum(conv3x3_s2d_fused2(x1_, x2_, wa_, wb_, b_) ** 2)

    from depgan_tpu.ops.conv_s2d_pallas import deconv_s2d_pallas

    wd = jnp.asarray(rng.normal(size=(c, 8)).astype(np.float32) * 0.2)
    bd = jnp.asarray(rng.normal(size=(8,)).astype(np.float32))

    def loss3(xp_, wd_, bd_):
        # interior sum only: the streamed deconv output carries extra
        # zero pad columns, so a full-plane sum would still match — the
        # interior sum additionally pins the VJP's cotangent crop.
        y = deconv_s2d_pallas(xp_, wd_, bd_)
        nn_ = y.shape[1] - 2
        return jnp.sum(y[:, 1 : nn_ + 1, 1 : nn_ + 1, :] ** 2)

    grads = []
    for streamed in (False, True):
        monkeypatch.setattr(csp, "STREAM_OUT", streamed)
        g1 = jax.grad(loss1, argnums=(0, 1, 2))(xp, w4j, b4j)
        g2 = jax.grad(loss2, argnums=(0, 1, 2, 3, 4))(
            xp, x2p, w4j, w24j, b4j)
        g3 = jax.grad(loss3, argnums=(0, 1, 2))(xp, wd, bd)
        grads.append([np.asarray(g) for g in (*g1, *g2, *g3)])
    for plain, streamed in zip(*grads):
        np.testing.assert_array_equal(plain, streamed)
