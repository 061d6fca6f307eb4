"""On-chip validation of every Pallas kernel at PRODUCTION shapes.

The CPU test suite runs the kernels in interpret mode, which exercises
their math but NOT the Mosaic lowering — a Mosaic miscompile (wrong
codegen for specific shapes) is invisible to it. Round 2 found exactly
that: the staged-u2s conv produced wrong values for input c4=128 at
n >= 64 on real TPU while bit-matching in interpret mode. This script is
the guard: every kernel, at every shape the generator/critic actually
uses, checked against its XLA twin on the real chip.

Run (real TPU): python scripts/onchip_validate.py
Exit code 0 iff every check passes its tolerance.
"""
from __future__ import annotations

import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from depgan_tpu.ops import s2d_conv as S
from depgan_tpu.ops.conv_s2d_pallas import (
    conv3x3_s2d_fused,
    conv3x3_s2d_fused2,
    conv5x5_s2d_fused,
    deconv_s2d_pallas,
    entry_pack,
    pad_s2d,
    pool_s2d_pallas,
    pool_to_s2d_pallas,
    unpad_s2d,
)

DT = jnp.bfloat16
FAILS = []


def _check(name, got, want, tol):
    err = float(jnp.max(jnp.abs(got.astype(jnp.float32)
                                - want.astype(jnp.float32))))
    ok = err <= tol
    print(f"{'ok ' if ok else 'FAIL'} {name}: max err {err:.5f} "
          f"(tol {tol})", flush=True)
    if not ok:
        FAILS.append((name, err))


def _conv_ref(x, w, b, relu=True):
    y = lax.conv_general_dilated(
        x.astype(DT), w.astype(DT), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ).astype(jnp.float32) + b
    return jax.nn.relu(y) if relu else y


def check_conv3(n, cin, cout, strip, b=4, tol=0.08, seed=0):
    x = jax.random.normal(jax.random.key(seed), (b, 2 * n, 2 * n, cin),
                          jnp.float32)
    w = jax.random.normal(jax.random.key(seed + 1), (3, 3, cin, cout),
                          jnp.float32) * 0.05
    bias = jax.random.normal(jax.random.key(seed + 2), (cout,),
                             jnp.float32) * 0.1
    w4, b4 = S.conv3x3_to_s2d_kernel_j(w, bias)

    def fused(x):
        xp = pad_s2d(S.s2d_unshifted(x.astype(DT)))
        yp = conv3x3_s2d_fused(xp, w4, b4, mode="relu", strip=strip)
        return S.d2s(unpad_s2d(yp))

    _check(f"conv3x3 n={n} c={cin}->{cout} strip={strip}",
           jax.jit(fused)(x), jax.jit(lambda x: _conv_ref(x, w, bias))(x),
           tol)


def check_film(n, cin, strip, b=4, tol=0.2, seed=3):
    """mode='film': out = x + relu(conv(x)*gamma + beta) (FiLM site)."""
    x = jax.random.normal(jax.random.key(seed), (b, 2 * n, 2 * n, cin),
                          jnp.float32)
    w = jax.random.normal(jax.random.key(seed + 1), (3, 3, cin, cin),
                          jnp.float32) * 0.05
    bias = jnp.zeros((cin,), jnp.float32)
    gamma = jax.random.normal(jax.random.key(seed + 2), (b, cin))
    beta = jax.random.normal(jax.random.key(seed + 3), (b, cin))
    w4, b4 = S.conv3x3_to_s2d_kernel_j(w, bias)

    def ref(x):
        pre = _conv_ref(x, w, bias, relu=False)
        return x.astype(jnp.float32) + jax.nn.relu(
            pre * gamma[:, None, None, :] + beta[:, None, None, :])

    def fused(x):
        xp = pad_s2d(S.s2d_unshifted(x.astype(DT)))
        yp = conv3x3_s2d_fused(
            xp, w4, b4, S.tile_channel_params(gamma),
            S.tile_channel_params(beta), mode="film", strip=strip)
        return S.d2s(unpad_s2d(yp))

    _check(f"film    n={n} c={cin} strip={strip}",
           jax.jit(fused)(x), jax.jit(ref)(x), tol)


def check_conv3_fused2(n, c_up, c_skip, cout, strip, b=4, tol=0.08, seed=5):
    x1 = jax.random.normal(jax.random.key(seed), (b, 2 * n, 2 * n, c_up),
                           jnp.float32)
    x2 = jax.random.normal(jax.random.key(seed + 1), (b, 2 * n, 2 * n, c_skip),
                           jnp.float32)
    w = jax.random.normal(jax.random.key(seed + 2),
                          (3, 3, c_up + c_skip, cout), jnp.float32) * 0.05
    bias = jax.random.normal(jax.random.key(seed + 3), (cout,),
                             jnp.float32) * 0.1
    w4u, b4 = S.conv3x3_to_s2d_kernel_j(w[:, :, :c_up, :], bias)
    w4s, _ = S.conv3x3_to_s2d_kernel_j(w[:, :, c_up:, :])

    def ref(x1, x2):
        return _conv_ref(jnp.concatenate([x1, x2], axis=-1), w, bias)

    def fused(x1, x2):
        p1 = pad_s2d(S.s2d_unshifted(x1.astype(DT)))
        p2 = pad_s2d(S.s2d_unshifted(x2.astype(DT)))
        yp = conv3x3_s2d_fused2(p1, p2, w4u, w4s, b4, strip=strip)
        return S.d2s(unpad_s2d(yp))

    _check(f"fused2  n={n} c={c_up}+{c_skip}->{cout} strip={strip}",
           jax.jit(fused)(x1, x2), jax.jit(ref)(x1, x2), tol)


def check_conv5(n, cin, cout, strip, b=4, tol=0.15, seed=7):
    x = jax.random.normal(jax.random.key(seed), (b, 2 * n, 2 * n, cin),
                          jnp.float32)
    w = jax.random.normal(jax.random.key(seed + 1), (5, 5, cin, cout),
                          jnp.float32) * 0.05
    bias = jax.random.normal(jax.random.key(seed + 2), (cout,),
                             jnp.float32) * 0.1

    def ref(x):
        y = lax.conv_general_dilated(
            x.astype(DT), w.astype(DT), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ).astype(jnp.float32) + bias
        return jax.nn.relu(y)

    def fused(x):
        xp = pad_s2d(S.s2d_unshifted(x.astype(DT)))
        yp = conv5x5_s2d_fused(xp, w, bias, mode="relu", strip=strip)
        return S.d2s(unpad_s2d(yp))

    _check(f"conv5x5 n={n} c={cin}->{cout} strip={strip}",
           jax.jit(fused)(x), jax.jit(ref)(x), tol)


def check_pools(n, cin, b=4, tol=0.0, seed=9):
    x = jax.random.normal(jax.random.key(seed), (b, 2 * n, 2 * n, cin),
                          jnp.float32).astype(DT)
    xp = jax.jit(lambda x: pad_s2d(S.s2d_unshifted(x)))(x)
    from flax import linen as nn

    want_px = jax.jit(lambda x: nn.max_pool(x, (2, 2), (2, 2)))(x)
    _check(f"pool_s2d n={n} c={cin}",
           jax.jit(pool_s2d_pallas)(xp), want_px, tol)

    want_next = jax.jit(lambda t: pad_s2d(S.s2d_unshifted(t)))(want_px)
    _check(f"pool_to_s2d n={n} c={cin}",
           jax.jit(pool_to_s2d_pallas)(xp), want_next, tol)


def check_deconv(m, cin, cout, b=4, tol=0.08, seed=11):
    """deconv_s2d_pallas vs Deconv2x2-as-matmul + relu + pad."""
    x = jax.random.normal(jax.random.key(seed), (b, 2 * m, 2 * m, cin),
                          jnp.float32).astype(DT)
    k = jax.random.normal(jax.random.key(seed + 1), (2, 2, cout, cin),
                          jnp.float32).astype(DT) * 0.1
    bias = jax.random.normal(jax.random.key(seed + 2), (cout,),
                             jnp.float32).astype(DT) * 0.1

    from depgan_tpu.ops.fast_gen import _deconv_matmul

    def ref(x):
        up = jax.nn.relu(_deconv_matmul(x, k, bias))  # unshifted s2d level
        return pad_s2d(up)

    def fused(x):
        xp = pad_s2d(S.s2d_unshifted(x))
        w2 = jnp.transpose(k, (3, 0, 1, 2)).reshape(cin, -1)
        return deconv_s2d_pallas(xp, w2, jnp.tile(bias, 4))

    _check(f"deconv m={m} c={cin}->{cout}",
           jax.jit(fused)(x), jax.jit(ref)(x), tol)


def check_entry(n, c_pad, b=4, tol=0.0, seed=13):
    x = jax.random.normal(jax.random.key(seed), (b, 2 * n, 2 * n, 1),
                          jnp.float32).astype(DT)

    def ref(x):
        s2d = S.s2d_unshifted(x)
        s2d = jnp.pad(s2d, ((0, 0), (1, 1), (1, 1), (0, 0)))
        grp = s2d.reshape(b, n + 2, n + 2, 4, 1)
        grp = jnp.pad(grp, ((0, 0),) * 3 + ((0, 0), (0, c_pad - 1)))
        return grp.reshape(b, n + 2, n + 2, 4 * c_pad)

    _check(f"entry_pack n={n} pad={c_pad}",
           jax.jit(lambda x: entry_pack(x, c_pad=c_pad))(x),
           jax.jit(ref)(x), tol)


def main():
    float(jax.jit(lambda v: (v @ v).sum())(jnp.ones((128, 128))))
    print(f"backend: {jax.default_backend()}", flush=True)

    # generator level-1 shapes (256x256 image, first_fm 32)
    check_conv3(128, 32, 32, 16)
    check_conv3(128, 8, 32, 16, seed=20)   # entry conv (pad 8)
    check_film(128, 32, 16)
    check_conv3_fused2(128, 32, 32, 32, 16)
    # generator level-2 shapes
    check_conv3(64, 32, 64, 16, seed=30)
    check_conv3(64, 64, 64, 16, seed=31)
    check_film(64, 64, 16)
    check_conv3_fused2(64, 64, 64, 64, 16)
    # critic shapes
    check_conv5(128, 4, 16, 16)
    check_conv5(128, 16, 16, 16)
    check_conv5(64, 16, 32, 16, seed=40)
    check_conv5(64, 32, 32, 16, seed=41)
    # relayouts
    check_pools(128, 32)
    check_pools(64, 64)
    check_pools(128, 16)
    check_deconv(64, 64, 32)
    check_deconv(32, 96, 64)
    check_entry(128, 8)
    check_entry(128, 4)

    print(f"\n{len(FAILS)} failures", flush=True)
    sys.exit(1 if FAILS else 0)


if __name__ == "__main__":
    main()
