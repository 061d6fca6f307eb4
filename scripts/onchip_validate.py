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
    conv3x3_s2d_fused_head,
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
    if got.shape != want.shape:
        # STREAM_OUT planes carry zero pad columns beyond the exact twin's
        # width (conv_s2d_pallas._stream_cols): the pad must be EXACT zeros
        # and the cropped interior is what the twin check compares.
        sl = tuple(slice(0, s) for s in want.shape)
        pad_max = float(jnp.max(jnp.abs(got[:, :, want.shape[2]:, :])))
        if pad_max != 0.0:
            print(f"FAIL {name}: nonzero stream pad cols ({pad_max})",
                  flush=True)
            FAILS.append((f"{name}[stream pad]", pad_max))
        got = got[sl]
    err = float(jnp.max(jnp.abs(got.astype(jnp.float32)
                                - want.astype(jnp.float32))))
    ok = err <= tol
    print(f"{'ok ' if ok else 'FAIL'} {name}: max err {err:.5f} "
          f"(tol {tol})", flush=True)
    if not ok:
        FAILS.append((name, err))


def _check_tree(name, got, want, rtol):
    """Relative-max-error check over a pytree of gradients."""
    for i, (g, w) in enumerate(zip(jax.tree.leaves(got), jax.tree.leaves(want))):
        g = jnp.asarray(g, jnp.float32)
        w = jnp.asarray(w, jnp.float32)
        scale = float(jnp.max(jnp.abs(w))) + 1e-6
        err = float(jnp.max(jnp.abs(g - w))) / scale
        ok = err <= rtol
        print(f"{'ok ' if ok else 'FAIL'} {name}[leaf{i}]: rel err {err:.5f} "
              f"(rtol {rtol})", flush=True)
        if not ok:
            FAILS.append((f"{name}[leaf{i}]", err))


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


def check_conv3_pool(n, cin, cout, strip, pool, b=4, tol=0.0, seed=21):
    """conv3x3_s2d_fused_pool vs conv3x3_s2d_fused + the separate pool
    kernel — the fused epilogue pools the SAME stored values, so the match
    must be exact (tol 0)."""
    from depgan_tpu.ops.conv_s2d_pallas import conv3x3_s2d_fused_pool

    x = jax.random.normal(jax.random.key(seed), (b, 2 * n, 2 * n, cin),
                          jnp.float32)
    w = jax.random.normal(jax.random.key(seed + 1), (3, 3, cin, cout),
                          jnp.float32) * 0.05
    bias = jax.random.normal(jax.random.key(seed + 2), (cout,),
                             jnp.float32) * 0.1
    w4, b4 = S.conv3x3_to_s2d_kernel_j(w, bias)

    def sep(x):
        xp = pad_s2d(S.s2d_unshifted(x.astype(DT)))
        yp = conv3x3_s2d_fused(xp, w4, b4, mode="relu", strip=strip)
        pooled = (pool_to_s2d_pallas(yp) if pool == "s2d"
                  else pool_s2d_pallas(yp))
        return yp, pooled

    def fused(x):
        xp = pad_s2d(S.s2d_unshifted(x.astype(DT)))
        return conv3x3_s2d_fused_pool(xp, w4, b4, mode="relu", strip=strip,
                                      pool=pool)

    want_y, want_p = jax.jit(sep)(x)
    got_y, got_p = jax.jit(fused)(x)
    _check(f"conv3+pool[{pool}] n={n} c={cin}->{cout} (conv out)",
           got_y, want_y, tol)
    _check(f"conv3+pool[{pool}] n={n} c={cin}->{cout} (pooled)",
           got_p, want_p, tol)


def check_chain3(n, cin, cmid, cout, strip, pool="", c_skip=0, b=4, tol=0.0,
                 seed=60):
    """conv3x3_s2d_chain3 (whole site in one kernel, round 5) vs the exact
    sequential composition it replaces — intermediates are dtype-rounded in
    VMEM exactly as the HBM round trip rounds them, so tol 0."""
    from depgan_tpu.ops.conv_s2d_pallas import (
        conv3x3_s2d_chain3,
        conv3x3_s2d_fused_pool,
    )

    k = jax.random.key
    two_op = c_skip > 0
    c4i, c4b, c4m, c4o = 4 * cin, 4 * c_skip, 4 * cmid, 4 * cout
    x1 = jax.random.normal(k(seed), (b, n + 2, n + 2, c4i), jnp.float32)
    x1 = jnp.asarray(x1, DT).at[:, 0].set(0).at[:, -1].set(0)
    x1 = x1.at[:, :, 0].set(0).at[:, :, -1].set(0)
    if two_op:
        x2 = jax.random.normal(k(seed + 9), (b, n + 2, n + 2, c4b),
                               jnp.float32)
        x2 = jnp.asarray(x2, DT).at[:, 0].set(0).at[:, -1].set(0)
        x2 = x2.at[:, :, 0].set(0).at[:, :, -1].set(0)
    w1a = jnp.asarray(
        jax.random.normal(k(seed + 1), (2, 2, c4i, c4m)) * 0.05, DT)
    w1b = (jnp.asarray(
        jax.random.normal(k(seed + 2), (2, 2, c4b, c4m)) * 0.05, DT)
        if two_op else None)
    b1 = jax.random.normal(k(seed + 3), (c4m,), jnp.float32) * 0.1
    wf = jnp.asarray(
        jax.random.normal(k(seed + 4), (2, 2, c4m, c4m)) * 0.05, DT)
    bf = jax.random.normal(k(seed + 5), (c4m,), jnp.float32) * 0.1
    g = jax.random.normal(k(seed + 6), (b, c4m), jnp.float32)
    bt = jax.random.normal(k(seed + 7), (b, c4m), jnp.float32)
    w3 = jnp.asarray(
        jax.random.normal(k(seed + 8), (2, 2, c4m, c4o)) * 0.05, DT)
    b3 = jax.random.normal(k(seed + 10), (c4o,), jnp.float32) * 0.1

    def seq(x1, *x2s):
        if two_op:
            h0 = conv3x3_s2d_fused2(x1, x2s[0], w1a, w1b, b1, strip=strip)
        else:
            h0 = conv3x3_s2d_fused(x1, w1a, b1, mode="relu", strip=strip)
        s = conv3x3_s2d_fused(h0, wf, bf, g, bt, mode="film", strip=strip)
        if pool:
            return conv3x3_s2d_fused_pool(s, w3, b3, mode="relu",
                                          strip=strip, pool=pool)
        return conv3x3_s2d_fused(s, w3, b3, mode="relu", strip=strip)

    def chain(x1, *x2s):
        return conv3x3_s2d_chain3(
            x1, w1a, b1, wf, bf, g, bt, w3, b3,
            x2_padded=x2s[0] if two_op else None, w1b4=w1b,
            strip=strip, pool=pool)

    args = (x1, x2) if two_op else (x1,)
    want = jax.jit(seq)(*args)
    got = jax.jit(chain)(*args)
    tag = (f"chain3 n={n} c={cin}" + (f"+{c_skip}" if two_op else "")
           + f"->{cmid}->{cout}" + (f" pool[{pool}]" if pool else ""))
    if pool:
        _check(f"{tag} (conv out)", got[0], want[0], tol)
        _check(f"{tag} (pooled)", got[1], want[1], tol)
    else:
        _check(tag, got, want, tol)


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


def check_film_residual(hw, c, b=16, tol=0.02, seed=14):
    """ops/film_pallas.film_residual vs its XLA reference, forward + the
    custom-VJP gradients. This kernel serves the PLAIN (use_pallas Flax)
    generator path; round 3 found its gamma/beta BlockSpec violated
    Mosaic's trailing-dims rule for b > 1 — a compile error no CPU test
    could see, so it gets the same on-chip guard as the conv kernels."""
    from depgan_tpu.ops.film_pallas import film_residual, film_residual_reference

    ks = jax.random.split(jax.random.key(seed), 4)
    h = jax.random.normal(ks[0], (b, hw, hw, c), jnp.float32).astype(DT)
    trunk = jax.random.normal(ks[1], (b, hw, hw, c), jnp.float32).astype(DT)
    gamma = jax.random.normal(ks[2], (b, c), jnp.float32)
    beta = jax.random.normal(ks[3], (b, c), jnp.float32)
    # The kernel casts gamma/beta to h.dtype (in the model both paths get
    # bf16 site mods anyway); match that in the reference so the residual
    # diff is one elementwise bf16 rounding (tol 0.02), not a layout bug.
    gb, bb = gamma.astype(DT), beta.astype(DT)
    _check(f"film_residual hw={hw} c={c} b={b}",
           jax.jit(film_residual)(h, gb, bb, trunk),
           jax.jit(film_residual_reference)(h, gb, bb, trunk), tol)
    cot = jax.random.normal(jax.random.key(seed + 1), (b, hw, hw, c),
                            jnp.float32)
    loss = lambda f: lambda *a: jnp.sum(f(*a).astype(jnp.float32) * cot)
    g_got = jax.jit(jax.grad(loss(film_residual), argnums=(0, 1, 2, 3)))(
        h, gamma, beta, trunk)
    g_want = jax.jit(jax.grad(loss(film_residual_reference),
                              argnums=(0, 1, 2, 3)))(h, gamma, beta, trunk)
    _check_tree(f"grad film_residual hw={hw} c={c}", g_got, g_want, 0.01)


def check_head(n, cin, cout, strip, b=4, tol=0.05, seed=15):
    # tol: the fused head matmuls the UNROUNDED f32 conv accumulator while
    # the XLA ref rounds the conv output to bf16 first — the fused result
    # is the more exact one; the diff is the ref's output-rounding noise
    # through a 32-channel head sum (~0.03 observed at n=128).
    """conv3x3_s2d_fused_head: last decoder conv + 1x1 head + tanh fused."""
    x = jax.random.normal(jax.random.key(seed), (b, 2 * n, 2 * n, cin),
                          jnp.float32)
    w = jax.random.normal(jax.random.key(seed + 1), (3, 3, cin, cout),
                          jnp.float32) * 0.05
    bias = jax.random.normal(jax.random.key(seed + 2), (cout,),
                             jnp.float32) * 0.1
    kh = jax.random.normal(jax.random.key(seed + 3), (1, 1, cout, 1),
                           jnp.float32) * 0.3
    bh = jax.random.normal(jax.random.key(seed + 4), (1,), jnp.float32) * 0.1
    w4, b4 = S.conv3x3_to_s2d_kernel_j(w, bias)
    kh4, bh4 = S.conv1x1_to_s2d_kernel_j(kh, bh)

    def ref(x):
        h = _conv_ref(x, w, bias)
        logits = lax.conv_general_dilated(
            h, kh, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
        ) + bh
        return jnp.tanh(logits)

    def fused(x):
        xp = pad_s2d(S.s2d_unshifted(x.astype(DT)))
        y = conv3x3_s2d_fused_head(xp, w4, b4, kh4, bh4, strip=strip)
        return S.d2s(y)

    _check(f"head    n={n} c={cin}->{cout}->1 strip={strip}",
           jax.jit(fused)(x), jax.jit(ref)(x), tol)


# ---------------------------------------------------------------------------
# Gradient checks (round 3): the custom VJPs and the hand-chained critic
# backward have the same Mosaic exposure as the forwards — every backward
# runs the kernels in primal position at NEW shapes (transposed kernels,
# cotangent inputs), which interpret-mode tests cannot vet.
# ---------------------------------------------------------------------------


def check_conv3_grad(n, cin, cout, strip, mode="relu", b=2, rtol=0.05,
                     seed=50, dt=None):
    """dt=float32 is the rigorous variant: bit-comparable masks, so it
    catches Mosaic layout/hazard bugs; the bf16 default additionally needs
    a loose rtol for film mode, where near-zero pre-activations flip the
    ReLU mask between the fused and ref roundings (an O(1) pointwise diff
    that is rounding noise, not miscompile — the f32 check is the guard)."""
    dt = dt or DT
    x = jax.random.normal(jax.random.key(seed), (b, 2 * n, 2 * n, cin),
                          jnp.float32) * 0.5
    w = jax.random.normal(jax.random.key(seed + 1), (3, 3, cin, cout),
                          jnp.float32) * 0.05
    bias = jax.random.normal(jax.random.key(seed + 2), (cout,),
                             jnp.float32) * 0.1
    gamma = jax.random.normal(jax.random.key(seed + 3), (b, cin)) * 0.5 + 1.0
    beta = jax.random.normal(jax.random.key(seed + 4), (b, cin)) * 0.1
    cot = jax.random.normal(jax.random.key(seed + 5), (b, 2 * n, 2 * n,
                            cin if mode == "film" else cout), jnp.float32)

    def loss_fused(x, w, bias, gamma, beta):
        w4, b4 = S.conv3x3_to_s2d_kernel_j(w, bias)
        xp = pad_s2d(S.s2d_unshifted(x.astype(dt)))
        yp = conv3x3_s2d_fused(
            xp, w4.astype(dt), b4,
            S.tile_channel_params(gamma) if mode == "film" else None,
            S.tile_channel_params(beta) if mode == "film" else None,
            mode=mode, strip=strip)
        return jnp.sum(S.d2s(unpad_s2d(yp)).astype(jnp.float32) * cot)

    def loss_ref(x, w, bias, gamma, beta):
        pre = lax.conv_general_dilated(
            x.astype(dt), w.astype(dt), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ).astype(jnp.float32) + bias
        if mode == "relu":
            y = jax.nn.relu(pre)
        elif mode == "film":
            y = x.astype(jnp.float32) + jax.nn.relu(
                pre * gamma[:, None, None, :] + beta[:, None, None, :])
        else:
            y = pre
        return jnp.sum(y * cot)

    args = (x, w, bias, gamma, beta)
    argnums = (0, 1, 2, 3, 4) if mode == "film" else (0, 1, 2)
    g_fused = jax.jit(jax.grad(loss_fused, argnums=argnums))(*args)
    g_ref = jax.jit(jax.grad(loss_ref, argnums=argnums))(*args)
    _check_tree(f"grad conv3 {mode} n={n} c={cin}->{cout}", g_fused, g_ref,
                rtol)


def check_conv2_grad(n, c_up, c_skip, cout, strip, b=2, rtol=0.05, seed=60):
    x1 = jax.random.normal(jax.random.key(seed), (b, 2 * n, 2 * n, c_up),
                           jnp.float32) * 0.5
    x2 = jax.random.normal(jax.random.key(seed + 1), (b, 2 * n, 2 * n, c_skip),
                           jnp.float32) * 0.5
    w = jax.random.normal(jax.random.key(seed + 2),
                          (3, 3, c_up + c_skip, cout), jnp.float32) * 0.05
    bias = jax.random.normal(jax.random.key(seed + 3), (cout,),
                             jnp.float32) * 0.1
    cot = jax.random.normal(jax.random.key(seed + 4),
                            (b, 2 * n, 2 * n, cout), jnp.float32)

    def loss_fused(x1, x2, w, bias):
        w4u, b4 = S.conv3x3_to_s2d_kernel_j(w[:, :, :c_up, :], bias)
        w4s, _ = S.conv3x3_to_s2d_kernel_j(w[:, :, c_up:, :])
        p1 = pad_s2d(S.s2d_unshifted(x1.astype(DT)))
        p2 = pad_s2d(S.s2d_unshifted(x2.astype(DT)))
        yp = conv3x3_s2d_fused2(p1, p2, w4u.astype(DT), w4s.astype(DT), b4,
                                strip=strip)
        return jnp.sum(S.d2s(unpad_s2d(yp)).astype(jnp.float32) * cot)

    def loss_ref(x1, x2, w, bias):
        y = _conv_ref(jnp.concatenate([x1, x2], axis=-1), w, bias)
        return jnp.sum(y * cot)

    g_fused = jax.jit(jax.grad(loss_fused, argnums=(0, 1, 2, 3)))(x1, x2, w, bias)
    g_ref = jax.jit(jax.grad(loss_ref, argnums=(0, 1, 2, 3)))(x1, x2, w, bias)
    _check_tree(f"grad fused2 n={n} c={c_up}+{c_skip}->{cout}", g_fused,
                g_ref, rtol)


def check_conv5_grad(n, cin, cout, strip, b=2, rtol=0.05, seed=70):
    x = jax.random.normal(jax.random.key(seed), (b, 2 * n, 2 * n, cin),
                          jnp.float32) * 0.5
    w = jax.random.normal(jax.random.key(seed + 1), (5, 5, cin, cout),
                          jnp.float32) * 0.05
    bias = jax.random.normal(jax.random.key(seed + 2), (cout,),
                             jnp.float32) * 0.1
    cot = jax.random.normal(jax.random.key(seed + 3),
                            (b, 2 * n, 2 * n, cout), jnp.float32)

    def loss_fused(x, w, bias):
        xp = pad_s2d(S.s2d_unshifted(x.astype(DT)))
        yp = conv5x5_s2d_fused(xp, w.astype(DT), bias, mode="relu",
                               strip=strip)
        return jnp.sum(S.d2s(unpad_s2d(yp)).astype(jnp.float32) * cot)

    def loss_ref(x, w, bias):
        y = lax.conv_general_dilated(
            x.astype(DT), w.astype(DT), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ).astype(jnp.float32) + bias
        return jnp.sum(jax.nn.relu(y) * cot)

    g_fused = jax.jit(jax.grad(loss_fused, argnums=(0, 1, 2)))(x, w, bias)
    g_ref = jax.jit(jax.grad(loss_ref, argnums=(0, 1, 2)))(x, w, bias)
    _check_tree(f"grad conv5 n={n} c={cin}->{cout}", g_fused, g_ref, rtol)


def check_fused_critic_grads(image_size=256, b=2, rtol=0.08, seed=80,
                             dt=None, tail_s2d=False):
    """FusedCritic: (a) the hand-chained input gradient vs jax.grad of the
    plain Flax critic; (b) the WGAN-GP-style DOUBLE backward — grad wrt
    params of a loss containing the input-grad norm — fused vs plain.

    Run (a) with dt=float32: in bf16 the two paths derive their 4 ReLU
    masks from differently-rounded forwards, and a flipped mask is an O(1)
    pointwise diff that swamps a max-rel check (0.17 observed) while the
    GP norm (b) still agrees to ~1e-3 — the f32 variant is the
    miscompile guard for the pointwise chain."""
    from depgan_tpu.config import ModelConfig
    from depgan_tpu.models.critic import make_critic
    from depgan_tpu.ops.fast_critic import FusedCritic

    dt = dt or DT
    cfg = ModelConfig(image_size=image_size, first_fm=32, n_input_channels=1,
                      compute_dtype=jnp.dtype(dt).name)
    critic = make_critic(cfg)
    params = critic.init({"params": jax.random.key(seed)},
                         jnp.zeros((1, image_size, image_size, 1)))["params"]
    fc = FusedCritic(cfg, compute_dtype=dt, tail_s2d=tail_s2d)
    x = jax.random.uniform(jax.random.key(seed + 1),
                           (b, image_size, image_size, 1), jnp.float32)

    # (a1) hand-chain vs jax.grad THROUGH THE SAME fused forward — same
    # program, same masks: must agree exactly (diagnosed on chip: 0.0 diff
    # in f32; any nonzero here is a real chain bug).
    def plain_sum(x):
        return jnp.sum(critic.apply({"params": params}, x))

    tag = " tail_s2d" if tail_s2d else ""
    dx_plain = jax.jit(jax.grad(plain_sum))(x)
    dx_fused = jax.jit(lambda x: fc.score_and_input_grad(params, x)[1])(x)
    dx_self = jax.jit(jax.grad(
        lambda x: jnp.sum(fc.forward(params, x))))(x)
    _check_tree(f"critic input-grad self{tag} ({jnp.dtype(dt).name})",
                (dx_fused,), (dx_self,), 1e-5 if dt == jnp.float32 else 0.02)
    # (a2) vs the PLAIN critic: a different program (s2d vs XLA conv
    # summation order -> different near-zero ReLU masks), so pointwise
    # max-rel is noise at init-scale gradients (~1e-4); the semantic
    # cross-check is the gradient NORM (what WGAN-GP consumes).
    nf = jnp.linalg.norm(dx_fused.astype(jnp.float32))
    npl = jnp.linalg.norm(dx_plain.astype(jnp.float32))
    err = abs(float(nf) - float(npl)) / (float(npl) + 1e-12)
    ok = err <= rtol
    print(f"{'ok ' if ok else 'FAIL'} critic input-grad norm vs plain{tag} "
          f"({jnp.dtype(dt).name}): rel err {err:.5f} (rtol {rtol})",
          flush=True)
    if not ok:
        FAILS.append((f"critic input-grad norm{tag}", err))

    # (b) GP double backward wrt params
    def gp_fused(p):
        _, g = fc.score_and_input_grad(p, x)
        nrm = jnp.sqrt(jnp.sum(g.astype(jnp.float32) ** 2, axis=(1, 2, 3))
                       + 1e-12)
        return jnp.mean((nrm - 1.0) ** 2)

    def gp_plain(p):
        g = jax.grad(
            lambda xx: jnp.sum(critic.apply({"params": p}, xx))
        )(x)
        nrm = jnp.sqrt(jnp.sum(g.astype(jnp.float32) ** 2, axis=(1, 2, 3))
                       + 1e-12)
        return jnp.mean((nrm - 1.0) ** 2)

    gf = jax.jit(jax.grad(gp_fused))(params)
    gp = jax.jit(jax.grad(gp_plain))(params)
    # Compare the global grad norm + the worst leaf (leaf-wise rel-max over
    # ~20 leaves is dominated by bf16 noise on near-zero leaves).
    nf = jnp.sqrt(sum(jnp.sum(jnp.asarray(l, jnp.float32) ** 2)
                      for l in jax.tree.leaves(gf)))
    np_ = jnp.sqrt(sum(jnp.sum(jnp.asarray(l, jnp.float32) ** 2)
                       for l in jax.tree.leaves(gp)))
    err = abs(float(nf) - float(np_)) / (float(np_) + 1e-9)
    ok = err <= rtol
    print(f"{'ok ' if ok else 'FAIL'} critic GP double-bwd norm{tag}: rel "
          f"err {err:.5f} (rtol {rtol})", flush=True)
    if not ok:
        FAILS.append((f"critic GP double-bwd norm{tag}", err))


def check_superstep_trajectory(image_size=256, batch=4, rtol=0.05, seed=90):
    """ONE fused-vs-plain superstep at production resolution (tiny batch):
    same data + key through use_pallas=False and =True must land on the
    same trajectory (generator loss + param-update norms)."""
    import dataclasses

    import numpy as onp

    from depgan_tpu.config import DataConfig, GanTrainConfig, ModelConfig
    from depgan_tpu.train import GanTrainer

    # The two superstep compiles below are the longest silent stretch of
    # the whole validation (>10 min on a slow remote-compile day) — print
    # so external stall watchdogs can tell compiling from hung.
    print("... superstep trajectory check: compiling fused + plain "
          "supersteps (long silent compiles are normal here)", flush=True)
    rng = onp.random.default_rng(seed)
    n = 2 * batch
    x_all = jnp.asarray(rng.uniform(0, 1, (n, image_size, image_size, 1)),
                        jnp.float32)
    y_all = jnp.asarray(rng.uniform(0, 1, (n, image_size, image_size, 1)),
                        jnp.float32)
    idx = onp.arange(n, dtype=onp.int32).reshape(2, batch)
    results = []
    for use_pallas in (False, True):
        mcfg = ModelConfig(image_size=image_size, first_fm=32,
                           n_input_channels=1, compute_dtype="bfloat16",
                           use_pallas=use_pallas)
        tcfg = GanTrainConfig(batch_size=batch, d_iters=2, warmup_d_iters=2,
                              k_noise=2, validate_every=10_000)
        tr = GanTrainer(mcfg, tcfg, DataConfig())
        s0 = tr.init_state(jax.random.key(0))
        s1, m = tr.superstep(s0, x_all, y_all, idx, n_valid=2,
                             key=jax.random.key(1))
        gnorm = jnp.sqrt(sum(
            jnp.sum(jnp.asarray(l, jnp.float32) ** 2)
            for l in jax.tree.leaves(s1.g_params)))
        results.append((float(m["gen"]["errG"]), float(gnorm),
                        int(m["best_noise_idx"])))
    (e0, n0, b0), (e1, n1, b1) = results
    err = abs(e0 - e1) / (abs(e0) + 1e-6)
    nerr = abs(n0 - n1) / (n0 + 1e-9)
    ok = err <= rtol and nerr <= 1e-3 and b0 == b1
    print(f"{'ok ' if ok else 'FAIL'} superstep trajectory: errG "
          f"{e0:+.4f} vs {e1:+.4f} (rel {err:.4f}), |G| rel {nerr:.6f}, "
          f"probe idx {b0}=={b1}", flush=True)
    if not ok:
        FAILS.append(("superstep trajectory", err))


def main():
    del FAILS[:]  # re-runnable in-process (onchip_session retries phases)
    float(jax.jit(lambda v: (v @ v).sum())(jnp.ones((128, 128))))
    print(f"backend: {jax.default_backend()}", flush=True)

    from depgan_tpu.ops import conv_s2d_pallas as csp

    default_aligned = csp.ALIGNED_STAGING
    default_packed = csp.CONV5_PACKED
    default_stream = csp.STREAM_OUT
    # conv3 family — BOTH staging variants (ALIGNED_STAGING selects
    # lane-aligned staging + weight row-block reversal; validate both
    # codegens so the A/B flag flip is always chip-safe).
    for aligned in (False, True):
        csp.ALIGNED_STAGING = aligned
        print(f"-- conv3 staging: {'aligned' if aligned else 'rotating'}",
              flush=True)
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
        # critic tail_s2d shapes (dis_2/dis_3 at 64^2 pixel -> n=32):
        # forward conv3 at c 32->64 / 64->64 plus the hand-chain's
        # flip-transposed backward shape 64->32.
        check_conv3(32, 32, 64, 16, seed=45)
        check_conv3(32, 64, 64, 16, seed=46)
        check_conv3(32, 64, 32, 16, seed=47)
    csp.ALIGNED_STAGING = default_aligned
    # critic shapes — both conv5 kernel variants (CONV5_PACKED selects the
    # K-packed kernel for c4 <= 64; validate the packed AND dense codegen).
    for packed in (True, False):
        csp.CONV5_PACKED = packed
        print(f"-- conv5 variant: {'packed' if packed else 'dense'}",
              flush=True)
        tag_seed = 0 if packed else 100
        check_conv5(128, 4, 16, 16, seed=7 + tag_seed)
        check_conv5(128, 16, 16, 16, seed=8 + tag_seed)
        check_conv5(64, 16, 32, 16, seed=40 + tag_seed)
        check_conv5(64, 32, 32, 16, seed=41 + tag_seed)
    csp.CONV5_PACKED = default_packed
    # Streaming output stores (round 4): STREAM_OUT moves the conv3
    # family's whole-plane VMEM output block to ANY (HBM) with explicit
    # 2-slot DMA staging so the store overlaps the next strip's matmuls
    # (see conv_s2d_pallas._StreamOut — explicit-semaphore WAR ordering).
    # Validate the streamed codegen of every affected path at production
    # shapes, forward AND grads (the VJP's backward convs stream too).
    csp.STREAM_OUT = True
    print("-- conv3 family: streaming output stores", flush=True)
    check_conv3(128, 32, 32, 16)
    check_conv3(128, 8, 32, 16, seed=20)
    check_film(128, 32, 16)
    check_conv3_fused2(128, 32, 32, 32, 16)
    check_conv3(64, 64, 64, 16, seed=31)
    check_conv3_pool(128, 32, 32, 16, pool="s2d")
    check_conv3_pool(64, 64, 64, 16, pool="pixel")
    check_deconv(64, 64, 32)   # production L1 deconv, streamed
    check_deconv(32, 96, 64)   # production L2 deconv, streamed
    check_conv3_grad(128, 32, 32, 16, mode="relu")
    check_conv3_grad(128, 32, 32, 16, mode="film", dt=jnp.float32,
                     rtol=0.02)
    check_conv2_grad(128, 32, 32, 32, 16)
    csp.STREAM_OUT = default_stream
    # conv+pool fusion (round 4): the conv emits its own pool from VMEM.
    # Production sites: gen_1 (n=128, 32ch, pool->s2d) and gen_3 (n=64,
    # 64ch, pool->pixel); must bit-match conv followed by the pool kernel.
    check_conv3_pool(128, 32, 32, 16, pool="s2d")
    check_conv3_pool(64, 64, 64, 16, pool="pixel")
    check_conv3_pool(64, 32, 64, 16, pool="s2d", seed=22)
    # whole-site chain kernel (round 5): the four production sites of
    # FastGenerator's fuse_chain path (enc m1/m2 with their fuse_pool
    # variants, dec p2/p1 two-operand) — must bit-match the sequential
    # kernel composition (tol 0).
    check_chain3(128, 8, 32, 32, 16, pool="s2d", seed=60)    # enc m1
    check_chain3(128, 8, 32, 32, 16, pool="", seed=61)       # enc m1 -pool
    check_chain3(64, 32, 64, 64, 16, pool="pixel", seed=62)  # enc m2
    check_chain3(64, 32, 64, 64, 16, pool="", seed=63)       # enc m2 -pool
    check_chain3(64, 96, 64, 64, 16, pool="", c_skip=64, seed=64)  # dec p2
    check_chain3(128, 64, 32, 32, 16, pool="", c_skip=32, seed=65)  # dec p1
    # relayouts
    check_pools(128, 32)
    check_pools(64, 64)
    check_pools(128, 16)
    check_pools(64, 32)   # critic L1->tail_s2d feed
    check_pools(32, 64)   # critic tail_s2d -> pixel drain
    check_deconv(64, 64, 32)
    check_deconv(32, 96, 64)
    check_entry(128, 8)
    check_entry(128, 4)
    # head fusion (round 3)
    check_head(128, 32, 32, 16)
    # FiLM elementwise kernel (plain use_pallas path) — the 7 site shapes
    # at image 256 / fm 32 collapse to these (hw, c) classes; 96 is the
    # non-lane-multiple one.
    check_film_residual(256, 32)
    check_film_residual(128, 64)
    check_film_residual(64, 96)
    check_film_residual(32, 128)

    # gradients (round 3) — every custom VJP at its production shapes.
    # film mode runs twice: f32 tight (the miscompile guard — masks are
    # bit-comparable) and bf16 loose (mask-flip rounding noise is O(1)
    # pointwise; see check_conv3_grad docstring).
    for aligned in (False, True):
        csp.ALIGNED_STAGING = aligned
        print(f"-- conv3 grads, staging: "
              f"{'aligned' if aligned else 'rotating'}", flush=True)
        check_conv3_grad(128, 32, 32, 16, mode="relu")
        check_conv3_grad(128, 32, 32, 16, mode="film", dt=jnp.float32,
                         rtol=0.02)
        check_conv3_grad(128, 32, 32, 16, mode="film", rtol=0.25)
        check_conv3_grad(128, 32, 32, 16, mode="none", seed=55)
        check_conv3_grad(64, 64, 64, 16, mode="relu", seed=56)
        check_conv3_grad(64, 64, 64, 16, mode="film", seed=57,
                         dt=jnp.float32, rtol=0.02)
        check_conv3_grad(64, 64, 64, 16, mode="film", seed=57, rtol=0.25)
        check_conv2_grad(128, 32, 32, 32, 16)
        check_conv2_grad(64, 64, 64, 64, 16, seed=65)
        check_conv3_grad(32, 32, 64, 16, mode="relu", seed=78)
        check_conv3_grad(32, 64, 64, 16, mode="relu", seed=79)
    csp.ALIGNED_STAGING = default_aligned
    for packed in (True, False):
        csp.CONV5_PACKED = packed
        print(f"-- conv5 grads, variant: "
              f"{'packed' if packed else 'dense'}", flush=True)
        check_conv5_grad(128, 4, 16, 16)
        check_conv5_grad(128, 16, 16, 16, seed=72)
        check_conv5_grad(64, 16, 32, 16, seed=74)
        check_conv5_grad(64, 32, 32, 16, seed=76)
    csp.CONV5_PACKED = default_packed
    check_fused_critic_grads(dt=jnp.float32)   # pointwise chain, f32 guard
    check_fused_critic_grads()                 # bf16: GP-norm check
    check_fused_critic_grads(dt=jnp.float32, tail_s2d=True)
    check_fused_critic_grads(tail_s2d=True)
    check_superstep_trajectory()

    print(f"\n{len(FAILS)} failures", flush=True)
    sys.exit(1 if FAILS else 0)


if __name__ == "__main__":
    main()
