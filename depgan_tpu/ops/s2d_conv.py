"""Space-to-depth convolution — MXU-efficient 3x3 convs at low channel count.

Problem: the generator's full-resolution stages run 3x3 convs with 32
channels; the MXU has 128 lanes, so XLA's conv achieves ~21 TFLOPS vs ~128
TFLOPS at 128 channels (measured, see BENCH notes). Solution: execute those
convs in a space-to-depth (s2d) domain — (B, 2N, 2N, C) becomes
(B, N, N, 4C) — where a 3x3/C conv becomes a 2x2/4C conv whose operands
tile the MXU well. The transformed kernel carries structured zeros (56%
density → 1.8x FLOPs) but runs ~6x more efficiently: ~3x net.

Layout algebra (all derivations verified by the brute-force tests):

- ``s2d_shifted(x)``: pad x by 1 on every side, then block-2 s2d. Block b
  holds original rows {2b-1, 2b}; there are N+1 blocks per axis. This is
  the INPUT layout of `conv2x2_s2d`.
- ``conv2x2_s2d(x_s, W4)``: VALID 2x2 conv producing the UNSHIFTED output
  s2d layout (block i holds output rows {2i, 2i+1}; N blocks). Equivalent
  to SAME 3x3 conv in the pixel domain.
- ``u2s(y)``: unshifted -> shifted relayout (slice/concat only, no
  compute). Out-of-image border sub-rows are zero-filled, which is exactly
  the SAME-padding semantics the next conv needs.
- ``pool2x2_s2d(y)``: 2x2 max-pool windows coincide with unshifted blocks,
  so pooling is a max over the 4 sub-pixel channel groups — no spatial op.
- ``d2s(y)``: unshifted s2d -> pixel domain.

Sub-pixel channel order is (p, q, c) flattened, p = row offset, q = col
offset — consistent across every function here, including
``concat_s2d`` (channel concat per sub-pixel) and ``tile_channel_params``
(broadcast per-channel BN/FiLM vectors into the s2d domain).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax


def s2d_shifted(x: jnp.ndarray) -> jnp.ndarray:
    """(B, 2N, 2N, C) -> shifted s2d (B, N+1, N+1, 4C). Pads 1 pixel on all
    sides so block b covers rows {2b-1, 2b}.

    Implemented as 4 stride-2 slices + channel concat — on TPU this lowers
    far better than the reshape/transpose formulation (the lane dimension
    is only ever concatenated, never permuted).
    """
    b, h, w, c = x.shape
    n = h // 2
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    parts = [xp[:, p::2, q::2, :] for p in range(2) for q in range(2)]
    return jnp.concatenate(parts, axis=-1)


def s2d_unshifted(x: jnp.ndarray) -> jnp.ndarray:
    """(B, 2N, 2N, C) -> unshifted s2d (B, N, N, 4C)."""
    parts = [x[:, p::2, q::2, :] for p in range(2) for q in range(2)]
    return jnp.concatenate(parts, axis=-1)


def d2s(y: jnp.ndarray) -> jnp.ndarray:
    """Unshifted s2d (B, N, N, 4C) -> (B, 2N, 2N, C)."""
    b, n, _, c4 = y.shape
    c = c4 // 4
    yr = y.reshape(b, n, n, 2, 2, c)
    return yr.transpose(0, 1, 3, 2, 4, 5).reshape(b, 2 * n, 2 * n, c)


def u2s(y: jnp.ndarray) -> jnp.ndarray:
    """Unshifted (B, N, N, 4C) -> shifted (B, N+1, N+1, 4C).

    shifted[b][p] = unshifted[b - 1 + p][1 - p] per axis; out-of-range
    blocks zero-fill, which reproduces SAME-padding for the next conv.
    """
    b, n, _, c4 = y.shape
    c = c4 // 4
    # Shifted sub-pixel (p, q) at block b comes from unshifted sub-pixel
    # (1-p, 1-q) at block b-1+p (per axis). Lane dim is only sliced in
    # whole channel groups and re-concatenated — TPU-friendly.
    yp = jnp.pad(y, ((0, 0), (1, 1), (1, 1), (0, 0)))
    parts = []
    for p in range(2):
        for q in range(2):
            src = (1 - p) * 2 + (1 - q)
            parts.append(
                yp[:, p : p + n + 1, q : q + n + 1, src * c : (src + 1) * c]
            )
    return jnp.concatenate(parts, axis=-1)


def pool2x2_s2d(y: jnp.ndarray) -> jnp.ndarray:
    """Max-pool 2x2 on an unshifted s2d tensor -> pixel-domain (B, N, N, C).

    Pool windows coincide with the sub-pixel groups: a pure channel-group
    max (reference `MaxPooling2D`, `...twoCritics_training_4fold.py:409`).
    """
    b, n, _, c4 = y.shape
    c = c4 // 4
    return jnp.max(y.reshape(b, n, n, 4, c), axis=3)


def concat_s2d(a: jnp.ndarray, b_: jnp.ndarray) -> jnp.ndarray:
    """Channel-concat two same-layout s2d tensors per sub-pixel."""
    b, n, m, ca4 = a.shape
    cb4 = b_.shape[-1]
    ar = a.reshape(b, n, m, 4, ca4 // 4)
    br = b_.reshape(b, n, m, 4, cb4 // 4)
    return jnp.concatenate([ar, br], axis=-1).reshape(b, n, m, ca4 + cb4)


def tile_channel_params(v: jnp.ndarray) -> jnp.ndarray:
    """Per-channel vector (..., C) -> s2d channel vector (..., 4C)."""
    return jnp.tile(v, (1,) * (v.ndim - 1) + (4,))


def conv3x3_to_s2d_kernel(w: np.ndarray, bias: np.ndarray | None = None):
    """Transform a SAME 3x3 HWIO kernel (3, 3, Ci, Co) into the equivalent
    shifted-s2d 2x2 kernel (2, 2, 4Ci, 4Co) (+ tiled bias).

    Derivation: output pixel (2i+p, 2j+q) needs input rows 2i+p+dy-1; the
    shifted input block i+A sub-row r holds row 2(i+A)+r-1, so
    p + dy = 2A + r with A in {0, 1} — a strictly 'forward' 2-tap
    footprint, hence the VALID 2x2 conv in `conv2x2_s2d`.
    """
    kh, kw, ci, co = w.shape
    assert (kh, kw) == (3, 3), "transform is specific to 3x3 SAME convs"
    w4 = np.zeros((2, 2, 4 * ci, 4 * co), dtype=w.dtype)
    for p in range(2):
        for q in range(2):
            for dy in range(3):
                for dx in range(3):
                    a, r = divmod(p + dy, 2)
                    b_, s = divmod(q + dx, 2)
                    # channel layout (r, s, ci) and (p, q, co), flattened
                    ci_base = (r * 2 + s) * ci
                    co_base = (p * 2 + q) * co
                    w4[a, b_, ci_base : ci_base + ci, co_base : co_base + co] += w[
                        dy, dx
                    ]
    bias4 = None if bias is None else np.tile(bias, 4)
    return w4, bias4


def conv3x3_to_s2d_kernel_j(w: jnp.ndarray, bias: jnp.ndarray | None = None):
    """Trace-safe (pure-jnp, differentiable) twin of `conv3x3_to_s2d_kernel`
    — used by the training-side fused path, where the pixel kernel is a live
    parameter and the transform must sit inside the jitted step so gradients
    flow back through it (the transform is linear, so its VJP is exact)."""
    ci, co = w.shape[2], w.shape[3]
    w4 = jnp.zeros((2, 2, 4 * ci, 4 * co), w.dtype)
    for p in range(2):
        for q in range(2):
            for dy in range(3):
                for dx in range(3):
                    a, r = divmod(p + dy, 2)
                    b_, s = divmod(q + dx, 2)
                    ci_base = (r * 2 + s) * ci
                    co_base = (p * 2 + q) * co
                    w4 = w4.at[
                        a, b_, ci_base : ci_base + ci, co_base : co_base + co
                    ].add(w[dy, dx])
    bias4 = None if bias is None else jnp.tile(bias, 4)
    return w4, bias4


def conv5x5_to_s2d_kernel_j(w: jnp.ndarray, bias: jnp.ndarray | None = None):
    """SAME 5x5 HWIO kernel (5, 5, Ci, Co) -> dense 3x3-tap kernel
    (3, 3, 4Ci, 4Co) over the padded *unshifted* s2d layout.

    Derivation: output pixel (2i+p, 2j+q) of block i needs input pixel rows
    2i+p+dy-2; with u = p+dy-2 in {-2..3} that row sits in unshifted block
    i + (u-r)/2 (r = u mod 2), i.e. tap offsets A-1 in {-1, 0, 1} — a 3x3
    tap footprint on the ring-padded layout, with NO channel-group
    permutation (unlike the shifted 2x2 form of the 3x3 conv: the
    permutation there comes from re-blocking into the shifted rep).
    The placement (dy,dx,p,q) -> w9 cell is injective, so the transform's
    adjoint (used for dW in the VJP) is an exact gather; it is linear, so
    ``jax.vjp`` of this function maps s2d weight cotangents back to pixel
    ones exactly. Used for the critic's conv5x5 stack
    (`...twoCritics_training_4fold.py:319-325`).
    """
    kh, kw, ci, co = w.shape
    w9 = jnp.zeros((3, 3, 4 * ci, 4 * co), w.dtype)
    for p in range(2):
        for q in range(2):
            for dy in range(kh):
                for dx in range(kw):
                    u, v = p + dy - 2, q + dx - 2
                    r, s = u % 2, v % 2
                    a, b_ = (u - r) // 2 + 1, (v - s) // 2 + 1
                    ci_base = (r * 2 + s) * ci
                    co_base = (p * 2 + q) * co
                    w9 = w9.at[
                        a, b_, ci_base : ci_base + ci, co_base : co_base + co
                    ].add(w[dy, dx])
    bias4 = None if bias is None else jnp.tile(bias, 4)
    return w9, bias4


def conv1x1_to_s2d_kernel_j(w: jnp.ndarray, bias: jnp.ndarray | None = None):
    """Trace-safe twin of `conv1x1_to_s2d_kernel`."""
    ci, co = w.shape[-2:]
    w4 = jnp.zeros((1, 1, 4 * ci, 4 * co), w.dtype)
    for k in range(4):
        w4 = w4.at[0, 0, k * ci : (k + 1) * ci, k * co : (k + 1) * co].set(w[0, 0])
    bias4 = None if bias is None else jnp.tile(bias, 4)
    return w4, bias4


def conv1x1_to_s2d_kernel(w: np.ndarray, bias: np.ndarray | None = None):
    """1x1 conv (1, 1, Ci, Co) -> block-diagonal s2d 1x1 (1, 1, 4Ci, 4Co)."""
    ci, co = w.shape[-2:]
    w4 = np.zeros((1, 1, 4 * ci, 4 * co), dtype=w.dtype)
    for k in range(4):
        w4[0, 0, k * ci : (k + 1) * ci, k * co : (k + 1) * co] = w[0, 0]
    bias4 = None if bias is None else np.tile(bias, 4)
    return w4, bias4


def conv2x2_s2d(x_s: jnp.ndarray, w4: jnp.ndarray, bias4=None) -> jnp.ndarray:
    """VALID 2x2 conv: shifted s2d input (B, N+1, N+1, 4Ci) -> unshifted
    s2d output (B, N, N, 4Co)."""
    y = lax.conv_general_dilated(
        x_s, w4, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if bias4 is not None:
        y = y + bias4
    return y


def conv3x3_same_s2d(x: jnp.ndarray, w: np.ndarray, bias=None) -> jnp.ndarray:
    """Reference composition: pixel-domain SAME 3x3 conv via the s2d path
    (used by tests; production code keeps activations in s2d layout)."""
    w4, bias4 = conv3x3_to_s2d_kernel(np.asarray(w), None if bias is None else np.asarray(bias))
    y_s = conv2x2_s2d(s2d_shifted(x), jnp.asarray(w4),
                      None if bias4 is None else jnp.asarray(bias4))
    return d2s(y_s)
