"""Pallas TPU kernel: fused space-to-depth 3x3 convolution.

The generator's low-channel 3x3 convs (32-96 channels) waste the 128-lane
MXU (~21-43 TFLOPS measured vs ~128 at 128 channels). XLA-level
space-to-depth fixes the matmul shapes but pays multi-millisecond HBM
relayouts between convs (u2s measured at 5-8 ms/step). This kernel does the
relayout *in VMEM*, where it is a handful of register shuffles:

- Activations live in HBM in **padded unshifted s2d layout**
  ``(B, N+2, N+2, 4C)``: block (i, j) holds pixels (2i+p-2, 2j+q-2) of the
  zero-padded image; interior blocks are [1..N], the border ring is zeros
  (which reproduces SAME-padding semantics for free).
- One grid step processes one batch element; the whole padded image fits
  VMEM (<= ~5 MB at every generator level). Row strips are processed in a
  static loop; each strip builds the four shifted-tap operands
  ``U[A][B]`` by lane-group slicing (the in-VMEM ``u2s``) and accumulates
  ``y += U[A][B] @ W4[A][B]`` on the MXU — 4 matmuls with K = N = 4C.
- Epilogues fuse into the same pass over VMEM:
    * ``mode='relu'``:  y = relu(y + b)        (ConvBNRelu, BN pre-folded)
    * ``mode='film'``:  y = x + relu((y + b) * gamma + beta)
      — the entire FiLM site of the generator (models/film.py) in ONE
      kernel: conv, modulation and residual add.
    * ``mode='none'``:  y = y + b

W4 is the transformed kernel from ops/s2d_conv.conv3x3_to_s2d_kernel
(2, 2, 4C, 4Co); correctness is pinned against the plain XLA conv by
tests/test_conv_pallas.py.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def pad_s2d(y: jnp.ndarray) -> jnp.ndarray:
    """Unshifted s2d (B, N, N, 4C) -> padded layout (B, N+2, N+2, 4C)."""
    return jnp.pad(y, ((0, 0), (1, 1), (1, 1), (0, 0)))


# ---------------------------------------------------------------------------
# Relayout kernels — the XLA-level conversions around the conv kernel cost
# 1.5-2 ms each on this backend (full HBM passes with poor lowering); these
# keep them in VMEM.
# ---------------------------------------------------------------------------


def _pool_kernel(x_ref, o_ref, *, n: int, c: int):
    """Padded s2d (1, N+2, N+2, 4C) -> pixel-domain 2x2 max-pool (1, N, N, C).

    Pool windows coincide with s2d sub-pixel groups: a pure 4-way lane-group
    max over the interior (reference MaxPooling2D semantics)."""
    x = x_ref[0]
    interior = x[1 : n + 1, 1 : n + 1, :]
    g = lambda k: interior[:, :, k * c : (k + 1) * c]
    o_ref[0] = jnp.maximum(
        jnp.maximum(g(0), g(1)), jnp.maximum(g(2), g(3))
    )


def pool_s2d_pallas(x_padded: jnp.ndarray) -> jnp.ndarray:
    b, p_dim, _, c4 = x_padded.shape
    n, c = p_dim - 2, c4 // 4
    return pl.pallas_call(
        partial(_pool_kernel, n=n, c=c),
        out_shape=jax.ShapeDtypeStruct((b, n, n, c), x_padded.dtype),
        grid=(b,),
        in_specs=[pl.BlockSpec((1, p_dim, p_dim, c4), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, n, n, c), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(x_padded)


def entry_pack(x: jnp.ndarray, c_pad: int = 32) -> jnp.ndarray:
    """Pixel (B, 2N, 2N, C_in) -> padded s2d (B, N+2, N+2, 4*c_pad) with
    each sub-pixel group zero-padded from C_in to c_pad channels.

    XLA implementation, ordered so every pass before the final (unavoidable)
    write of the padded-lane output touches only the tiny C_in-channel data.
    (A strided-gather Pallas version is not lowerable: Mosaic supports only
    2-D gathers.)
    """
    from . import s2d_conv as S

    b, h, w, c_in = x.shape
    n = h // 2
    s2d = S.s2d_unshifted(x)  # (B, N, N, 4*C_in) — small
    s2d = jnp.pad(s2d, ((0, 0), (1, 1), (1, 1), (0, 0)))
    grp = s2d.reshape(b, n + 2, n + 2, 4, c_in)
    grp = jnp.pad(grp, ((0, 0), (0, 0), (0, 0), (0, 0), (0, c_pad - c_in)))
    return grp.reshape(b, n + 2, n + 2, 4 * c_pad)


def _deinter_rows(m, p: int, n2: int):
    """Contiguous reshape + static index — the Mosaic-safe replacement for a
    stride-2 slice on the leading dim (strided slices lower to unsupported
    gathers)."""
    return m[1 : 1 + 2 * n2].reshape(n2, 2, m.shape[1], m.shape[2])[:, p]


def _pool_to_s2d_kernel(x_ref, o_ref, *, n: int, c: int):
    """Padded s2d level-L (1, N+2, N+2, 4C) -> padded s2d level-L+1
    (1, N/2+2, N/2+2, 4C): the 2x2 max-pool emitting the NEXT level's
    layout directly, so consecutive fused-conv levels never leave s2d.

    out[bi, bj, (p, q, c)] = pool_pixel(2(bi-1)+p, 2(bj-1)+q)
                           = max_g in[2bi-1+p, 2bj-1+q, (g, c)].
    Row/col deinterleave via reshape+index and swapaxes (both Mosaic-safe).
    """
    n2 = n // 2
    x = x_ref[0]
    g = lambda k: x[:, :, k * c : (k + 1) * c]
    mx = jnp.maximum(jnp.maximum(g(0), g(1)), jnp.maximum(g(2), g(3)))
    o_ref[...] = jnp.zeros_like(o_ref)
    for p in range(2):
        rows = _deinter_rows(mx, p, n2)          # (N/2, N+2, C)
        t = jnp.swapaxes(rows, 0, 1)             # cols -> leading
        for q in range(2):
            cols = _deinter_rows(t, q, n2)       # (N/2, N/2, C)
            blk = jnp.swapaxes(cols, 0, 1)
            dst = p * 2 + q
            o_ref[0, 1 : n2 + 1, 1 : n2 + 1, dst * c : (dst + 1) * c] = blk


def pool_to_s2d_pallas(x_padded: jnp.ndarray) -> jnp.ndarray:
    b, p_dim, _, c4 = x_padded.shape
    n, c = p_dim - 2, c4 // 4
    n2 = n // 2
    return pl.pallas_call(
        partial(_pool_to_s2d_kernel, n=n, c=c),
        out_shape=jax.ShapeDtypeStruct((b, n2 + 2, n2 + 2, c4), x_padded.dtype),
        grid=(b,),
        in_specs=[pl.BlockSpec((1, p_dim, p_dim, c4), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, n2 + 2, n2 + 2, c4), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(x_padded)


def _padcat_kernel(up_ref, skip_ref, o_ref, *, n: int, c1: int, c2: int):
    """Unshifted s2d up (1, N, N, 4C1) + padded s2d skip (1, N+2, N+2, 4C2)
    -> padded s2d concat (1, N+2, N+2, 4(C1+C2)), channels interleaved per
    sub-pixel group in [up, skip] order (reference decoder concat)."""
    up = up_ref[0]
    skip = skip_ref[0]
    o_ref[...] = jnp.zeros_like(o_ref)
    cc = c1 + c2
    for g in range(4):
        o_ref[0, 1 : n + 1, 1 : n + 1, g * cc : g * cc + c1] = up[
            :, :, g * c1 : (g + 1) * c1
        ]
        o_ref[0, :, :, g * cc + c1 : (g + 1) * cc] = skip[
            :, :, g * c2 : (g + 1) * c2
        ]


def pad_concat_pallas(up: jnp.ndarray, skip_padded: jnp.ndarray) -> jnp.ndarray:
    b, n, _, c14 = up.shape
    p_dim = n + 2
    c24 = skip_padded.shape[-1]
    c1, c2 = c14 // 4, c24 // 4
    return pl.pallas_call(
        partial(_padcat_kernel, n=n, c1=c1, c2=c2),
        out_shape=jax.ShapeDtypeStruct((b, p_dim, p_dim, c14 + c24), up.dtype),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, n, n, c14), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, p_dim, p_dim, c24), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, p_dim, p_dim, c14 + c24), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(up, skip_padded)


def unpad_s2d(y: jnp.ndarray) -> jnp.ndarray:
    return y[:, 1:-1, 1:-1, :]


def _deconv_concat_kernel(x_ref, w_ref, b_ref, skip_ref, o_ref, *,
                          m: int, c: int, o_ch: int, cs: int):
    """Fused decoder transition: padded s2d level-(L+1) decoder output
    (1, M+2, M+2, 4C) -> Deconv2x2 (per-pixel matmul, kernel (C, 4O)) + ReLU
    -> interleave into the level-L s2d layout -> channel-concat with the
    level-L skip (1, N+2, N+2, 4Cs), N = 2M. Output: padded s2d concat
    (1, N+2, N+2, 4(O+Cs)) with per-group [up, skip] channel order — exactly
    what `conv3x3_s2d_fused` consumes, so consecutive Pallas decoder levels
    never leave the s2d domain (replaces an unpad+d2s XLA relayout, the
    deconv matmul, and the separate pad_concat kernel).

    Level-L block (2i+p, 2j+q) is input pixel (i, j) of sub-pixel group
    (p, q) pushed through the matmul — the nested-s2d identity. The (p, q)
    interleave uses stack + contiguous reshape (Mosaic rejects strided
    stores)."""
    n = 2 * m
    x = x_ref[0]
    skip = skip_ref[0]
    o_ref[...] = jnp.zeros_like(o_ref)
    bias = b_ref[0]  # (4O,) — per-channel bias tiled over output sub-pixels
    w = w_ref[...]   # (C, 4O), columns (sub-pixel group, channel)-major
    interior = x[1 : m + 1, 1 : m + 1, :]
    ys = []
    for g in range(4):
        xg = interior[:, :, g * c : (g + 1) * c].reshape(m * m, c)
        yg = jnp.dot(xg, w, preferred_element_type=jnp.float32) + bias[None, :]
        yg = jnp.maximum(yg, 0.0).astype(o_ref.dtype).reshape(m, m, 4 * o_ch)
        ys.append(yg)
    # cols: a_p[i, 2j+q] = Y_(p,q)[i, j]; rows: up[2i+p] = a_p[i]
    a0 = jnp.stack([ys[0], ys[1]], axis=2).reshape(m, n, 4 * o_ch)
    a1 = jnp.stack([ys[2], ys[3]], axis=2).reshape(m, n, 4 * o_ch)
    up = jnp.stack([a0, a1], axis=1).reshape(n, n, 4 * o_ch)
    cc = o_ch + cs
    for g in range(4):
        o_ref[0, 1 : n + 1, 1 : n + 1, g * cc : g * cc + o_ch] = up[
            :, :, g * o_ch : (g + 1) * o_ch
        ]
        o_ref[0, :, :, g * cc + o_ch : (g + 1) * cc] = skip[
            :, :, g * cs : (g + 1) * cs
        ]


def deconv_s2d_concat_pallas(
    x_padded: jnp.ndarray,   # (B, M+2, M+2, 4C) — padded s2d at level L+1
    w2: jnp.ndarray,         # (C, 4O) — Deconv2x2 kernel in matmul form
    bias4: jnp.ndarray,      # (4O,) — bias tiled over the 4 sub-pixels
    skip_padded: jnp.ndarray,  # (B, N+2, N+2, 4Cs), N = 2M
) -> jnp.ndarray:
    b, mp, _, c4 = x_padded.shape
    m, c = mp - 2, c4 // 4
    n = 2 * m
    o4 = w2.shape[-1]
    o_ch = o4 // 4
    cs4 = skip_padded.shape[-1]
    cs = cs4 // 4
    out_c = o4 + cs4
    dt = x_padded.dtype
    return pl.pallas_call(
        partial(_deconv_concat_kernel, m=m, c=c, o_ch=o_ch, cs=cs),
        out_shape=jax.ShapeDtypeStruct((b, n + 2, n + 2, out_c), dt),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, mp, mp, c4), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # w2, whole
            pl.BlockSpec(memory_space=pltpu.VMEM),  # bias
            pl.BlockSpec((1, n + 2, n + 2, cs4), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, n + 2, n + 2, out_c), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * m * m * 4 * c * o4,
            bytes_accessed=x_padded.size * 2 + skip_padded.size * 2
            + b * (n + 2) * (n + 2) * out_c * 2,
            transcendentals=0,
        ),
        interpret=_interpret(),
    )(x_padded, w2.astype(dt), bias4.reshape(1, o4).astype(jnp.float32),
      skip_padded)


def _kernel(x_ref, w_ref, b_ref, gamma_ref, beta_ref, out_ref, u_scratch, *,
            n: int, c4: int, co4: int, strip: int, mode: str):
    """One batch element. x_ref (1, N+2, N+2, 4C); out_ref same spatial with
    4Co channels; w_ref (4, 4C, 4Co); b/gamma/beta (1, 4Co|4C)."""
    c = c4 // 4
    x = x_ref[0]  # (P, P, 4C)
    out_ref[...] = jnp.zeros_like(out_ref)  # border ring stays zero

    bias = b_ref[0]
    if mode == "film":
        gamma = gamma_ref[0, 0]
        beta = beta_ref[0, 0]

    n_strips = n // strip
    for s_i in range(n_strips):
        j0 = s_i * strip  # first interior output row (0-based interior)

        # Stage the strip's shifted-s2d representation ONCE — the in-VMEM
        # u2s: su[a, b, group(p, q)] = x[j0+a+p, b+q, group(1-p, 1-q)].
        # 4 stores (Mosaic relayouts on store; lane-dim concat of
        # offset-mismatched slices is unsupported); all 4 conv taps are then
        # aligned sub-reads of this one buffer.
        for p in range(2):
            for q in range(2):
                src = (1 - p) * 2 + (1 - q)
                dst = p * 2 + q
                u_scratch[:, :, dst * c : (dst + 1) * c] = x[
                    j0 + p : j0 + p + strip + 1,
                    q : q + n + 1,
                    src * c : (src + 1) * c,
                ]

        acc = jnp.zeros((strip * n, co4), jnp.float32)
        for A in range(2):
            for B in range(2):
                u = u_scratch[A : A + strip, B : B + n, :].reshape(strip * n, c4)
                acc = acc + jnp.dot(
                    u, w_ref[A * 2 + B], preferred_element_type=jnp.float32
                )

        y = acc + bias[None, :]
        if mode == "relu":
            y = jnp.maximum(y, 0.0)
        elif mode == "film":
            trunk = x[j0 + 1 : j0 + 1 + strip, 1 : 1 + n, :].reshape(
                strip * n, c4
            ).astype(jnp.float32)
            y = trunk + jnp.maximum(y * gamma[None, :] + beta[None, :], 0.0)
        y = y.reshape(strip, n, co4).astype(out_ref.dtype)
        out_ref[0, j0 + 1 : j0 + 1 + strip, 1 : 1 + n, :] = y


def conv3x3_s2d_fused(
    x_padded: jnp.ndarray,  # (B, N+2, N+2, 4C)
    w4: jnp.ndarray,  # (2, 2, 4C, 4Co)
    bias4: jnp.ndarray,  # (4Co,)
    gamma4: jnp.ndarray | None = None,  # (B, 4C) — film mode
    beta4: jnp.ndarray | None = None,
    mode: str = "relu",
    strip: int = 8,
) -> jnp.ndarray:
    """Fused s2d conv; returns padded unshifted s2d (B, N+2, N+2, 4Co)."""
    b, p_dim, _, c4 = x_padded.shape
    n = p_dim - 2
    co4 = w4.shape[-1]
    if mode == "film" and c4 != co4:
        raise ValueError("film mode requires C_out == C_in (residual add)")
    while n % strip != 0:
        strip //= 2

    dt = x_padded.dtype
    w_flat = w4.reshape(4, c4, co4).astype(dt)
    bias = bias4.reshape(1, co4).astype(jnp.float32)
    if mode == "film":
        gamma = gamma4.astype(jnp.float32).reshape(b, 1, c4)
        beta = beta4.astype(jnp.float32).reshape(b, 1, c4)
    else:
        gamma = jnp.zeros((b, 1, c4), jnp.float32)
        beta = jnp.zeros((b, 1, c4), jnp.float32)

    kernel = partial(_kernel, n=n, c4=c4, co4=co4, strip=strip, mode=mode)
    flops = 2 * b * n * n * 4 * c4 * co4
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, p_dim, p_dim, co4), dt),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, p_dim, p_dim, c4), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # weights, whole
            pl.BlockSpec(memory_space=pltpu.VMEM),  # bias
            pl.BlockSpec((1, 1, c4), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c4), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, p_dim, p_dim, co4), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((strip + 1, n + 1, c4), dt)],
        # Whole-image blocks + Pallas double-buffering exceed the default
        # 16M scoped-vmem budget at level 1; the physical budget is larger.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=x_padded.size * 2 + b * p_dim * p_dim * co4 * 2,
            transcendentals=0,
        ),
        interpret=_interpret(),
    )(x_padded, w_flat, bias, gamma, beta)
