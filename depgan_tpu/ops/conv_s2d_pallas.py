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


# Staging schedule of the 3x3 s2d kernels (perf A/B knob, scripts/
# ab_inference.py): True interleaves strip i+1's scratch staging with strip
# i's matmuls (VPU stores overlap MXU work); False stages the whole plane as
# one prologue (the round-2 scheme). Both write every scratch row exactly
# once — the WAR-hazard-safe invariant (see _kernel). Module-level on
# purpose: it selects codegen at trace time, so flip it before first use.
INTERLEAVED_STAGING = True

# Lane-ALIGNED staging (round 3): the classic staged-u2s buffer puts the
# value of input group src=(1-p,1-q) into lane block dst=(p,q) — every
# staging copy crosses lane blocks, which Mosaic lowers with lane
# rotations. But the dst labeling is arbitrary: keeping each group in its
# OWN lane block (v[r, b, g] = x[(1-p_g)+r, (1-q_g)+b, g·C..]) makes every
# staging copy a same-lane masked copy, and the group relabeling folds
# into the weights as a static row-block REVERSAL (W'[A,B][g-rows] =
# W4[A,B][comp(g)-rows], comp = bitwise complement of the (p,q) bits,
# i.e. block order 3,2,1,0) done once at trace time. Mathematically
# identical — pinned by the same XLA-twin tests; flag kept for on-chip A/B.
# DEFAULT OFF until scripts/onchip_validate.py has passed with it on the
# real chip AND scripts/ab_inference.py shows a win (CLAUDE.md kernel
# gate: interpret mode cannot see Mosaic miscompiles).
ALIGNED_STAGING = False

# K-packed conv5 kernel (round 3): for the critic's c4 <= 64 widths, stage
# the 9 taps lane-concatenated and run one K = 9*4C matmul per strip
# instead of nine K-starved ones. See _kernel5_packed. Same on-chip gate
# as ALIGNED_STAGING: default off until validated + measured faster.
CONV5_PACKED = False

# Env overrides for A/B runs without code edits (read once at import):
#   DEPGAN_ALIGNED_STAGING=0|1, DEPGAN_INTERLEAVED_STAGING=0|1,
#   DEPGAN_CONV5_PACKED=0|1
import os as _os  # noqa: E402

if "DEPGAN_ALIGNED_STAGING" in _os.environ:
    ALIGNED_STAGING = _os.environ["DEPGAN_ALIGNED_STAGING"] == "1"
if "DEPGAN_INTERLEAVED_STAGING" in _os.environ:
    INTERLEAVED_STAGING = _os.environ["DEPGAN_INTERLEAVED_STAGING"] == "1"
if "DEPGAN_CONV5_PACKED" in _os.environ:
    CONV5_PACKED = _os.environ["DEPGAN_CONV5_PACKED"] == "1"

# Streaming output stores (round 4): kernel_anatomy measured that the conv
# kernels pay HBM + MXU *serially* — the full-kernel marginal exceeds the
# matmul phase by almost exactly the output-plane store time (1.145 vs
# 0.823 ms at the production L1 shape), because whole-plane in/out blocks
# leave Mosaic's automatic pipeliner no room to double-buffer. With
# STREAM_OUT the conv output lives in ANY (HBM) and each strip's result is
# DMA'd out of a 2-slot VMEM scratch (pltpu.make_async_copy) while the
# next strip's matmuls run on the MXU; the zero ring rides two small DMAs
# of a constant zero-row buffer. WAR safety: a slot is rewritten only
# after an explicit semaphore wait on its previous DMA — the ordering is
# explicit, not inferred (the round-2 Mosaic hazard was implicit vector
# dependence tracking). Same on-chip gate as every kernel change:
# scripts/onchip_validate.py on the real chip before this defaults on.
#
# VERDICT (round 4, measured): REJECTED — on-chip validation passed at
# every production shape (forwards, gradients, chained consumers), but
# the full inference A/B measured 2530/2575 slices/s streamed vs
# 2831/2841 with the plain whole-plane stores (scripts/ab_inference.py,
# batch 256). The manual ring pays more than the serialized store it
# replaces: +4.6% store traffic from the 8-aligned pad columns (136 vs
# 130), consumers then read a 130-col window out of a 136-col plane
# (misaligned staging copies), and per-strip DMA issue + semaphore waits
# add fixed cost ~8x per plane. Kept as a measured-and-documented dead
# end (CPU tests pin bit-identity of every streamed path); default OFF.
#
# LAYOUT: Mosaic requires DMA slices of a tiled HBM memref to be
# (8, 128)-tile-aligned on the last two dims — a whole-row slice of a
# (N+2)-column plane (130/66/34, always ≡ 2 mod 8) is REJECTED at compile
# time ("Slice shape along dimension 2 must be aligned to tiling (8)",
# measured on chip this round). Streamed outputs therefore carry their
# column dim padded up to a multiple of 8: (B, N+2, colP, 4Co) with
# colP = _stream_cols(N+2) (136/72/40); the pad columns are constant
# zeros (written once into the staging ring). Every kernel wrapper
# derives N from the ROW dim and reads only cols [0, N+2) — explicit
# bounds everywhere — so col-padded and exact planes mix freely; the
# custom VJPs crop dX back to each input's own column width.
STREAM_OUT = False
if "DEPGAN_STREAM_OUT" in _os.environ:
    STREAM_OUT = _os.environ["DEPGAN_STREAM_OUT"] == "1"


def _norm_strip(n: int, strip: int) -> int:
    """Largest power-of-two <= ``strip`` that divides the interior row count
    ``n``. Replaces the old bare ``while n % strip: strip //= 2`` loop,
    which crashed (ZeroDivisionError) for non-positive strips and silently
    accepted nonsense shapes — a kernel library should fail loudly."""
    if n <= 0:
        raise ValueError(f"s2d conv kernel: invalid interior size n={n}")
    if strip < 1:
        raise ValueError(f"s2d conv kernel: invalid strip={strip}")
    strip = min(strip, n)
    while strip > 1 and n % strip != 0:
        strip //= 2
    return strip  # strip == 1 always divides n


def pad_s2d(y: jnp.ndarray) -> jnp.ndarray:
    """Unshifted s2d (B, N, N, 4C) -> padded layout (B, N+2, N+2, 4C)."""
    return jnp.pad(y, ((0, 0), (1, 1), (1, 1), (0, 0)))


def _stream_cols(p_dim: int) -> int:
    """Column width of a STREAM_OUT output plane: N+2 rounded up to the
    (8, 128) sublane tile so every strip DMA slice is tile-aligned (see
    the STREAM_OUT comment — Mosaic rejects misaligned HBM slices)."""
    return -(-p_dim // 8) * 8


def _zero_ring_ref(o_ref, n: int):
    """Zero only the 1-block border ring of a padded (1, N+2, N+2, C)
    output ref. The kernels overwrite the whole interior, so zeroing the
    full plane (`o_ref[...] = zeros`, a plane-sized VPU store per grid
    step) is wasted work — only the ring must be constant zero (it carries
    the SAME-padding semantics for the next conv)."""
    z_row = jnp.zeros_like(o_ref[0, 0:1, :, :])
    o_ref[0, 0:1, :, :] = z_row
    o_ref[0, n + 1 : n + 2, :, :] = z_row
    z_col = jnp.zeros_like(o_ref[0, :, 0:1, :])
    o_ref[0, :, 0:1, :] = z_col
    o_ref[0, :, n + 1 : n + 2, :] = z_col


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


def _pool_ref(x_padded: jnp.ndarray) -> jnp.ndarray:
    """XLA twin of the pool kernel (used for its VJP)."""
    b, p_dim, _, c4 = x_padded.shape
    n = p_dim - 2  # interior bounds from ROWS (input may be col-padded)
    interior = x_padded[:, 1 : n + 1, 1 : n + 1, :]
    c = c4 // 4
    return jnp.max(interior.reshape(b, n, n, 4, c), axis=3)


@jax.custom_vjp
def pool_s2d_pallas(x_padded: jnp.ndarray) -> jnp.ndarray:
    b, p_dim, in_cols, c4 = x_padded.shape
    n, c = p_dim - 2, c4 // 4
    return pl.pallas_call(
        partial(_pool_kernel, n=n, c=c),
        out_shape=jax.ShapeDtypeStruct((b, n, n, c), x_padded.dtype),
        grid=(b,),
        in_specs=[pl.BlockSpec((1, p_dim, in_cols, c4), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, n, n, c), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(x_padded)


def _pool_fwd(x_padded):
    return pool_s2d_pallas(x_padded), x_padded


def _pool_bwd(x_padded, g):
    _, vjp = jax.vjp(_pool_ref, x_padded)
    return vjp(g)


pool_s2d_pallas.defvjp(_pool_fwd, _pool_bwd)


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
    NOTE (round-3 attempt, kept dead): merging column pairs into channels
    with a contiguous (n2, n, c) -> (n2, n2, 2c) reshape — which would
    remove all 8 swapaxes — compiles at toy shapes but hits Mosaic's
    'infer-vector-layout: unsupported shape cast' at the production
    (n=128, c=32) shape; the transpose formulation is the one that lowers.
    """
    n2 = n // 2
    x = x_ref[0]
    g = lambda k: x[:, :, k * c : (k + 1) * c]
    mx = jnp.maximum(jnp.maximum(g(0), g(1)), jnp.maximum(g(2), g(3)))
    _zero_ring_ref(o_ref, n2)
    for p in range(2):
        rows = _deinter_rows(mx, p, n2)          # (N/2, N+2, C)
        t = jnp.swapaxes(rows, 0, 1)             # cols -> leading
        for q in range(2):
            cols = _deinter_rows(t, q, n2)       # (N/2, N/2, C)
            blk = jnp.swapaxes(cols, 0, 1)
            dst = p * 2 + q
            o_ref[0, 1 : n2 + 1, 1 : n2 + 1, dst * c : (dst + 1) * c] = blk


@jax.custom_vjp
def pool_to_s2d_pallas(x_padded: jnp.ndarray) -> jnp.ndarray:
    b, p_dim, in_cols, c4 = x_padded.shape
    n, c = p_dim - 2, c4 // 4
    n2 = n // 2
    return pl.pallas_call(
        partial(_pool_to_s2d_kernel, n=n, c=c),
        out_shape=jax.ShapeDtypeStruct((b, n2 + 2, n2 + 2, c4), x_padded.dtype),
        grid=(b,),
        in_specs=[pl.BlockSpec((1, p_dim, in_cols, c4), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, n2 + 2, n2 + 2, c4), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(x_padded)


def _pool_to_s2d_ref(x_padded: jnp.ndarray) -> jnp.ndarray:
    """XLA twin of pool_to_s2d (pool then relayout to next-level padded
    s2d) — used for its VJP."""
    from . import s2d_conv as S

    return pad_s2d(S.s2d_unshifted(_pool_ref(x_padded)))


def _pool_to_s2d_fwd(x_padded):
    return pool_to_s2d_pallas(x_padded), x_padded


def _pool_to_s2d_bwd(x_padded, g):
    _, vjp = jax.vjp(_pool_to_s2d_ref, x_padded)
    return vjp(g)


pool_to_s2d_pallas.defvjp(_pool_to_s2d_fwd, _pool_to_s2d_bwd)


def unpad_s2d(y: jnp.ndarray) -> jnp.ndarray:
    """Padded s2d -> unshifted s2d interior. Interior bounds come from the
    ROW dim: STREAM_OUT planes carry zero pad columns beyond N+2 (see
    _stream_cols), which must be dropped along with the ring."""
    n = y.shape[1] - 2
    return y[:, 1 : n + 1, 1 : n + 1, :]


def _deconv_kernel(x_ref, w_ref, b_ref, o_ref, *, m: int, c: int, o_ch: int,
                   strip: int = 0, stream=None):
    """Decoder upsample: padded s2d level-(L+1) decoder output
    (1, M+2, M+2, 4C) -> Deconv2x2 (per-pixel matmul, kernel (C, 4O)) + ReLU
    -> interleaved into the level-L padded s2d layout (1, N+2, N+2, 4O),
    N = 2M, zero ring. Output lanes are a whole s2d tensor (4O channels),
    so every store is lane-aligned — the skip concat is NOT materialised;
    the following conv reads up and skip as two operands
    (`conv3x3_s2d_fused2`) with the kernel rows split accordingly.

    Level-L block (2i+p, 2j+q) is input pixel (i, j) of sub-pixel group
    (p, q) pushed through the matmul — the nested-s2d identity. The (p, q)
    interleave uses stack + contiguous reshape (Mosaic rejects strided
    stores).

    stream=(zrow_ref, o_stage, sems, zsem) (STREAM_OUT): the output (this
    is the decoder's BIGGEST plane store, measured ~3x its HBM floor in
    the round-3 roofline) goes to ANY/HBM via the _StreamOut ring; the
    matmul+interleave then runs per INPUT strip of ``strip`` rows (2*strip
    output rows per DMA) so the stores overlap the next strip's matmuls.
    The non-streamed path keeps the measured whole-plane codegen
    unchanged."""
    n = 2 * m
    x = x_ref[0]
    bias = b_ref[0]  # (4O,) — per-channel bias tiled over output sub-pixels
    w = w_ref[...]   # (C, 4O), columns (sub-pixel group, channel)-major
    o4 = 4 * o_ch

    def up_rows(i0: int, rows: int):
        """relu(deconv) of input interior rows [i0, i0+rows) interleaved
        into the (2*rows, n, 4O) output-row block."""
        interior = x[1 + i0 : 1 + i0 + rows, 1 : m + 1, :]
        ys = []
        for g in range(4):
            xg = interior[:, :, g * c : (g + 1) * c].reshape(rows * m, c)
            yg = jnp.dot(xg, w, preferred_element_type=jnp.float32)
            yg = jnp.maximum(yg + bias[None, :], 0.0)
            ys.append(yg.astype(o_ref.dtype).reshape(rows, m, o4))
        # cols: a_p[i, 2j+q] = Y_(p,q)[i, j]; rows: up[2i+p] = a_p[i]
        a0 = jnp.stack([ys[0], ys[1]], axis=2).reshape(rows, n, o4)
        a1 = jnp.stack([ys[2], ys[3]], axis=2).reshape(rows, n, o4)
        return jnp.stack([a0, a1], axis=1).reshape(2 * rows, n, o4)

    if stream is None:
        _zero_ring_ref(o_ref, n)
        o_ref[0, 1 : n + 1, 1 : n + 1, :] = up_rows(0, m)
        return
    stream = _StreamOut(o_ref, *stream, n=n, strip=2 * strip, co4=o4)
    for s_i in range(m // strip):
        stream.store(s_i, up_rows(s_i * strip, strip))
    stream.drain()


def _deconv_ref(x_padded, w2, bias4):
    """XLA twin of deconv_s2d_pallas (used for its VJP and tests)."""
    b, mp, _, c4 = x_padded.shape
    m, c = mp - 2, c4 // 4
    o4 = w2.shape[-1]
    interior = x_padded[:, 1 : m + 1, 1 : m + 1, :]
    ys = [
        jax.nn.relu(
            jnp.dot(interior[..., g * c : (g + 1) * c], w2.astype(x_padded.dtype))
            + bias4.reshape(-1).astype(x_padded.dtype)
        )
        for g in range(4)
    ]
    a0 = jnp.stack([ys[0], ys[1]], axis=3).reshape(b, m, 2 * m, o4)
    a1 = jnp.stack([ys[2], ys[3]], axis=3).reshape(b, m, 2 * m, o4)
    up = jnp.stack([a0, a1], axis=2).reshape(b, 2 * m, 2 * m, o4)
    return jnp.pad(up, ((0, 0), (1, 1), (1, 1), (0, 0)))


def _deconv_stream_adapter(inner, x_ref, w_ref, b_ref, zrow_ref, out_ref,
                           o_stage, sems, zsem):
    """Positional adapter for the streaming-store deconv layout."""
    inner(x_ref, w_ref, b_ref, out_ref,
          stream=(zrow_ref, o_stage, sems, zsem))


@jax.custom_vjp
def deconv_s2d_pallas(
    x_padded: jnp.ndarray,  # (B, M+2, M+2, 4C) — padded s2d at level L+1
    w2: jnp.ndarray,        # (C, 4O) — Deconv2x2 kernel in matmul form
    bias4: jnp.ndarray,     # (4O,) — bias tiled over the 4 sub-pixels
) -> jnp.ndarray:
    b, mp, in_cols, c4 = x_padded.shape
    m, c = mp - 2, c4 // 4
    n = 2 * m
    o4 = w2.shape[-1]
    o_ch = o4 // 4
    dt = x_padded.dtype
    in_specs = [
        pl.BlockSpec((1, mp, in_cols, c4), lambda i: (i, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),  # w2, whole
        pl.BlockSpec(memory_space=pltpu.VMEM),  # bias
    ]
    operands = [x_padded, w2.astype(dt),
                bias4.reshape(1, o4).astype(jnp.float32)]
    scratch = []
    if STREAM_OUT:
        out_cols = _stream_cols(n + 2)
        strip = _norm_strip(m, 8)
        kernel = partial(
            _deconv_stream_adapter,
            partial(_deconv_kernel, m=m, c=c, o_ch=o_ch, strip=strip),
        )
        in_specs.append(_zrow_spec(out_cols, o4))
        operands.append(jnp.zeros((1, out_cols, o4), dt))
        out_spec = pl.BlockSpec(memory_space=pl.ANY)
        scratch = _stream_scratch(2 * strip, out_cols, o4, dt)
    else:
        out_cols = n + 2
        kernel = partial(_deconv_kernel, m=m, c=c, o_ch=o_ch)
        out_spec = pl.BlockSpec((1, n + 2, n + 2, o4), lambda i: (i, 0, 0, 0),
                                memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, n + 2, out_cols, o4), dt),
        grid=(b,),
        in_specs=in_specs,
        out_specs=out_spec,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * m * m * 4 * c * o4,
            bytes_accessed=x_padded.size * 2
            + b * (n + 2) * out_cols * o4 * 2,
            transcendentals=0,
        ),
        interpret=_interpret(),
    )(*operands)


def _deconv_fwd(x_padded, w2, bias4):
    out = deconv_s2d_pallas(x_padded, w2, bias4)
    return out, (x_padded, w2, bias4)


def _deconv_bwd(res, g):
    x_padded, w2, bias4 = res
    _, vjp = jax.vjp(_deconv_ref, x_padded, w2, bias4)
    # The XLA twin emits the exact (N+2)-column plane; crop a STREAM_OUT
    # cotangent's constant-zero pad columns before feeding it.
    n = g.shape[1] - 2
    return vjp(g[:, :, : n + 2, :])


deconv_s2d_pallas.defvjp(_deconv_fwd, _deconv_bwd)


def _w_rows_for_staging(w4: jnp.ndarray, c4: int, co4: int) -> jnp.ndarray:
    """(2, 2, 4C, 4Co) -> (4, 4C, 4Co) tap-flat weights, with the row
    blocks REVERSED when ALIGNED_STAGING is on (see the flag comment:
    lane-aligned staging keeps group g in lane block g, so the weight rows
    that used to sit at block dst=(p,q) move to block comp(dst))."""
    if ALIGNED_STAGING:
        c = c4 // 4
        return w4.reshape(2, 2, 4, c, co4)[:, :, ::-1].reshape(4, c4, co4)
    return w4.reshape(4, c4, co4)


def _kernel(x_ref, w_ref, b_ref, gamma_ref, beta_ref, out_ref, u_scratch, *,
            n: int, c4: int, co4: int, strip: int, mode: str,
            head_co4: int = 0, pool: str = "", pool_ref=None, stream=None):
    """One batch element. x_ref (1, N+2, N+2, 4C); out_ref same spatial with
    4Co channels; w_ref (4, 4C, 4Co); b/gamma/beta (1, 4Co|4C).

    mode='head' additionally fuses the generator's 1x1 head conv + tanh:
    gamma_ref carries the (4Co, Ho4) s2d head kernel, beta_ref the (1, Ho4)
    head bias, and out_ref is the UNPADDED (1, N, N, Ho4) head output — the
    relu'd conv activations never leave VMEM.

    pool='pixel'|'s2d' (via conv3x3_s2d_fused_pool) additionally emits the
    2x2 max-pool of the conv output into ``pool_ref`` from the SAME strip
    pass — the conv already has the plane in VMEM, so the separate relayout
    kernel's HBM re-read + launch disappear and the pool's VPU work
    overlaps the next strip's matmuls. 'pixel' = pixel-domain (1, N, N, Co)
    (pool_s2d twin); 's2d' = next level's padded s2d (1, N/2+2, N/2+2, 4Co)
    (pool_to_s2d twin; needs even strip so row pairs stay in-strip).

    stream=(zrow_ref, o_stage, sems, zsem) (via STREAM_OUT) switches the
    MAIN output to streaming stores — out_ref lives in ANY (HBM) and each
    strip's result is DMA'd out while the next strip's matmuls run; see
    _StreamOut for the rationale and WAR-safety argument."""
    c = c4 // 4
    x = x_ref[0]  # (P, P, 4C)
    n_strips = n // strip

    if stream is not None:
        stream = _StreamOut(out_ref, *stream, n=n, strip=strip, co4=co4)
    elif mode != "head":
        _zero_ring_ref(out_ref, n)  # ring stays zero; interior overwritten
    if pool == "s2d":
        _zero_ring_ref(pool_ref, n // 2)

    bias = b_ref[0]
    if mode == "film":
        gamma = gamma_ref[0, 0]
        beta = beta_ref[0, 0]

    # Stage the plane's shifted-s2d representation — the in-VMEM u2s:
    # u[g, b, group(p, q)] = x[g+p, b+q, group(1-p, 1-q)]; every strip's
    # conv taps are then aligned sub-reads of this buffer.
    #
    # IMPORTANT (round-2 on-chip finding): a per-strip staging buffer
    # REUSED across the strip loop miscompiles on real TPU for c4=128 at
    # n >= 64 — Mosaic software-pipelines the loop and overwrites the
    # scratch before the previous strip's matmul reads complete (a missed
    # WAR hazard; deterministic wrong values from the 3rd-4th strip on,
    # invisible in interpret mode). The staging here writes every scratch
    # row EXACTLY ONCE (disjoint regions, only RAW dependencies, which
    # lower correctly) — but interleaved with the strip matmuls (round 3):
    # strip i+1's rows are staged before strip i's matmuls issue, so the
    # VPU staging stores can overlap the MXU matmuls instead of running as
    # one serial prologue. Guard: scripts/onchip_validate.py.
    def stage_rows(r0: int, r1: int):
        """Write u rows [r0, r1) — each row written exactly once."""
        for p in range(2):
            for q in range(2):
                if ALIGNED_STAGING:
                    # lane block g keeps its own channels, shifted by
                    # comp(g); the caller reversed the weight row blocks.
                    g = p * 2 + q
                    u_scratch[r0:r1, :, g * c : (g + 1) * c] = x[
                        (1 - p) + r0 : (1 - p) + r1,
                        (1 - q) : (1 - q) + n + 1,
                        g * c : (g + 1) * c,
                    ]
                else:
                    src = (1 - p) * 2 + (1 - q)
                    dst = p * 2 + q
                    u_scratch[r0:r1, :, dst * c : (dst + 1) * c] = x[
                        p + r0 : p + r1,
                        q : q + n + 1,
                        src * c : (src + 1) * c,
                    ]

    if INTERLEAVED_STAGING:
        stage_rows(0, strip + 1)  # strip 0 reads u rows [0, strip]
    else:
        stage_rows(0, n + 1)  # whole-plane prologue (round-2 scheme)
    for s_i in range(n_strips):
        j0 = s_i * strip  # first interior output row (0-based interior)
        if INTERLEAVED_STAGING and s_i + 1 < n_strips:
            # Strip s_i+1 reads u rows [j0+strip, j0+2*strip]; row j0+strip
            # is already staged — stage the new ones now, ahead of this
            # strip's matmuls.
            stage_rows(j0 + strip + 1, j0 + 2 * strip + 1)

        acc = jnp.zeros((strip * n, co4), jnp.float32)
        for A in range(2):
            for B in range(2):
                u = u_scratch[
                    j0 + A : j0 + A + strip, B : B + n, :
                ].reshape(strip * n, c4)
                acc = acc + jnp.dot(
                    u, w_ref[A * 2 + B], preferred_element_type=jnp.float32
                )

        y = acc + bias[None, :]
        if mode == "head":
            # The 1x1 head matmul runs here on the in-VMEM activations (the
            # full-channel conv plane never round-trips HBM); bias and tanh
            # are left to the CALLER — everything elementwise on the Ho4
            # (=4)-channel result runs on vregs lane-padded 4 -> 128 inside
            # the kernel (32x wasted VPU work; the padded in-kernel tanh
            # alone measured ~+9 ms/forward at batch 256), while XLA fuses
            # them into the following dense d2s relayout for free.
            # NOTE a lane-dense (strip, n*Ho4) store is NOT an option
            # either: Mosaic rejects the (strip*n, Ho4) -> (strip, n*Ho4)
            # lane merge ('infer-vector-layout: unsupported shape cast');
            # the sublane split to (strip, n, Ho4) below is supported.
            yb = jnp.maximum(y, 0.0).astype(jnp.bfloat16)
            yh = jnp.dot(yb, gamma_ref[...], preferred_element_type=jnp.float32)
            out_ref[0, j0 : j0 + strip, 0:n, :] = yh.reshape(
                strip, n, head_co4
            ).astype(out_ref.dtype)
            continue
        if mode == "relu":
            y = jnp.maximum(y, 0.0)
        elif mode == "film":
            trunk = x[j0 + 1 : j0 + 1 + strip, 1 : 1 + n, :].reshape(
                strip * n, c4
            ).astype(jnp.float32)
            y = trunk + jnp.maximum(y * gamma[None, :] + beta[None, :], 0.0)
        y = y.reshape(strip, n, co4).astype(out_ref.dtype)
        if stream is not None:
            stream.store(s_i, y)
        else:
            out_ref[0, j0 + 1 : j0 + 1 + strip, 1 : 1 + n, :] = y
        if pool:
            # Pool from the STORED (dtype-rounded) values so the fused
            # result bit-matches the separate pool kernels reading HBM.
            cp = co4 // 4
            gmax = jnp.maximum(
                jnp.maximum(y[:, :, 0:cp], y[:, :, cp : 2 * cp]),
                jnp.maximum(y[:, :, 2 * cp : 3 * cp], y[:, :, 3 * cp :]),
            )  # (strip, n, cp) — pooled pixel rows j0..j0+strip-1
            if pool == "pixel":
                pool_ref[0, j0 : j0 + strip, 0:n, :] = gmax
            else:  # 's2d': interior row r -> next row r//2, group-row r%2
                s2, n2 = strip // 2, n // 2
                rows4 = gmax.reshape(s2, 2, n, cp)
                for p in range(2):
                    t = jnp.swapaxes(rows4[:, p], 0, 1)  # (n, s2, cp)
                    tq = t.reshape(n2, 2, s2, cp)
                    for q in range(2):
                        blk = jnp.swapaxes(tq[:, q], 0, 1)  # (s2, n2, cp)
                        dst = p * 2 + q
                        pool_ref[
                            0,
                            j0 // 2 + 1 : j0 // 2 + 1 + s2,
                            1 : n2 + 1,
                            dst * cp : (dst + 1) * cp,
                        ] = blk

    if stream is not None:
        stream.drain()


class _StreamOut:
    """Streaming-store state for one grid step (STREAM_OUT): the main
    output lives in ANY (HBM) and each strip's result is DMA'd out of a
    2-slot VMEM staging ring while the next strip's matmuls run on the
    MXU. kernel_anatomy measured the whole-plane VMEM output block
    serializing its store against the MXU (full-kernel marginal 1.145 ms
    vs 0.823 ms matmul phase at the production L1 shape; the 0.31 ms
    delta is exactly the un-overlapped output-store time), because
    double-buffering whole in+out planes exceeds VMEM and Mosaic falls
    back to serial DMA.

    The output plane is COLUMN-PADDED to ``cols = _stream_cols(n + 2)``
    so every DMA slice is (8, 128)-tile-aligned (Mosaic rejects
    misaligned HBM slices — see the STREAM_OUT comment); the ring column
    0, ring column n+1 and the pad columns [n+2, cols) are zeroed ONCE
    in the staging slots at grid step 0 and never rewritten (the
    interior store only touches cols [1, n+1)), so every DMA'd row
    carries the correct zeros. The zero ring ROWS ride two row DMAs of
    a constant zeros INPUT (zrow_ref — an input, not a scratch, so
    there is no vector-write -> DMA-read ordering to trust). WAR
    safety: a slot is rewritten only after an explicit .wait() on its
    previous DMA — ordering is explicit semaphore flow, not inferred
    vector dependence (the round-2 Mosaic hazard was a missed implicit
    WAR on a reused vector scratch)."""

    def __init__(self, out_ref, zrow_ref, o_stage, sems, zsem, *,
                 n: int, strip: int, co4: int):
        self.out_ref, self.o_stage, self.sems = out_ref, o_stage, sems
        self.n, self.strip = n, strip
        self.n_strips = n // strip
        cols = _stream_cols(n + 2)
        self.grid_i = pl.program_id(0)
        self._ring = [
            pltpu.make_async_copy(
                zrow_ref, out_ref.at[self.grid_i, pl.ds(r, 1)], zsem.at[k]
            )
            for k, r in enumerate((0, n + 1))
        ]
        self._ring[0].start()
        self._ring[1].start()

        @pl.when(self.grid_i == 0)
        def _():
            o_stage[:, :, 0:1, :] = jnp.zeros(
                (2, strip, 1, co4), o_stage.dtype
            )
            o_stage[:, :, n + 1 : cols, :] = jnp.zeros(
                (2, strip, cols - n - 1, co4), o_stage.dtype
            )

    def _dma(self, slot: int, s_i: int):
        return pltpu.make_async_copy(
            self.o_stage.at[slot],
            self.out_ref.at[
                self.grid_i, pl.ds(s_i * self.strip + 1, self.strip)
            ],
            self.sems.at[slot],
        )

    def store(self, s_i: int, y):
        """Stage strip ``s_i``'s (strip, n, co4) result and start its DMA."""
        slot = s_i % 2
        if s_i >= 2:
            self._dma(slot, s_i - 2).wait()  # slot free before rewrite
        self.o_stage[slot, :, 1 : 1 + self.n, :] = y
        self._dma(slot, s_i).start()

    def drain(self):
        """Wait out all in-flight DMAs: the grid step must not end with
        DMAs pending (the next step rewrites the slots; the final step
        would leak semaphores)."""
        for s_i in range(max(0, self.n_strips - 2), self.n_strips):
            self._dma(s_i % 2, s_i).wait()
        self._ring[0].wait()
        self._ring[1].wait()


def _stream_scratch(strip: int, cols: int, co4: int, dt):
    """Scratch tail shared by every streaming-store pallas_call: the 2-slot
    output staging buffer (column-padded width) + its DMA semaphores + the
    ring-row semaphores."""
    return [
        pltpu.VMEM((2, strip, cols, co4), dt),
        pltpu.SemaphoreType.DMA((2,)),
        pltpu.SemaphoreType.DMA((2,)),
    ]


def _zrow_spec(cols: int, co4: int):
    """BlockSpec of the constant zero-row input (same block every step)."""
    return pl.BlockSpec((1, cols, co4), lambda i: (0, 0, 0),
                        memory_space=pltpu.VMEM)


def _kernel_stream_adapter(inner, x_ref, w_ref, b_ref, gamma_ref, beta_ref,
                           zrow_ref, out_ref, u_scratch, o_stage, sems, zsem):
    """Positional adapter for the streaming-store layout: the zrow input
    lands after the regular inputs, the stream scratch after u_scratch."""
    inner(x_ref, w_ref, b_ref, gamma_ref, beta_ref, out_ref, u_scratch,
          stream=(zrow_ref, o_stage, sems, zsem))


def _kernel2_stream_adapter(inner, x1_ref, x2_ref, w1_ref, w2_ref, b_ref,
                            zrow_ref, out_ref, u1, u2, o_stage, sems, zsem):
    """Streaming-store adapter for the two-operand kernel."""
    inner(x1_ref, x2_ref, w1_ref, w2_ref, b_ref, out_ref, u1, u2,
          stream=(zrow_ref, o_stage, sems, zsem))


def conv3x3_s2d_fused(
    x_padded: jnp.ndarray,  # (B, N+2, N+2, 4C)
    w4: jnp.ndarray,  # (2, 2, 4C, 4Co)
    bias4: jnp.ndarray,  # (4Co,)
    gamma4: jnp.ndarray | None = None,  # (B, 4C) — film mode
    beta4: jnp.ndarray | None = None,
    mode: str = "relu",
    strip: int = 8,
) -> jnp.ndarray:
    """Fused s2d conv; returns padded unshifted s2d (B, N+2, N+2, 4Co).

    Differentiable: a custom VJP (below) backpropagates with the same
    Pallas kernel (dX is the flip-transposed conv) plus MXU einsums for dW,
    so the fused path can run inside the generator's own gradient step."""
    b = x_padded.shape[0]
    c4 = x_padded.shape[-1]
    if gamma4 is None:
        gamma4 = jnp.zeros((b, c4), jnp.float32)
        beta4 = jnp.zeros((b, c4), jnp.float32)
    return _conv3x3_s2d_vjp(x_padded, w4, bias4, gamma4, beta4, mode, strip)


@partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def _conv3x3_s2d_vjp(x_padded, w4, bias4, gamma4, beta4, mode, strip):
    return _conv3x3_s2d_impl(x_padded, w4, bias4, gamma4, beta4, mode, strip)


def _flip_transpose_w4(w4: jnp.ndarray) -> jnp.ndarray:
    """s2d kernel of the transpose conv: recover the pixel 3x3 kernel from
    w4 (each pixel tap is stored verbatim in the (p,q)=(0,0) output block /
    the matching input block — the transform's slices, inverted), flip it
    spatially, swap I/O, re-transform. All slicing + one re-transform: the
    map is linear, exact, and cheap (runs on (3,3,C,Co) weights)."""
    from . import s2d_conv as S

    c4, co4 = w4.shape[2], w4.shape[3]
    ci, co = c4 // 4, co4 // 4
    taps = []
    for dy in range(3):
        row = []
        for dx in range(3):
            a, r = divmod(dy, 2)   # (p, q) = (0, 0)
            b_, s = divmod(dx, 2)
            row.append(
                w4[a, b_, (r * 2 + s) * ci : (r * 2 + s + 1) * ci, 0:co]
            )
        taps.append(row)
    w_px = jnp.stack([jnp.stack(row, axis=0) for row in taps], axis=0)
    # transpose conv kernel: flip spatially, swap in/out channels
    w_bwd = jnp.flip(w_px, axis=(0, 1)).transpose(0, 1, 3, 2)
    w4_bwd, _ = S.conv3x3_to_s2d_kernel_j(w_bwd)
    return w4_bwd


def _interior_mask(p_dim: int, cols: int, n: int, dtype) -> jnp.ndarray:
    """(1, p_dim, cols, 1) 0/1 mask selecting the interior [1, n+1) x
    [1, n+1). A broadcasted multiply by this fuses into the adjacent
    elementwise ops as ONE pass; the old pad(slice(...)) formulation
    measured ~5.7x its HBM floor on chip (round-5 critic roofline: the
    mask/pad glue cost as much as the transposed conv it fed)."""
    row = (jnp.arange(p_dim) >= 1) & (jnp.arange(p_dim) <= n)
    col = (jnp.arange(cols) >= 1) & (jnp.arange(cols) <= n)
    return (row[:, None] & col[None, :]).astype(dtype)[None, :, :, None]


def _zero_ring(g: jnp.ndarray) -> jnp.ndarray:
    """Drop cotangents on the padded border ring (the forward writes
    constant zeros there, so they carry no gradient). Interior bounds come
    from the ROW dim: a STREAM_OUT cotangent also carries constant-zero
    pad columns beyond N+1, which are zeroed here the same way.
    Implemented as a fused multiplicative mask (0/1 multiplies are exact,
    so this matches the old pad(slice) up to the sign of zeros)."""
    n = g.shape[1] - 2
    return g * _interior_mask(g.shape[1], g.shape[2], n, g.dtype)


def _match_cols(a: jnp.ndarray, cols: int) -> jnp.ndarray:
    """Crop or zero-pad ``a``'s column dim to ``cols``: an input cotangent
    must match that input's own column width, while the backward convs emit
    the CURRENT STREAM_OUT width (the dropped/added pad columns carry
    constant zeros either way)."""
    if a.shape[2] == cols:
        return a
    if a.shape[2] > cols:
        return a[:, :, :cols, :]
    return jnp.pad(a, ((0, 0), (0, 0), (0, cols - a.shape[2]), (0, 0)))


def _conv3x3_s2d_fwd(x_padded, w4, bias4, gamma4, beta4, mode, strip):
    out = _conv3x3_s2d_impl(x_padded, w4, bias4, gamma4, beta4, mode, strip)
    return out, (x_padded, w4, bias4, gamma4, beta4, out)


def _conv3x3_s2d_bwd(mode, strip, res, g):
    x_padded, w4, bias4, gamma4, beta4, out = res
    b, p_dim, _, c4 = x_padded.shape
    n = p_dim - 2
    co4 = w4.shape[-1]
    f32 = jnp.float32

    g = _zero_ring(g)
    if mode == "relu":
        # y = relu(conv + b): ring of `out` is 0 -> masked automatically.
        dpre = jnp.where(out > 0, g, 0.0).astype(f32)
        dgamma = jnp.zeros_like(gamma4)
        dbeta = jnp.zeros_like(beta4)
        dx_extra = None
    elif mode == "film":
        # y = x + relu(gamma*(conv+b) + beta). The pre-modulation activation
        # c0 is recomputed with one 'none'-mode kernel pass (cheaper than
        # storing a second full tensor), and the ReLU mask is derived
        # EXACTLY as (gamma*c0 + beta) > 0 — differencing the dtype-rounded
        # saved output (out - x) can flip the mask in bf16 when the small
        # FiLM branch cancels against the large residual trunk.
        c0 = _conv3x3_s2d_impl(
            x_padded, w4, bias4, jnp.zeros_like(gamma4),
            jnp.zeros_like(beta4), "none", strip,
        ).astype(f32)
        gb = gamma4.astype(f32)[:, None, None, :]
        bb = beta4.astype(f32)[:, None, None, :]
        mask = c0 * gb + bb > 0
        gm = jnp.where(mask, g, 0.0).astype(f32)
        dpre = gm * gb
        dgamma = jnp.sum(gm * c0, axis=(1, 2)).astype(gamma4.dtype)
        dbeta = jnp.sum(gm, axis=(1, 2)).astype(beta4.dtype)
        dx_extra = g  # identity (residual trunk) path
    else:  # none
        dpre = g.astype(f32)
        dgamma = jnp.zeros_like(gamma4)
        dbeta = jnp.zeros_like(beta4)
        dx_extra = None

    dpre = dpre.astype(x_padded.dtype)
    # dX: transpose conv through the same fused kernel (mode='none',
    # zero bias); emits the padded layout with a zero ring — exactly the
    # cotangent x_padded expects.
    # CONTRACT: dX goes through the raw _conv3x3_s2d_impl (no VJP), so
    # conv3x3_s2d_fused/fused2 are FIRST-ORDER-ONLY — they cannot be
    # linearized twice. All current call sites respect this (the WGAN-GP
    # critic path hand-chains its input gradient in ops/fast_critic.py);
    # a future grad-of-grad through the generator kernels must route this
    # through _conv3x3_s2d_vjp instead (as _conv5_bwd does).
    w4_bwd = _flip_transpose_w4(w4)
    dx = _conv3x3_s2d_impl(
        dpre, w4_bwd, jnp.zeros((c4,), f32),
        jnp.zeros((b, co4), f32), jnp.zeros((b, co4), f32), "none", strip,
    )
    if dx_extra is not None:
        dx = dx + dx_extra
    # The cotangent must match x's OWN column width (the backward conv
    # emits the current STREAM_OUT width; pad columns are zeros).
    dx = _match_cols(dx, x_padded.shape[2]).astype(x_padded.dtype)

    dw4 = _dw4_einsums(x_padded, dpre, n).astype(w4.dtype)
    dbias = jnp.sum(dpre[:, 1 : n + 1, 1 : n + 1, :], axis=(0, 1, 2)).astype(
        jnp.asarray(bias4).dtype
    )
    return (dx, dw4, dbias, dgamma, dbeta)


def _dw4_einsums(x_padded, dpre, n):
    """dW4[A,B][(p,q)C+c, o] = sum_b,oi,oj x_pad[b, oi+A+p, oj+B+q,
    (1-p,1-q)C+c] * dpre[b, oi+1, oj+1, o] — 16 MXU einsums (same FLOPs as
    one forward conv, the standard dW cost)."""
    f32 = jnp.float32
    c4 = x_padded.shape[-1]
    co4 = dpre.shape[-1]
    c = c4 // 4
    dint = dpre[:, 1 : n + 1, 1 : n + 1, :]  # explicit: dpre may be col-padded
    dw4 = jnp.zeros((2, 2, c4, co4), f32)
    for A in range(2):
        for B_ in range(2):
            for p in range(2):
                for q in range(2):
                    src = ((1 - p) * 2 + (1 - q)) * c
                    xs = x_padded[:, A + p : A + p + n, B_ + q : B_ + q + n,
                                  src : src + c]
                    blk = jnp.einsum(
                        "bijc,bijo->co", xs, dint,
                        preferred_element_type=f32,
                    )
                    dw4 = dw4.at[
                        A, B_, (p * 2 + q) * c : (p * 2 + q + 1) * c, :
                    ].set(blk)
    return dw4


_conv3x3_s2d_vjp.defvjp(_conv3x3_s2d_fwd, _conv3x3_s2d_bwd)


def _conv3x3_s2d_impl(
    x_padded: jnp.ndarray,  # (B, N+2, N+2, 4C)
    w4: jnp.ndarray,  # (2, 2, 4C, 4Co)
    bias4: jnp.ndarray,  # (4Co,)
    gamma4: jnp.ndarray,  # (B, 4C) — film mode
    beta4: jnp.ndarray,
    mode: str = "relu",
    strip: int = 8,
) -> jnp.ndarray:
    """Kernel dispatch (no VJP); returns padded unshifted s2d — with the
    column dim padded to _stream_cols(N+2) when STREAM_OUT is on. The
    input's own column dim may exceed its row dim (a streamed producer);
    the kernel reads cols [0, N+2) only."""
    b, p_dim, in_cols, c4 = x_padded.shape
    n = p_dim - 2
    co4 = w4.shape[-1]
    if mode == "film" and c4 != co4:
        raise ValueError("film mode requires C_out == C_in (residual add)")
    strip = _norm_strip(n, strip)

    dt = x_padded.dtype
    w_flat = _w_rows_for_staging(w4, c4, co4).astype(dt)
    bias = bias4.reshape(1, co4).astype(jnp.float32)
    if mode == "film":
        gamma = gamma4.astype(jnp.float32).reshape(b, 1, c4)
        beta = beta4.astype(jnp.float32).reshape(b, 1, c4)
    else:
        gamma = jnp.zeros((b, 1, c4), jnp.float32)
        beta = jnp.zeros((b, 1, c4), jnp.float32)

    kernel = partial(_kernel, n=n, c4=c4, co4=co4, strip=strip, mode=mode)
    flops = 2 * b * n * n * 4 * c4 * co4
    in_specs = [
        pl.BlockSpec((1, p_dim, in_cols, c4), lambda i: (i, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),  # weights, whole
        pl.BlockSpec(memory_space=pltpu.VMEM),  # bias
        pl.BlockSpec((1, 1, c4), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, c4), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
    ]
    operands = [x_padded, w_flat, bias, gamma, beta]
    scratch = [pltpu.VMEM((n + 1, n + 1, c4), dt)]
    if STREAM_OUT:
        out_cols = _stream_cols(p_dim)
        kernel = partial(_kernel_stream_adapter, kernel)
        in_specs.append(_zrow_spec(out_cols, co4))
        operands.append(jnp.zeros((1, out_cols, co4), dt))
        out_spec = pl.BlockSpec(memory_space=pl.ANY)
        scratch += _stream_scratch(strip, out_cols, co4, dt)
    else:
        out_cols = p_dim
        out_spec = pl.BlockSpec((1, p_dim, p_dim, co4), lambda i: (i, 0, 0, 0),
                                memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, p_dim, out_cols, co4), dt),
        grid=(b,),
        in_specs=in_specs,
        out_specs=out_spec,
        scratch_shapes=scratch,
        # Whole-image blocks + Pallas double-buffering exceed the default
        # 16M scoped-vmem budget at level 1; the physical budget is larger.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=x_padded.size * 2 + b * p_dim * out_cols * co4 * 2,
            transcendentals=0,
        ),
        interpret=_interpret(),
    )(*operands)


def _kernel_pool(x_ref, w_ref, b_ref, gamma_ref, beta_ref, out_ref,
                 pool_ref, u_scratch, *, n, c4, co4, strip, mode, pool):
    """Positional adapter: pallas passes the second output ref between
    out_ref and the scratch."""
    _kernel(x_ref, w_ref, b_ref, gamma_ref, beta_ref, out_ref, u_scratch,
            n=n, c4=c4, co4=co4, strip=strip, mode=mode,
            pool=pool, pool_ref=pool_ref)


def _kernel_pool_stream(x_ref, w_ref, b_ref, gamma_ref, beta_ref, zrow_ref,
                        out_ref, pool_ref, u_scratch, o_stage, sems, zsem, *,
                        n, c4, co4, strip, mode, pool):
    """Streaming-store adapter for the pool-fused kernel: only the MAIN
    conv output streams (it is the big whole-plane store); the pooled
    output is 4x smaller and keeps its VMEM block."""
    _kernel(x_ref, w_ref, b_ref, gamma_ref, beta_ref, out_ref, u_scratch,
            n=n, c4=c4, co4=co4, strip=strip, mode=mode,
            pool=pool, pool_ref=pool_ref,
            stream=(zrow_ref, o_stage, sems, zsem))


def conv3x3_s2d_fused_pool(
    x_padded: jnp.ndarray,  # (B, N+2, N+2, 4C)
    w4: jnp.ndarray,        # (2, 2, 4C, 4Co)
    bias4: jnp.ndarray,     # (4Co,)
    mode: str = "relu",
    strip: int = 8,
    pool: str = "s2d",
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Fused s2d conv that ALSO emits the 2x2 max-pool of its output from
    the same VMEM pass (VERDICT r3 item 3: the level-1/2 relayout stages —
    pool_to_s2d ~8 ms net vs a 1.7 ms floor at batch 256 — re-read a plane
    the conv kernel just had in VMEM).

    Returns ``(conv_out, pooled)`` where conv_out is the usual padded s2d
    plane (still stored — it is the encoder skip) and pooled is
      pool='s2d'  : the NEXT level's padded s2d (B, N/2+2, N/2+2, 4Co)
                    (bit-matches pool_to_s2d_pallas(conv_out)),
      pool='pixel': the pixel-domain pool (B, N, N, Co)
                    (bit-matches pool_s2d_pallas(conv_out)).

    INFERENCE-ONLY: no VJP (training keeps the separate kernels, whose
    custom VJPs are already validated); used by FastGenerator behind the
    ``fuse_pool`` knob after on-chip validation (CLAUDE.md kernel gate)."""
    b, p_dim, in_cols, c4 = x_padded.shape
    n = p_dim - 2
    co4 = w4.shape[-1]
    if mode not in ("relu", "none"):
        raise ValueError("pool fusion supports mode='relu'|'none' only")
    strip = _norm_strip(n, strip)
    if pool == "s2d" and (strip % 2 or n % 2):
        raise ValueError("pool='s2d' needs even strip and even n")
    if pool not in ("s2d", "pixel"):
        raise ValueError(f"unknown pool mode {pool!r}")
    cp = co4 // 4
    n2 = n // 2
    dt = x_padded.dtype
    w_flat = _w_rows_for_staging(w4, c4, co4).astype(dt)
    bias = bias4.reshape(1, co4).astype(jnp.float32)
    gamma = jnp.zeros((b, 1, c4), jnp.float32)
    beta = jnp.zeros((b, 1, c4), jnp.float32)

    if pool == "s2d":
        pool_shape = (b, n2 + 2, n2 + 2, co4)
        pool_block = (1, n2 + 2, n2 + 2, co4)
    else:
        pool_shape = (b, n, n, cp)
        pool_block = (1, n, n, cp)

    kernel = partial(_kernel_pool, n=n, c4=c4, co4=co4, strip=strip,
                     mode=mode, pool=pool)
    flops = 2 * b * n * n * 4 * c4 * co4
    in_specs = [
        pl.BlockSpec((1, p_dim, in_cols, c4), lambda i: (i, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),  # weights, whole
        pl.BlockSpec(memory_space=pltpu.VMEM),  # bias
        pl.BlockSpec((1, 1, c4), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, c4), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
    ]
    operands = [x_padded, w_flat, bias, gamma, beta]
    scratch = [pltpu.VMEM((n + 1, n + 1, c4), dt)]
    pool_spec = pl.BlockSpec(pool_block, lambda i: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM)
    if STREAM_OUT:
        out_cols = _stream_cols(p_dim)
        kernel = partial(_kernel_pool_stream, n=n, c4=c4, co4=co4,
                         strip=strip, mode=mode, pool=pool)
        in_specs.append(_zrow_spec(out_cols, co4))
        operands.append(jnp.zeros((1, out_cols, co4), dt))
        out_specs = (pl.BlockSpec(memory_space=pl.ANY), pool_spec)
        scratch += _stream_scratch(strip, out_cols, co4, dt)
    else:
        out_cols = p_dim
        out_specs = (
            pl.BlockSpec((1, p_dim, p_dim, co4), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pool_spec,
        )
    return pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((b, p_dim, out_cols, co4), dt),
            jax.ShapeDtypeStruct(pool_shape, dt),
        ),
        grid=(b,),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=x_padded.size * 2
            + b * p_dim * out_cols * co4 * 2
            + int(np.prod(pool_shape)) * 2,
            transcendentals=0,
        ),
        interpret=_interpret(),
    )(*operands)


def conv3x3_s2d_fused_head(
    x_padded: jnp.ndarray,  # (B, N+2, N+2, 4C)
    w4: jnp.ndarray,        # (2, 2, 4C, 4Co)
    bias4: jnp.ndarray,     # (4Co,)
    w_head4: jnp.ndarray,   # (1, 1, 4Co, Ho4) — s2d 1x1 head kernel
    b_head4: jnp.ndarray,   # (Ho4,)
    strip: int = 8,
) -> jnp.ndarray:
    """tanh(head_1x1(relu(conv3x3_s2d(x) + b))) with the head MATMUL fused
    into the final decoder conv's epilogue (reference head: 1x1 conv +
    tanh, `...twoCritics_training_4fold.py:494-495`); the head bias + tanh
    run in XLA on the dense output (see the mode='head' comment in
    _kernel for why the elementwise tail must NOT live in the kernel).

    Returns UNPADDED unshifted s2d tanh(logits) (B, N, N, Ho4) float32.
    The head matmul runs on the in-VMEM activations, so the old path's
    separate f32 cast + XLA conv over the full-channel plane never touches
    HBM. INFERENCE-ONLY: no VJP (training's fused path keeps the separate
    head, whose gradient the kernels' custom VJPs already cover)."""
    b, p_dim, in_cols, c4 = x_padded.shape
    n = p_dim - 2
    co4 = w4.shape[-1]
    h4 = w_head4.shape[-1]
    strip = _norm_strip(n, strip)
    dt = x_padded.dtype
    w_flat = _w_rows_for_staging(w4, c4, co4).astype(dt)
    bias = bias4.reshape(1, co4).astype(jnp.float32)
    w_head = w_head4.reshape(co4, h4).astype(jnp.bfloat16)  # bf16 MXU rate
    b_head = b_head4.reshape(1, h4).astype(jnp.float32)
    kernel = partial(_kernel, n=n, c4=c4, co4=co4, strip=strip, mode="head",
                     head_co4=h4)
    flops = 2 * b * n * n * (4 * c4 * co4 + co4 * h4)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, n, n, h4), jnp.float32),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, p_dim, in_cols, c4), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # conv weights, whole
            pl.BlockSpec(memory_space=pltpu.VMEM),  # conv bias
            pl.BlockSpec(memory_space=pltpu.VMEM),  # head kernel (gamma slot)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # head bias (beta slot)
        ],
        out_specs=pl.BlockSpec((1, n, n, h4), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((n + 1, n + 1, c4), dt)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=x_padded.size * 2 + b * n * n * h4 * 4,
            transcendentals=b * n * n * h4,
        ),
        interpret=_interpret(),
    )(x_padded, w_flat, bias, w_head, b_head)
    # Elementwise tail outside the kernel: XLA fuses bias + tanh into the
    # consumer (the d2s relayout) at dense lane occupancy.
    return jnp.tanh(out + b_head4.astype(jnp.float32))


# ---------------------------------------------------------------------------
# Two-operand fused conv — the decoder's first conv without materialising the
# skip concat. conv(concat(a, b), W) == conv(a, W_rows_a) + conv(b, W_rows_b),
# so the kernel stages both operands and accumulates 8 matmuls; the 5-7 ms
# concat relayout the old path paid at level 1 (misaligned per-group channel
# stores over a 12 MB buffer — measured, docs/PERF.md round-2 bisection)
# disappears entirely.
# ---------------------------------------------------------------------------


def _kernel2(x1_ref, x2_ref, w1_ref, w2_ref, b_ref, out_ref, u1, u2, *,
             n: int, c4a: int, c4b: int, co4: int, strip: int, stream=None):
    ca, cb = c4a // 4, c4b // 4
    x1 = x1_ref[0]
    x2 = x2_ref[0]
    if stream is not None:
        stream = _StreamOut(out_ref, *stream, n=n, strip=strip, co4=co4)
    else:
        _zero_ring_ref(out_ref, n)
    bias = b_ref[0]

    # Interleaved single-write staging, same scheme (and same WAR-hazard
    # rationale) as _kernel: every scratch row written exactly once, strip
    # i+1's rows staged ahead of strip i's matmuls.
    def stage_rows(r0: int, r1: int):
        for p in range(2):
            for q in range(2):
                if ALIGNED_STAGING:
                    g = p * 2 + q
                    u1[r0:r1, :, g * ca : (g + 1) * ca] = x1[
                        (1 - p) + r0 : (1 - p) + r1,
                        (1 - q) : (1 - q) + n + 1,
                        g * ca : (g + 1) * ca,
                    ]
                    u2[r0:r1, :, g * cb : (g + 1) * cb] = x2[
                        (1 - p) + r0 : (1 - p) + r1,
                        (1 - q) : (1 - q) + n + 1,
                        g * cb : (g + 1) * cb,
                    ]
                else:
                    src = (1 - p) * 2 + (1 - q)
                    dst = p * 2 + q
                    u1[r0:r1, :, dst * ca : (dst + 1) * ca] = x1[
                        p + r0 : p + r1, q : q + n + 1,
                        src * ca : (src + 1) * ca,
                    ]
                    u2[r0:r1, :, dst * cb : (dst + 1) * cb] = x2[
                        p + r0 : p + r1, q : q + n + 1,
                        src * cb : (src + 1) * cb,
                    ]

    n_strips = n // strip
    if INTERLEAVED_STAGING:
        stage_rows(0, strip + 1)
    else:
        stage_rows(0, n + 1)
    for s_i in range(n_strips):
        j0 = s_i * strip
        if INTERLEAVED_STAGING and s_i + 1 < n_strips:
            stage_rows(j0 + strip + 1, j0 + 2 * strip + 1)
        acc = jnp.zeros((strip * n, co4), jnp.float32)
        for A in range(2):
            for B in range(2):
                v1 = u1[j0 + A : j0 + A + strip, B : B + n, :].reshape(
                    strip * n, c4a)
                v2 = u2[j0 + A : j0 + A + strip, B : B + n, :].reshape(
                    strip * n, c4b)
                acc = acc + jnp.dot(v1, w1_ref[A * 2 + B],
                                    preferred_element_type=jnp.float32)
                acc = acc + jnp.dot(v2, w2_ref[A * 2 + B],
                                    preferred_element_type=jnp.float32)
        y = jnp.maximum(acc + bias[None, :], 0.0)
        y = y.reshape(strip, n, co4).astype(out_ref.dtype)
        if stream is not None:
            stream.store(s_i, y)
        else:
            out_ref[0, j0 + 1 : j0 + 1 + strip, 1 : 1 + n, :] = y

    if stream is not None:
        stream.drain()


def conv3x3_s2d_fused2(
    x1_padded: jnp.ndarray,  # (B, N+2, N+2, 4C1)
    x2_padded: jnp.ndarray,  # (B, N+2, N+2, 4C2)
    w4_1: jnp.ndarray,  # (2, 2, 4C1, 4Co)
    w4_2: jnp.ndarray,  # (2, 2, 4C2, 4Co)
    bias4: jnp.ndarray,  # (4Co,)
    strip: int = 8,
) -> jnp.ndarray:
    """relu(conv(x1, w1) + conv(x2, w2) + b) — padded s2d in and out."""
    return _conv2_vjp(x1_padded, x2_padded, w4_1, w4_2, bias4, strip)


@partial(jax.custom_vjp, nondiff_argnums=(5,))
def _conv2_vjp(x1_padded, x2_padded, w4_1, w4_2, bias4, strip):
    return _conv2_impl(x1_padded, x2_padded, w4_1, w4_2, bias4, strip)


def _conv2_impl(x1_padded, x2_padded, w4_1, w4_2, bias4, strip):
    b, p_dim, cols1, c4a = x1_padded.shape
    c4b = x2_padded.shape[-1]
    cols2 = x2_padded.shape[2]  # the two inputs' col pads may differ
    n = p_dim - 2
    co4 = w4_1.shape[-1]
    strip = _norm_strip(n, strip)
    dt = x1_padded.dtype
    w1 = _w_rows_for_staging(w4_1, c4a, co4).astype(dt)
    w2 = _w_rows_for_staging(w4_2, c4b, co4).astype(dt)
    bias = bias4.reshape(1, co4).astype(jnp.float32)
    kernel = partial(_kernel2, n=n, c4a=c4a, c4b=c4b, co4=co4, strip=strip)
    flops = 2 * b * n * n * 4 * (c4a + c4b) * co4
    in_specs = [
        pl.BlockSpec((1, p_dim, cols1, c4a), lambda i: (i, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, p_dim, cols2, c4b), lambda i: (i, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
    ]
    operands = [x1_padded, x2_padded, w1, w2, bias]
    scratch = [
        pltpu.VMEM((n + 1, n + 1, c4a), dt),
        pltpu.VMEM((n + 1, n + 1, c4b), dt),
    ]
    if STREAM_OUT:
        out_cols = _stream_cols(p_dim)
        kernel = partial(_kernel2_stream_adapter, kernel)
        in_specs.append(_zrow_spec(out_cols, co4))
        operands.append(jnp.zeros((1, out_cols, co4), dt))
        out_spec = pl.BlockSpec(memory_space=pl.ANY)
        scratch += _stream_scratch(strip, out_cols, co4, dt)
    else:
        out_cols = p_dim
        out_spec = pl.BlockSpec((1, p_dim, p_dim, co4), lambda i: (i, 0, 0, 0),
                                memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, p_dim, out_cols, co4), dt),
        grid=(b,),
        in_specs=in_specs,
        out_specs=out_spec,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=x1_padded.size * 2 + x2_padded.size * 2
            + b * p_dim * out_cols * co4 * 2,
            transcendentals=0,
        ),
        interpret=_interpret(),
    )(*operands)


def _conv2_fwd(x1, x2, w4_1, w4_2, bias4, strip):
    out = _conv2_impl(x1, x2, w4_1, w4_2, bias4, strip)
    return out, (x1, x2, w4_1, w4_2, bias4, out)


def _conv2_bwd(strip, res, g):
    x1, x2, w4_1, w4_2, bias4, out = res
    b = x1.shape[0]
    n = x1.shape[1] - 2
    co4 = w4_1.shape[-1]
    f32 = jnp.float32

    g = _zero_ring(g)
    dpre = jnp.where(out > 0, g, 0.0).astype(x1.dtype)

    def dx_for(w4, x):
        # Raw impl (no VJP) — first-order-only, same contract as
        # _conv3x3_s2d_bwd above. Cropped/padded to that input's own
        # column width (see _match_cols).
        dx = _conv3x3_s2d_impl(
            dpre, _flip_transpose_w4(w4), jnp.zeros((x.shape[-1],), f32),
            jnp.zeros((b, co4), f32), jnp.zeros((b, co4), f32), "none", strip,
        )
        return _match_cols(dx, x.shape[2]).astype(x.dtype)

    dx1 = dx_for(w4_1, x1)
    dx2 = dx_for(w4_2, x2)
    dw1 = _dw4_einsums(x1, dpre.astype(f32), n).astype(w4_1.dtype)
    dw2 = _dw4_einsums(x2, dpre.astype(f32), n).astype(w4_2.dtype)
    dbias = jnp.sum(
        dpre[:, 1 : n + 1, 1 : n + 1, :].astype(f32), axis=(0, 1, 2)
    ).astype(jnp.asarray(bias4).dtype)
    return (dx1, dx2, dw1, dw2, dbias)


_conv2_vjp.defvjp(_conv2_fwd, _conv2_bwd)


# ---------------------------------------------------------------------------
# Chained two-conv kernel (round 5) — HBM-traffic ELIMINATION.
#
# Round 5 closed the store/fetch-overlap question: all three scheduling
# formulations (STREAM_OUT manual DMA ring, ALIGNED_STAGING, row-blocked
# output grids) measured REJECTED on chip (docs/PERF.md), so the
# per-kernel un-overlapped store is a fixed cost of the whole-plane
# design. What remains reachable is removing HBM round trips outright:
# the generator's site chains (conv_in -> film -> conv_out,
# models/film.py; reference `...twoCritics_training_4fold.py:420-470`)
# store each intermediate plane to HBM only for the next kernel to read
# it straight back (store+load = 2.7 ms at L1/batch-256, 1.4 ms at L2 —
# pure serial HBM time by the kernel-anatomy measurement). This kernel
# runs TWO chained 3x3 s2d convs in one pallas_call: the intermediate
# plane lives in a VMEM scratch (bf16-rounded exactly as the HBM
# round trip would round it, so the result is bit-identical to the
# sequential two-kernel composition), and only x and the final output
# touch HBM.
#
# VMEM budget: x + u1 + h + u2 + out = 5 plane-sized buffers — ~21.5 MB
# at the L1 shape, well under what the production fused2 kernel already
# holds resident (~47 MB at dec p1), i.e. within this chip's VMEM.
#
# WAR safety (the round-2 Mosaic hazard rule): every scratch region is
# written exactly once per grid step — u1 staged once, h's ring and
# interior disjointly once, u2 once — only RAW dependencies anywhere.
#
# INFERENCE-ONLY: no VJP (training keeps the separate kernels whose
# custom VJPs are validated); used by FastGenerator behind `fuse_chain`
# after on-chip validation (CLAUDE.md kernel gate).
# ---------------------------------------------------------------------------


def _kernel_chain2(x_ref, w1_ref, w2_ref, b1_ref, b2_ref, gamma_ref,
                   beta_ref, out_ref, u1, h, u2, *, n: int, c4i: int,
                   c4m: int, c4o: int, strip: int, modes: tuple):
    """One batch element: x (1, N+2, N+2, 4Ci) -> conv1[modes[0]] ->
    h (VMEM, padded, 4Cm) -> conv2[modes[1]] -> out (1, N+2, N+2, 4Co).

    modes: two of {'relu', 'film', 'none'}; at most one 'film'. The film
    stage's trunk residual is that stage's own input (x for stage 1, h for
    stage 2 — matching conv3x3_s2d_fused's film semantics), and gamma/beta
    apply there."""
    ci, cm = c4i // 4, c4m // 4
    x = x_ref[0]
    bias1 = b1_ref[0]
    bias2 = b2_ref[0]
    gamma = gamma_ref[0, 0]
    beta = beta_ref[0, 0]
    n_strips = n // strip

    def stage_rows(u, src, c, r0: int, r1: int):
        # The in-VMEM u2s (same scheme + write-once rule as _kernel).
        for p in range(2):
            for q in range(2):
                sg = (1 - p) * 2 + (1 - q)
                dst = p * 2 + q
                u[r0:r1, :, dst * c : (dst + 1) * c] = src[
                    p + r0 : p + r1, q : q + n + 1, sg * c : (sg + 1) * c
                ]

    def conv_stage(u, w_ref, src, bias, mode, src_c4, dst_write):
        """Strip loop: 4 MXU matmuls + epilogue; dst_write(j0, y) stores
        the (strip, n, co) interior rows [j0+1, j0+1+strip)."""
        co = w_ref.shape[-1]
        for s_i in range(n_strips):
            j0 = s_i * strip
            acc = jnp.zeros((strip * n, co), jnp.float32)
            for A in range(2):
                for Bq in range(2):
                    v = u[j0 + A : j0 + A + strip, Bq : Bq + n, :].reshape(
                        strip * n, u.shape[-1])
                    acc = acc + jnp.dot(
                        v, w_ref[A * 2 + Bq],
                        preferred_element_type=jnp.float32)
            y = acc + bias[None, :]
            if mode == "relu":
                y = jnp.maximum(y, 0.0)
            elif mode == "film":
                trunk = src[j0 + 1 : j0 + 1 + strip, 1 : 1 + n, :].reshape(
                    strip * n, src_c4).astype(jnp.float32)
                y = trunk + jnp.maximum(
                    y * gamma[None, :] + beta[None, :], 0.0)
            dst_write(j0, y.reshape(strip, n, co))

    # --- stage 1: x -> h (VMEM scratch, padded plane, dtype-rounded) ----
    stage_rows(u1, x, ci, 0, n + 1)
    # h ring zeros (SAME-padding semantics for stage 2), written once.
    h[0:1, :, :] = jnp.zeros((1, n + 2, c4m), h.dtype)
    h[n + 1 : n + 2, :, :] = jnp.zeros((1, n + 2, c4m), h.dtype)
    h[:, 0:1, :] = jnp.zeros((n + 2, 1, c4m), h.dtype)
    h[:, n + 1 : n + 2, :] = jnp.zeros((n + 2, 1, c4m), h.dtype)

    def h_write(j0, y):
        h[j0 + 1 : j0 + 1 + strip, 1 : 1 + n, :] = y.astype(h.dtype)

    conv_stage(u1, w1_ref, x, bias1, modes[0], c4i, h_write)

    # --- stage 2: h -> out ---------------------------------------------
    stage_rows(u2, h, cm, 0, n + 1)
    _zero_ring_ref(out_ref, n)

    def out_write(j0, y):
        out_ref[0, j0 + 1 : j0 + 1 + strip, 1 : 1 + n, :] = y.astype(
            out_ref.dtype)

    conv_stage(u2, w2_ref, h, bias2, modes[1], c4m, out_write)


def conv3x3_s2d_chain2(
    x_padded: jnp.ndarray,  # (B, N+2, N+2, 4Ci)
    w4_1: jnp.ndarray,      # (2, 2, 4Ci, 4Cm)
    bias4_1: jnp.ndarray,   # (4Cm,)
    w4_2: jnp.ndarray,      # (2, 2, 4Cm, 4Co)
    bias4_2: jnp.ndarray,   # (4Co,)
    gamma4: jnp.ndarray | None = None,  # (B, 4Cf) — film stage's width
    beta4: jnp.ndarray | None = None,
    modes: tuple = ("relu", "film"),
    strip: int = 8,
) -> jnp.ndarray:
    """conv2[modes[1]](conv1[modes[0]](x)) in ONE kernel; the intermediate
    padded plane never exists in HBM. Bit-identical to the sequential
    conv3x3_s2d_fused composition (the intermediate is bf16-rounded in
    VMEM exactly as the HBM round trip rounds it)."""
    b, p_dim, in_cols, c4i = x_padded.shape
    n = p_dim - 2
    c4m = w4_1.shape[-1]
    c4o = w4_2.shape[-1]
    if len(modes) != 2 or sum(m == "film" for m in modes) > 1:
        raise ValueError(f"chain2 modes must be 2 with <=1 film: {modes}")
    if ALIGNED_STAGING:
        # chain2 stages with the (default, measured-winner) unaligned
        # scheme only; the rejected aligned layout would need its weight
        # row-reversal threaded through both stages.
        raise NotImplementedError("chain2 does not support ALIGNED_STAGING")
    if modes[0] == "film" and c4i != c4m:
        raise ValueError("film stage 1 requires C_mid == C_in")
    if modes[1] == "film" and c4m != c4o:
        raise ValueError("film stage 2 requires C_out == C_mid")
    strip = _norm_strip(n, strip)
    dt = x_padded.dtype
    w1 = _w_rows_for_staging(w4_1, c4i, c4m).astype(dt)
    w2 = _w_rows_for_staging(w4_2, c4m, c4o).astype(dt)
    b1 = bias4_1.reshape(1, c4m).astype(jnp.float32)
    b2 = bias4_2.reshape(1, c4o).astype(jnp.float32)
    c4f = c4m if modes[0] == "film" else c4o
    if gamma4 is None:
        gamma4 = jnp.zeros((b, c4f), jnp.float32)
        beta4 = jnp.zeros((b, c4f), jnp.float32)
    gamma = gamma4.astype(jnp.float32).reshape(b, 1, c4f)
    beta = beta4.astype(jnp.float32).reshape(b, 1, c4f)

    return pl.pallas_call(
        partial(_kernel_chain2, n=n, c4i=c4i, c4m=c4m, c4o=c4o, strip=strip,
                modes=tuple(modes)),
        out_shape=jax.ShapeDtypeStruct((b, p_dim, p_dim, c4o), dt),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, p_dim, in_cols, c4i), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # w1
            pl.BlockSpec(memory_space=pltpu.VMEM),  # w2
            pl.BlockSpec(memory_space=pltpu.VMEM),  # b1
            pl.BlockSpec(memory_space=pltpu.VMEM),  # b2
            pl.BlockSpec((1, 1, c4f), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c4f), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, p_dim, p_dim, c4o), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((n + 1, n + 1, c4i), dt),
            pltpu.VMEM((n + 2, n + 2, c4m), dt),
            pltpu.VMEM((n + 1, n + 1, c4m), dt),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * n * n * 4 * (c4i * c4m + c4m * c4o),
            bytes_accessed=x_padded.size * 2 + b * p_dim * p_dim * c4o * 2,
            transcendentals=0,
        ),
        interpret=_interpret(),
    )(x_padded, w1, w2, b1, b2, gamma, beta)


# ---------------------------------------------------------------------------
# Chained whole-site kernel (round 5): conv_in (or the two-operand
# no-concat decoder conv) -> FiLM site -> conv_out (+ optional fused
# 2x2 max-pool), ONE pallas_call per generator site. Both intermediate
# planes (h0 and the site output) live only in VMEM scratch; at L1/batch
# 256 that removes ~5.4 ms of pure serial HBM time per site (two
# store+load round trips of a 1.1 GB plane at 819 GB/s — serial by the
# kernel-anatomy measurement, un-hideable by the three measured-rejected
# overlap schemes). Bit-identity with the sequential kernels is preserved
# by rounding each intermediate to the activation dtype in VMEM exactly
# where the HBM round trip would round it, and accumulating the fused2
# matmuls in the same per-tap interleaved order as _kernel2.
# Write-once rule: u1a/u1b/h0/u2/s/u3 each written in exactly one
# disjoint-region phase per grid step — RAW dependencies only.
# INFERENCE-ONLY (no VJP), gated like fuse_pool behind on-chip
# validation. Reference site structure: models/film.py / fast_gen
# _block_pallas{,2} (reference `...twoCritics_training_4fold.py:420-495`).
# ---------------------------------------------------------------------------


def _kernel_chain3(*refs, n: int, strip: int, c4a: int, c4b: int,
                   c4m: int, c4o: int, pool: str, two_op: bool):
    """Layout of ``refs`` (inputs, outputs, scratch — in pallas order):
    x1[, x2], w1a[, w1b], b1, wf, bf, gamma, beta, w3, b3,
    out[, pool_out], u1a[, u1b], h0, u2, s, u3."""
    it = iter(refs)
    x1 = next(it)[0]
    x2 = next(it)[0] if two_op else None
    w1a = next(it)
    w1b = next(it) if two_op else None
    b1 = next(it)[0]
    wf = next(it)
    bf = next(it)[0]
    gamma = next(it)[0, 0]
    beta = next(it)[0, 0]
    w3 = next(it)
    b3 = next(it)[0]
    out_ref = next(it)
    pool_ref = next(it) if pool else None
    u1a = next(it)
    u1b = next(it) if two_op else None
    h0 = next(it)
    u2 = next(it)
    s = next(it)
    u3 = next(it)

    ca, cb, cm = c4a // 4, c4b // 4, c4m // 4
    n_strips = n // strip

    def stage_rows(u, src, c):
        """Whole-plane in-VMEM u2s staging (write-once)."""
        for p in range(2):
            for q in range(2):
                sg = (1 - p) * 2 + (1 - q)
                dst = p * 2 + q
                u[0 : n + 1, :, dst * c : (dst + 1) * c] = src[
                    p : p + n + 1, q : q + n + 1, sg * c : (sg + 1) * c
                ]

    def zero_ring_scratch(m, c4):
        m[0:1, :, :] = jnp.zeros((1, n + 2, c4), m.dtype)
        m[n + 1 : n + 2, :, :] = jnp.zeros((1, n + 2, c4), m.dtype)
        m[:, 0:1, :] = jnp.zeros((n + 2, 1, c4), m.dtype)
        m[:, n + 1 : n + 2, :] = jnp.zeros((n + 2, 1, c4), m.dtype)

    # --- stage 1: conv_in (one or two operands) -> h0 -------------------
    stage_rows(u1a, x1, ca)
    if two_op:
        stage_rows(u1b, x2, cb)
    zero_ring_scratch(h0, c4m)
    for s_i in range(n_strips):
        j0 = s_i * strip
        acc = jnp.zeros((strip * n, c4m), jnp.float32)
        for A in range(2):
            for Bq in range(2):
                v1 = u1a[j0 + A : j0 + A + strip, Bq : Bq + n, :].reshape(
                    strip * n, c4a)
                acc = acc + jnp.dot(v1, w1a[A * 2 + Bq],
                                    preferred_element_type=jnp.float32)
                if two_op:
                    v2 = u1b[j0 + A : j0 + A + strip, Bq : Bq + n, :
                             ].reshape(strip * n, c4b)
                    acc = acc + jnp.dot(v2, w1b[A * 2 + Bq],
                                        preferred_element_type=jnp.float32)
        y = jnp.maximum(acc + b1[None, :], 0.0)
        h0[j0 + 1 : j0 + 1 + strip, 1 : 1 + n, :] = y.reshape(
            strip, n, c4m).astype(h0.dtype)

    # --- stage 2: FiLM site (trunk = h0) -> s ---------------------------
    stage_rows(u2, h0, cm)
    zero_ring_scratch(s, c4m)
    for s_i in range(n_strips):
        j0 = s_i * strip
        acc = jnp.zeros((strip * n, c4m), jnp.float32)
        for A in range(2):
            for Bq in range(2):
                v = u2[j0 + A : j0 + A + strip, Bq : Bq + n, :].reshape(
                    strip * n, c4m)
                acc = acc + jnp.dot(v, wf[A * 2 + Bq],
                                    preferred_element_type=jnp.float32)
        y = acc + bf[None, :]
        trunk = h0[j0 + 1 : j0 + 1 + strip, 1 : 1 + n, :].reshape(
            strip * n, c4m).astype(jnp.float32)
        y = trunk + jnp.maximum(y * gamma[None, :] + beta[None, :], 0.0)
        s[j0 + 1 : j0 + 1 + strip, 1 : 1 + n, :] = y.reshape(
            strip, n, c4m).astype(s.dtype)

    # --- stage 3: conv_out -> out (+ optional fused pool) ---------------
    stage_rows(u3, s, cm)
    _zero_ring_ref(out_ref, n)
    if pool == "s2d":
        _zero_ring_ref(pool_ref, n // 2)
    for s_i in range(n_strips):
        j0 = s_i * strip
        acc = jnp.zeros((strip * n, c4o), jnp.float32)
        for A in range(2):
            for Bq in range(2):
                v = u3[j0 + A : j0 + A + strip, Bq : Bq + n, :].reshape(
                    strip * n, c4m)
                acc = acc + jnp.dot(v, w3[A * 2 + Bq],
                                    preferred_element_type=jnp.float32)
        y = jnp.maximum(acc + b3[None, :], 0.0)
        y = y.reshape(strip, n, c4o).astype(out_ref.dtype)
        out_ref[0, j0 + 1 : j0 + 1 + strip, 1 : 1 + n, :] = y
        if pool:
            # identical pool emission to _kernel (bit-matches the
            # separate pool kernels reading the stored plane).
            cp = c4o // 4
            gmax = jnp.maximum(
                jnp.maximum(y[:, :, 0:cp], y[:, :, cp : 2 * cp]),
                jnp.maximum(y[:, :, 2 * cp : 3 * cp], y[:, :, 3 * cp :]),
            )
            if pool == "pixel":
                pool_ref[0, j0 : j0 + strip, 0:n, :] = gmax
            else:  # 's2d'
                s2, n2 = strip // 2, n // 2
                rows4 = gmax.reshape(s2, 2, n, cp)
                for p in range(2):
                    t = jnp.swapaxes(rows4[:, p], 0, 1)
                    tq = t.reshape(n2, 2, s2, cp)
                    for q in range(2):
                        blk = jnp.swapaxes(tq[:, q], 0, 1)
                        dst = p * 2 + q
                        pool_ref[
                            0,
                            j0 // 2 + 1 : j0 // 2 + 1 + s2,
                            1 : n2 + 1,
                            dst * cp : (dst + 1) * cp,
                        ] = blk


def conv3x3_s2d_chain3(
    x_padded: jnp.ndarray,          # (B, N+2, N+2, 4Ca)
    w1a4: jnp.ndarray,              # (2, 2, 4Ca, 4Cm)
    bias14: jnp.ndarray,            # (4Cm,)
    wf4: jnp.ndarray,               # (2, 2, 4Cm, 4Cm) — film conv
    biasf4: jnp.ndarray,            # (4Cm,)
    gamma4: jnp.ndarray,            # (B, 4Cm)
    beta4: jnp.ndarray,             # (B, 4Cm)
    w34: jnp.ndarray,               # (2, 2, 4Cm, 4Co)
    bias34: jnp.ndarray,            # (4Co,)
    x2_padded: jnp.ndarray | None = None,  # (B, N+2, N+2, 4Cb) — fused2 skip
    w1b4: jnp.ndarray | None = None,       # (2, 2, 4Cb, 4Cm)
    strip: int = 8,
    pool: str = "",
):
    """A whole generator site in one kernel:
    ``conv_out(film_site(conv_in(x[, skip])))`` with h0 and the site
    output kept in VMEM only. Returns ``out`` — or ``(out, pooled)``
    when ``pool`` is 's2d'/'pixel' (same contract as
    conv3x3_s2d_fused_pool). Bit-identical to the sequential kernel
    composition; INFERENCE-ONLY (no VJP)."""
    b, p_dim, in_cols, c4a = x_padded.shape
    n = p_dim - 2
    c4m = w1a4.shape[-1]
    c4o = w34.shape[-1]
    two_op = x2_padded is not None
    c4b = x2_padded.shape[-1] if two_op else 0
    if wf4.shape[-1] != c4m:
        raise ValueError("film conv must keep channels (residual add)")
    if ALIGNED_STAGING:
        raise NotImplementedError("chain3 does not support ALIGNED_STAGING")
    strip = _norm_strip(n, strip)
    if pool == "s2d" and (strip % 2 or n % 2):
        raise ValueError("pool='s2d' needs even strip and even n")
    if pool not in ("", "s2d", "pixel"):
        raise ValueError(f"unknown pool mode {pool!r}")
    dt = x_padded.dtype
    w1a = _w_rows_for_staging(w1a4, c4a, c4m).astype(dt)
    wf = _w_rows_for_staging(wf4, c4m, c4m).astype(dt)
    w3 = _w_rows_for_staging(w34, c4m, c4o).astype(dt)
    b1 = bias14.reshape(1, c4m).astype(jnp.float32)
    bf = biasf4.reshape(1, c4m).astype(jnp.float32)
    b3 = bias34.reshape(1, c4o).astype(jnp.float32)
    gamma = gamma4.astype(jnp.float32).reshape(b, 1, c4m)
    beta = beta4.astype(jnp.float32).reshape(b, 1, c4m)

    whole = pl.BlockSpec(memory_space=pltpu.VMEM)
    per_b = lambda shape: pl.BlockSpec(shape, lambda i: (i,) + (0,) * (len(shape) - 1),
                                       memory_space=pltpu.VMEM)
    in_specs = [per_b((1, p_dim, in_cols, c4a))]
    operands = [x_padded]
    if two_op:
        in_specs.append(per_b((1, p_dim, x2_padded.shape[2], c4b)))
        operands.append(x2_padded)
        w1b = _w_rows_for_staging(w1b4, c4b, c4m).astype(dt)
        in_specs.append(whole)
        operands.append(w1a)
        in_specs.append(whole)
        operands.append(w1b)
    else:
        in_specs.append(whole)
        operands.append(w1a)
    in_specs += [whole, whole, whole, per_b((1, 1, c4m)), per_b((1, 1, c4m)),
                 whole, whole]
    operands += [b1, wf, bf, gamma, beta, w3, b3]

    out_shapes = [jax.ShapeDtypeStruct((b, p_dim, p_dim, c4o), dt)]
    out_specs = [per_b((1, p_dim, p_dim, c4o))]
    if pool == "s2d":
        n2 = n // 2
        out_shapes.append(jax.ShapeDtypeStruct((b, n2 + 2, n2 + 2, c4o), dt))
        out_specs.append(per_b((1, n2 + 2, n2 + 2, c4o)))
    elif pool == "pixel":
        out_shapes.append(jax.ShapeDtypeStruct((b, n, n, c4o // 4), dt))
        out_specs.append(per_b((1, n, n, c4o // 4)))

    scratch = [pltpu.VMEM((n + 1, n + 1, c4a), dt)]
    if two_op:
        scratch.append(pltpu.VMEM((n + 1, n + 1, c4b), dt))
    scratch += [
        pltpu.VMEM((n + 2, n + 2, c4m), dt),  # h0
        pltpu.VMEM((n + 1, n + 1, c4m), dt),  # u2
        pltpu.VMEM((n + 2, n + 2, c4m), dt),  # s
        pltpu.VMEM((n + 1, n + 1, c4m), dt),  # u3
    ]
    flops = 2 * b * n * n * 4 * ((c4a + c4b) * c4m + c4m * c4m + c4m * c4o)
    out = pl.pallas_call(
        partial(_kernel_chain3, n=n, strip=strip, c4a=c4a, c4b=c4b,
                c4m=c4m, c4o=c4o, pool=pool, two_op=two_op),
        out_shape=tuple(out_shapes) if pool else out_shapes[0],
        grid=(b,),
        in_specs=in_specs,
        out_specs=tuple(out_specs) if pool else out_specs[0],
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=x_padded.size * 2
            + (x2_padded.size * 2 if two_op else 0)
            + b * p_dim * p_dim * c4o * 2,
            transcendentals=0,
        ),
        interpret=_interpret(),
    )(*operands)
    return out


# ---------------------------------------------------------------------------
# Dense 3x3-tap s2d conv — the 5x5 pixel conv on the padded unshifted
# layout. A SAME 5x5 conv at (2N, 2N, C) is exactly a 3x3-tap conv at
# (N, N, 4C) with the transformed kernel of
# s2d_conv.conv5x5_to_s2d_kernel_j — and, unlike the 3x3 case, with NO
# channel-group permutation, so the taps are direct sub-reads of the padded
# plane and no staging scratch is needed at all. Built for the critic's
# conv5x5(16)x2 / conv5x5(32)x2 trunk (reference
# `...twoCritics_training_4fold.py:319-325`), whose 16-32 channel pixel
# convs starve the MXU exactly like the generator's did.
# ---------------------------------------------------------------------------


def _kernel5(x_ref, w_ref, b_ref, out_ref, *, n: int, c4: int, co4: int,
             strip: int, mode: str):
    """One batch element: x (1, N+2, N+2, 4C) padded unshifted s2d;
    w_ref (9, 4C, 4Co) in (A*3+B) tap order; out (1, N+2, N+2, 4Co)."""
    x = x_ref[0]
    _zero_ring_ref(out_ref, n)
    bias = b_ref[0]
    n_strips = n // strip
    for s_i in range(n_strips):
        j0 = s_i * strip
        acc = jnp.zeros((strip * n, co4), jnp.float32)
        for A in range(3):
            for B in range(3):
                v = x[j0 + A : j0 + A + strip, B : B + n, :].reshape(
                    strip * n, c4
                )
                acc = acc + jnp.dot(v, w_ref[A * 3 + B],
                                    preferred_element_type=jnp.float32)
        y = acc + bias[None, :]
        if mode == "relu":
            y = jnp.maximum(y, 0.0)
        out_ref[0, j0 + 1 : j0 + 1 + strip, 1 : 1 + n, :] = y.reshape(
            strip, n, co4
        ).astype(out_ref.dtype)


def _kernel5_packed(x_ref, w_ref, b_ref, out_ref, u9, *, n: int, c4: int,
                    co4: int, strip: int, mode: str):
    """K-packed variant of _kernel5 for the critic's K-starved widths
    (c4 = 16/64 vs the 128-lane MXU): the 9 tap operands are staged ONCE
    lane-concatenated into u9 (1 write per region — the WAR-hazard-safe
    single-write-phase pattern, see _kernel), so each strip runs ONE matmul
    with K = 9*4C instead of nine K = 4C matmuls. Same FLOPs, ~9x/2x MXU
    K-occupancy for c4 = 16/64, and 9x fewer MXU issues. w_ref (9*4C, 4Co)
    row order matches the (A*3+B, channel) lane packing."""
    x = x_ref[0]
    _zero_ring_ref(out_ref, n)
    bias = b_ref[0]
    for A in range(3):
        for B in range(3):
            t = A * 3 + B
            u9[:, :, t * c4 : (t + 1) * c4] = x[A : A + n, B : B + n, :]
    n_strips = n // strip
    for s_i in range(n_strips):
        j0 = s_i * strip
        v = u9[j0 : j0 + strip, :, :].reshape(strip * n, 9 * c4)
        y = jnp.dot(v, w_ref[...], preferred_element_type=jnp.float32)
        y = y + bias[None, :]
        if mode == "relu":
            y = jnp.maximum(y, 0.0)
        out_ref[0, j0 + 1 : j0 + 1 + strip, 1 : 1 + n, :] = y.reshape(
            strip, n, co4
        ).astype(out_ref.dtype)


def conv5x5_s2d_fused(
    x_padded: jnp.ndarray,  # (B, N+2, N+2, 4C) padded unshifted s2d
    w5: jnp.ndarray,        # (5, 5, C, Co) pixel-domain HWIO kernel
    bias: jnp.ndarray,      # (Co,)
    mode: str = "relu",
    strip: int = 8,
) -> jnp.ndarray:
    """relu(conv5x5_SAME(x, w5) + b) in padded s2d, differentiable.

    Takes the live pixel kernel: the (linear) s2d transform runs inside, so
    the custom VJP returns pixel-kernel cotangents and the op drops
    straight into the critic's training graph (including the WGAN-GP
    double-backward: the backward pass is built from this same op plus
    einsums, all differentiable)."""
    return _conv5_vjp(x_padded, w5, bias, mode, strip)


@partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _conv5_vjp(x_padded, w5, bias, mode, strip):
    return _conv5_impl(x_padded, w5, bias, mode, strip)


def _conv5_impl(x_padded, w5, bias, mode, strip):
    from . import s2d_conv as S

    b, p_dim, in_cols, c4 = x_padded.shape
    n = p_dim - 2
    co4 = 4 * w5.shape[-1]
    strip = _norm_strip(n, strip)
    dt = x_padded.dtype
    w9, bias4 = S.conv5x5_to_s2d_kernel_j(w5, bias)
    # K-packed kernel for the K-starved widths (see _kernel5_packed). The
    # u9 staging buffer is 9x the interior plane — only worth it (and only
    # VMEM-affordable) below the MXU's native K of 128 lanes.
    packed = CONV5_PACKED and c4 <= 64
    if packed:
        kernel = partial(_kernel5_packed, n=n, c4=c4, co4=co4, strip=strip,
                         mode=mode)
        w_arg = w9.reshape(9 * c4, co4).astype(dt)
        scratch = [pltpu.VMEM((n, n, 9 * c4), dt)]
    else:
        kernel = partial(_kernel5, n=n, c4=c4, co4=co4, strip=strip,
                         mode=mode)
        w_arg = w9.reshape(9, c4, co4).astype(dt)
        scratch = []
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, p_dim, p_dim, co4), dt),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, p_dim, in_cols, c4), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, p_dim, p_dim, co4), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * n * n * 9 * c4 * co4,
            bytes_accessed=x_padded.size * 2 + b * p_dim * p_dim * co4 * 2,
            transcendentals=0,
        ),
        interpret=_interpret(),
    )(x_padded, w_arg, bias4.reshape(1, co4).astype(jnp.float32))


def _conv5_fwd(x_padded, w5, bias, mode, strip):
    out = _conv5_impl(x_padded, w5, bias, mode, strip)
    return out, (x_padded, w5, bias, out)


def _conv5_bwd(mode, strip, res, g):
    from . import s2d_conv as S

    x_padded, w5, bias, out = res
    b, p_dim, _, c4 = x_padded.shape
    n = p_dim - 2
    co4 = 4 * w5.shape[-1]
    f32 = jnp.float32

    g = _zero_ring(g)
    if mode == "relu":
        dpre = jnp.where(out > 0, g, 0.0)
    else:
        dpre = g
    dpre = dpre.astype(x_padded.dtype)

    # dX: transpose of a SAME 5x5 conv is the SAME 5x5 conv with the
    # spatially flipped, io-swapped kernel — through this same op (the
    # custom-vjp wrapper, NOT the raw impl, so the WGAN-GP double-backward
    # can differentiate this backward pass again).
    w5_bwd = jnp.flip(w5, axis=(0, 1)).transpose(0, 1, 3, 2)
    dx = _conv5_vjp(
        dpre, w5_bwd, jnp.zeros((c4 // 4,), f32), "none", strip
    ).astype(x_padded.dtype)

    # dW: 9 MXU einsums give the s2d-kernel cotangent; the linear transform's
    # vjp gathers it back to the pixel 5x5 kernel exactly.
    dint = dpre[:, 1 : n + 1, 1 : n + 1, :].astype(f32)
    dw9 = jnp.stack(
        [
            jnp.stack(
                [
                    jnp.einsum(
                        "bijc,bijo->co",
                        x_padded[:, A : A + n, B : B + n, :].astype(f32),
                        dint,
                        preferred_element_type=f32,
                    )
                    for B in range(3)
                ],
                axis=0,
            )
            for A in range(3)
        ],
        axis=0,
    )
    _, t_vjp = jax.vjp(
        lambda w: S.conv5x5_to_s2d_kernel_j(w)[0].astype(f32), w5
    )
    (dw5,) = t_vjp(dw9)
    dbias = jnp.sum(dint, axis=(0, 1, 2)).reshape(4, co4 // 4).sum(0).astype(
        jnp.asarray(bias).dtype
    )
    return (dx, dw5.astype(w5.dtype), dbias)


_conv5_vjp.defvjp(_conv5_fwd, _conv5_bwd)
