"""Fused s2d critic path for DisC2DFCN1 (WGAN-GP critics).

The critic's hot convs are the 5x5 stacks at full/half resolution with
16-32 channels (reference `...twoCritics_training_4fold.py:319-325`) —
exactly the MXU-starving shapes the generator's fused path fixes. Levels
0-1 run through `conv5x5_s2d_fused` (a SAME 5x5 pixel conv is a dense
3x3-tap conv on the padded unshifted s2d layout) and the Pallas pool
kernels; the 64-256-channel tail stays in XLA, which tiles it fine.

WGAN-GP needs the critic's *input* gradient inside the training loss, and
then differentiates that wrt critic params (double backward). Pallas
custom-VJP ops cannot be linearized a second time, so
``score_and_input_grad`` writes the backward chain out by hand: every
Pallas op appears only in primal position (the transpose of a 5x5 conv is
a 5x5 conv with the flip-transposed kernel, run through the same op), and
the standard-primitive stages use ``jax.vjp`` closures. ``jax.grad`` of
the result wrt params then needs only first-order rules everywhere.
Equivalence with ``jax.grad`` of the plain critic is pinned by
tests/test_fast_critic.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax import lax

from ..config import ModelConfig
from .conv_s2d_pallas import (
    _flip_transpose_w4,
    _pool_bwd,
    _pool_to_s2d_bwd,
    conv3x3_s2d_fused,
    conv5x5_s2d_fused,
    entry_pack,
    pool_s2d_pallas,
    pool_to_s2d_pallas,
)
from . import s2d_conv as S

# (block, conv) leaf names of the two fused 5x5 levels, in order.
_LEVEL0 = (("block_dis_0a", "conv2d_dis_0a"), ("block_dis_0b", "conv2d_dis_0b"))
_LEVEL1 = (("block_dis_1a", "conv2d_dis_1a"), ("block_dis_1b", "conv2d_dis_1b"))
_TAIL_CONVS = ("dis_2", "dis_3", None, "dis_4", "dis_5", None,
               "dis_6", "dis_7", "dis_8")  # None = max-pool


def critic_pallas_supported(cfg) -> bool:
    """Whether the fused critic's conv5x5 s2d kernels compile for this
    config on real TPU. The critic's channel widths are FIXED (16/16/32/32,
    models/critic.py) — only the image size varies — and the on-chip
    validated envelope (scripts/onchip_validate.py) is the 256-image
    config: level-0 n=128 (c 4->16, 16->16) and level-1 n=64 (16->32,
    32->32). Smaller images shrink n below the validated/compilable range
    (Mosaic rejects small shapes; see fast_gen.generator_pallas_supported).
    Interpret mode (CPU) is shape-agnostic."""
    from .conv_s2d_pallas import _interpret

    if _interpret():
        return True
    return cfg.image_size >= 256


class FusedCritic:
    """Trace-safe fused critic forward + hand-chained input gradient.

    Carries no parameters; every method takes the live critic params
    pytree (the critic has no BN, so there is nothing to fold)."""

    def __init__(self, cfg: ModelConfig, strip: int = 16,
                 compute_dtype=jnp.bfloat16, tail_s2d: bool = False):
        self.cfg = cfg
        self.strip = strip
        self.dtype = compute_dtype
        # entry channels padded per s2d group (image is 1-channel).
        self.entry_pad = 4
        # Route dis_2/dis_3 (the first two tail convs, 64^2 pixel x 32->64
        # ch) through the conv3 s2d kernel too (n=32, c4=128->256 — MXU-
        # friendly K/N) instead of XLA. Experimental perf knob: the n=32
        # shapes are outside the round-2 validated envelope, so enabling it
        # in the trainer requires the scripts/onchip_validate.py checks at
        # these shapes to be green first.
        self.tail_s2d = tail_s2d

    # ------------------------------------------------------------- pieces

    def _leaf(self, params, block, name):
        d = params[block][name]
        return jnp.asarray(d["kernel"]), jnp.asarray(d["bias"])

    def _entry_kernel(self, params):
        """dis_0a kernel zero-padded on input channels to entry_pad."""
        k, b = self._leaf(params, *_LEVEL0[0])
        pad = self.entry_pad - k.shape[2]
        return jnp.pad(k, ((0, 0), (0, 0), (0, pad), (0, 0))), b

    def _tail(self, params, h):
        """dis_2..dis_8 + dis_9 + flatten + dense — plain XLA, pixel domain.

        Standard primitives only: ``jax.vjp`` of this is double-
        differentiable, so it needs no hand-written backward."""
        dt = self.dtype

        def conv(h, k, b, relu=True):
            y = lax.conv_general_dilated(
                h, k.astype(dt), (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ) + b.astype(dt)
            return jax.nn.relu(y) if relu else y

        convs = _TAIL_CONVS[3:] if self.tail_s2d else _TAIL_CONVS
        for blk in convs:
            if blk is None:
                h = nn.max_pool(h, (2, 2), (2, 2))
            else:
                k, b = self._leaf(params, f"block_{blk}", f"conv2d_{blk}")
                h = conv(h, k, b)
        k9 = jnp.asarray(params["dis_9"]["kernel"])
        b9 = jnp.asarray(params["dis_9"]["bias"])
        h = conv(h, k9, b9, relu=False)
        h = h.reshape(h.shape[0], -1)
        kd = jnp.asarray(params["dis_dense"]["kernel"]).astype(dt)
        bd = jnp.asarray(params["dis_dense"]["bias"]).astype(dt)
        return (h @ kd + bd).astype(jnp.float32)

    def _front(self, params, x):
        """Entry + fused levels 0-1. Returns the pixel-domain tensor the
        tail consumes plus the residuals the manual backward needs."""
        dt, st = self.dtype, self.strip
        k0a, b0a = self._entry_kernel(params)
        k0b, b0b = self._leaf(params, *_LEVEL0[1])
        k1a, b1a = self._leaf(params, *_LEVEL1[0])
        k1b, b1b = self._leaf(params, *_LEVEL1[1])

        xp = entry_pack(x.astype(dt), c_pad=self.entry_pad)
        h0a = conv5x5_s2d_fused(xp, k0a.astype(dt), b0a, strip=st)
        h0b = conv5x5_s2d_fused(h0a, k0b.astype(dt), b0b, strip=st)
        hp = pool_to_s2d_pallas(h0b)
        h1a = conv5x5_s2d_fused(hp, k1a.astype(dt), b1a, strip=st)
        h1b = conv5x5_s2d_fused(h1a, k1b.astype(dt), b1b, strip=st)
        res = dict(
            xp=xp, h0a=h0a, h0b=h0b, hp=hp, h1a=h1a, h1b=h1b,
            ks=(k0a, k0b, k1a, k1b),
        )
        if self.tail_s2d:
            # dis_2/dis_3 in the s2d domain (n=32, c4=128->256).
            k2, b2 = self._leaf(params, "block_dis_2", "conv2d_dis_2")
            k3, b3 = self._leaf(params, "block_dis_3", "conv2d_dis_3")
            w4_2, b4_2 = S.conv3x3_to_s2d_kernel_j(k2, b2)
            w4_3, b4_3 = S.conv3x3_to_s2d_kernel_j(k3, b3)
            hp1 = pool_to_s2d_pallas(h1b)
            h2 = conv3x3_s2d_fused(hp1, w4_2.astype(dt), b4_2,
                                   mode="relu", strip=st)
            h3 = conv3x3_s2d_fused(h2, w4_3.astype(dt), b4_3,
                                   mode="relu", strip=st)
            pix = pool_s2d_pallas(h3)
            res.update(hp1=hp1, h2=h2, h3=h3, ks3=(w4_2, w4_3))
        else:
            pix = pool_s2d_pallas(h1b)
        return pix, res

    # ------------------------------------------------------------ forward

    def forward(self, params, x):
        """(B, H, W, 1) -> (B, 1) Wasserstein score. Differentiable wrt
        params and x to FIRST order (enough for D(real)/D(fake) terms)."""
        pix, _ = self._front(params, x)
        return self._tail(params, pix)

    # ----------------------------------------------- input-gradient chain

    def score_and_input_grad(self, params, x):
        """Returns (score (B,1), d sum(score) / dx (B,H,W,1)).

        The backward chain is written out op by op; ``jax.grad`` of either
        output wrt ``params`` (the WGAN-GP double backward) only ever
        differentiates Pallas ops in primal position."""
        dt, st = self.dtype, self.strip
        pix, res = self._front(params, x)
        score, tail_vjp = jax.vjp(lambda h: self._tail(params, h), pix)

        (d_pix,) = tail_vjp(jnp.ones_like(score))

        def mask_ring(d_out, out):
            """relu mask + ring zeroing as ONE fused elementwise pass (a
            0/1 multiply — exact). The old slice+pad formulation measured
            0.72 ms marginal at the L0 shape (round-5 critic roofline) —
            as much as the transposed conv it fed; this runs at the ~0.13
            ms elementwise floor."""
            from .conv_s2d_pallas import _interior_mask

            m = _interior_mask(out.shape[1], out.shape[2],
                               out.shape[1] - 2, jnp.float32)
            return (jnp.where(out > 0, d_out, 0.0) * m).astype(dt)

        def conv3_bwd(d_out, out, w4, c_in4):
            """Transpose of conv3x3_s2d_fused (relu mode): relu mask, then
            the flip-transposed s2d conv through the same Pallas op (primal
            position — first-order differentiable for the GP double bwd)."""
            d_pre = mask_ring(d_out, out)
            return conv3x3_s2d_fused(
                d_pre, _flip_transpose_w4(w4).astype(dt),
                jnp.zeros((c_in4,), jnp.float32), mode="none", strip=st,
            )

        if self.tail_s2d:
            (d_h3,) = _pool_bwd(res["h3"], d_pix.astype(res["h3"].dtype))
            w4_2, w4_3 = res["ks3"]
            d_h2 = conv3_bwd(d_h3, res["h3"], w4_3, res["h2"].shape[-1])
            d_hp1 = conv3_bwd(d_h2, res["h2"], w4_2, res["hp1"].shape[-1])
            (d_h1b,) = _pool_to_s2d_bwd(res["h1b"], d_hp1)
        else:
            # pool backwards: the pools' own custom-bwd functions (pure
            # jnp, differentiable again) applied directly.
            (d_h1b,) = _pool_bwd(res["h1b"], d_pix.astype(res["h1b"].dtype))

        def conv5_bwd(d_out, out, w5, c_in4):
            """Transpose of conv5x5_s2d_fused (relu mode): relu mask, then
            the flip-transposed 5x5 conv through the same Pallas op."""
            d_pre = mask_ring(d_out, out)
            w_bwd = jnp.flip(w5, axis=(0, 1)).transpose(0, 1, 3, 2)
            return conv5x5_s2d_fused(
                d_pre, w_bwd.astype(dt),
                jnp.zeros((c_in4 // 4,), jnp.float32), mode="none", strip=st,
            )

        k0a, k0b, k1a, k1b = res["ks"]
        d_h1a = conv5_bwd(d_h1b, res["h1b"], k1b, res["h1a"].shape[-1])
        d_hp = conv5_bwd(d_h1a, res["h1a"], k1a, res["hp"].shape[-1])
        (d_h0b,) = _pool_to_s2d_bwd(res["h0b"], d_hp)
        d_h0a = conv5_bwd(d_h0b, res["h0b"], k0b, res["h0a"].shape[-1])
        d_xp = conv5_bwd(d_h0a, res["h0a"], k0a, res["xp"].shape[-1])

        # adjoint of entry_pack: drop the ring, keep the real channel of
        # each sub-pixel group, undo the s2d blocking.
        d_grp = d_xp[:, 1:-1, 1:-1, :]
        b, n, _, c4 = d_grp.shape
        d_real = d_grp.reshape(b, n, n, 4, self.entry_pad)[..., :1]
        dx = S.d2s(d_real.reshape(b, n, n, 4))
        return score, dx.astype(jnp.float32)


def make_critic_fns(cfg: ModelConfig, params_example=None, strip: int = 16,
                    compute_dtype=jnp.bfloat16):
    """(apply_fn, input_grad_fn) pair for the trainer's use_pallas path."""
    fc = FusedCritic(cfg, strip=strip, compute_dtype=compute_dtype)
    return fc.forward, (lambda p, x: fc.score_and_input_grad(p, x)[1])
