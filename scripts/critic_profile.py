"""Critic stage breakdown on the real chip — where do the 6.35 ms go?

scripts/superstep_profile.py showed the critic forward at batch 16 costs
6.35 ms fused / 6.64 ms plain while its MXU floor is ~0.4 ms — and that
cost multiplies into every superstep component (10 critic updates, 20
probe critic calls, the gen update). This times the front (entry + fused
conv5 levels 0-1), the XLA tail (dis_2..dis_8 + head), each level-0/1
conv5 kernel in isolation, the XLA twins, and an s2d candidate for the
first tail convs.

Run (real TPU): python scripts/critic_profile.py [batch]
"""
from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax import lax

from depgan_tpu.config import ModelConfig
from depgan_tpu.models.critic import make_critic
from depgan_tpu.ops import s2d_conv as S
from depgan_tpu.ops.conv_s2d_pallas import (
    conv3x3_s2d_fused,
    conv5x5_s2d_fused,
    entry_pack,
    pad_s2d,
    pool_s2d_pallas,
    pool_to_s2d_pallas,
    unpad_s2d,
)
from depgan_tpu.ops.fast_critic import FusedCritic

B = int(sys.argv[1]) if len(sys.argv) > 1 else 16
N_SCAN = 16
DT = jnp.bfloat16


def timed(name, fn, x, *args):
    """fn(x, *args) -> array; x is the chained operand (kernel_micro.py
    pattern). The carry feeds back into fn's first argument so scan
    iterations serialise (a body with no carry dependency is loop-invariant
    and XLA hoists it — the measurement would be up to N_SCAN x too fast),
    and all operands ride as jit arguments, never closures (docs/PERF.md
    HTTP-413 rule)."""

    @jax.jit
    def run(x, args):
        def body(carry, _):
            out = fn(carry, *args)
            return carry + 1e-30 * jnp.sum(out).astype(carry.dtype), ()

        c, _ = jax.lax.scan(body, x, None, length=N_SCAN)
        return jnp.sum(c.astype(jnp.float32))

    float(run(x, args))
    reps = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(run(x, args))
        reps.append(time.perf_counter() - t0)
    ms = min(reps) / N_SCAN * 1e3
    print(f"{name:46s} {ms:8.3f} ms", flush=True)
    return ms


def main():
    float(jax.jit(lambda v: (v @ v).sum())(jnp.ones((128, 128))))
    print(f"backend: {jax.default_backend()}  batch={B}", flush=True)

    mcfg = ModelConfig(image_size=256, first_fm=32, n_input_channels=1,
                       compute_dtype="bfloat16")
    critic = make_critic(mcfg)
    params = critic.init({"params": jax.random.key(1)},
                         jnp.zeros((1, 256, 256, 1)))["params"]
    fc = FusedCritic(mcfg, compute_dtype=DT)
    x = jax.random.uniform(jax.random.key(2), (B, 256, 256, 1))

    timed("critic fwd fused (front+tail)",
          lambda x, p: fc.forward(p, x), x, params)
    timed("critic fwd plain (whole XLA)",
          lambda x, p: critic.apply({"params": p}, x), x, params)
    timed("front only (entry + conv5 L0-1 + pools)",
          lambda x, p: fc._front(p, x)[0], x, params)
    pix = jax.jit(lambda p, x: fc._front(p, x)[0])(params, x)
    timed("tail only (dis_2..9 + dense, XLA)",
          lambda pix, p: fc._tail(p, pix), pix, params)

    # individual fused conv5 kernels at critic shapes
    def leaf(block, name):
        d = params[block][name]
        return jnp.asarray(d["kernel"]), jnp.asarray(d["bias"])

    xp = jax.jit(lambda x: entry_pack(x.astype(DT), c_pad=4))(x)
    k0a, b0a = leaf("block_dis_0a", "conv2d_dis_0a")
    k0a = jnp.pad(k0a, ((0, 0), (0, 0), (0, 3), (0, 0)))
    k0b, b0b = leaf("block_dis_0b", "conv2d_dis_0b")
    k1a, b1a = leaf("block_dis_1a", "conv2d_dis_1a")
    k1b, b1b = leaf("block_dis_1b", "conv2d_dis_1b")

    conv5 = lambda x, k, b: conv5x5_s2d_fused(x, k, b, strip=16)
    k0a, k0b, k1a, k1b = (k.astype(DT) for k in (k0a, k0b, k1a, k1b))
    h0a = jax.jit(conv5)(xp, k0a, b0a)
    timed("conv5 dis_0a (n=128, c4=16->64)", conv5, xp, k0a, b0a)
    timed("conv5 dis_0b (n=128, c4=64->64)", conv5, h0a, k0b, b0b)
    hp = jax.jit(pool_to_s2d_pallas)(h0a)
    timed("pool_to_s2d L0->1 (n=128, c4=64)", pool_to_s2d_pallas, h0a)
    h1a = jax.jit(conv5)(hp, k1a, b1a)
    timed("conv5 dis_1a (n=64, c4=64->128)", conv5, hp, k1a, b1a)
    timed("conv5 dis_1b (n=64, c4=128->128)", conv5, h1a, k1b, b1b)
    timed("pool_s2d L1->pix (n=64, c4=128)", pool_s2d_pallas, h1a)

    # CONV5_PACKED A/B: the K-packed kernel (one K=9*4C matmul per strip)
    # vs the dense 9-matmul default, per kernel and whole-critic.
    from depgan_tpu.ops import conv_s2d_pallas as csp

    prev_packed = csp.CONV5_PACKED
    for packed in (False, True):
        csp.CONV5_PACKED = packed
        tag = "packed" if packed else "dense "
        try:
            timed(f"conv5 dis_0a {tag} (n=128, c4=16->64)", conv5,
                  xp, k0a, b0a)
            timed(f"conv5 dis_0b {tag} (n=128, c4=64->64)", conv5,
                  h0a, k0b, b0b)
            timed(f"conv5 dis_1a {tag} (n=64, c4=64->128)", conv5,
                  hp, k1a, b1a)
            timed(f"critic fwd fused {tag}",
                  lambda x, p: fc.forward(p, x), x, params)
            timed(f"critic fwd+input-grad {tag}",
                  lambda x, p: fc.score_and_input_grad(p, x)[1], x, params)
        except Exception as e:
            print(f"conv5 {tag} A/B: FAILED {type(e).__name__}: "
                  f"{str(e).splitlines()[0][:120]}", flush=True)
    csp.CONV5_PACKED = prev_packed

    # XLA twins of levels 0-1 (what 'plain' pays for the same stages)
    def xla_conv(h, k, b):
        y = lax.conv_general_dilated(
            h.astype(DT), k.astype(DT), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + b.astype(DT)
        return jax.nn.relu(y)

    def rand(n, c, seed):
        return jax.random.normal(jax.random.key(seed), (B, n, n, c), DT)

    # NB: the original Keras kernels, not the padded/s2d-transformed ones.
    k0b_px, _ = leaf("block_dis_0b", "conv2d_dis_0b")
    k1b_px, _ = leaf("block_dis_1b", "conv2d_dis_1b")
    timed("XLA conv5 dis_0b (256^2, 16->16ch)", xla_conv,
          rand(256, 16, 10), k0b_px, b0b)
    timed("XLA conv5 dis_1b (128^2, 32->32ch)", xla_conv,
          rand(128, 32, 11), k1b_px, b1b)

    # Tail stage costs in XLA
    k2, b2 = leaf("block_dis_2", "conv2d_dis_2")
    timed("XLA conv3 dis_2 (64^2, 32->64ch)", xla_conv,
          rand(64, 32, 12), k2, b2)
    k4, b4 = leaf("block_dis_4", "conv2d_dis_4")
    timed("XLA conv3 dis_4 (32^2, 64->128ch)", xla_conv,
          rand(32, 64, 13), k4, b4)
    k6, b6 = leaf("block_dis_6", "conv2d_dis_6")
    timed("XLA conv3 dis_6 (16^2, 128->256ch)", xla_conv,
          rand(16, 128, 14), k6, b6)

    # s2d candidate for dis_2/dis_3 (64^2 pixel -> n=32, c4=128->256):
    conv3 = lambda x, w, b: conv3x3_s2d_fused(x, w, b, mode="relu", strip=16)
    w4, bias4 = S.conv3x3_to_s2d_kernel_j(k2, b2)
    xs2d = pad_s2d(S.s2d_unshifted(rand(64, 32, 15)))
    try:
        timed("s2d conv3 dis_2 (n=32, c4=128->256)", conv3,
              xs2d, w4.astype(DT), bias4)
        k3, b3 = leaf("block_dis_3", "conv2d_dis_3")
        w4_3, bias4_3 = S.conv3x3_to_s2d_kernel_j(k3, b3)
        xs2d3 = pad_s2d(S.s2d_unshifted(rand(64, 64, 16)))
        timed("s2d conv3 dis_3 (n=32, c4=256->256)", conv3,
              xs2d3, w4_3.astype(DT), bias4_3)
    except Exception as e:
        print(f"s2d conv3 dis_2/3: FAILED {type(e).__name__}: "
              f"{str(e).splitlines()[0][:120]}", flush=True)

    # tail_s2d A/B: the whole fused critic with dis_2/dis_3 in s2d vs the
    # round-2 envelope, forward AND the hand-chained input grad (what the
    # superstep's critic updates / GP actually pay).
    fc_t = FusedCritic(mcfg, compute_dtype=DT, tail_s2d=True)
    try:
        timed("critic fwd fused tail_s2d",
              lambda x, p: fc_t.forward(p, x), x, params)
        timed("critic fwd+input-grad (tail_s2d=False)",
              lambda x, p: fc.score_and_input_grad(p, x)[1], x, params)
        timed("critic fwd+input-grad (tail_s2d=True)",
              lambda x, p: fc_t.score_and_input_grad(p, x)[1], x, params)
    except Exception as e:
        print(f"tail_s2d A/B: FAILED {type(e).__name__}: "
              f"{str(e).splitlines()[0][:120]}", flush=True)

    # strip sweep of the fused forward (the conv5 kernels' row-strip size).
    for st in (8, 32, 64):
        try:
            fcs = FusedCritic(mcfg, strip=st, compute_dtype=DT)
            timed(f"critic fwd fused strip={st}",
                  lambda x, p, fcs=fcs: fcs.forward(p, x), x, params)
        except Exception as e:
            print(f"strip={st}: FAILED {type(e).__name__}: "
                  f"{str(e).splitlines()[0][:120]}", flush=True)


if __name__ == "__main__":
    main()
