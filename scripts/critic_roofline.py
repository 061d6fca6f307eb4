"""Critic (DisC2DFCN1) per-stage roofline — VERDICT r3 item 2.

The critic forward measures ~6.4 ms at batch 16 against a ~0.4 ms raw MXU
floor and multiplies x~30 into every superstep (10 critic updates + 20
probe scores, docs/PERF.md). This table answers WHERE the 16x goes before
any new kernel is written, with three instruments the generator roofline
didn't need:

1. **Batch sweep per stage** (B and 2B): fit t = a + m*(B/16). The
   intercept `a` is the batch-independent cost (pallas_call/XLA launch +
   scan-harness overhead), the marginal `m` is the true per-16-slices
   compute. A stage whose cost is mostly intercept needs FEWER kernel
   launches (fusion/batching); one whose cost is marginal needs a faster
   kernel.
2. **Shape-adjusted MXU floor**: the raw 175-TFLOPS floor assumes full
   128x128 MXU tiles. The critic's matmuls are K/N-starved (dis_0a:
   K=16, N=64), so each row also shows
   ``mxu_shape = flops / (175e12 * min(K,128)/128 * min(N,128)/128)``
   — the realistic systolic-array bound at that operand shape. Measured
   below mxu_shape but above mxu_raw means the KERNEL is fine and only a
   different *math layout* (K-packing, channel fusion) can help.
3. **Harness calibration row**: a passthrough op at the largest operand
   shape, so the scan-chain overhead baked into every row is printed
   rather than guessed.

Stages mirror ops/fast_critic.FusedCritic at production config (image 256,
bf16): entry_pack -> conv5 dis_0a/0b (s2d n=128) -> pool_to_s2d ->
conv5 dis_1a/1b (n=64) -> pool_s2d -> XLA tail dis_2..dis_8 + dis_9 +
dense (reference critic: `...twoCritics_training_4fold.py:316-345`).

Run (real TPU): python scripts/critic_roofline.py [batch] [n_scan]
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
from depgan_tpu.ops.conv_s2d_pallas import (
    conv5x5_s2d_fused,
    entry_pack,
    pool_s2d_pallas,
    pool_to_s2d_pallas,
)
from depgan_tpu.ops.fast_critic import FusedCritic

B = int(sys.argv[1]) if len(sys.argv) > 1 else 16
N_SCAN = int(sys.argv[2]) if len(sys.argv) > 2 else 32
HBM_GBPS = 819.0
MXU_TFLOPS = 175.0
DT = jnp.bfloat16

ROWS = []  # (name, t_B, t_2B, hbm_ms, mxu_raw, mxu_shape)


def measure(fn, x, args):
    """Scan-chain timing (docs/PERF.md remote-backend rules): N_SCAN
    serialized applications inside one jit, one dependent-scalar fetch."""

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
    return min(reps) / N_SCAN * 1e3


def stage(name, fn, make_x, args=(), flops=0, kdim=0, ndim=0, args_fn=None):
    """Measure fn at B and 2B; record floors. make_x(b) builds the chained
    operand; matmul K/N dims give the shape-adjusted MXU floor. Batch-
    dependent extra operands (e.g. the forward residual a backward piece
    masks against) come from args_fn(b) instead of the fixed args."""
    if args_fn is not None:
        args = args_fn(B)
    x1 = make_x(B)
    t1 = measure(fn, x1, args)
    t2 = measure(fn, make_x(2 * B),
                 args_fn(2 * B) if args_fn is not None else args)
    out = jax.eval_shape(lambda x, a: fn(x, *a), x1, args)
    nbytes = sum(a.size * jnp.dtype(a.dtype).itemsize
                 for a in jax.tree.leaves((x1, args, out)))
    hbm = nbytes / (HBM_GBPS * 1e6)
    mxu_raw = flops / (MXU_TFLOPS * 1e9)
    occ = ((min(kdim, 128) / 128) * (min(ndim, 128) / 128)
           if kdim and ndim else 1.0)
    mxu_shape = mxu_raw / occ if occ else 0.0
    a = max(2 * t1 - t2, 0.0)  # intercept (fixed cost at this stage)
    m = t2 - t1                # marginal cost of +B slices
    print(f"{name:38s} t{B}={t1:7.3f}  t{2*B}={t2:7.3f}  fix={a:6.3f} "
          f"marg={m:6.3f}  hbm={hbm:6.3f} mxuR={mxu_raw:6.3f} "
          f"mxuS={mxu_shape:6.3f}", flush=True)
    ROWS.append((name, t1, t2, hbm, mxu_raw, mxu_shape))


def main():
    float(jax.jit(lambda v: (v @ v).sum())(jnp.ones((128, 128))))
    print(f"backend: {jax.default_backend()}  B={B}  n_scan={N_SCAN}",
          flush=True)

    mcfg = ModelConfig(image_size=256, first_fm=32, n_input_channels=1,
                       compute_dtype="bfloat16")
    critic = make_critic(mcfg)
    params = critic.init({"params": jax.random.key(1)},
                         jnp.zeros((1, 256, 256, 1)))["params"]
    fc = FusedCritic(mcfg, compute_dtype=DT)

    def leaf(block, name):
        d = params[block][name]
        return jnp.asarray(d["kernel"]).astype(DT), jnp.asarray(d["bias"])

    def rand_px(b, n, c, seed=0, dtype=jnp.float32):
        return jax.random.uniform(jax.random.key(seed), (b, n, n, c),
                                  dtype=dtype)

    def rand_s2d(b, n, c4, seed=0):
        # padded unshifted s2d plane (ring included)
        return jax.random.uniform(jax.random.key(seed),
                                  (b, n + 2, n + 2, c4), dtype=DT)

    # --- calibration: passthrough at the biggest front shape --------------
    stage("calib passthrough (n=128, c4=64)",
          lambda x: x * jnp.bfloat16(1.0009765625),
          lambda b: rand_s2d(b, 128, 64), ())

    # --- front (fused s2d) -------------------------------------------------
    k0a, b0a = leaf("block_dis_0a", "conv2d_dis_0a")
    k0a = jnp.pad(k0a, ((0, 0), (0, 0), (0, 3), (0, 0)))
    k0b, b0b = leaf("block_dis_0b", "conv2d_dis_0b")
    k1a, b1a = leaf("block_dis_1a", "conv2d_dis_1a")
    k1b, b1b = leaf("block_dis_1b", "conv2d_dis_1b")

    conv5 = lambda x, k, b: conv5x5_s2d_fused(x, k, b, strip=fc.strip)

    def c5_flops(b, n, c4, co4):
        return 2 * b * n * n * 9 * c4 * co4

    stage("entry_pack (256, 1ch -> c4=16)",
          lambda x: entry_pack(x.astype(DT), c_pad=4),
          lambda b: rand_px(b, 256, 1), ())
    stage("conv5 dis_0a (n=128, c4=16->64)", conv5,
          lambda b: rand_s2d(b, 128, 16), (k0a, b0a),
          flops=c5_flops(B, 128, 16, 64), kdim=16, ndim=64)
    stage("conv5 dis_0b (n=128, c4=64->64)", conv5,
          lambda b: rand_s2d(b, 128, 64), (k0b, b0b),
          flops=c5_flops(B, 128, 64, 64), kdim=64, ndim=64)
    stage("pool_to_s2d L0->1 (n=128, c4=64)",
          lambda x: pool_to_s2d_pallas(x),
          lambda b: rand_s2d(b, 128, 64), ())
    stage("conv5 dis_1a (n=64, c4=64->128)", conv5,
          lambda b: rand_s2d(b, 64, 64), (k1a, b1a),
          flops=c5_flops(B, 64, 64, 128), kdim=64, ndim=128)
    stage("conv5 dis_1b (n=64, c4=128->128)", conv5,
          lambda b: rand_s2d(b, 64, 128), (k1b, b1b),
          flops=c5_flops(B, 64, 128, 128), kdim=128, ndim=128)
    stage("pool_s2d L1->pix (n=64, c4=128)",
          lambda x: pool_s2d_pallas(x),
          lambda b: rand_s2d(b, 64, 128), ())

    # --- tail (XLA pixel domain) -------------------------------------------
    def xla_conv(h, k, b, relu=True):
        y = lax.conv_general_dilated(
            h, k, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + b.astype(h.dtype)
        return jax.nn.relu(y) if relu else y

    def c3_flops(b, n, ci, co):
        return 2 * b * n * n * 9 * ci * co

    tail_shapes = [  # (blk, n_in, ci, co, pool_after)
        ("dis_2", 64, 32, 64, False), ("dis_3", 64, 64, 64, True),
        ("dis_4", 32, 64, 128, False), ("dis_5", 32, 128, 128, True),
        ("dis_6", 16, 128, 256, False), ("dis_7", 16, 256, 256, False),
        ("dis_8", 16, 256, 256, False),
    ]
    for blk, n, ci, co, pool in tail_shapes:
        k, bb = leaf(f"block_{blk}", f"conv2d_{blk}")
        stage(f"XLA conv3 {blk} ({n}^2, {ci}->{co})", xla_conv,
              lambda b, n=n, ci=ci: rand_px(b, n, ci, dtype=DT), (k, bb),
              flops=c3_flops(B, n, ci, co),
              kdim=9 * ci, ndim=co)
        if pool:
            stage(f"maxpool after {blk} ({n}^2)",
                  lambda x: nn.max_pool(x, (2, 2), (2, 2)),
                  lambda b, n=n, co=co: rand_px(b, n, co, dtype=DT), ())

    k9 = jnp.asarray(params["dis_9"]["kernel"]).astype(DT)
    b9 = jnp.asarray(params["dis_9"]["bias"])
    kd = jnp.asarray(params["dis_dense"]["kernel"]).astype(DT)
    bd = jnp.asarray(params["dis_dense"]["bias"]).astype(DT)

    def head(h, k9, b9, kd, bd):
        y = xla_conv(h, k9, b9, relu=False)
        y = y.reshape(y.shape[0], -1)
        return (y @ kd + bd).astype(jnp.float32)

    stage("dis_9 1x1 + flatten + dense (16^2)", head,
          lambda b: rand_px(b, 16, 256, dtype=DT), (k9, b9, kd, bd),
          flops=2 * B * 16 * 16 * 256 * 1, kdim=256, ndim=1)

    # --- composites ----------------------------------------------------------
    stage("FULL critic fwd fused",
          lambda x, p: fc.forward(p, x),
          lambda b: rand_px(b, 256, 1), (params,))
    stage("FULL critic fwd plain XLA",
          lambda x, p: critic.apply({"params": p}, x),
          lambda b: rand_px(b, 256, 1), (params,))
    stage("front only (entry..pool_s2d)",
          lambda x, p: fc._front(p, x)[0],
          lambda b: rand_px(b, 256, 1), (params,))
    pix_fn = jax.jit(lambda p, x: fc._front(p, x)[0])
    stage("tail only (dis_2..dense)",
          lambda pix, p: fc._tail(p, pix),
          lambda b: pix_fn(params, rand_px(b, 256, 1)), (params,))
    stage("FULL fwd + hand-chained input grad",
          lambda x, p: fc.score_and_input_grad(p, x)[1],
          lambda b: rand_px(b, 256, 1), (params,))

    # --- input-grad backward chain, piece by piece (round 4) ---------------
    # The fwd+input-grad marginal measured 7.00 ms vs a ~3.7 ms FLOP-
    # symmetry expectation (fwd marg 1.87 + bwd convs ~ fwd convs) — these
    # rows localize the ~1.9x backward-chain gap before any kernel work.
    # Pieces mirror fast_critic.score_and_input_grad exactly: the tail VJP
    # (plain XLA), the relu-mask + ring-crop + re-pad glue, the flip-
    # transposed conv5 through the same Pallas op, the two pool backwards
    # (jax.vjp of their XLA twins — suspect: XLA s2d relayout transposes),
    # and the entry_pack adjoint.
    from depgan_tpu.ops import s2d_conv as S
    from depgan_tpu.ops.conv_s2d_pallas import _pool_bwd, _pool_to_s2d_bwd

    def tail_vjp_piece(pix, p):
        score, vjp = jax.vjp(lambda h: fc._tail(p, h), pix)
        return vjp(jnp.ones_like(score))[0]

    stage("BWD tail VJP (dis_2..dense)", tail_vjp_piece,
          lambda b: rand_px(b, 64, 32, dtype=DT), (params,))

    def mask_pad(d_out, out):
        """The OLD slice+pad glue (kept for comparison rows — measured
        0.72 ms marginal at n=128, round 5)."""
        d_pre = jnp.where(out > 0, d_out, 0.0).astype(DT)
        return jnp.pad(d_pre[:, 1:-1, 1:-1, :],
                       ((0, 0), (1, 1), (1, 1), (0, 0)))

    def mask_mul(d_out, out):
        """The PRODUCTION glue since round 5 (fast_critic.mask_ring): one
        fused elementwise pass via a multiplicative 0/1 interior mask."""
        from depgan_tpu.ops.conv_s2d_pallas import _interior_mask

        m = _interior_mask(out.shape[1], out.shape[2], out.shape[1] - 2,
                           jnp.float32)
        return (jnp.where(out > 0, d_out, 0.0) * m).astype(DT)

    def conv5_bwd_full(d_out, out, w5, c_in4):
        d_pre = mask_pad(d_out, out)
        w_bwd = jnp.flip(w5, axis=(0, 1)).transpose(0, 1, 3, 2)
        return conv5x5_s2d_fused(d_pre, w_bwd.astype(DT),
                                 jnp.zeros((c_in4 // 4,), jnp.float32),
                                 mode="none", strip=fc.strip)

    bwd_shapes = [  # (tag, n, c4 of d_out, c4 of dX, fwd kernel)
        ("dis_1b", 64, 128, 128, k1b),
        ("dis_1a", 64, 128, 64, k1a),
        ("dis_0b", 128, 64, 64, k0b),
        ("dis_0a", 128, 64, 16, k0a),
    ]
    for tag, n, c4o, c4i, w5 in bwd_shapes:
        stage(f"BWD maskpad {tag} (n={n}, c4={c4o})", mask_pad,
              lambda b, n=n, c=c4o: rand_s2d(b, n, c, 1),
              args_fn=lambda b, n=n, c=c4o: (rand_s2d(b, n, c, 2),))
        stage(f"BWD maskmul {tag} (n={n}, c4={c4o})", mask_mul,
              lambda b, n=n, c=c4o: rand_s2d(b, n, c, 1),
              args_fn=lambda b, n=n, c=c4o: (rand_s2d(b, n, c, 2),))
        # w5/c4i bound statically (c4i sizes the zero bias — must not be
        # a traced operand; w5 is a tiny (5,5,C,Co) constant).
        stage(f"BWD conv5T {tag} (n={n}, {c4o}->{c4i})",
              lambda d, out, w5=w5, ci=c4i: conv5_bwd_full(d, out, w5, ci),
              lambda b, n=n, c=c4o: rand_s2d(b, n, c, 1),
              args_fn=lambda b, n=n, c=c4o: (rand_s2d(b, n, c, 2),),
              flops=c5_flops(B, n, c4o, c4i), kdim=c4o, ndim=c4i)

    stage("BWD pool_s2d (n=64, c4=128)",
          lambda g, h: _pool_bwd(h, g)[0],
          lambda b: rand_px(b, 64, 32, 1, dtype=DT),
          args_fn=lambda b: (rand_s2d(b, 64, 128, 2),))
    stage("BWD pool_to_s2d (n=128, c4=64)",
          lambda g, h: _pool_to_s2d_bwd(h, g)[0],
          lambda b: rand_s2d(b, 64, 64, 1),
          args_fn=lambda b: (rand_s2d(b, 128, 64, 2),))

    def entry_adj(d_xp):
        d_grp = d_xp[:, 1:-1, 1:-1, :]
        b, n, _, _ = d_grp.shape
        d_real = d_grp.reshape(b, n, n, 4, fc.entry_pad)[..., :1]
        return S.d2s(d_real.reshape(b, n, n, 4)).astype(jnp.float32)

    stage("BWD entry adjoint (d2s)", entry_adj,
          lambda b: rand_s2d(b, 128, 16), ())

    n_bwd = 1 + 3 * len(bwd_shapes) + 3  # tail vjp + pieces + pools + entry
    bwd_rows = ROWS[-n_bwd:]
    # maskmul rows are the PRODUCTION glue measured for comparison against
    # the old maskpad rows — exclude them from the chain sum (the conv5T
    # rows already include their own glue).
    bwd_marg = sum(r[2] - r[1] for r in bwd_rows
                   if "maskmul" not in r[0] and "maskpad" not in r[0])
    full_g = next(r for r in ROWS if r[0].startswith("FULL fwd +"))
    fwd_full = next(r for r in ROWS if r[0].startswith("FULL critic fwd fused"))
    print("-" * 86, flush=True)
    print(f"BWD pieces marginal sum {bwd_marg:.3f} ms + fwd marginal "
          f"{fwd_full[2] - fwd_full[1]:.3f} vs FULL fwd+grad marginal "
          f"{full_g[2] - full_g[1]:.3f}", flush=True)

    # --- summary -------------------------------------------------------------
    per_stage = ROWS[1 : -(5 + n_bwd)]  # drop calibration + composites + bwd
    calib = ROWS[0]
    t_sum = sum(r[1] for r in per_stage)
    fix_sum = sum(max(2 * r[1] - r[2], 0.0) for r in per_stage)
    marg_sum = sum(r[2] - r[1] for r in per_stage)
    floor = sum(max(r[3], r[4]) for r in per_stage)
    floor_s = sum(max(r[3], r[5]) for r in per_stage)
    full = next(r for r in ROWS if r[0].startswith("FULL critic fwd fused"))
    print("-" * 86, flush=True)
    print(f"calibration passthrough: t{B}={calib[1]:.3f} ms "
          f"(per-row harness overhead at the front shape)", flush=True)
    print(f"stage sum t{B}={t_sum:.3f} ms  (fixed {fix_sum:.3f} + marginal "
          f"{marg_sum:.3f});  raw floor {floor:.3f};  shape-adj floor "
          f"{floor_s:.3f}", flush=True)
    print(f"FULL fused fwd t{B}={full[1]:.3f} ms  t{2*B}={full[2]:.3f} ms "
          f"(fix={max(2 * full[1] - full[2], 0):.3f}, "
          f"marg={full[2] - full[1]:.3f})", flush=True)


if __name__ == "__main__":
    main()
