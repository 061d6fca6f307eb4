"""Superstep stage profile on the real chip — where do the 607 ms go?

Times each component of the two-critic WGAN-GP superstep
(train/gan_trainer.py) in isolation, fused (use_pallas) vs plain, using
the remote-backend-safe methodology from docs/PERF.md: on-device lax.scan
with a data-dependency chain, one dependent-scalar fetch per timing.

Run (real TPU): python scripts/superstep_profile.py
"""
from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from depgan_tpu.config import DataConfig, GanTrainConfig, ModelConfig
from depgan_tpu.models.critic import make_critic
from depgan_tpu.models.generator import make_generator
from depgan_tpu.ops.fast_critic import FusedCritic
from depgan_tpu.ops.fast_gen import FusedGenerator
from depgan_tpu.train.wgan_gp import critic_step_loss, generator_loss

B = 16
IMG = 256
N_SCAN = 8


def timed(name, fn, *args):
    """fn(x_seed, *args) -> scalar; scans N_SCAN times with a carry chain."""

    @jax.jit
    def run(args):
        def body(carry, _):
            out = fn(carry, *args)
            return jnp.tanh(carry + 1e-20 * out), out

        c, outs = jax.lax.scan(body, jnp.float32(0.0), None, length=N_SCAN)
        return c + jnp.sum(outs)

    float(run(args))  # compile
    reps = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(run(args))
        reps.append(time.perf_counter() - t0)
    ms = min(reps) / N_SCAN * 1e3
    print(f"{name:44s} {ms:8.2f} ms", flush=True)
    return ms


def main():
    float(jax.jit(lambda v: (v @ v).sum())(jnp.ones((128, 128))))
    print(f"backend: {jax.default_backend()}  batch={B}", flush=True)

    mcfg = ModelConfig(image_size=IMG, first_fm=32, n_input_channels=1,
                       compute_dtype="bfloat16", use_pallas=True)
    tcfg = GanTrainConfig(batch_size=B, d_iters=5, k_noise=10)
    thresh = DataConfig().wmh_threshold
    gen = make_generator(mcfg)
    critic = make_critic(mcfg)

    k = jax.random.key(0)
    gvars = gen.init({"params": k}, jnp.zeros((1, IMG, IMG, 1)),
                     jnp.zeros((1, 32, 1)), train=False)
    dparams = critic.init({"params": jax.random.key(1)},
                          jnp.zeros((1, IMG, IMG, 1)))["params"]

    fused = FusedGenerator(mcfg, pallas_levels=(1, 2),
                           compute_dtype=jnp.bfloat16)
    fc = FusedCritic(mcfg, compute_dtype=jnp.bfloat16)
    W = jax.jit(fused.build_weights)(gvars)

    x = jax.random.uniform(jax.random.key(2), (B, IMG, IMG, 1))
    y2 = jax.random.uniform(jax.random.key(3), (B, IMG, IMG, 1))
    z = jax.random.normal(jax.random.key(4), (B, 32, 1))
    eps = jax.random.uniform(jax.random.key(5), (B, 1, 1, 1))
    img = jax.random.uniform(jax.random.key(6), (B, IMG, IMG, 1))

    # --- generator forwards ---
    timed("gen fwd (fused W prebuilt)",
          lambda c, W, x, z: jnp.sum(fused.forward(W, x + 1e-20 * c, z)),
          W, x, z)
    timed("gen fwd (fused, build_weights inside)",
          lambda c, gv, x, z: jnp.sum(
              fused.forward(fused.build_weights(gv), x + 1e-20 * c, z)),
          gvars, x, z)
    timed("gen fwd (plain flax)",
          lambda c, gv, x, z: jnp.sum(
              gen.apply(gv, x + 1e-20 * c, z, train=False)),
          gvars, x, z)

    # --- critic forwards ---
    timed("critic fwd (fused)",
          lambda c, p, m: jnp.sum(fc.forward(p, m + 1e-20 * c)),
          dparams, img)
    timed("critic fwd (plain)",
          lambda c, p, m: jnp.sum(critic.apply({"params": p}, m + 1e-20 * c)),
          dparams, img)
    timed("critic fwd+input-grad (fused hand-chain)",
          lambda c, p, m: jnp.sum(
              fc.score_and_input_grad(p, m + 1e-20 * c)[1]),
          dparams, img)

    # --- one critic update (loss fwd+bwd incl. GP double backward) ---
    def crit_update_fused(c, p, real, fake, eps):
        def loss_fn(p):
            cf = lambda m: fc.forward(p, m)
            igf = lambda m: fc.score_and_input_grad(p, m)[1]
            l, _ = critic_step_loss(cf, real + 1e-20 * c, fake, eps, 10.0,
                                    input_grad_fn=igf)
            return l

        l, g = jax.value_and_grad(loss_fn)(p)
        return l + sum(jnp.sum(jnp.abs(t)) for t in jax.tree.leaves(g)) * 0.0

    def crit_update_plain(c, p, real, fake, eps):
        def loss_fn(p):
            cf = lambda m: critic.apply({"params": p}, m)
            l, _ = critic_step_loss(cf, real + 1e-20 * c, fake, eps, 10.0)
            return l

        l, g = jax.value_and_grad(loss_fn)(p)
        return l + sum(jnp.sum(jnp.abs(t)) for t in jax.tree.leaves(g)) * 0.0

    fake = jax.jit(lambda W, x, z: x[..., :1] + fused.forward(W, x, z))(W, x, z)
    timed("critic update fused (loss+param grads)",
          crit_update_fused, dparams, y2, fake, eps)
    timed("critic update plain (loss+param grads)",
          crit_update_plain, dparams, y2, fake, eps)

    # tail_s2d variant of the full critic update (dis_2/dis_3 in s2d).
    fct = FusedCritic(mcfg, compute_dtype=jnp.bfloat16, tail_s2d=True)

    def crit_update_tail(c, p, real, fake, eps):
        def loss_fn(p):
            cf = lambda m: fct.forward(p, m)
            igf = lambda m: fct.score_and_input_grad(p, m)[1]
            l, _ = critic_step_loss(cf, real + 1e-20 * c, fake, eps, 10.0,
                                    input_grad_fn=igf)
            return l

        l, g = jax.value_and_grad(loss_fn)(p)
        return l + sum(jnp.sum(jnp.abs(t)) for t in jax.tree.leaves(g)) * 0.0

    try:
        timed("critic update fused tail_s2d", crit_update_tail,
              dparams, y2, fake, eps)
        timed("critic fwd fused tail_s2d",
              lambda c, p, m: jnp.sum(fct.forward(p, m + 1e-20 * c)),
              dparams, img)
    except Exception as e:
        print(f"tail_s2d update: FAILED {type(e).__name__}: "
              f"{str(e).splitlines()[0][:120]}", flush=True)

    # CONV5_PACKED variants of the full critic update (front convs run one
    # K=9*4C matmul per strip) — alone and combined with tail_s2d. The
    # decision quantity for both flags is THIS row (the update runs 10x per
    # superstep), not the per-kernel micro-benches.
    from depgan_tpu.ops import conv_s2d_pallas as csp

    prev_packed = csp.CONV5_PACKED
    csp.CONV5_PACKED = True
    try:
        timed("critic update fused conv5-packed",
              crit_update_fused, dparams, y2, fake, eps)
        timed("critic update fused packed+tail_s2d",
              crit_update_tail, dparams, y2, fake, eps)
    except Exception as e:
        print(f"conv5-packed update: FAILED {type(e).__name__}: "
              f"{str(e).splitlines()[0][:120]}", flush=True)
    csp.CONV5_PACKED = prev_packed

    # --- batch-scaling probes for the merged-critic design: if one batch-2B
    # update is much cheaper than two batch-B updates, stacking the two
    # critics into one vmapped update wins (they are independent: separate
    # params/opt, G frozen during the loops).
    x32 = jnp.concatenate([x, x])
    y32 = jnp.concatenate([y2, y2])
    z32 = jnp.concatenate([z, jax.random.normal(jax.random.key(8), z.shape)])
    fake32 = jnp.concatenate([fake, fake])
    eps32 = jnp.concatenate([eps, eps])
    timed("gen fwd fused batch 2B",
          lambda c, W, x, z: jnp.sum(fused.forward(W, x + 1e-20 * c, z)),
          W, x32, z32)
    timed("critic update fused batch 2B",
          crit_update_fused, dparams, y32, fake32, eps32)

    # vmapped two-critic update (stacked params) at batch B each:
    dstack = jax.tree.map(lambda a: jnp.stack([a, a * 0.99]), dparams)
    reals2 = jnp.stack([y2, y2 - x[..., :1]])
    fakes2 = jnp.stack([fake, fake - x[..., :1]])
    eps2 = jnp.stack([eps, eps])

    def two_crit_update(c, ps, reals, fakes, epss):
        def one(p, real, fake, ep):
            def loss_fn(p):
                cf = lambda m: fc.forward(p, m)
                igf = lambda m: fc.score_and_input_grad(p, m)[1]
                l, _ = critic_step_loss(cf, real + 1e-20 * c, fake, ep, 10.0,
                                        input_grad_fn=igf)
                return l
            return jax.value_and_grad(loss_fn)(p)

        l, g = jax.vmap(one)(ps, reals, fakes, epss)
        return jnp.sum(l) + sum(
            jnp.sum(jnp.abs(t)) for t in jax.tree.leaves(g)) * 0.0

    timed("two-critic vmapped update (2 x batch B)",
          two_crit_update, dstack, reals2, fakes2, eps2)

    # --- batched probe: 10 noises as ONE batch-10B forward vs lax.map ---
    zs = jax.random.normal(jax.random.key(7), (10, B, 32, 1))

    def probe_batched(c, W, x, zs, y2):
        k = zs.shape[0]
        xk = jnp.broadcast_to(x, (k,) + x.shape).reshape((-1,) + x.shape[1:])
        zk = zs.reshape((-1,) + zs.shape[2:])
        dem = fused.forward(W, xk + 1e-20 * c, zk)
        dem = dem.reshape((k,) + x.shape[:1] + dem.shape[1:])
        cf = lambda m: fc.forward(dparams, m)

        def one(d):
            l, _ = generator_loss(tcfg, thresh, d, x[..., :1], y2, cf, cf)
            return l

        return jnp.sum(jax.lax.map(one, dem))

    timed("best-of-10 probe (one 10B G forward)", probe_batched,
          W, x, zs, y2)

    # --- generator update (5-term loss fwd+bwd through fused VJPs) ---
    def gen_update_fused(c, gv, x, z, y2):
        def loss_fn(params):
            v = {"params": params, "batch_stats": gvars.get("batch_stats", {})}
            Wg = fused.build_weights(v)
            dem = fused.forward(Wg, x + 1e-20 * c, z)
            cf = lambda m: fc.forward(dparams, m)
            l, _ = generator_loss(tcfg, thresh, dem, x[..., :1], y2, cf, cf)
            return l

        l, g = jax.value_and_grad(loss_fn)(gv["params"])
        return l + sum(jnp.sum(jnp.abs(t)) for t in jax.tree.leaves(g)) * 0.0

    timed("gen update fused (loss+param grads)",
          gen_update_fused, gvars, x, z, y2)

    # --- best-of-10 probe (lax.map over 10 fused forwards + loss) ---
    def probe(c, W, x, zs, y2):
        def one(z):
            dem = fused.forward(W, x + 1e-20 * c, z)
            cf = lambda m: fc.forward(dparams, m)
            l, _ = generator_loss(tcfg, thresh, dem, x[..., :1], y2, cf, cf)
            return l

        return jnp.sum(jax.lax.map(one, zs))

    timed("best-of-10 probe (fused)", probe, W, x, zs, y2)


if __name__ == "__main__":
    main()
