"""Whole-forward roofline: static per-stage floors + measured per-stage ms.

Replays the EXACT stage sequence of the production inference forward
(FastGenerator, image 256, fm 32, pallas_levels (1, 2), bf16 — the path
behind bench.py and `test-gan --fast`; reference hot path
DEP-GAN_testing_4fold.py:616-628) and for every stage computes

  mxu_ms = matmul FLOPs / measured-peak bf16 MXU rate (175 TFLOPS, the
           8192^2-matmul calibration in docs/PERF.md),
  hbm_ms = (activations in + out + weights) bytes / 819 GB/s (v5e peak),
  floor  = max(mxu_ms, hbm_ms)  — the perfect-overlap bound,

then measures the stage in isolation on the real chip (scan-chain
methodology, docs/PERF.md remote-backend rules: the stage runs N_SCAN
times inside one jitted lax.scan with a data dependency; one dependent
scalar is fetched). The summed floor converts into a ceiling in
slices/s/chip — the number that decides how much of the 5000 north star
is reachable on this part at all (VERDICT r2 item 1's alternative done
criterion), and the measured column shows which stages still sit above
their floor.

Run (real TPU): python scripts/roofline.py [batch]
"""
from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from depgan_tpu.config import ModelConfig
from depgan_tpu.models import init_generator
from depgan_tpu.ops import s2d_conv as S
from depgan_tpu.ops.conv_s2d_pallas import (
    conv3x3_s2d_fused,
    conv3x3_s2d_fused2,
    deconv_s2d_pallas,
    entry_pack,
    pad_s2d,
    pool_s2d_pallas,
    pool_to_s2d_pallas,
    unpad_s2d,
)
from depgan_tpu.ops.fast_gen import FastGenerator, _conv, _deconv_matmul

B = int(sys.argv[1]) if len(sys.argv) > 1 else 256
N_SCAN = int(sys.argv[2]) if len(sys.argv) > 2 else 16
HBM_GBPS = 819.0
MXU_TFLOPS = 175.0

ROWS = []  # (name, measured_ms, hbm_ms, mxu_ms)


def bytes_of(*arrs) -> int:
    return sum(a.size * a.dtype.itemsize for a in arrs)


def timed(name, fn, x, args, flops=0):
    """Measure fn(x, *args) with the scan-chain methodology; record the
    roofline row. x is the chained operand; args are passed as jit args
    (never closed over — docs/PERF.md HTTP-413 rule)."""

    @jax.jit
    def run(x, args):
        def body(carry, _):
            out = fn(carry, *args)
            return carry + 1e-30 * jnp.sum(out).astype(carry.dtype), ()

        c, _ = jax.lax.scan(body, x, None, length=N_SCAN)
        return jnp.sum(c.astype(jnp.float32))

    float(run(x, args))  # compile
    reps = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(run(x, args))
        reps.append(time.perf_counter() - t0)
    ms = min(reps) / N_SCAN * 1e3

    out = jax.eval_shape(lambda x, a: fn(x, *a), x, args)
    nbytes = bytes_of(x, *args) + out.size * jnp.dtype(out.dtype).itemsize
    hbm_ms = nbytes / (HBM_GBPS * 1e6)
    mxu_ms = flops / (MXU_TFLOPS * 1e9)
    floor = max(hbm_ms, mxu_ms)
    util = f"{mxu_ms / ms:5.0%}" if flops else "    -"
    print(f"{name:36s} {ms:7.3f} ms  hbm {hbm_ms:6.3f}  mxu {mxu_ms:6.3f}"
          f"  floor {floor:6.3f}  util {util}", flush=True)
    ROWS.append((name, ms, hbm_ms, mxu_ms))
    return fn(x, *args)


def conv3_flops(b, n, c4, co4):
    # 4 tap matmuls of (n*(n+1), c4) @ (c4, co4) per image (strip loop).
    return 2 * b * n * (n + 1) * 4 * c4 * co4


def main():
    float(jax.jit(lambda v: (v @ v).sum())(jnp.ones((128, 128))))
    print(f"backend: {jax.default_backend()}  batch={B}  n_scan={N_SCAN}",
          flush=True)

    cfg = ModelConfig(image_size=256, first_fm=32, n_input_channels=1,
                      compute_dtype="bfloat16")
    _, variables = init_generator(cfg, jax.random.key(0))
    fg = FastGenerator(cfg, variables, s2d_levels=(), pallas_levels=(1, 2))
    W = fg.weights
    dt = fg.dtype
    st = fg.strip

    x = jax.random.uniform(jax.random.key(1), (B, 256, 256, 1))
    z = jax.random.normal(jax.random.key(2), (B, 32, 1))
    mods = fg._site_mods(W, z.astype(jnp.float32))

    def wk(name):
        return W[f"{name}/kernel"].astype(dt)

    def wb(name):
        return W[f"{name}/bias"]

    def film_args(site):
        g, b_ = mods[site]
        return S.tile_channel_params(g), S.tile_channel_params(b_)

    # --- encoder ---------------------------------------------------------
    xp = timed("entry_pack (256, 1ch, pad 8)",
               lambda x: entry_pack(x.astype(dt), c_pad=fg.entry_pad_cin),
               x, ())

    def conv3_stage(tag, x_in, wname, mode, site=None):
        w, bias = wk(wname), wb(wname)
        n = x_in.shape[1] - 2
        fl = conv3_flops(B, n, x_in.shape[-1], w.shape[-1])
        if mode == "film":
            g, b_ = film_args(site)
            return timed(tag,
                         lambda x, w, bias, g, b_: conv3x3_s2d_fused(
                             x, w, bias, g, b_, mode="film", strip=st),
                         x_in, (w, bias, g, b_), flops=fl)
        return timed(tag,
                     lambda x, w, bias: conv3x3_s2d_fused(
                         x, w, bias, mode=mode, strip=st),
                     x_in, (w, bias), flops=fl)

    h = conv3_stage("enc L1 conv gen_0 (128, 32->128)", xp, "gen_0", "relu")
    h = conv3_stage("enc L1 film m1 (128, 128->128)", h, "noise_m1",
                    "film", site="m1")
    h1_skip = conv3_stage("enc L1 conv gen_1 (128, 128->128)", h, "gen_1",
                          "relu")
    h = timed("pool_to_s2d L1->2 (128, c4=128)",
              lambda x: pool_to_s2d_pallas(x), h1_skip, ())
    h = conv3_stage("enc L2 conv gen_2 (64, 128->256)", h, "gen_2", "relu")
    h = conv3_stage("enc L2 film m2 (64, 256->256)", h, "noise_m2",
                    "film", site="m2")
    h2_skip = conv3_stage("enc L2 conv gen_3 (64, 256->256)", h, "gen_3",
                          "relu")
    h = timed("pool_s2d L2->pixel (64, c4=256)",
              lambda x: pool_s2d_pallas(x), h2_skip, ())

    # --- XLA levels (enc 3, mid, dec 3) ----------------------------------
    def xla_block(tag, x_in, site, cin, cout):
        def kb(name):
            if f"{name}/kernel_px" in W:
                return (W[f"{name}/kernel_px"].astype(dt),
                        W[f"{name}/bias_px"].astype(dt))
            return W[f"{name}/kernel"].astype(dt), W[f"{name}/bias"].astype(dt)

        g, b_ = mods[site]
        ka, ba = kb(cin)
        kn, bn = kb(f"noise_{site}")
        kc, bc = kb(cout)
        n, cch = x_in.shape[1], x_in.shape[-1]
        fl = sum(2 * B * n * n * 9 * k.shape[2] * k.shape[3]
                 for k in (ka, kn, kc))

        def blk(x, ka, ba, kn, bn, kc, bc, g, b_):
            h0 = jax.nn.relu(_conv(x, ka, ba))
            hn = _conv(h0, kn, bn)
            s = h0 + jax.nn.relu(
                hn * g.astype(dt)[:, None, None, :]
                + b_.astype(dt)[:, None, None, :])
            return jax.nn.relu(_conv(s, kc, bc))

        return timed(tag, blk, x_in, (ka, ba, kn, bn, kc, bc, g, b_),
                     flops=fl)

    h3_in = h
    h3_skip = xla_block("enc L3 block (64px, 64->96ch)", h3_in, "m3",
                        "gen_4", "gen_5")
    from flax import linen as nn
    h = timed("maxpool L3 (64px)", lambda x: nn.max_pool(x, (2, 2), (2, 2)),
              h3_skip, ())
    h = xla_block("mid block (32px, 96->128ch)", h, "p4", "gen_8", "gen_9")

    # dec L3 (XLA): deconv matmul + concat + block
    kd, bd = W["de_gen_9/kernel"].astype(dt), W["de_gen_9/bias"].astype(dt)
    up3 = timed("dec L3 deconv (32->64px)",
                lambda x, k, b: S.d2s(jax.nn.relu(_deconv_matmul(x, k, b))),
                h, (kd, bd),
                flops=2 * B * 32 * 32 * kd.shape[3] * 4 * kd.shape[2])
    cat = timed("dec L3 concat", lambda a, b: jnp.concatenate([a, b], -1),
                up3, (h3_skip,))
    h = xla_block("dec L3 block (64px, 192->96ch)", cat, "p3",
                  "gen_10", "gen_11")

    # dec L2 (pallas): pixel deconv -> padded s2d, fused2 chain
    kd2, bd2 = W["de_gen_11/kernel"].astype(dt), W["de_gen_11/bias"].astype(dt)
    up2 = timed("dec L2 deconv+pad_s2d (64->66)",
                lambda x, k, b: pad_s2d(jax.nn.relu(_deconv_matmul(x, k, b))),
                h, (kd2, bd2),
                flops=2 * B * 64 * 64 * kd2.shape[3] * 4 * kd2.shape[2])

    def fused2_stage(tag, up, skip, cname):
        wu = W[f"{cname}/kernel_up"].astype(dt)
        ws = W[f"{cname}/kernel_skip"].astype(dt)
        bias = wb(cname)
        n = up.shape[1] - 2
        fl = (conv3_flops(B, n, up.shape[-1], wu.shape[-1])
              + conv3_flops(B, n, skip.shape[-1], ws.shape[-1]))
        return timed(tag,
                     lambda u, s, wu, ws, b: conv3x3_s2d_fused2(
                         u, s, wu, ws, b, strip=st),
                     up, (skip, wu, ws, bias), flops=fl)

    h = fused2_stage("dec L2 fused2 (64, 2x256->256)", up2, h2_skip,
                     "gen_14")
    h = conv3_stage("dec L2 film p2 (64, 256->256)", h, "noise_p2",
                    "film", site="p2")
    h = conv3_stage("dec L2 conv gen_15 (64, 256->256)", h, "gen_15", "relu")

    # dec L1 (pallas): s2d deconv kernel + fused2 chain
    kd1 = W["de_gen_15/kernel"].astype(dt)
    bd1 = W["de_gen_15/bias"].astype(dt)
    cin_ch = kd1.shape[3]
    w2 = jnp.transpose(kd1, (3, 0, 1, 2)).reshape(cin_ch, -1)
    up1 = timed("dec L1 deconv_s2d (66->130)",
                lambda x, w, b: deconv_s2d_pallas(x, w, jnp.tile(b, 4)),
                h, (w2, bd1),
                flops=2 * B * 64 * 64 * kd1.shape[3] * 4 * kd1.shape[2])
    h = fused2_stage("dec L1 fused2 (128, 2x128->128)", up1, h1_skip,
                     "gen_16")
    h = conv3_stage("dec L1 film p1 (128, 128->128)", h, "noise_p1",
                    "film", site="p1")
    h = conv3_stage("dec L1 conv gen_17 (128, 128->128)", h, "gen_17", "relu")

    # head (f32 XLA 1x1 on padded s2d + relayout + tanh)
    kseg = W["gen_segmentation/kernel"].astype(jnp.float32)
    bseg = W["gen_segmentation/bias"].astype(jnp.float32)

    def head(x, k, b):
        logits = jax.lax.conv_general_dilated(
            x.astype(jnp.float32), k, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + b
        return jnp.tanh(S.d2s(unpad_s2d(logits)))

    timed("head 1x1+tanh (130, 128->4, f32)", head, h, (kseg, bseg),
          flops=2 * B * 130 * 130 * 128 * 4)

    # --- summary ----------------------------------------------------------
    tot_ms = sum(r[1] for r in ROWS)
    tot_floor = sum(max(r[2], r[3]) for r in ROWS)
    tot_mxu = sum(r[3] for r in ROWS)
    print("-" * 78, flush=True)
    print(f"sum measured {tot_ms:7.2f} ms   sum floor {tot_floor:7.2f} ms "
          f"  sum mxu {tot_mxu:7.2f} ms", flush=True)
    for name, unit in (("measured", tot_ms), ("floor", tot_floor),
                       ("mxu-only", tot_mxu)):
        print(f"ceiling @ {name:9s}: {B * 1e3 / unit:7.1f} slices/s",
              flush=True)

    # end-to-end forward for the fetch/fusion delta vs the stage sum
    @jax.jit
    def fwd_scan(weights, x, zs):
        def body(carry, z):
            y = fg._forward(weights, carry, z)
            return jnp.tanh(carry + 1e-12 * y), jnp.sum(y)

        _, sums = jax.lax.scan(body, x, zs)
        return jnp.sum(sums)

    zs = jax.random.normal(jax.random.key(3), (N_SCAN, B, 32, 1))
    float(fwd_scan(W, x, zs))
    reps = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(fwd_scan(W, x, zs))
        reps.append(time.perf_counter() - t0)
    e2e = min(reps) / N_SCAN * 1e3
    print(f"end-to-end forward {e2e:7.2f} ms  ({B * 1e3 / e2e:7.1f} "
          f"slices/s)", flush=True)


if __name__ == "__main__":
    main()
