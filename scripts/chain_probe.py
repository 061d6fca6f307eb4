"""Whole-site chained kernel probe (round 5).

Round 5 closed the store/fetch-overlap family (STREAM_OUT, ALIGNED_STAGING,
row-blocked grids: all measured REJECTED on chip — docs/PERF.md), so the
remaining reachable inference lever is eliminating the HBM round trips
between the site kernels outright: conv3x3_s2d_chain3 runs a whole
generator site (conv_in|fused2 -> film -> conv_out[+pool]) in ONE
pallas_call with both intermediate planes in VMEM scratch. At batch 256
the eliminated store+load pairs are worth ~5.4 ms per L1 site and
~1.4-2.8 ms per L2 site of pure serial HBM time.

This probe A/Bs the chain kernel against the exact sequential composition
FastGenerator runs today (fuse_pool defaults), at the four production
Pallas sites, with a bit-identity gate before any timing.

Run (real TPU): python scripts/chain_probe.py [batch] [n_scan]
"""
from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from depgan_tpu.ops.conv_s2d_pallas import (
    conv3x3_s2d_chain3,
    conv3x3_s2d_fused,
    conv3x3_s2d_fused2,
    conv3x3_s2d_fused_pool,
)

B = int(sys.argv[1]) if len(sys.argv) > 1 else 64
N_SCAN = int(sys.argv[2]) if len(sys.argv) > 2 else 16
DT = jnp.bfloat16
STRIP = 16


def measure(fn, *args):
    @jax.jit
    def run(*args):
        def body(carry, _):
            out = fn(args[0] + carry, *args[1:])
            leaf = out[0] if isinstance(out, tuple) else out
            return carry + 1e-30 * jnp.sum(leaf).astype(carry.dtype), ()

        c, _ = jax.lax.scan(body, jnp.zeros((), args[0].dtype), None,
                            length=N_SCAN)
        return jnp.sum(c.astype(jnp.float32))

    float(run(*args))
    reps = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(run(*args))
        reps.append(time.perf_counter() - t0)
    return min(reps) / N_SCAN * 1e3


def ring0(x):
    return (x.at[:, 0].set(0).at[:, -1].set(0)
             .at[:, :, 0].set(0).at[:, :, -1].set(0))


def main():
    float(jax.jit(lambda v: (v @ v).sum())(jnp.ones((128, 128))))
    print(f"backend: {jax.default_backend()}  B={B}  n_scan={N_SCAN}",
          flush=True)
    rng = np.random.default_rng(0)

    def mk(n, c4, seed):
        r = np.random.default_rng(seed)
        return ring0(jnp.asarray(r.normal(size=(B, n + 2, n + 2, c4)), DT))

    def w(s, *shape):
        return jnp.asarray(
            np.random.default_rng(s).normal(size=shape) * 0.1, jnp.float32)

    # (name, n, one-op c4a / two-op (c4a, c4b), c4m, c4o, pool)
    sites = [
        ("enc m1 (n=128, 32->128->128, pool s2d)", 128, 32, None, 128, 128, "s2d"),
        ("enc m2 (n=64, 128->256->256, pool pixel)", 64, 128, None, 256, 256, "pixel"),
        ("dec p2 (n=64, up384+skip256->256->256)", 64, 384, 256, 256, 256, ""),
        ("dec p1 (n=128, up256+skip128->128->128)", 128, 256, 128, 128, 128, ""),
    ]

    wins = []
    for name, n, c4a, c4b, c4m, c4o, pool in sites:
        x1 = mk(n, c4a, hash(name) % 1000)
        x2 = mk(n, c4b, hash(name) % 1000 + 1) if c4b else None
        w1a, b1 = w(1, 2, 2, c4a, c4m).astype(DT), w(2, c4m)
        w1b = w(3, 2, 2, c4b, c4m).astype(DT) if c4b else None
        wf, bfc = w(4, 2, 2, c4m, c4m).astype(DT), w(5, c4m)
        g, bt = w(6, B, c4m), w(7, B, c4m)
        w3, b3 = w(8, 2, 2, c4m, c4o).astype(DT), w(9, c4o)

        def seq(x1, *rest):
            if c4b:
                x2_, w1a_, w1b_, b1_, wf_, bfc_, g_, bt_, w3_, b3_ = rest
                h0 = conv3x3_s2d_fused2(x1, x2_, w1a_, w1b_, b1_, strip=STRIP)
            else:
                w1a_, b1_, wf_, bfc_, g_, bt_, w3_, b3_ = rest
                h0 = conv3x3_s2d_fused(x1, w1a_, b1_, mode="relu", strip=STRIP)
            s = conv3x3_s2d_fused(h0, wf_, bfc_, g_, bt_, mode="film",
                                  strip=STRIP)
            if pool:
                return conv3x3_s2d_fused_pool(s, w3_, b3_, mode="relu",
                                              strip=STRIP, pool=pool)
            return conv3x3_s2d_fused(s, w3_, b3_, mode="relu", strip=STRIP)

        def chain(x1, *rest):
            if c4b:
                x2_, w1a_, w1b_, b1_, wf_, bfc_, g_, bt_, w3_, b3_ = rest
                return conv3x3_s2d_chain3(
                    x1, w1a_, b1_, wf_, bfc_, g_, bt_, w3_, b3_,
                    x2_padded=x2_, w1b4=w1b_, strip=STRIP, pool=pool)
            w1a_, b1_, wf_, bfc_, g_, bt_, w3_, b3_ = rest
            return conv3x3_s2d_chain3(
                x1, w1a_, b1_, wf_, bfc_, g_, bt_, w3_, b3_,
                strip=STRIP, pool=pool)

        rest = ((x2, w1a, w1b, b1, wf, bfc, g, bt, w3, b3) if c4b else
                (w1a, b1, wf, bfc, g, bt, w3, b3))
        try:
            ref = jax.jit(seq)(x1, *rest)
            got = jax.jit(chain)(x1, *rest)
            rl = ref if not isinstance(ref, tuple) else ref[0]
            gl = got if not isinstance(got, tuple) else got[0]
            err = float(jnp.max(jnp.abs(
                gl.astype(jnp.float32) - rl.astype(jnp.float32))))
            if pool:
                err = max(err, float(jnp.max(jnp.abs(
                    got[1].astype(jnp.float32) - ref[1].astype(jnp.float32)))))
            if err != 0.0:
                print(f"{name}: WRONG (max err {err:.6f})", flush=True)
                continue
            t_seq = measure(seq, x1, *rest)
            t_chain = measure(chain, x1, *rest)
            print(f"{name}:\n  sequential {t_seq:7.3f} ms   chain "
                  f"{t_chain:7.3f} ms   ({t_seq / t_chain:5.2f}x)  "
                  f"[bit-identical]", flush=True)
            wins.append((name, t_seq, t_chain))
        except Exception as e:
            msg = str(e).split("\n")[0][:160]
            print(f"{name}: FAILED {type(e).__name__}: {msg}", flush=True)

    if wins:
        tot_s = sum(wv[1] for wv in wins)
        tot_c = sum(wv[2] for wv in wins)
        print(f"\nTOTAL over measured sites: sequential {tot_s:.3f} ms vs "
              f"chain {tot_c:.3f} ms ({tot_s / tot_c:.2f}x)", flush=True)


if __name__ == "__main__":
    main()
