"""TRUE in-graph per-stage costs of the production forward, by ablation.

Round-4 finding: isolated per-stage measurements are NOT additive — the
round-3 roofline's isolated pool_to_s2d stage measured ~8 ms net at
batch 256, yet fusing the pools away (fuse_pool) moved the END-TO-END
forward by only ~0.45 ms (2834 -> 2848 slices/s). Per-stage numbers from
isolated scan chains therefore cannot direct optimization. This script
measures each component's REAL composed cost by differencing end-to-end
forwards: the production forward vs the same forward with ONE component
replaced by an identity (channel-preserving convs) or a cheap stub
(channel-changing stages; stub cost ~ its output's HBM write, printed
as `stub_floor` — the true stage cost is delta + stub_floor at most).

Components (FusedGenerator.ablate tags): conv_in/film/conv_out per site,
fused2 + deconv per decoder site, pool per encoder site, head.

Caveats (first round-4 run): every stub must DEPEND on its input — the
original deconv stub was constant zeros, so XLA dead-code-eliminated the
whole mid network and the 'deconv:p1' delta read +50 ms (fixed: the stub
broadcasts mean(h)). Channel-preserving rows (conv_in:m1/m2) ablate to an
identity and measured slightly NEGATIVE deltas (-0.6/-2.7 ms) — removing
a kernel can shift downstream fusion/layout; read those rows as "composed
cost below noise", not as a negative cost.

Run (real TPU): python scripts/ablation_forward.py [batch] [n_scan]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from depgan_tpu.config import ModelConfig
from depgan_tpu.models import init_generator
from depgan_tpu.ops.fast_gen import FastGenerator

B = int(sys.argv[1]) if len(sys.argv) > 1 else 256
N_SCAN = int(sys.argv[2]) if len(sys.argv) > 2 else 16
IMG = 256

ABLATIONS = [
    # encoder level 1 (n=128, c4=128)
    ("conv_in:m1 (entry conv, stub)", {"conv_in:m1"}, B * 130 * 130 * 128 * 2),
    ("film:m1", {"film:m1"}, 0),
    ("conv_out:m1", {"conv_out:m1"}, 0),
    ("pool:m1 (L1->2)", {"pool:m1"}, B * 66 * 66 * 128 * 2),
    # encoder level 2 (n=64, c4=256)
    ("conv_in:m2 (stub)", {"conv_in:m2"}, B * 66 * 66 * 256 * 2),
    ("film:m2", {"film:m2"}, 0),
    ("conv_out:m2", {"conv_out:m2"}, 0),
    ("pool:m2 (L2->pixel)", {"pool:m2"}, B * 64 * 64 * 64 * 2),
    # decoder level 2
    ("fused2:p2 (stub)", {"fused2:p2"}, B * 66 * 66 * 256 * 2),
    ("film:p2", {"film:p2"}, 0),
    ("conv_out:p2", {"conv_out:p2"}, 0),
    # decoder level 1
    ("deconv:p1 (stub)", {"deconv:p1"}, B * 130 * 130 * 128 * 2),
    ("fused2:p1 (stub)", {"fused2:p1"}, B * 130 * 130 * 128 * 2),
    ("film:p1", {"film:p1"}, 0),
    ("conv_out:p1", {"conv_out:p1"}, 0),
    ("head (stub)", {"head"}, B * 256 * 256 * 1 * 4),
    # whole level-1 encoder site + whole decoder L1 tail, for cross-checks
    ("enc L1 all three convs", {"conv_in:m1", "film:m1", "conv_out:m1"},
     B * 130 * 130 * 128 * 2),
    ("dec L1 all (deconv+fused2+film+conv)",
     {"deconv:p1", "fused2:p1", "film:p1", "conv_out:p1"},
     B * 130 * 130 * 128 * 2),
]


def measure(fg, weights, x, z):
    fwd = jax.jit(
        lambda w, x, z: jax.lax.scan(
            lambda c, _: (
                c + 1e-30 * jnp.sum(fg.forward(w, x + c, z)).astype(c.dtype),
                (),
            ),
            jnp.zeros((), x.dtype),
            None,
            length=N_SCAN,
        )[0]
    )
    float(fwd(weights, x, z))  # compile
    reps = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(fwd(weights, x, z))
        reps.append(time.perf_counter() - t0)
    return min(reps) / N_SCAN * 1e3


def main():
    float(jax.jit(lambda v: (v @ v).sum())(jnp.ones((128, 128))))
    print(f"backend: {jax.default_backend()}  batch={B}  n_scan={N_SCAN}  "
          f"fuse_pool=0 (pools measured as their own stages)", flush=True)

    cfg = ModelConfig(image_size=IMG, first_fm=32, n_input_channels=1,
                      compute_dtype="bfloat16")
    _, variables = init_generator(cfg, jax.random.key(0))
    # Separate pool kernels so pool:* tags have a stage to ablate; scoped so
    # later onchip_session phases (bench) keep the production default.
    prev = os.environ.get("DEPGAN_FUSE_POOL")
    os.environ["DEPGAN_FUSE_POOL"] = "0"
    try:
        fg = FastGenerator(cfg, variables, pallas_levels=(1, 2))
    finally:
        if prev is None:
            del os.environ["DEPGAN_FUSE_POOL"]
        else:
            os.environ["DEPGAN_FUSE_POOL"] = prev
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 1, (B, IMG, IMG, 1)), jnp.bfloat16)
    z = jnp.asarray(rng.normal(size=(B, cfg.noise_size, 1)), jnp.float32)

    t_full = measure(fg, fg.weights, x, z)
    print(f"\nFULL forward: {t_full:7.3f} ms  "
          f"({B / t_full * 1e3:.0f} slices/s)\n", flush=True)
    print(f"{'component':44s} {'t_ablated':>9s} {'delta':>7s} "
          f"{'stub_floor':>10s}", flush=True)

    total = 0.0
    for name, tags, stub_bytes in ABLATIONS:
        fg.ablate = frozenset(tags)
        try:
            t = measure(fg, fg.weights, x, z)
        except Exception as e:  # keep the sweep alive on one bad stub
            print(f"{name:44s}   FAILED {type(e).__name__}: {e}", flush=True)
            continue
        finally:
            fg.ablate = frozenset()
        delta = t_full - t
        stub_ms = stub_bytes / 819e6
        if not name.startswith(("enc ", "dec ")):
            total += delta
        print(f"{name:44s} {t:9.3f} {delta:+7.3f} {stub_ms:10.3f}",
              flush=True)

    print(f"\nsum of single-component deltas: {total:.3f} ms "
          f"(full {t_full:.3f}; remainder = L3/mid/glue/site_mods)",
          flush=True)


if __name__ == "__main__":
    main()
