"""Measure the op the pixel-domain packed-tap design hinges on (VERDICT r3
item 5).

Round 3 rejected the only design whose paper ceiling (~5,700 slices/s)
clears the 5,000 north star — pixel-domain convs with lane-packed taps —
WITHOUT measuring it, on the grounds that every pool/deconv boundary needs
a **column (second-minor/sublane-adjacent) deinterleave**: (n, 2m, c) ->
even/odd column planes (n, m, c)+(n, m, c), the exact access pattern the
s2d layout exists to avoid (stride-2 slicing along a non-minor axis lowers
to unsupported >2-D gathers in Mosaic, docs/PERF.md).

This probe measures 2-3 candidate Mosaic formulations of that op at the
production boundary shapes, so the design is either killed by numbers or
revived:

  xla_strided   jnp even/odd strided slice + concat (the XLA reference)
  reshape_idx   Pallas: x.reshape(n, m, 2, c) then [:, :, k, :] sub-reads
                (the formulation the existing pool_to_s2d kernel uses for
                its column step)
  merge_cast    Pallas: (2m, c) -> (m, 2c) contiguous sublane->lane merge
                reshape (the 'unsupported shape cast' risk case — compiled
                at toy shapes in round 3, failed at production; re-tried
                here at exactly the boundary shapes the design needs)

Boundary shapes (batch B, bf16): the packed-tap design's pool boundaries
at L1->L2 (n=256 -> c=32... wait, in pixel domain the plane is 256^2 x 32
pooled to 128^2 x 32) and L2->L3 (128^2 x 64 -> 64^2 x 64); the deconv
boundaries are the same shapes in reverse. Per boundary the design needs
ONE column deinterleave (rows deinterleave free via sublane-contiguous
slicing).

The verdict math: the design's paper ceiling assumed boundary cost ~= HBM
floor. With the measured per-boundary cost `t_b`, the revised ceiling is
  B / (mxu_and_hbm_floor_of_packed_design + sum_boundaries t_b_net)
printed at the end (floors from scripts/roofline.py's measured MXU peak).

Run (real TPU): python scripts/packed_tap_probe.py [batch]
"""
from __future__ import annotations

import sys
import time
from functools import partial

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B = int(sys.argv[1]) if len(sys.argv) > 1 else 256
N_SCAN = 16
DT = jnp.bfloat16


def timed(name, fn, x, args=()):
    @jax.jit
    def run(x, args):
        def body(carry, _):
            out = fn(carry, *args)
            s = sum(jnp.sum(o).astype(carry.dtype) for o in jax.tree.leaves(out))
            return carry + 1e-30 * s, ()

        c, _ = jax.lax.scan(body, x, None, length=N_SCAN)
        return jnp.sum(c.astype(jnp.float32))

    try:
        float(run(x, args))
    except Exception as e:
        print(f"{name:44s} FAILED {type(e).__name__}: "
              f"{str(e).splitlines()[0][:100]}", flush=True)
        return None
    reps = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(run(x, args))
        reps.append(time.perf_counter() - t0)
    ms = min(reps) / N_SCAN * 1e3
    print(f"{name:44s} {ms:8.3f} ms", flush=True)
    return ms


# --- formulation 1: XLA strided slice -------------------------------------

def xla_strided(x):
    return jnp.concatenate([x[:, :, 0::2, :], x[:, :, 1::2, :]], axis=-1)


# --- formulation 2: Pallas reshape + parity index sub-reads -----------------

def k_reshape_idx(x_ref, o_ref, *, n, m, c):
    x = x_ref[0]                      # (n, 2m, c)
    x4 = x.reshape(n, m, 2, c)
    o_ref[0, :, :, :c] = x4[:, :, 0, :]
    o_ref[0, :, :, c:] = x4[:, :, 1, :]


# --- formulation 3: Pallas contiguous sublane->lane merge reshape -----------

def k_merge_cast(x_ref, o_ref, *, n, m, c):
    x = x_ref[0]                      # (n, 2m, c)
    # contiguous (2m, c) -> (m, 2c): even col lands in [:c], odd in [c:]
    # INTERLEAVED pairwise — the packed-tap conv consumes exactly this
    # (even, odd) lane pairing, so no further permute is needed.
    o_ref[0] = x.reshape(n, m, 2 * c)


def pallas_deint(kernel, x, n, m, c):
    return pl.pallas_call(
        partial(kernel, n=n, m=m, c=c),
        out_shape=jax.ShapeDtypeStruct((x.shape[0], n, m, 2 * c), x.dtype),
        grid=(x.shape[0],),
        in_specs=[pl.BlockSpec((1, n, 2 * m, c), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, n, m, 2 * c), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(x)


def main():
    float(jax.jit(lambda v: (v @ v).sum())(jnp.ones((128, 128))))
    print(f"backend: {jax.default_backend()}  batch={B}  n_scan={N_SCAN}",
          flush=True)

    # (label, rows n, col pairs m, channels c) — pixel-domain boundaries.
    shapes = [
        ("L1->L2 boundary (256 rows, 128 col-pairs, c=32)", 256, 128, 32),
        ("L2->L3 boundary (128 rows, 64 col-pairs, c=64)", 128, 64, 64),
    ]
    results = {}
    for label, n, m, c in shapes:
        x = jax.random.normal(jax.random.key(1), (B, n, 2 * m, c), DT)
        hbm = 2 * x.size * 2 / 819e6
        print(f"\n{label}  [hbm floor {hbm:.3f} ms]", flush=True)
        best = None
        t = timed("  xla_strided slice+concat", xla_strided, x)
        best = min(t, best) if (t and best) else (t or best)
        t = timed("  pallas reshape_idx",
                  lambda x: pallas_deint(k_reshape_idx, x, n, m, c), x)
        best = min(t, best) if (t and best) else (t or best)
        t = timed("  pallas merge_cast (shape-cast risk)",
                  lambda x: pallas_deint(k_merge_cast, x, n, m, c), x)
        best = min(t, best) if (t and best) else (t or best)
        results[label] = (best, hbm)

    # Revised packed-tap ceiling. Paper floors of the pixel-domain design
    # (9-tap lane-packed convs at native channel widths — NO 16/9 s2d FLOP
    # overhead): mxu+hbm stage floors rescale from the s2d roofline's 65.3
    # ms total by 9/16 on the conv FLOPs-dominated stages ~= 44.9 ms at
    # B=256 (the ~5,700 paper number). Boundaries: 2 pools + 2 deconvs at
    # L1/L2 scale = 2x each measured boundary, minus the HBM floor already
    # counted once per stage in the paper number.
    if all(v[0] for v in results.values()):
        paper_ms = B / 5700 * 1e3
        extra = sum(2 * (t - hbm) for t, hbm in results.values())
        ceil = B / (paper_ms + extra) * 1e3
        print(f"\npaper ceiling 5700 -> revised with measured boundaries: "
              f"{ceil:.0f} slices/s  (paper fwd {paper_ms:.1f} ms + "
              f"boundary excess {extra:.1f} ms)", flush=True)
        print("verdict: design DEAD (<3920 s2d floor)" if ceil < 3920
              else "verdict: design ALIVE — exceeds the s2d floor ceiling",
              flush=True)


if __name__ == "__main__":
    main()
