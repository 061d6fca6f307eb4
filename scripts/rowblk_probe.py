"""Row-blocked-output conv kernel probe (round 4).

kernel_anatomy measured the production s2d conv kernels paying their
output store UN-overlapped (full-kernel marginal 1.145 ms vs 0.823 ms
matmul phase at the L1 shape): with grid=(batch,) whole-plane blocks,
double-buffering in+out+staging exceeds the ~16 MB VMEM, so Mosaic
serializes the output DMA. STREAM_OUT (manual 2-slot DMA ring) attacked
this and LOST 11% end-to-end — the 8-aligned pad columns + per-strip DMA
issue cost more than the overlap recovered (docs/PERF.md).

This probe measures the remaining formulation: give Mosaic's AUTOMATIC
pipeline the structure it needs — grid=(batch, n_row_blocks) with the
output row-blocked (block = p_dim/n_blocks rows x FULL columns, so no
alignment padding and no manual semaphores) while the input stays a
whole-plane revisited block and the shifted-rep staging scratch persists
across the plane's blocks (each u row written exactly once per plane —
the round-2 write-once rule; grid steps execute sequentially so the
cross-step RAW is safe). Output-block stores then double-buffer against
the next block's matmuls (2 x ~0.9 MB out buffers instead of 2 x 4.3 MB
whole planes).

Measures, at the production L1/L2 relu-conv shapes: the whole-plane
production kernel vs the row-blocked variant (several block counts),
with a bit-identity check against the production kernel first (same
staging, same 4-matmul accumulation -> results must match exactly;
the M-tiling of the matmuls does not change per-row math).

Run (real TPU): python scripts/rowblk_probe.py [batch] [n_scan]
"""
from __future__ import annotations

import sys
import time
from functools import partial

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from depgan_tpu.ops.conv_s2d_pallas import (
    _interpret,
    _w_rows_for_staging,
    conv3x3_s2d_fused,
)

B = int(sys.argv[1]) if len(sys.argv) > 1 else 64
N_SCAN = int(sys.argv[2]) if len(sys.argv) > 2 else 16


def _kernel_rowblk(x_ref, w_ref, b_ref, o_ref, u_scratch, *,
                   n: int, c4: int, co4: int, rows_blk: int, n_blocks: int):
    """One output row-block of one batch element.

    x_ref: (1, N+2, N+2, 4C) whole plane (same block every s — fetched once
    per batch element). o_ref: (1, rows_blk, N+2, 4Co) — padded rows
    [s*rows_blk, (s+1)*rows_blk). u_scratch: (N+1, N+1, 4C) persists across
    the plane's blocks; block 0 stages u rows [0, rows_blk), block s>0
    stages [s*rows_blk, min((s+1)*rows_blk, N+1)) — each row exactly once
    per plane; block s reads u rows [s*rows_blk-1, s*rows_blk+rows_blk-1]
    (all staged by now)."""
    s = pl.program_id(1)
    c = c4 // 4
    bias = b_ref[0]

    def stage_rows(r0, cnt: int):
        # dynamic row starts -> index the REFS (pl.ds is a ref indexer)
        for p in range(2):
            for q in range(2):
                src = (1 - p) * 2 + (1 - q)
                dst = p * 2 + q
                u_scratch[pl.ds(r0, cnt), :, dst * c : (dst + 1) * c] = x_ref[
                    0, pl.ds(p + r0, cnt), q : q + n + 1,
                    src * c : (src + 1) * c,
                ]

    def compute(r_lo, cnt: int, l_lo: int):
        """Interior out rows [r_lo, r_lo+cnt) -> block-local rows
        [l_lo, l_lo+cnt)."""
        acc = jnp.zeros((cnt * n, co4), jnp.float32)
        for A in range(2):
            for Bq in range(2):
                u = u_scratch[
                    pl.ds(r_lo + A, cnt), Bq : Bq + n, :
                ].reshape(cnt * n, c4)
                acc = acc + jnp.dot(
                    u, w_ref[A * 2 + Bq], preferred_element_type=jnp.float32
                )
        y = jnp.maximum(acc + bias[None, :], 0.0)
        o_ref[0, l_lo : l_lo + cnt, 1 : 1 + n, :] = y.reshape(
            cnt, n, co4
        ).astype(o_ref.dtype)

    # column ring: cols 0 and n+1 zero for every block row
    zc = jnp.zeros_like(o_ref[0, :, 0:1, :])
    o_ref[0, :, 0:1, :] = zc
    o_ref[0, :, n + 1 : n + 2, :] = zc

    r0 = s * rows_blk

    @pl.when(s == 0)
    def _():
        stage_rows(0, rows_blk)
        o_ref[0, 0:1, :, :] = jnp.zeros_like(o_ref[0, 0:1, :, :])  # top ring
        compute(0, rows_blk - 1, 1)

    if n_blocks > 2:
        @pl.when((s > 0) & (s < n_blocks - 1))
        def _():
            stage_rows(r0, rows_blk)
            compute(r0 - 1, rows_blk, 0)

    @pl.when(s == n_blocks - 1)
    def _():
        stage_rows(r0, rows_blk - 1)  # u has N+1 rows; last padded row has none
        o_ref[0, rows_blk - 1 : rows_blk, :, :] = jnp.zeros_like(
            o_ref[0, 0:1, :, :]
        )  # bottom ring
        compute(r0 - 1, rows_blk - 1, 0)


def conv3x3_rowblk(x_padded, w4, bias4, n_blocks: int):
    b, p_dim, _, c4 = x_padded.shape
    n = p_dim - 2
    co4 = w4.shape[-1]
    assert p_dim % n_blocks == 0, (p_dim, n_blocks)
    rows_blk = p_dim // n_blocks
    dt = x_padded.dtype
    w_flat = _w_rows_for_staging(w4, c4, co4).astype(dt)
    bias = bias4.reshape(1, co4).astype(jnp.float32)
    return pl.pallas_call(
        partial(_kernel_rowblk, n=n, c4=c4, co4=co4, rows_blk=rows_blk,
                n_blocks=n_blocks),
        out_shape=jax.ShapeDtypeStruct((b, p_dim, p_dim, co4), dt),
        grid=(b, n_blocks),
        in_specs=[
            pl.BlockSpec((1, p_dim, p_dim, c4), lambda i, s: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, rows_blk, p_dim, co4),
                               lambda i, s: (i, s, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((n + 1, n + 1, c4), dt)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * n * n * 4 * c4 * co4,
            bytes_accessed=x_padded.size * 2 + b * p_dim * p_dim * co4 * 2,
            transcendentals=0,
        ),
        interpret=_interpret(),
    )(x_padded, w_flat, bias)


def measure(fn, *args):
    @jax.jit
    def run(*args):
        def body(carry, _):
            out = fn(args[0] + carry, *args[1:])
            return carry + 1e-30 * jnp.sum(out).astype(carry.dtype), ()

        c, _ = jax.lax.scan(body, jnp.zeros((), args[0].dtype), None,
                            length=N_SCAN)
        return jnp.sum(c.astype(jnp.float32))

    # scan carries a scalar added to x — keeps a data dependency chain
    def chained(*args):
        return run(*args)

    float(chained(*args))
    reps = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(chained(*args))
        reps.append(time.perf_counter() - t0)
    return min(reps) / N_SCAN * 1e3


def main():
    float(jax.jit(lambda v: (v @ v).sum())(jnp.ones((128, 128))))
    print(f"backend: {jax.default_backend()}  B={B}  n_scan={N_SCAN}",
          flush=True)
    rng = np.random.default_rng(0)

    shapes = [  # (name, n, c4, co4, block counts to try)
        ("L1 conv (n=128, c4=128->128)", 128, 128, 128, (5, 10)),
        ("L2 conv (n=64, c4=256->256)", 64, 256, 256, (3, 6)),
    ]
    for name, n, c4, co4, blk_counts in shapes:
        x = jnp.asarray(
            rng.normal(size=(B, n + 2, n + 2, c4)), jnp.bfloat16
        )
        w4 = jnp.asarray(rng.normal(size=(2, 2, c4, co4)) * 0.05,
                         jnp.float32)
        bias = jnp.asarray(rng.normal(size=(co4,)), jnp.float32)

        ref = jax.jit(
            lambda x, w, b: conv3x3_s2d_fused(x, w.astype(x.dtype), b,
                                              mode="relu", strip=16)
        )(x, w4, bias)
        t_ref = measure(
            lambda x, w, b: conv3x3_s2d_fused(x, w.astype(x.dtype), b,
                                              mode="relu", strip=16),
            x, w4, bias)
        print(f"\n{name}: whole-plane production kernel {t_ref:7.3f} ms",
              flush=True)

        for nb in blk_counts:
            try:
                got = jax.jit(
                    lambda x, w, b, nb=nb: conv3x3_rowblk(
                        x, w.astype(x.dtype), b, nb)
                )(x, w4, bias)
                err = float(jnp.max(jnp.abs(
                    got.astype(jnp.float32) - ref.astype(jnp.float32))))
                if err != 0.0:
                    print(f"  rowblk nb={nb}: WRONG (max err {err:.5f})",
                          flush=True)
                    continue
                t = measure(
                    lambda x, w, b, nb=nb: conv3x3_rowblk(
                        x, w.astype(x.dtype), b, nb),
                    x, w4, bias)
                print(f"  rowblk nb={nb} ({(n + 2) // nb} rows/blk): "
                      f"{t:7.3f} ms ({t_ref / t:5.2f}x)  [bit-identical]",
                      flush=True)
            except Exception as e:
                msg = str(e).split("\n")[0][:140]
                print(f"  rowblk nb={nb}: FAILED {type(e).__name__}: {msg}",
                      flush=True)


if __name__ == "__main__":
    main()
