"""Decompose the fused s2d conv kernel's wall time into its phases.

Round-3's version measured each phase variant as a separate pallas_call
and was swamped: isolated stage_only + matmul_only BOTH measured ~4.3 ms
(>> full), i.e. per-measurement overhead dominated (docs/PERF.md). This
version uses the on-device loop harness VERDICT r3 item 4 asked for:
every variant kernel REPEATS its phase ``reps`` times inside ONE
pallas_call (rep r stages into its own scratch slab — the write-once
staging discipline of the round-2 WAR-hazard rule holds per slab), and
each phase cost is the REPS-DIFFERENCED marginal

    phase_ms = (t(reps=5) - t(reps=1)) / 4

which cancels the pallas_call launch, the scan-chain carry traffic, and
the HBM block in/out — everything batch- and rep-independent — so the
attribution resolves well below 1 ms.

Variants at the level-1 production shape (n=128, c4=co4=128, strip 16):

  full        staging + 4-tap matmuls + bias/relu + store, per rep
  no_epi      staging + matmuls + raw store (no bias/relu)
  matmul_only pre-staged u input; matmuls + store, per rep
  stage_only  staging copies + one cheap store per rep

epilogue = marg(full) - marg(no_epi); check: marg(stage_only) +
marg(matmul_only) should land near marg(full).

Run (real TPU): python scripts/kernel_anatomy.py [batch]
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

B = int(sys.argv[1]) if len(sys.argv) > 1 else 64
N, C4, CO4, STRIP = 128, 128, 128, 16
N_SCAN = 16
REPS = (1, 5)


def _stage(u, r, x, n, c):
    """The production kernel's group-relabeling staging copies (shifted
    rep of the plane) into slab ``r`` — 4 disjoint-region writes, each
    region written exactly once (ops/conv_s2d_pallas.py::_kernel
    discipline, held per slab)."""
    for p in range(2):
        for q in range(2):
            src = (1 - p) * 2 + (1 - q)
            dst = p * 2 + q
            u[r, 0 : n + 1, :, dst * c : (dst + 1) * c] = x[
                p : p + n + 1, q : q + n + 1, src * c : (src + 1) * c
            ]


def _matmuls(read_tap, w_ref, bias, o_ref, n, c4, co4, strip, epi):
    for s_i in range(n // strip):
        j0 = s_i * strip
        acc = jnp.zeros((strip * n, co4), jnp.float32)
        for A in range(2):
            for Bs in range(2):
                v = read_tap(j0 + A, Bs).reshape(strip * n, c4)
                acc = acc + jnp.dot(v, w_ref[A * 2 + Bs],
                                    preferred_element_type=jnp.float32)
        if epi == "relu":
            y = jnp.maximum(acc + bias[None, :], 0.0)
        else:
            y = acc
        o_ref[0, j0 + 1 : j0 + 1 + strip, 1 : 1 + n, :] = y.reshape(
            strip, n, co4).astype(o_ref.dtype)


def k_full(x_ref, w_ref, b_ref, o_ref, u, *, n, c4, co4, strip, epi, reps):
    x = x_ref[0]
    c = c4 // 4
    bias = b_ref[0]
    for r in range(reps):
        _stage(u, r, x, n, c)
        read = lambda j, q, r=r: u[r, j : j + strip, q : q + n, :]
        _matmuls(read, w_ref, bias, o_ref, n, c4, co4, strip, epi)


def k_matmul_only(u_ref, w_ref, b_ref, o_ref, *, n, c4, co4, strip, reps):
    bias = b_ref[0]
    for _ in range(reps):
        read = lambda j, q: u_ref[0, j : j + strip, q : q + n, :]
        _matmuls(read, w_ref, bias, o_ref, n, c4, co4, strip, "relu")


def k_stage_only(x_ref, w_ref, b_ref, o_ref, u, *, n, c4, co4, strip, reps):
    x = x_ref[0]
    c = c4 // 4
    for r in range(reps):
        _stage(u, r, x, n, c)
        # one cheap dependent store per rep so staging cannot be DCE'd
        o_ref[0, 1 : 1 + strip, 1 : 1 + n, :] = (
            u[r, 0:strip, 0:n, :co4] + u[r, 1 : 1 + strip, 1 : 1 + n, :co4]
        ).astype(o_ref.dtype)


def run_variant(name, kernel, args_builder, n_slabs):
    p_dim = N + 2
    x, w, b = args_builder()
    scratch = ([pltpu.VMEM((n_slabs, N + 1, N + 1, C4), jnp.bfloat16)]
               if n_slabs else [])

    def call(x, w, b):
        in_specs = [
            pl.BlockSpec((1,) + x.shape[1:], lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(w.shape, lambda i: (0,) * w.ndim,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, CO4), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ]
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((B, p_dim, p_dim, CO4),
                                           jnp.bfloat16),
            grid=(B,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((1, p_dim, p_dim, CO4),
                                   lambda i: (i, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=scratch,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(x, w, b)

    @jax.jit
    def run(x, w, b):
        def body(carry, _):
            out = call(carry, w, b)
            return carry + 1e-30 * jnp.sum(out).astype(carry.dtype), ()

        c, _ = jax.lax.scan(body, x, None, length=N_SCAN)
        return jnp.sum(c.astype(jnp.float32))

    float(run(x, w, b))
    reps = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(run(x, w, b))
        reps.append(time.perf_counter() - t0)
    ms = min(reps) / N_SCAN * 1e3
    print(f"  {name:36s} {ms:7.3f} ms", flush=True)
    return ms


def measure_marginal(label, make_kernel, args_builder, slabs_scale):
    """t at reps=1 and reps=REPS[1]; marginal per rep by differencing."""
    ts = {}
    for r in REPS:
        ts[r] = run_variant(f"{label} reps={r}", make_kernel(r),
                            args_builder, slabs_scale * r)
    marg = (ts[REPS[1]] - ts[REPS[0]]) / (REPS[1] - REPS[0])
    print(f"{label:30s} marginal {marg:7.3f} ms/rep  "
          f"(fixed {ts[1] - marg:7.3f})", flush=True)
    return marg, ts[1]


def main():
    float(jax.jit(lambda v: (v @ v).sum())(jnp.ones((128, 128))))
    print(f"backend: {jax.default_backend()}  batch={B}  shape n={N} "
          f"c4={C4}->co4={CO4} strip={STRIP}  reps={REPS}", flush=True)
    p_dim = N + 2
    ks = jax.random.split(jax.random.key(0), 3)

    def x_args():
        x = jax.random.normal(ks[0], (B, p_dim, p_dim, C4), jnp.bfloat16)
        w = jax.random.normal(ks[1], (4, C4, CO4), jnp.bfloat16) * 0.05
        b = jax.random.normal(ks[2], (1, CO4), jnp.float32)
        return x, w, b

    def u_args():
        u = jax.random.normal(ks[0], (B, N + 1, N + 1, C4), jnp.bfloat16)
        w = jax.random.normal(ks[1], (4, C4, CO4), jnp.bfloat16) * 0.05
        b = jax.random.normal(ks[2], (1, CO4), jnp.float32)
        return u, w, b

    mxu_ms = 2 * B * N * N * 4 * C4 * CO4 / 175e9
    print(f"mxu floor {mxu_ms:.3f} ms   hbm floor "
          f"{B * (p_dim * p_dim * (C4 + CO4) * 2) / 819e6:.3f} ms",
          flush=True)

    m_full, t1_full = measure_marginal(
        "full (stage+mm+bias/relu)",
        lambda r: partial(k_full, n=N, c4=C4, co4=CO4, strip=STRIP,
                          epi="relu", reps=r),
        x_args, 1)
    m_noepi, _ = measure_marginal(
        "no_epi (stage+mm+raw store)",
        lambda r: partial(k_full, n=N, c4=C4, co4=CO4, strip=STRIP,
                          epi="none", reps=r),
        x_args, 1)
    m_mm, _ = measure_marginal(
        "matmul_only (pre-staged u)",
        lambda r: partial(k_matmul_only, n=N, c4=C4, co4=CO4, strip=STRIP,
                          reps=r),
        u_args, 0)
    m_st, _ = measure_marginal(
        "stage_only",
        lambda r: partial(k_stage_only, n=N, c4=C4, co4=CO4, strip=STRIP,
                          reps=r),
        x_args, 1)

    print("-" * 64, flush=True)
    print(f"PHASE TABLE (marginal ms/rep): staging {m_st:.3f}  "
          f"matmul+store {m_mm:.3f}  epilogue {m_full - m_noepi:.3f}  "
          f"| full {m_full:.3f}  (stage+matmul sum {m_st + m_mm:.3f})",
          flush=True)
    print(f"fixed per-call (t(full,reps=1) - marginal): "
          f"{t1_full - m_full:.3f} ms", flush=True)


if __name__ == "__main__":
    main()
