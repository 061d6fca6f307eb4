"""Decompose the fused s2d conv kernel's wall time into its phases.

The level-1 conv measures ~1.06 ms at batch 64 vs a 0.70 ms MXU floor
(docs/PERF.md). This script times stripped-down variants of the SAME
kernel structure at the same shape so the 0.36 ms overhead can be
attributed to a phase instead of guessed at:

  full        staging + matmuls + epilogue (mirror of _kernel, relu)
  matmul_only u passed in pre-staged (no staging copies)
  stage_only  staging copies + one cheap store per strip (no matmuls)
  no_epi      staging + matmuls, raw store (no bias/relu, f32->bf16 only)
  store_f32   staging + matmuls + bias/relu, f32 store (no bf16 cast)

All variants keep the single-write-phase staging discipline (the round-2
WAR-hazard rule: every scratch region written exactly once). Timings use
the scan-chain methodology (docs/PERF.md remote-backend rules).

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


def _stage(u, x, n, c, r0, r1):
    for p in range(2):
        for q in range(2):
            src = (1 - p) * 2 + (1 - q)
            dst = p * 2 + q
            u[r0:r1, :, dst * c : (dst + 1) * c] = x[
                p + r0 : p + r1, q : q + n + 1, src * c : (src + 1) * c
            ]


def k_full(x_ref, w_ref, b_ref, o_ref, u, *, n, c4, co4, strip, epi):
    x = x_ref[0]
    c = c4 // 4
    _stage(u, x, n, c, 0, n + 1)
    bias = b_ref[0]
    for s_i in range(n // strip):
        j0 = s_i * strip
        acc = jnp.zeros((strip * n, co4), jnp.float32)
        for A in range(2):
            for Bs in range(2):
                v = u[j0 + A : j0 + A + strip, Bs : Bs + n, :].reshape(
                    strip * n, c4)
                acc = acc + jnp.dot(v, w_ref[A * 2 + Bs],
                                    preferred_element_type=jnp.float32)
        if epi == "relu":
            y = jnp.maximum(acc + bias[None, :], 0.0)
        elif epi == "bias":
            y = acc + bias[None, :]
        else:
            y = acc
        o_ref[0, j0 + 1 : j0 + 1 + strip, 1 : 1 + n, :] = y.reshape(
            strip, n, co4).astype(o_ref.dtype)


def k_matmul_only(u_ref, w_ref, b_ref, o_ref, *, n, c4, co4, strip):
    u = u_ref[0]
    bias = b_ref[0]
    for s_i in range(n // strip):
        j0 = s_i * strip
        acc = jnp.zeros((strip * n, co4), jnp.float32)
        for A in range(2):
            for Bs in range(2):
                v = u[j0 + A : j0 + A + strip, Bs : Bs + n, :].reshape(
                    strip * n, c4)
                acc = acc + jnp.dot(v, w_ref[A * 2 + Bs],
                                    preferred_element_type=jnp.float32)
        y = jnp.maximum(acc + bias[None, :], 0.0)
        o_ref[0, j0 + 1 : j0 + 1 + strip, 1 : 1 + n, :] = y.reshape(
            strip, n, co4).astype(o_ref.dtype)


def k_stage_only(x_ref, w_ref, b_ref, o_ref, u, *, n, c4, co4, strip):
    x = x_ref[0]
    c = c4 // 4
    _stage(u, x, n, c, 0, n + 1)
    for s_i in range(n // strip):
        j0 = s_i * strip
        # one cheap dependent store per strip so staging cannot be DCE'd
        o_ref[0, j0 + 1 : j0 + 1 + strip, 1 : 1 + n, :] = (
            u[j0 : j0 + strip, 0:n, :co4] + u[j0 + 1 : j0 + 1 + strip,
                                              1 : 1 + n, :co4]
        ).astype(o_ref.dtype)


def run_variant(name, kernel, args_builder, scratch):
    p_dim = N + 2
    x, w, b = args_builder()

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
    print(f"{name:28s} {ms:7.3f} ms", flush=True)
    return ms


def main():
    float(jax.jit(lambda v: (v @ v).sum())(jnp.ones((128, 128))))
    print(f"backend: {jax.default_backend()}  batch={B}  shape n={N} "
          f"c4={C4}->co4={CO4} strip={STRIP}", flush=True)
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

    u_scr = [pltpu.VMEM((N + 1, N + 1, C4), jnp.bfloat16)]
    mxu_ms = 2 * B * N * N * 4 * C4 * CO4 / 175e9
    print(f"mxu floor {mxu_ms:.3f} ms   hbm floor "
          f"{B * (p_dim * p_dim * (C4 + CO4) * 2) / 819e6:.3f} ms",
          flush=True)
    run_variant("full (stage+mm+bias/relu)",
                partial(k_full, n=N, c4=C4, co4=CO4, strip=STRIP, epi="relu"),
                x_args, u_scr)
    run_variant("no_epi (stage+mm)",
                partial(k_full, n=N, c4=C4, co4=CO4, strip=STRIP, epi="none"),
                x_args, u_scr)
    run_variant("bias only (stage+mm+bias)",
                partial(k_full, n=N, c4=C4, co4=CO4, strip=STRIP, epi="bias"),
                x_args, u_scr)
    run_variant("matmul_only (pre-staged u)",
                partial(k_matmul_only, n=N, c4=C4, co4=CO4, strip=STRIP),
                u_args, [])
    run_variant("stage_only",
                partial(k_stage_only, n=N, c4=C4, co4=CO4, strip=STRIP),
                x_args, u_scr)


if __name__ == "__main__":
    main()
