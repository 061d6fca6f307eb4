"""Data-parallel scaling overhead of the GAN superstep on a virtual mesh.

The real deployment axis is data-parallel over ICI (SURVEY.md §2.7); this
host has ONE physical chip, so absolute multi-chip speed cannot be
measured. What CAN be measured is the *overhead structure* of the sharded
program: run the identical global-batch superstep at n_data = 1, 2, 4, 8
on a virtual CPU mesh and compare wall time against the ideal 1/n_data
compute scaling. The virtual devices share one host's cores, so ideal
scaling here is FLAT wall time (same total compute, same cores); measured
deviation from flat = partitioning + collective overhead XLA inserts for
the psum/all-gather pattern — the part of the multi-chip story that is
not pure arithmetic.

Run: JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
     python scripts/dp_overhead.py
(or let it re-exec itself, same trick as __graft_entry__.dryrun_multichip)
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_DEVICES = 8
GLOBAL_BATCH = 16
IMG = 64  # keep CPU compile time sane; overhead structure is shape-generic


def main():
    import jax

    if len(jax.devices()) < N_DEVICES or jax.default_backend() != "cpu":
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        flags = " ".join(
            f for f in env.get("XLA_FLAGS", "").split()
            if "xla_force_host_platform_device_count" not in f
        )
        env["XLA_FLAGS"] = (
            f"{flags} --xla_force_host_platform_device_count={N_DEVICES}".strip()
        )
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        code = (
            "import sys; sys.path.insert(0, {r!r}); "
            "import jax; jax.config.update('jax_platforms', 'cpu'); "
            "g = {{'__name__': '__main__', '__file__': {f!r}}}; "
            "exec(open({f!r}).read(), g)"
        ).format(r=repo, f=os.path.abspath(__file__))
        raise SystemExit(
            subprocess.run([sys.executable, "-c", code], env=env, cwd=repo
                           ).returncode)

    import jax.numpy as jnp
    import numpy as np

    from depgan_tpu.config import DataConfig, GanTrainConfig, ModelConfig
    from depgan_tpu.parallel import mesh as meshlib
    from depgan_tpu.train import GanTrainer

    print(f"backend: {jax.default_backend()}, {len(jax.devices())} devices",
          flush=True)
    rng = np.random.default_rng(0)
    n = 4 * GLOBAL_BATCH
    x = rng.uniform(0, 1, (n, IMG, IMG, 1)).astype(np.float32)
    y = rng.uniform(0, 1, (n, IMG, IMG, 1)).astype(np.float32)
    idx = np.arange(2 * GLOBAL_BATCH, dtype=np.int32).reshape(2, GLOBAL_BATCH)

    results = {}
    for n_data in (1, 2, 4, 8):
        mesh = meshlib.make_mesh(n_data=n_data,
                                 devices=jax.devices()[:n_data])
        mcfg = ModelConfig(image_size=IMG, first_fm=32, n_input_channels=1)
        tcfg = GanTrainConfig(batch_size=GLOBAL_BATCH, d_iters=2,
                              warmup_d_iters=2, k_noise=2,
                              validate_every=10_000)
        tr = GanTrainer(mcfg, tcfg, DataConfig(), mesh=mesh)
        state = tr.init_state(jax.random.key(0))
        x_all = meshlib.put_replicated(jnp.asarray(x), mesh)
        y_all = meshlib.put_replicated(jnp.asarray(y), mesh)

        def run(s, key):
            s, m = tr.superstep(s, x_all, y_all, idx, 2, key)
            float(jnp.asarray(m["gen"]["errG"]))
            return s

        state = run(state, jax.random.key(1))  # compile
        reps = []
        for i in range(3):
            t0 = time.perf_counter()
            state = run(state, jax.random.key(2 + i))
            reps.append(time.perf_counter() - t0)
        ms = min(reps) * 1e3
        results[n_data] = ms
        print(f"n_data={n_data}: {ms:8.1f} ms/superstep "
              f"(global batch {GLOBAL_BATCH})", flush=True)

    base = results[1]
    print(json.dumps({
        "metric": "dp_superstep_overhead",
        "unit": "ms (virtual CPU mesh, flat=ideal)",
        "ms_per_ndata": results,
        "overhead_vs_1dev": {k: round(v / base, 3) for k, v in results.items()},
    }), flush=True)


if __name__ == "__main__":
    main()
