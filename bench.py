"""Benchmark driver: generator inference throughput (256x256 slices/sec/chip).

Thin wrapper over depgan_tpu/benchmarks.py (also exposed as `depgan bench`).
Measures the flagship DEP-GAN generator forward (the reference's hot
inference path, `DEP-GAN_testing_4fold.py:616-628`) through the optimised
FastGenerator (folded BatchNorm, bfloat16 trunk, fused Pallas s2d kernels)
against the BASELINE.json north-star target of 5,000 slices/sec/chip.

Methodology: the iteration loop runs ON DEVICE via lax.scan with a
data-dependency chain and the result is fetched to host (the only operation
the remote runtime genuinely blocks on), so dispatch latency cannot fake
throughput. Single-dispatch overhead (~20 ms) is amortised over the scan.

Robustness: the remote TPU tunnel occasionally wedges a FRESH process
before its first jit (futex-wait forever, no error — docs/PERF.md /
CLAUDE.md; transient, a retried process works). The measurement therefore
runs in a child process with a deadline; on timeout the child is killed by
PID and retried. A healthy run is ~6-9 min (mostly one-time backend init),
so the 900 s deadline only fires on a genuine wedge.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

_CHILD_ENV = "DEPGAN_BENCH_CHILD"
_DEADLINE_S = 900
_ATTEMPTS = 3
_RETRY_WAIT_S = 60  # the wedge playbook: kill by PID, wait ~60 s, retry


def _run_child() -> None:
    from depgan_tpu.benchmarks import gen_inference_bench

    print(json.dumps(gen_inference_bench()), flush=True)


def main() -> None:
    if os.environ.get(_CHILD_ENV) == "1":
        _run_child()
        return

    env = dict(os.environ, **{_CHILD_ENV: "1"})
    last_err = ""
    for attempt in range(1, _ATTEMPTS + 1):
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__)],
                env=env, timeout=_DEADLINE_S,
                capture_output=True, text=True,
            )
        except subprocess.TimeoutExpired:
            last_err = f"attempt {attempt}: wedged (no result in {_DEADLINE_S}s)"
            print(last_err, file=sys.stderr, flush=True)
            if attempt < _ATTEMPTS:
                time.sleep(_RETRY_WAIT_S)
            continue
        # Forward the child's single JSON line (last stdout line).
        lines = [ln for ln in proc.stdout.splitlines() if ln.strip()]
        if proc.returncode == 0 and lines:
            print(lines[-1], flush=True)
            return
        last_err = (f"attempt {attempt}: exit={proc.returncode} "
                    f"stderr tail: {proc.stderr[-800:]}")
        print(last_err, file=sys.stderr, flush=True)
        if attempt < _ATTEMPTS:
            time.sleep(_RETRY_WAIT_S)
    raise SystemExit(f"bench failed after {_ATTEMPTS} attempts — {last_err}")


if __name__ == "__main__":
    main()
