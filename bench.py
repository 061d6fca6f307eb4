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

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json


def main() -> None:
    from depgan_tpu.benchmarks import gen_inference_bench

    print(json.dumps(gen_inference_bench()))


if __name__ == "__main__":
    main()
