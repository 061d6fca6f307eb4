"""One-process on-chip session: validation + every profile, one backend init.

Each fresh process on the axon backend pays ~200-250 s of init before its
first jit (docs/PERF.md), so after a kernel-change batch the full measure
loop (validate -> micro -> critic -> superstep -> inference A/B) is run in
ONE process. onchip_validate gates the rest: if any kernel fails its
XLA-twin check, the profiles are meaningless and are skipped.

Run (real TPU): python scripts/onchip_session.py [phases]
  phases: comma list of {validate,micro,critic,critic_roofline,superstep,
  ab,roofline,anatomy}; default all of those. Opt-in-only extras (request
  explicitly): chain (the whole-site chained-kernel A/B probe),
  rowblk (the row-blocked-output conv pipeline probe),
  packed_tap (the pixel-domain boundary-op probe), ablation
  (TRUE in-graph per-stage forward costs by end-to-end differencing),
  anchor (scripts/fold_anchor.py, the measured GAN training-wall anchor),
  uresnet_anchor (the supervised epoch wall) and bench (the BENCH
  headline inference number).
"""
from __future__ import annotations

import sys
import time
import traceback

sys.path.insert(0, ".")

PHASES = ("validate", "micro", "critic", "critic_roofline", "superstep",
          "ab", "roofline", "anatomy")
# Extra phases not in the default sweep (request explicitly):
#   anchor — scripts/fold_anchor.py, the measured 4-fold wall-clock anchor;
#   bench  — the BENCH headline (depgan_tpu.benchmarks.gen_inference_bench).


def run_phase(name, fn, retries: int = 1):
    """Run one phase; on a TRANSPORT failure (the axon tunnel's transient
    'remote_compile: read body' / connection drops — round 5 saw two, ~40
    min apart) retry the whole phase in-process: already-compiled graphs
    are cached, so the re-run skips straight to the failed call."""
    print(f"\n===== {name} =====", flush=True)
    t0 = time.time()
    ok = False
    for attempt in range(retries + 1):
        try:
            fn()
            ok = True
        except SystemExit as e:  # onchip_validate exits nonzero on failures
            ok = (e.code or 0) == 0
        except Exception as e:
            traceback.print_exc()
            transient = "remote_compile" in str(e) or "read body" in str(e)
            if transient and attempt < retries:
                print(f"----- {name}: transient transport error, retrying "
                      f"({attempt + 1}/{retries}) after 60 s -----",
                      flush=True)
                time.sleep(60)
                continue
            ok = False
        break
    print(f"===== {name}: {'ok' if ok else 'FAILED'} "
          f"({time.time() - t0:.0f}s) =====", flush=True)
    return ok


def main():
    want = sys.argv[1].split(",") if len(sys.argv) > 1 else PHASES
    sys.argv = sys.argv[:1]  # sub-scripts parse argv (batch size etc.)

    import onchip_validate

    if "validate" in want:
        if not run_phase("validate", onchip_validate.main):
            print("validation failed — skipping profiles", flush=True)
            sys.exit(1)

    if "micro" in want:
        import kernel_micro

        run_phase("kernel_micro", kernel_micro.main)
    if "critic" in want:
        import critic_profile

        run_phase("critic_profile", critic_profile.main)
    if "critic_roofline" in want:
        import critic_roofline

        run_phase("critic_roofline", critic_roofline.main)
    if "superstep" in want:
        import superstep_profile

        run_phase("superstep_profile", superstep_profile.main)
    if "ab" in want:
        import ab_inference

        run_phase("ab_inference", ab_inference.main)
    if "roofline" in want:
        import roofline

        run_phase("roofline", roofline.main)
    if "anatomy" in want:
        import kernel_anatomy

        run_phase("kernel_anatomy", kernel_anatomy.main)
    if "packed_tap" in want:
        import packed_tap_probe

        run_phase("packed_tap", packed_tap_probe.main)
    if "rowblk" in want:
        import rowblk_probe

        run_phase("rowblk", rowblk_probe.main)
    if "chain" in want:
        import chain_probe

        run_phase("chain", chain_probe.main)
    if "trajectory" in want:
        import onchip_validate as ov

        def _traj():
            del ov.FAILS[:]
            float(__import__("jax").jit(lambda v: (v @ v).sum())(
                __import__("jax.numpy", fromlist=["ones"]).ones((128, 128))))
            ov.check_superstep_trajectory()
            if ov.FAILS:
                raise SystemExit(1)

        run_phase("trajectory", _traj)
    if "ablation" in want:
        import ablation_forward

        run_phase("ablation", ablation_forward.main)
    if "anchor" in want:
        import fold_anchor

        run_phase("anchor", fold_anchor.main)
    if "uresnet_anchor" in want:
        import uresnet_anchor

        run_phase("uresnet_anchor", uresnet_anchor.main)
    if "bench" in want:
        import json

        from depgan_tpu.benchmarks import gen_inference_bench

        run_phase("bench", lambda: print(json.dumps(gen_inference_bench()),
                                         flush=True))
    if "bench_uresnet" in want:
        import json

        from depgan_tpu.benchmarks import uresnet_inference_bench

        run_phase("bench_uresnet",
                  lambda: print(json.dumps(uresnet_inference_bench()),
                                flush=True))


if __name__ == "__main__":
    sys.path.insert(0, "scripts")
    main()
