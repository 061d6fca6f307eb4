"""Command-line interface.

The reference has no CLI — its scripts are edited in place then run
(SURVEY.md §1 L0). Here every workload is a subcommand with flags mapping
1:1 onto the reference's top-of-script constants:

    depgan train-gan      --manifest-dir train_data_server_fold --pm --nicg 1
    depgan train-gan      --folds-parallel   # all folds concurrently on a mesh
    depgan train-uresnet  --manifest-dir train_data_server_fold
    depgan test-gan       --weights 'models/netG_depgan_fold{fold}.h5'
    depgan test-uresnet   --weights 'models/trained_depuresnet_fold{fold}.h5'
    depgan import-weights --h5 netG.h5 --out vars.msgpack
    depgan bench          --what gen-inference|uresnet-inference|gan-step
"""

from __future__ import annotations

import argparse
import json
import sys

from .config import (
    DataConfig,
    EvalConfig,
    GanTrainConfig,
    ModelConfig,
    UResNetTrainConfig,
)


def _add_common(p: argparse.ArgumentParser, train_manifests: bool) -> None:
    default_dir = "train_data_server_fold" if train_manifests else "test_data_server_fold"
    p.add_argument("--manifest-dir", default=default_dir)
    p.add_argument("--folds", type=int, nargs="+", default=[1, 2, 3, 4])
    p.add_argument("--image-size", type=int, default=256)
    p.add_argument("--noise-size", type=int, default=32)
    p.add_argument("--first-fm", type=int, default=32)
    p.add_argument("--nicg", type=int, default=1, choices=(1, 2),
                   help="generator input channels: 1=map, 2=map+FLAIR")
    pm = p.add_mutually_exclusive_group()
    pm.add_argument("--pm", dest="pm", action="store_true", default=True,
                    help="probability maps (threshold 0.5, default)")
    pm.add_argument("--im", dest="pm", action="store_false",
                    help="irregularity maps (threshold 0.178)")
    p.add_argument("--use-pallas", action="store_true",
                   help="route fused blocks through Pallas kernels")
    p.add_argument("--bf16", action="store_true", help="bfloat16 conv trunk")


def _model_cfg(args, n_out=1, dropout="gan") -> ModelConfig:
    return ModelConfig(
        image_size=args.image_size,
        noise_size=args.noise_size,
        first_fm=args.first_fm,
        n_input_channels=args.nicg if n_out == 1 else 1,
        n_out=n_out,
        dropout_mode=dropout,
        compute_dtype="bfloat16" if args.bf16 else "float32",
        use_pallas=args.use_pallas,
    )


def _data_cfg(args) -> DataConfig:
    return DataConfig(
        manifest_dir=args.manifest_dir,
        image_size=args.image_size,
        n_input_channels=args.nicg,
        use_probability_map=args.pm,
    )


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(prog="depgan", description=__doc__)
    parser.add_argument(
        "--platform", choices=("cpu", "tpu"), default=None,
        help="pin the JAX backend. The session environment may preimport "
             "jax and register a remote TPU backend that ignores "
             "JAX_PLATFORMS; jax.config.update BEFORE first backend use "
             "(this flag) is what actually pins it.")
    sub = parser.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("train-gan", help="two-critic WGAN-GP training, 4-fold")
    _add_common(p, train_manifests=True)
    p.add_argument("--run-name", default="depgan_twoCritics")
    p.add_argument("--epochs", type=int, default=200)
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--d-iters", type=int, default=5)
    p.add_argument("--bn-mode", choices=("frozen", "batch"), default="frozen")
    p.add_argument("--threshold-mode", choices=("hard", "soft"), default="hard")
    p.add_argument("--checkpoint-every", type=int, default=100)
    p.add_argument("--reset-counters-per-fold", action="store_true")
    p.add_argument("--model-dir", default="models")
    p.add_argument("--log-dir", default="logdir")
    p.add_argument("--n-data", type=int, default=-1,
                   help="mesh data-parallel width (-1: all devices)")
    p.add_argument("--folds-parallel", action="store_true",
                   help="train all folds concurrently on a (fold, data) mesh "
                        "(one fold per device group)")

    p = sub.add_parser("train-uresnet", help="supervised 4-class training, 4-fold")
    _add_common(p, train_manifests=True)
    p.add_argument("--run-name", default="depuresnet_pNoises")
    p.add_argument("--epochs", type=int, default=200)
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--model-dir", default="models")
    p.add_argument("--log-dir", default="logs")
    p.add_argument("--n-data", type=int, default=-1)
    p.add_argument("--folds-parallel", action="store_true",
                   help="train all folds concurrently on a (fold, data) mesh "
                        "(one fold per device group)")

    p = sub.add_parser("test-gan", help="GAN inference + evaluation, 4-fold")
    _add_common(p, train_manifests=False)
    p.add_argument("--weights", required=True,
                   help="pattern with {fold}, e.g. models/netG_x_fold{fold}.h5")
    p.add_argument("--out-dir", default="outputs/depgan")
    p.add_argument("--n-repeat", type=int, default=10)
    p.add_argument("--fast", action="store_true",
                   help="FastGenerator inference (folded BN + fused Pallas "
                        "s2d kernels): ~2.4x the plain Flax module's "
                        "measured TPU throughput (docs/PERF.md headline "
                        "table), numerically ~1e-3 from it (bf16 trunk; "
                        "validated on chip by scripts/onchip_validate.py). "
                        "Default OFF = faithful plain-module numerics.")

    p = sub.add_parser("test-uresnet", help="UResNet inference + evaluation, 4-fold")
    _add_common(p, train_manifests=False)
    p.add_argument("--weights", required=True)
    p.add_argument("--out-dir", default="outputs/depuresnet")
    p.add_argument("--n-repeat", type=int, default=10)
    p.add_argument("--fast", action="store_true",
                   help="FastGenerator inference (softmax variant): ~2.4x "
                        "the plain module's measured TPU throughput, ~1e-3 "
                        "numeric delta. Default OFF = faithful numerics.")

    p = sub.add_parser("import-weights",
                       help="Keras .h5 -> Flax variables (optionally saved)")
    _add_common(p, train_manifests=False)
    p.add_argument("--h5", required=True)
    p.add_argument("--n-out", type=int, default=1)
    p.add_argument("--out", default=None,
                   help="write the imported variables as msgpack "
                        "(flax.serialization), e.g. vars.msgpack")

    p = sub.add_parser("bench", help="throughput benchmarks (one JSON line)")
    p.add_argument("--what",
                   choices=("gen-inference", "uresnet-inference", "gan-step"),
                   default="gen-inference")

    args = parser.parse_args(argv)

    if args.platform is not None:
        import jax

        jax.config.update("jax_platforms", args.platform)

    if args.cmd == "train-gan":
        from . import drivers
        from .parallel import make_mesh

        cfg = GanTrainConfig(
            batch_size=args.batch_size, n_epochs=args.epochs, d_iters=args.d_iters,
            bn_mode=args.bn_mode, threshold_mode=args.threshold_mode,
            checkpoint_every=args.checkpoint_every,
            reset_counters_per_fold=args.reset_counters_per_fold,
        )
        if args.folds_parallel:
            if not args.reset_counters_per_fold:
                # Fold-parallel scheduling necessarily runs every fold's
                # counters independently — the same semantics as
                # --reset-counters-per-fold, NOT the reference's faithful
                # global-counter quirk (reference :47-49; the sequential
                # default). Make the silent switch loud.
                print(
                    "train-gan: --folds-parallel trains folds concurrently, so "
                    "warm-up counters are per-fold (as if "
                    "--reset-counters-per-fold were set); the reference's "
                    "global-counter behaviour needs the sequential scheduler.",
                    file=sys.stderr,
                )
            mesh = make_mesh(n_data=args.n_data, n_fold=len(args.folds))
            drivers.run_gan_training_multifold(
                _model_cfg(args), cfg, _data_cfg(args), run_name=args.run_name,
                folds=tuple(args.folds), log_dir=args.log_dir,
                model_dir=args.model_dir, mesh=mesh,
            )
        else:
            mesh = make_mesh(n_data=args.n_data)
            drivers.run_gan_training(
                _model_cfg(args), cfg, _data_cfg(args), run_name=args.run_name,
                folds=tuple(args.folds), log_dir=args.log_dir,
                model_dir=args.model_dir, mesh=mesh,
            )
    elif args.cmd == "train-uresnet":
        from . import drivers
        from .parallel import make_mesh

        cfg = UResNetTrainConfig(batch_size=args.batch_size, n_epochs=args.epochs)
        if args.folds_parallel:
            mesh = make_mesh(n_data=args.n_data, n_fold=len(args.folds))
            drivers.run_uresnet_training_multifold(
                _model_cfg(args, n_out=4, dropout="uresnet"), cfg,
                _data_cfg(args), run_name=args.run_name,
                folds=tuple(args.folds), log_dir=args.log_dir,
                model_dir=args.model_dir, mesh=mesh,
            )
        else:
            mesh = make_mesh(n_data=args.n_data)
            drivers.run_uresnet_training(
                _model_cfg(args, n_out=4, dropout="uresnet"), cfg, _data_cfg(args),
                run_name=args.run_name, folds=tuple(args.folds),
                log_dir=args.log_dir, model_dir=args.model_dir, mesh=mesh,
            )
    elif args.cmd == "test-gan":
        from . import drivers
        from .eval.runner import run_gan_testing

        eval_cfg = EvalConfig(
            n_repeat=args.n_repeat, use_probability_map=args.pm,
            n_input_channels=args.nicg, output_dir=args.out_dir,
            fast=args.fast,
        )
        mc = _model_cfg(args)
        results = run_gan_testing(
            mc, _data_cfg(args), eval_cfg,
            drivers.generator_loader(mc, args.weights), folds=tuple(args.folds),
        )
        print(json.dumps({"subjects": len(results)}))
    elif args.cmd == "test-uresnet":
        from . import drivers
        from .eval.runner import run_uresnet_testing

        eval_cfg = EvalConfig(
            n_repeat=args.n_repeat, output_dir=args.out_dir, fast=args.fast,
        )
        mc = _model_cfg(args, n_out=4, dropout="uresnet")
        results = run_uresnet_testing(
            mc, _data_cfg(args), eval_cfg,
            drivers.generator_loader(mc, args.weights), folds=tuple(args.folds),
        )
        print(json.dumps({"subjects": len(results)}))
    elif args.cmd == "import-weights":
        import jax

        from .io import h5_import
        from .models import init_generator

        mc = _model_cfg(args, n_out=args.n_out,
                        dropout="gan" if args.n_out == 1 else "uresnet")
        _, variables = init_generator(mc, jax.random.key(0))
        variables = h5_import.import_keras_h5(args.h5, variables)
        if args.out:
            from flax import serialization

            with open(args.out, "wb") as f:
                f.write(serialization.to_bytes(variables))
        print(json.dumps({"status": "ok", "h5": args.h5, "out": args.out}))
    elif args.cmd == "bench":
        from . import benchmarks

        fn = {
            "gen-inference": benchmarks.gen_inference_bench,
            "uresnet-inference": benchmarks.uresnet_inference_bench,
            "gan-step": benchmarks.gan_step_bench,
        }[args.what]
        print(json.dumps(fn()))
    return 0


if __name__ == "__main__":
    sys.exit(main())
