"""4-fold workload drivers: the framework-level equivalents of the
reference's four top-level scripts.

- :func:`run_gan_training`  == DEP-GAN_PROB_IM_twoCritics_training_4fold.py
- :func:`run_uresnet_training` == DEP-UResNet-wNoises-training-4fold.py
- eval/runner.py provides the two testing drivers.

Folds run sequentially by default (reference `for fold in [1,2,3,4]`,
`...twoCritics_training_4fold.py:506`); on a multi-chip mesh they can also
run concurrently, one fold per device group (parallel/mesh.py fold axis).
"""

from __future__ import annotations

from pathlib import Path

import jax

from .config import (
    DataConfig,
    GanTrainConfig,
    ModelConfig,
    UResNetTrainConfig,
)
from .data import dataset
from .data.dataset import train_val_split
from .io import h5_import
from .io.checkpoint import CheckpointManager, export_generator_h5, export_uresnet_h5
from .models import init_generator
from .train import Counters, GanTrainer, UResNetTrainer
from .utils.logging import Logger, LossHistory, NullLogger


def run_gan_training(
    model_cfg: ModelConfig,
    train_cfg: GanTrainConfig,
    data_cfg: DataConfig,
    run_name: str = "depgan",
    folds=(1, 2, 3, 4),
    log_dir: str = "logdir",
    model_dir: str = "models",
    mesh=None,
    use_tensorboard: bool = True,
    resume: bool = True,
):
    """Train the two-critic WGAN-GP on each fold (reference :506-894).

    ``resume=True`` restores the latest orbax checkpoint (full G + critics +
    Adam + counters) if one exists — the reference has no resume path at
    all (SURVEY.md §5)."""
    trainer = GanTrainer(model_cfg, train_cfg, data_cfg, mesh=mesh)
    counters = Counters()
    Path(model_dir).mkdir(parents=True, exist_ok=True)
    states = {}

    for fold in folds:
        # Faithful quirk: counters persist across folds unless configured
        # (reference :47-49,:506).
        if train_cfg.reset_counters_per_fold:
            counters = Counters()
        logger = (
            Logger(Path(log_dir) / f"{run_name}_fold{fold}")
            if use_tensorboard
            else NullLogger()
        )
        x, y = dataset.load_gan_training_fold(data_cfg, fold)
        x_tr, x_val, y_tr, y_val = train_val_split(
            x, y, data_cfg.val_fraction, data_cfg.split_seed
        )
        state = trainer.init_state(jax.random.key(train_cfg.seed + fold))
        ckpt = CheckpointManager(Path(model_dir) / f"{run_name}_fold{fold}")
        if resume and ckpt.latest_step() is not None:
            state, counters, _ = ckpt.restore(state)
            print(f"resumed fold {fold} at gen_iteration {counters.gen_iterations}")
        # Initial validation images (reference :772-773, [:50]).
        k_img = train_cfg.n_val_images
        logger.log_images("val_img_Y1_IM", x_val[:k_img, ..., 0], counters.gen_iterations)
        logger.log_images("val_img_Y2_IM", y_val[:k_img], counters.gen_iterations)

        h5_path = Path(model_dir) / f"netG_{run_name}_fold{fold}.h5"

        def checkpoint_fn(s, c):
            ckpt.save(c.gen_iterations, s, c)
            export_generator_h5(s, h5_path)

        state, counters = trainer.fit_fold(
            state, counters, x_tr, y_tr, x_val, y_val,
            logger=logger, checkpoint_fn=checkpoint_fn, fold=fold,
        )
        ckpt.save(counters.gen_iterations, state, counters)
        export_generator_h5(state, h5_path)
        ckpt.close()
        logger.close()
        states[fold] = state
    return states


def run_gan_training_multifold(
    model_cfg: ModelConfig,
    train_cfg: GanTrainConfig,
    data_cfg: DataConfig,
    run_name: str = "depgan",
    folds=(1, 2, 3, 4),
    log_dir: str = "logdir",
    model_dir: str = "models",
    mesh=None,
    use_tensorboard: bool = True,
    resume: bool = True,
):
    """Train ALL folds concurrently on a (fold, data) mesh — the folds share
    nothing (reference runs them sequentially, :506), so they map onto
    disjoint device groups in the wall-clock of one (train/multi_fold.py).

    Validation streams (`fold{k}/val_D_*`, val images) run per fold at the
    sequential trainer's cadence (reference :842-865), and ``resume=True``
    restores the latest stacked-state checkpoint — same contract as
    :func:`run_gan_training`.

    Scheduling note: counters are per-fold-synchronous (every fold follows
    the fold-1 warm-up schedule), equivalent to
    ``reset_counters_per_fold=True``.
    """
    from .parallel import make_mesh
    from .train.multi_fold import MultiFoldGanTrainer, unstack_state

    if mesh is None:
        mesh = make_mesh(n_fold=len(folds))
    trainer = MultiFoldGanTrainer(model_cfg, train_cfg, data_cfg, mesh)
    Path(model_dir).mkdir(parents=True, exist_ok=True)

    per_fold, per_fold_val = [], []
    for fold in folds:
        x, y = dataset.load_gan_training_fold(data_cfg, fold)
        x_tr, x_val, y_tr, y_val = train_val_split(
            x, y, data_cfg.val_fraction, data_cfg.split_seed
        )
        per_fold.append((x_tr, y_tr))
        per_fold_val.append((x_val, y_val))

    logger = (
        Logger(Path(log_dir) / f"{run_name}_allfolds")
        if use_tensorboard
        else NullLogger()
    )
    states = trainer.init_states(jax.random.key(train_cfg.seed))
    ckpt = CheckpointManager(Path(model_dir) / f"{run_name}_allfolds")
    counters = None
    if resume and ckpt.latest_step() is not None:
        states, counters, _ = ckpt.restore(states)
        print(
            f"resumed all-folds training at gen_iteration "
            f"{counters.gen_iterations}"
        )
    # Initial validation images per fold (reference :772-773, [:50]).
    k_img = train_cfg.n_val_images
    for i, fold in enumerate(folds):
        x_val, y_val = per_fold_val[i]
        step0 = counters.gen_iterations if counters is not None else 0
        logger.log_images(f"fold{fold}/val_img_Y1_IM", x_val[:k_img, ..., 0], step0)
        logger.log_images(f"fold{fold}/val_img_Y2_IM", y_val[:k_img], step0)

    def checkpoint_fn(s, c):
        ckpt.save(c.gen_iterations, s, c)

    states, counters = trainer.fit(
        states, per_fold, per_fold_val=per_fold_val, logger=logger,
        checkpoint_fn=checkpoint_fn, counters=counters, fold_ids=folds,
    )
    ckpt.save(counters.gen_iterations, states, counters)
    ckpt.close()
    logger.close()

    out = {}
    for i, fold in enumerate(folds):
        state = unstack_state(states, i)
        export_generator_h5(state, Path(model_dir) / f"netG_{run_name}_fold{fold}.h5")
        out[fold] = state
    return out


def run_uresnet_training(
    model_cfg: ModelConfig,
    train_cfg: UResNetTrainConfig,
    data_cfg: DataConfig,
    run_name: str = "depuresnet",
    folds=(1, 2, 3, 4),
    log_dir: str = "logs",
    model_dir: str = "models",
    mesh=None,
):
    """Supervised 4-class trainer per fold
    (DEP-UResNet-wNoises-training-4fold.py:434-626)."""
    from .config import save_config

    trainer = UResNetTrainer(model_cfg, train_cfg, mesh=mesh)
    Path(model_dir).mkdir(parents=True, exist_ok=True)
    states = {}
    for fold in folds:
        name = f"{run_name}_fold{fold}"
        # Architecture description alongside the weights (the reference
        # writes model.to_json() per epoch,
        # DEP-UResNet-wNoises-training-4fold.py:623-625).
        save_config(model_cfg, Path(model_dir) / f"model_{name}.json")
        x, y = dataset.load_uresnet_training_fold(data_cfg, fold)
        x_tr, x_val, y_tr, y_val = train_val_split(
            x, y, data_cfg.val_fraction, data_cfg.split_seed
        )
        state = trainer.init_state(jax.random.key(train_cfg.seed + fold))
        ckpt = CheckpointManager(Path(model_dir) / name)
        h5_path = Path(model_dir) / f"trained_{name}.h5"

        def checkpoint_fn(s, epoch):
            ckpt.save(epoch, s)
            export_uresnet_h5(s, h5_path)

        state = trainer.fit(
            state, x_tr, y_tr, x_val, y_val,
            loss_history=LossHistory(Path(log_dir) / f"loss_{name}.txt"),
            val_loss_history=LossHistory(Path(log_dir) / f"val_loss_{name}.txt"),
            checkpoint_fn=checkpoint_fn,
        )
        ckpt.close()
        states[fold] = state
    return states


def run_uresnet_training_multifold(
    model_cfg: ModelConfig,
    train_cfg: UResNetTrainConfig,
    data_cfg: DataConfig,
    run_name: str = "depuresnet",
    folds=(1, 2, 3, 4),
    log_dir: str = "logs",
    model_dir: str = "models",
    mesh=None,
):
    """All UResNet folds concurrently on the mesh's fold axis — the
    reference's 4-fold supervised workload
    (`DEP-UResNet-wNoises-training-4fold.py:434-626`) is embarrassingly
    parallel like the GAN folds. Writes the sequential driver's exact
    artifact set per fold: model_*.json, loss_*.txt / val_loss_*.txt
    histories and the trained_*.h5 export."""
    from .config import save_config
    from .parallel import make_mesh
    from .train.multi_fold import MultiFoldUResNetTrainer, unstack_state

    if mesh is None:
        mesh = make_mesh(n_fold=len(folds))
    trainer = MultiFoldUResNetTrainer(model_cfg, train_cfg, mesh)
    Path(model_dir).mkdir(parents=True, exist_ok=True)
    Path(log_dir).mkdir(parents=True, exist_ok=True)

    per_fold, per_fold_val, loss_hist, val_hist = [], [], [], []
    for fold in folds:
        name = f"{run_name}_fold{fold}"
        save_config(model_cfg, Path(model_dir) / f"model_{name}.json")
        x, y = dataset.load_uresnet_training_fold(data_cfg, fold)
        x_tr, x_val, y_tr, y_val = train_val_split(
            x, y, data_cfg.val_fraction, data_cfg.split_seed
        )
        per_fold.append((x_tr, y_tr))
        per_fold_val.append((x_val, y_val))
        loss_hist.append(LossHistory(Path(log_dir) / f"loss_{name}.txt"))
        val_hist.append(LossHistory(Path(log_dir) / f"val_loss_{name}.txt"))

    states = trainer.init_states(folds)
    ckpt = CheckpointManager(Path(model_dir) / f"{run_name}_allfolds")

    def checkpoint_fn(s, epoch):
        ckpt.save(epoch, s)

    states = trainer.fit(
        states, per_fold, per_fold_val, loss_histories=loss_hist,
        val_loss_histories=val_hist, checkpoint_fn=checkpoint_fn,
        fold_ids=folds,
    )
    ckpt.close()

    out = {}
    for i, fold in enumerate(folds):
        state = unstack_state(states, i)
        export_uresnet_h5(
            state, Path(model_dir) / f"trained_{run_name}_fold{fold}.h5")
        out[fold] = state
    return out


def generator_loader(model_cfg: ModelConfig, weights_pattern: str):
    """``weights_for_fold`` factory for eval/runner.py: builds the generator
    and imports ``weights_pattern.format(fold=k)`` (a Keras .h5 or an orbax
    dir) — the reference's build + load_weights step
    (`DEP-GAN_testing_4fold.py:380-384`)."""

    def weights_for_fold(fold: int):
        model, variables = init_generator(model_cfg, jax.random.key(0))
        path = Path(weights_pattern.format(fold=fold))
        if path.is_file() and path.suffix == ".h5":
            variables = h5_import.import_keras_h5(str(path), variables)
        elif path.is_dir():
            from flax import traverse_util
            from flax.core import unfreeze

            from .io.checkpoint import load_generator_variables

            loaded = load_generator_variables(path)
            # Restore by flattened path onto the built tree's structure
            # (orbax returns plain dicts; the built tree may be frozen) —
            # shape agreement is checked leaf by leaf.
            out = {}
            for coll in ("params", "batch_stats"):
                t_flat = traverse_util.flatten_dict(
                    unfreeze(variables[coll]))
                l_flat = traverse_util.flatten_dict(loaded[coll])
                missing = set(t_flat) - set(l_flat)
                if missing:
                    raise ValueError(
                        f"checkpoint {path} lacks {coll} entries: "
                        f"{sorted('/'.join(k) for k in missing)[:5]}")
                out[coll] = traverse_util.unflatten_dict({
                    k: jax.numpy.asarray(l_flat[k], t.dtype).reshape(t.shape)
                    for k, t in t_flat.items()
                })
            variables = out
        elif not path.exists():
            raise FileNotFoundError(
                f"no weights for fold {fold}: {path} "
                f"(from pattern '{weights_pattern}')"
            )
        else:
            raise ValueError(f"unsupported weights file: {path}")
        return model, variables

    return weights_for_fold
