"""Concurrent multi-fold training over the mesh's `fold` axis.

The reference trains its 4 cross-validation folds *sequentially* in one
process (`for fold in [1,2,3,4]`, `...twoCritics_training_4fold.py:506`).
The folds share nothing, so on a multi-chip TPU they map onto disjoint
device groups with zero inter-fold communication: a (fold, data) mesh
(parallel/mesh.py) runs all folds in the wall-clock of one.

Mechanics: fold-stacked state/data pytrees with the leading axis sharded
over `fold`; the single-fold superstep (train/gan_trainer.py) is ``vmap``'d
over that axis and jitted once — XLA partitions the program so each fold's
device group executes only its own slice, and the gradient psum for the
`data` axis within each group falls out of the shardings.

Scheduling deviates from the sequential reference in exactly one
(documented) way: iteration counters are per-fold-synchronous, i.e. every
fold follows the fold-1 warm-up schedule — equivalent to the
``reset_counters_per_fold=True`` configuration.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from ..config import DataConfig, GanTrainConfig, ModelConfig
from ..data.pipeline import EpochShuffler
from ..parallel.mesh import FOLD_AXIS
from ..utils.profiling import StepTimer
from .gan_trainer import _GEN_KEYS, GanTrainer, log_superstep_metrics
from .state import Counters


def _pack_fold_metrics(metrics):
    """All folds' superstep scalars as ONE f32 vector (see
    gan_trainer.pack_superstep_metrics — same deferred-fetch rationale; the
    eager path here was even worse: F x leaves separate round trips)."""
    rows = [metrics["crit_y2_real"], metrics["crit_y2_fake"],
            metrics["crit_dem_real"], metrics["crit_dem_fake"]]  # (F, d)
    gen = jnp.stack([metrics["gen"][k] for k in _GEN_KEYS])  # (6, F)
    return jnp.concatenate(
        [jnp.asarray(r, jnp.float32).reshape(-1) for r in rows]
        + [gen.astype(jnp.float32).reshape(-1)]
    )


def _unpack_fold_metrics(flat: np.ndarray, n_folds: int, d: int, f: int):
    """One fold's host metrics dict out of a packed vector."""
    rows = flat[: 4 * n_folds * d].reshape(4, n_folds, d)
    gen_mat = flat[4 * n_folds * d :].reshape(len(_GEN_KEYS), n_folds)
    return {
        "crit_y2_real": rows[0, f], "crit_y2_fake": rows[1, f],
        "crit_dem_real": rows[2, f], "crit_dem_fake": rows[3, f],
        "gen": dict(zip(_GEN_KEYS, gen_mat[:, f])),
    }


class MultiFoldGanTrainer:
    def __init__(self, model_cfg: ModelConfig, train_cfg: GanTrainConfig,
                 data_cfg: DataConfig, mesh):
        if FOLD_AXIS not in mesh.axis_names:
            raise ValueError("mesh must carry a fold axis (parallel.make_mesh)")
        self.mesh = mesh
        self.n_folds = mesh.shape[FOLD_AXIS]
        self.cfg = train_cfg
        self.base = GanTrainer(model_cfg, train_cfg, data_cfg, mesh=None)

        self._fold_sharding = NamedSharding(mesh, P(FOLD_AXIS))
        self._idx_sharding = NamedSharding(mesh, P(FOLD_AXIS))

        # shard_map (not vmap): each fold's device group executes the plain
        # single-fold superstep on its own slice — no batched-conv rewrites,
        # no cross-fold communication.
        try:
            from jax import shard_map as _shard_map

            def shard_map(f, mesh, in_specs, out_specs):
                return _shard_map(f, mesh=mesh, in_specs=in_specs,
                                  out_specs=out_specs, check_vma=False)
        except ImportError:
            from jax.experimental.shard_map import shard_map as _shard_map

            def shard_map(f, mesh, in_specs, out_specs):
                return _shard_map(f, mesh=mesh, in_specs=in_specs,
                                  out_specs=out_specs, check_rep=False)

        def make_step(fn):
            def per_shard(state, x, y, idx, valid, key):
                state1 = jax.tree.map(lambda a: a[0], state)
                new_state, metrics = fn(
                    state1, x[0], y[0], idx[0], valid, key[0]
                )
                expand = lambda a: jnp.asarray(a)[None]
                return (
                    jax.tree.map(expand, new_state),
                    jax.tree.map(expand, metrics),
                )

            fold = P(FOLD_AXIS)
            return jax.jit(
                shard_map(
                    per_shard, self.mesh,
                    in_specs=(fold, fold, fold, fold, P(), fold),
                    out_specs=(fold, fold),
                ),
                donate_argnums=0,
            )

        self._steps = {
            d: make_step(fn) for d, fn in self.base._superstep_fns.items()
        }

        # Fold-stacked validation step (reference :842-865): the sequential
        # trainer's pure val fn shard_mapped over the fold axis — scores +
        # generated DEMs per fold in one dispatch.
        val_fn = self.base._val_step_fn

        def per_shard_val(state, xv, yv, noise):
            state1 = jax.tree.map(lambda a: a[0], state)
            d_fake, d_real, d_gen, dem = val_fn(state1, xv[0], yv[0], noise[0])
            expand = lambda a: jnp.asarray(a)[None]
            return expand(d_fake), expand(d_real), expand(d_gen), expand(dem)

        fold = P(FOLD_AXIS)
        self._val_step = jax.jit(
            shard_map(
                per_shard_val, self.mesh,
                in_specs=(fold, fold, fold, fold),
                out_specs=(fold, fold, fold, fold),
            )
        )

    # ------------------------------------------------------------------

    def init_states(self, rng):
        """Fold-stacked state, leading axis sharded over `fold`."""
        keys = jax.random.split(rng, self.n_folds)
        stacked = jax.vmap(self.base.init_state)(keys)
        return jax.device_put(stacked, self._fold_sharding)

    def stack_fold_data(self, per_fold_arrays):
        """[(x, y)] per fold -> stacked (F, N, ...) device arrays, truncated
        to the smallest fold so shapes are static."""
        n = min(a.shape[0] for a, _ in per_fold_arrays)
        x = np.stack([a[:n] for a, _ in per_fold_arrays])
        y = np.stack([b[:n] for _, b in per_fold_arrays])
        return (
            jax.device_put(jnp.asarray(x), self._fold_sharding),
            jax.device_put(jnp.asarray(y), self._fold_sharding),
            n,
        )

    def superstep(self, states, x_all, y_all, idx_blocks, n_valid, key):
        """idx_blocks (F, D, B); the same n_valid applies to every fold."""
        d = idx_blocks.shape[1]
        valid = jnp.arange(d) < n_valid
        keys = jax.random.split(key, self.n_folds)
        idx = jax.device_put(jnp.asarray(idx_blocks), self._idx_sharding)
        return self._steps[d](states, x_all, y_all, idx, valid, keys)

    def fit(self, states, per_fold_data, per_fold_val=None,
            n_epochs: int | None = None, logger=None, checkpoint_fn=None,
            seed: int | None = None, counters: Counters | None = None,
            fold_ids=None):
        """Train all folds concurrently.

        ``per_fold_data``: list of (x_train, y_train) per fold.
        ``per_fold_val``: optional list of (x_val, y_val) per fold — enables
        the reference's validation streams (scores every ``validate_every``
        gen-iters, images every ``image_log_every``, reference :842-865),
        emitted per fold under ``fold{k}/`` with the exact sequential-trainer
        tag set. ``fold_ids`` gives the actual fold numbers behind each
        stacked position (so a ``--folds 3 4`` run logs under fold3/fold4,
        matching the driver's initial-image namespaces); default 1..F.
        ``counters`` resumes from a restored checkpoint.
        Returns the final stacked states and the shared counters.
        """
        cfg = self.cfg
        fold_ids = (tuple(fold_ids) if fold_ids is not None
                    else tuple(range(1, self.n_folds + 1)))
        if len(fold_ids) != self.n_folds:
            raise ValueError(
                f"fold_ids has {len(fold_ids)} entries for {self.n_folds} folds")
        n_epochs = n_epochs if n_epochs is not None else cfg.n_epochs
        key = jax.random.key(seed if seed is not None else cfg.seed)
        x_all, y_all, n = self.stack_fold_data(per_fold_data)

        xv = yv = fixed_noise = None
        if per_fold_val is not None:
            xv, yv, n_val = self.stack_fold_data(per_fold_val)
            key, vk = jax.random.split(key)
            fixed_noise = jax.device_put(
                jax.random.normal(
                    vk, (self.n_folds, n_val, self.base.model_cfg.noise_size, 1)
                ),
                self._fold_sharding,
            )

        shufflers = [
            EpochShuffler(n, cfg.batch_size, cfg.seed + f)
            for f in range(self.n_folds)
        ]
        counters = counters if counters is not None else Counters()
        log = logger.log_scalar if logger is not None else (lambda *a: None)
        timer = StepTimer()
        pack = jax.jit(_pack_fold_metrics)

        # Deferred metric fetch (see gan_trainer.fit_fold): one packed
        # vector per superstep, drained in a single transfer per flush.
        pending: list[tuple] = []  # (vec, d, n_valid, counters)

        def flush():
            nonlocal pending
            if not pending:
                return
            if len(pending) == 1:
                flat = np.asarray(pending[0][0])
            else:
                flat = np.asarray(jnp.concatenate([p[0] for p in pending]))
            off = 0
            for _, d_, nv, ctr in pending:
                ln = (4 * d_ + len(_GEN_KEYS)) * self.n_folds
                chunk = flat[off : off + ln]
                off += ln
                for f in range(self.n_folds):
                    log_superstep_metrics(
                        log, _unpack_fold_metrics(chunk, self.n_folds, d_, f),
                        ctr, nv, prefix=f"fold{fold_ids[f]}/",
                    )
            pending = []

        for epoch in range(n_epochs):
            epochs_idx = [s.epoch() for s in shufflers]  # F x (nb, B)
            n_batches = epochs_idx[0].shape[0]
            i = 0
            while i < n_batches:
                d = self.base._d_iters_for(counters)
                n_valid = min(d, n_batches - i)
                blocks = np.zeros((self.n_folds, d, cfg.batch_size), np.int32)
                for f in range(self.n_folds):
                    blocks[f, :n_valid] = epochs_idx[f][i : i + n_valid]
                i += n_valid
                key, sk = jax.random.split(key)
                states, metrics = self.superstep(
                    states, x_all, y_all, blocks, n_valid, sk
                )
                gi = counters.gen_iterations
                # Full reference tag set per fold (gan_trainer.py's stream,
                # namespaced fold{k}/...) — same resolution as the
                # sequential trainer, deferred fetch.
                pending.append((pack(metrics), d, n_valid, counters))
                if len(pending) >= cfg.metric_flush_every:
                    flush()
                timer.step()
                if logger is not None and gi % 10 == 0:
                    timer.log_to(logger, gi)

                # --- validation per fold (reference :842-865) ---
                if xv is not None and gi % cfg.validate_every == 0:
                    flush()
                    d_fake, d_real, d_gen, dems = self._val_step(
                        states, xv, yv, fixed_noise
                    )
                    # One transfer for all three (F,) score rows.
                    d_fake, d_real, d_gen = np.asarray(
                        jnp.stack([d_fake, d_real, d_gen])
                    )
                    for f in range(self.n_folds):
                        pre = f"fold{fold_ids[f]}/"
                        log(pre + "val_D_fake_loss", float(d_fake[f]), gi)
                        log(pre + "val_D_real_loss", float(d_real[f]), gi)
                        log(pre + "val_D_real_generated_loss", float(d_gen[f]), gi)
                    if logger is not None and gi % cfg.image_log_every == 0:
                        k_img = cfg.n_val_images
                        dems = np.asarray(dems)  # (F, n_val, H, W, 1)
                        y1 = np.asarray(xv)[..., :1]
                        for f in range(self.n_folds):
                            pre = f"fold{fold_ids[f]}/"
                            logger.log_images(
                                f"{pre}attributed_img_step{gi}",
                                dems[f, :k_img], gi,
                            )
                            logger.log_images(
                                f"{pre}fake_img_step{gi}",
                                (y1[f] + dems[f])[:k_img], gi,
                            )

                counters = counters.replace(
                    gen_iterations=gi + 1,
                    crit_iterations=counters.crit_iterations + n_valid,
                    crit_dem_iterations=counters.crit_dem_iterations + n_valid,
                )
                if checkpoint_fn is not None and (gi + 1) % cfg.checkpoint_every == 0:
                    checkpoint_fn(states, counters)
        flush()
        return states, counters


def unstack_state(states, fold_index: int):
    """Extract one fold's state from the stacked pytree (host-side)."""
    return jax.tree.map(lambda a: np.asarray(a)[fold_index], states)
