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

import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from ..config import DataConfig, GanTrainConfig, ModelConfig
from ..data.pipeline import EpochShuffler
from ..parallel.mesh import FOLD_AXIS
from ..utils.profiling import StepTimer
from .gan_trainer import (
    _GEN_KEYS,
    GanTrainer,
    log_superstep_metrics,
    plan_dispatch_chunk,
    unpack_superstep_metrics,
)
from .state import Counters


def shard_map(f, mesh, in_specs, out_specs, manual_axes=None):
    """jax.shard_map across the JAX API rename, replication checks off (the
    fold-stacked trainers return per-shard trees under fold specs).

    ``manual_axes``: restrict manual partitioning to these mesh axes —
    the remaining axes stay AUTO (GSPMD), which is how the per-fold data
    parallelism composes: manual over `fold` (each fold group runs the
    plain single-fold superstep), auto over `data` (the inner trainer's
    constrain_batch pins shard the batch; XLA derives the gradient
    psums). None = fully manual (all axes), the pre-round-5 behavior."""
    try:
        from jax import shard_map as _shard_map

        kw = {}
        if manual_axes is not None:
            kw["axis_names"] = frozenset(manual_axes)
        return _shard_map(f, mesh=mesh, in_specs=in_specs,
                          out_specs=out_specs, check_vma=False, **kw)
    except ImportError:
        if manual_axes is not None:
            raise RuntimeError(
                "partial-manual shard_map (fold x data composition) needs "
                "jax.shard_map with axis_names; this JAX only has the "
                "experimental API")
        from jax.experimental.shard_map import shard_map as _shard_map

        return _shard_map(f, mesh=mesh, in_specs=in_specs,
                          out_specs=out_specs, check_rep=False)


class MultiFoldGanTrainer:
    def __init__(self, model_cfg: ModelConfig, train_cfg: GanTrainConfig,
                 data_cfg: DataConfig, mesh):
        if FOLD_AXIS not in mesh.axis_names:
            raise ValueError("mesh must carry a fold axis (parallel.make_mesh)")
        self.mesh = mesh
        self.n_folds = mesh.shape[FOLD_AXIS]
        self.cfg = train_cfg
        # fold x data composition (round 5, SURVEY §2.7's production v4-8
        # layout): when the mesh carries a >1-way data axis AND the batch
        # divides over it, the inner single-fold trainer is built WITH the
        # mesh (its in-jit constrain_batch pins shard each fold's batch
        # over `data`), and every shard_map below goes partial-manual
        # (manual over `fold`, GSPMD-auto over `data` — XLA inserts the
        # per-fold gradient psums from the shardings). Otherwise the data
        # axis (if any) is replicated, the pre-round-5 behavior.
        from ..parallel import mesh as meshlib

        self.data_parallel = meshlib.data_parallel(mesh, train_cfg.batch_size)
        self._manual = (FOLD_AXIS,) if self.data_parallel else None
        self.base = GanTrainer(
            model_cfg, train_cfg, data_cfg,
            mesh=mesh if self.data_parallel else None, _inner=True,
        )

        self._fold_sharding = NamedSharding(mesh, P(FOLD_AXIS))
        self._idx_sharding = NamedSharding(mesh, P(FOLD_AXIS))

        # shard_map (not vmap): each fold's device group executes the plain
        # single-fold superstep on its own slice — no batched-conv rewrites,
        # no cross-fold communication.

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
                    manual_axes=self._manual,
                ),
                donate_argnums=0,
            )

        self._steps = {
            d: make_step(fn) for d, fn in self.base._superstep_fns.items()
        }

        # Chunked dispatch (see gan_trainer._build_chunk): L supersteps
        # scanned per device call inside each fold's shard — the ~2.6 s
        # per-dispatch pytree-marshaling cost is paid once per chunk. Keys
        # are precomputed on the host with the exact sequential derivation
        # (key -> split -> per-fold split), so trajectories are unchanged.
        def make_chunk_step(fn, d_iters, L):
            from .gan_trainer import pack_superstep_metrics
            from .state import tree_select

            def per_shard(state, x, y, idx, nvalid, active, key_data):
                # idx (1, L, D, B); key_data (L, 1, 2) raw uint32 (padded
                # rows are zeros — inactive, so never used); nvalid/active
                # (L,).
                state1 = jax.tree.map(lambda a: a[0], state)

                def body(st, xs):
                    idx_k, nv_k, act_k, kd = xs
                    k = jax.random.wrap_key_data(kd)
                    valid = (jnp.arange(d_iters) < nv_k) & act_k
                    new_st, metrics = fn(st, x[0], y[0], idx_k, valid, k)
                    st = tree_select(act_k, new_st, st)
                    return st, pack_superstep_metrics(metrics)

                st, vecs = jax.lax.scan(
                    body, state1, (idx[0], nvalid, active, key_data[:, 0])
                )
                expand = lambda a: jnp.asarray(a)[None]
                return jax.tree.map(expand, st), expand(vecs)

            fold = P(FOLD_AXIS)
            return jax.jit(
                shard_map(
                    per_shard, self.mesh,
                    in_specs=(fold, fold, fold, fold, P(), P(),
                              P(None, FOLD_AXIS, None)),
                    out_specs=(fold, fold),
                    manual_axes=self._manual,
                ),
                donate_argnums=0,
            )

        self._make_chunk_step = make_chunk_step
        self._chunk_jits: dict = {}

        # One dispatch derives the whole chunk's key schedule: per superstep
        # j, key -> (key, sk_j); sk_j -> F per-fold keys — exactly the
        # sequential loop's `split(key)` + `split(sk, F)`. Emits RAW key
        # data (n, F, 2) (typed keys cannot ride shard_map replicated specs).
        def chunk_keys(key, n):
            def body(k, _):
                k, sk = jax.random.split(k)
                return k, jax.random.key_data(jax.random.split(sk, self.n_folds))

            return jax.lax.scan(body, key, None, length=n)

        self._chunk_keys = jax.jit(chunk_keys, static_argnums=1)

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
                manual_axes=self._manual,
            )
        )

    # ------------------------------------------------------------------

    def _chunk_step(self, d: int, L: int):
        fn = self._chunk_jits.get((d, L))
        if fn is None:
            fn = self._make_chunk_step(self.base._superstep_fns[d], d, L)
            self._chunk_jits[(d, L)] = fn
        return fn

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
        chunk_len = self.base._chunk_len()

        # Deferred metric fetch (see gan_trainer.fit_fold): each chunk
        # dispatch yields a stacked (F, L, len) array of packed per-fold
        # rows, drained in a single transfer per flush.
        pending: list[tuple] = []  # (arr (F, L, len), [(d, n_valid, ctr)])
        n_pending = 0

        def flush():
            nonlocal pending, n_pending
            if not pending:
                return
            if len(pending) == 1:
                flat = np.asarray(pending[0][0]).reshape(-1)
            else:
                flat = np.asarray(
                    jnp.concatenate([jnp.reshape(a, (-1,)) for a, _ in pending])
                )
            off = 0
            for arr, metas in pending:
                n_f, n_rows = arr.shape[0], arr.shape[1]
                ln = 4 * metas[0][0] + len(_GEN_KEYS)
                for r, (d_, nv, ctr) in enumerate(metas):
                    for f in range(n_f):
                        base = off + (f * n_rows + r) * ln
                        log_superstep_metrics(
                            log,
                            unpack_superstep_metrics(flat[base : base + ln], d_),
                            ctr, nv, prefix=f"fold{fold_ids[f]}/",
                        )
                off += n_f * n_rows * ln
            pending = []
            n_pending = 0

        for epoch in range(n_epochs):
            epochs_idx = [s.epoch() for s in shufflers]  # F x (nb, B)
            n_batches = epochs_idx[0].shape[0]
            i = 0
            while i < n_batches:
                d = self.base._d_iters_for(counters)

                # ---- plan one chunked dispatch: the SAME boundaries as the
                # sequential trainer (gan_trainer.plan_dispatch_chunk —
                # validation, checkpoint, D change, epoch end).
                spans, i = plan_dispatch_chunk(
                    i, n_batches, d, counters.gen_iterations, cfg, chunk_len,
                    self.base._d_iters_for_gi,
                    validates=xv is not None,
                    checkpoints=checkpoint_fn is not None,
                )
                plan = []  # (blocks (F, D, B), n_valid)
                for start, n_valid in spans:
                    blocks = np.zeros(
                        (self.n_folds, d, cfg.batch_size), np.int32
                    )
                    for f in range(self.n_folds):
                        blocks[f, :n_valid] = (
                            epochs_idx[f][start : start + n_valid]
                        )
                    plan.append((blocks, n_valid))

                # Chunk length = actual span count (keyed compile per
                # (d, L)): padding to a fixed chunk_len made the device
                # EXECUTE the masked-out supersteps — an epoch tail padded
                # 10 -> 25 wasted 15 supersteps of compute (round-4 anchor
                # finding, same fix as gan_trainer._chunk_step).
                L = len(plan)
                idx_stack = np.zeros(
                    (self.n_folds, L, d, cfg.batch_size), np.int32
                )
                nvalid = np.zeros((L,), np.int32)
                active = np.zeros((L,), bool)
                for j, (blk, nv) in enumerate(plan):
                    idx_stack[:, j], nvalid[j], active[j] = blk, nv, True
                key, key_data = self._chunk_keys(key, len(plan))
                idxs = jax.device_put(jnp.asarray(idx_stack), self._idx_sharding)
                states, vecs = self._chunk_step(d, L)(
                    states, x_all, y_all, idxs,
                    jnp.asarray(nvalid), jnp.asarray(active), key_data,
                )

                # Full reference tag set per fold (gan_trainer.py's stream,
                # namespaced fold{k}/...) — same resolution as the
                # sequential trainer, deferred fetch.
                metas = []
                for j, (_, nv) in enumerate(plan):
                    metas.append((d, nv, counters))
                    gi = counters.gen_iterations
                    timer.step()
                    if logger is not None and gi % 10 == 0:
                        timer.log_to(logger, gi)
                    if j < len(plan) - 1:
                        counters = counters.replace(
                            gen_iterations=gi + 1,
                            crit_iterations=counters.crit_iterations + nv,
                            crit_dem_iterations=(
                                counters.crit_dem_iterations + nv
                            ),
                        )
                pending.append((vecs, metas))
                n_pending += len(plan)
                if n_pending >= cfg.metric_flush_every:
                    flush()

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


class MultiFoldUResNetTrainer:
    """Concurrent multi-fold supervised UResNet training over the mesh's
    `fold` axis — the reference's 4-fold workload
    (`DEP-UResNet-wNoises-training-4fold.py:434-626`) is the same
    embarrassingly-parallel shape as the GAN folds: sequential folds that
    share nothing.

    Mechanics mirror :class:`MultiFoldGanTrainer`: fold-stacked state
    pytrees shard_mapped over `fold`, with the chunked scan-of-batches
    dispatch of :class:`..uresnet_trainer.UResNetTrainer` inside each
    fold's shard.

    Trajectory note: the sequential driver seeds every fold's ``fit`` with
    the SAME ``cfg.seed`` (drivers.run_uresnet_training), so the shuffle
    indices, per-epoch noise, and dropout-key sequence are already shared
    across folds — they replicate here verbatim (specs ``P()``), and only
    the data and the per-fold init keys carry the fold axis. Each fold's
    trajectory is therefore IDENTICAL to its sequential run up to data
    truncation (folds truncate to the smallest fold's slice count for
    static shapes; equal-sized folds match exactly —
    tests/test_multi_fold.py pins this)."""

    def __init__(self, model_cfg, train_cfg, mesh):
        from .uresnet_trainer import UResNetTrainer

        if FOLD_AXIS not in mesh.axis_names:
            raise ValueError("mesh must carry a fold axis (parallel.make_mesh)")
        self.mesh = mesh
        self.n_folds = mesh.shape[FOLD_AXIS]
        self.cfg = train_cfg
        self.model_cfg = model_cfg
        self.base = UResNetTrainer(model_cfg, train_cfg, mesh=None)
        self._fold_sharding = NamedSharding(mesh, P(FOLD_AXIS))
        self._chunk_jits: dict = {}

        # Host key schedule: one dispatch derives the chunk's per-batch
        # dropout keys with the exact sequential split sequence
        # (uresnet_trainer.fit: `key, dk = split(key)` per batch). Raw key
        # data so rows pass through shard_map replicated.
        def chunk_keys(key, n):
            def body(k, _):
                k, dk = jax.random.split(k)
                return k, jax.random.key_data(dk)

            return jax.lax.scan(body, key, None, length=n)

        self._chunk_keys = jax.jit(chunk_keys, static_argnums=1)

        # Fold-stacked validation: the sequential chunked-CCE core
        # shard_mapped over `fold` — one dispatch, (F,) losses.
        val_core = self.base._val_core

        def per_shard_val(state, xv, noise, yv):
            state1 = jax.tree.map(lambda a: a[0], state)
            loss = val_core(state1, xv[0], noise, yv[0])
            return jnp.asarray(loss)[None]

        fold = P(FOLD_AXIS)
        self._val_step = jax.jit(
            shard_map(
                per_shard_val, self.mesh,
                in_specs=(fold, fold, P(), fold),
                out_specs=fold,
            )
        )

    def _chunk_step(self, L: int):
        fn = self._chunk_jits.get(L)
        if fn is None:
            update = self.base._update

            def per_shard(state, x, y, noise, idx_stack, key_data):
                # state/x/y lead with the local fold slice (1, ...); noise
                # (n, Z, 1), idx_stack (L, B) and key_data (L, 2) are
                # replicated — identical across folds by the sequential
                # trainer's own seeding. Batches pre-gathered ONCE per
                # chunk (uresnet_trainer.chunk_step_fn's round-4 scheme).
                state1 = jax.tree.map(lambda a: a[0], state)
                xb = x[0][idx_stack]
                yb = y[0][idx_stack]
                nb = noise[idx_stack]

                def body(st, xs):
                    xc, yc, nc, kd = xs
                    st, loss = update(
                        st, xc, yc, nc, jax.random.wrap_key_data(kd),
                    )
                    return st, loss

                st, losses = jax.lax.scan(
                    body, state1, (xb, yb, nb, key_data)
                )
                expand = lambda a: jnp.asarray(a)[None]
                return jax.tree.map(expand, st), expand(losses)

            fold = P(FOLD_AXIS)
            fn = jax.jit(
                shard_map(
                    per_shard, self.mesh,
                    in_specs=(fold, fold, fold, P(), P(), P()),
                    out_specs=(fold, fold),
                ),
                donate_argnums=0,
            )
            self._chunk_jits[L] = fn
        return fn

    def init_states(self, fold_ids=None):
        """Fold-stacked state with the sequential driver's exact per-fold
        init keys (``key(seed + fold)``), leading axis sharded over `fold`."""
        fold_ids = (tuple(fold_ids) if fold_ids is not None
                    else tuple(range(1, self.n_folds + 1)))
        if len(fold_ids) != self.n_folds:
            raise ValueError(
                f"{len(fold_ids)} folds for a {self.n_folds}-fold mesh")
        keys = jnp.stack(
            [jax.random.key(self.cfg.seed + f) for f in fold_ids]
        )
        stacked = jax.vmap(self.base.init_state)(keys)
        return jax.device_put(stacked, self._fold_sharding)

    def fit(self, states, per_fold_data, per_fold_val, n_epochs=None,
            logger=None, loss_histories=None, val_loss_histories=None,
            checkpoint_fn=None, rng_seed=None, fold_ids=None):
        """Train all folds concurrently.

        ``per_fold_data``/``per_fold_val``: [(x, y_labels)] per fold (labels
        are one-hot-encoded here, like the sequential ``fit``).
        ``loss_histories``/``val_loss_histories``: optional per-fold
        LossHistory lists (the reference's loss_*.txt appends per fold).
        """
        from ..data.preprocess import one_hot

        cfg = self.cfg
        fold_ids = (tuple(fold_ids) if fold_ids is not None
                    else tuple(range(1, self.n_folds + 1)))
        if len(fold_ids) != self.n_folds:
            raise ValueError(
                f"{len(fold_ids)} folds for a {self.n_folds}-fold mesh")
        n_epochs = n_epochs if n_epochs is not None else cfg.n_epochs
        seed = rng_seed if rng_seed is not None else cfg.seed
        key = jax.random.key(seed)

        def enc(y_labels):
            return (one_hot(y_labels.astype(int), cfg.n_classes)
                    .astype(np.float32)
                    .reshape(y_labels.shape[:-1] + (cfg.n_classes,)))

        def stack(per_fold, encode_y):
            n = min(a.shape[0] for a, _ in per_fold)
            x = np.stack([a[:n] for a, _ in per_fold])
            y = np.stack([
                enc(b[:n]) if encode_y else b[:n] for _, b in per_fold
            ])
            return (
                jax.device_put(jnp.asarray(x), self._fold_sharding),
                jax.device_put(jnp.asarray(y), self._fold_sharding),
                n,
            )

        x_all, y_all, n = stack(per_fold_data, True)
        xv, yv, n_val = stack(per_fold_val, True)
        key, vk = jax.random.split(key)
        fixed_noise = jax.random.normal(
            vk, (n_val, self.model_cfg.noise_size, 1)
        )

        shuffler = EpochShuffler(n, cfg.batch_size, seed)
        log = logger.log_scalar if logger is not None else (lambda *a: None)
        timer = StepTimer()
        t0 = time.time()
        for epoch in range(n_epochs):
            idx_epoch = shuffler.epoch() if cfg.shuffle_each_epoch else (
                np.arange(shuffler.n_batches * cfg.batch_size)
                .reshape(shuffler.n_batches, cfg.batch_size).astype(np.int32)
            )
            key, nk = jax.random.split(key)
            epoch_noise = jax.random.normal(
                nk, (n, self.model_cfg.noise_size, 1)
            )
            n_batches = idx_epoch.shape[0]
            chunk_len = self.base._chunk_len(n_batches)
            losses = []
            b = 0
            while b < n_batches:
                L = min(chunk_len, n_batches - b)
                key, key_data = self._chunk_keys(key, L)
                states, ls = self._chunk_step(L)(
                    states, x_all, y_all, epoch_noise,
                    jnp.asarray(idx_epoch[b : b + L]), key_data,
                )
                losses.append(ls)  # (F, L)
                b += L
            # One fetch per epoch for the whole fold x batch loss matrix.
            train_losses = np.asarray(
                jnp.concatenate(losses, axis=1)).mean(axis=1)
            val_losses = np.asarray(self._val_step(states, xv, fixed_noise, yv))
            states = states.replace(epoch=states.epoch + 1)

            timer.step()
            for f in range(self.n_folds):
                pre = f"fold{fold_ids[f]}/"
                log(pre + "loss", float(train_losses[f]), epoch)
                log(pre + "val_loss", float(val_losses[f]), epoch)
                if loss_histories is not None:
                    loss_histories[f].append(float(train_losses[f]))
                if val_loss_histories is not None:
                    val_loss_histories[f].append(float(val_losses[f]))
            if logger is not None:
                timer.log_to(logger, epoch)
            if checkpoint_fn is not None and (epoch + 1) % cfg.checkpoint_every == 0:
                checkpoint_fn(states, epoch)
            print(
                f"EPOCH {epoch + 1}/{n_epochs} "
                + " ".join(
                    f"fold{fold_ids[f]}: loss={train_losses[f]:.5f} "
                    f"val={val_losses[f]:.5f}"
                    for f in range(self.n_folds)
                )
                + f" ({time.time() - t0:.1f}s)"
            )
        return states
