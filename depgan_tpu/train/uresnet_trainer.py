"""DEP-UResNet supervised trainer.

Re-implements the reference's per-epoch ``model.fit`` loop
(`DEP-UResNet-wNoises-training-4fold.py:596-626`) as an explicit jitted
train step over device-resident data:

- categorical cross-entropy on the 4-class softmax output, Adam(1e-4)
  (reference :427),
- fresh Gaussian noise for the whole training set each epoch, fixed noise
  for validation (reference :592,:601),
- shuffle per epoch, batch 16 (reference :602-606),
- loss-history .txt appends + per-epoch checkpoints (reference :608-625).

TPU-first: the fold's slices live in HBM; each step gathers its batch by
index on device; the mesh's ``data`` axis shards the batch and XLA inserts
the gradient psum from the sharding annotations.
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config import ModelConfig, UResNetTrainConfig
from ..data.pipeline import EpochShuffler
from ..data.preprocess import one_hot
from ..models.generator import make_generator
from ..parallel import mesh as meshlib
from ..utils.profiling import StepTimer
from .state import UResNetTrainState

KERAS_EPS = 1e-7  # Keras clips softmax outputs before the log


def categorical_crossentropy(probs, labels_1hot):
    """Keras 'categorical_crossentropy' on probability outputs: clip to
    [eps, 1], -sum(y * log p) over classes, mean elsewhere."""
    probs = jnp.clip(probs, KERAS_EPS, 1.0)
    ce = -jnp.sum(labels_1hot * jnp.log(probs), axis=-1)
    return jnp.mean(ce)


@dataclass
class UResNetTrainer:
    model_cfg: ModelConfig
    train_cfg: UResNetTrainConfig
    mesh: object | None = None

    def __post_init__(self):
        self.model = make_generator(self.model_cfg)
        self.tx = optax.adam(self.train_cfg.lr)
        self._data_parallel = meshlib.data_parallel(
            self.mesh, self.train_cfg.batch_size
        )
        self._chunk_jits: dict = {}
        self._step = self._build_step()
        self._val_step = self._build_val_step()

    # -- state ---------------------------------------------------------------

    def init_state(self, rng) -> UResNetTrainState:
        cfg = self.model_cfg
        x = jnp.zeros((1, cfg.image_size, cfg.image_size, cfg.n_input_channels))
        z = jnp.zeros((1, cfg.noise_size, 1))
        variables = self.model.init({"params": rng}, x, z, train=False)
        state = UResNetTrainState(
            params=variables["params"],
            batch_stats=variables.get("batch_stats", {}),
            opt_state=self.tx.init(variables["params"]),
        )
        if self.mesh is not None:
            state = meshlib.put_replicated(state, self.mesh)
        return state

    # -- steps ---------------------------------------------------------------

    def _build_step(self):
        model, tx = self.model, self.tx
        if self._data_parallel:
            mesh = self.mesh
            shard_b = lambda a: meshlib.constrain_batch(a, mesh)
        else:
            shard_b = lambda a: a

        def update(state, x, y, noise, drop_key):
            """One batch update on ALREADY-GATHERED batch tensors."""
            x, y, noise = shard_b(x), shard_b(y), shard_b(noise)

            def loss_fn(params):
                out, updates = model.apply(
                    {"params": params, "batch_stats": state.batch_stats},
                    x, noise, train=True,
                    rngs={"dropout": drop_key},
                    mutable=["batch_stats"],
                )
                return categorical_crossentropy(out, y), updates["batch_stats"]

            (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params
            )
            updates, new_opt = tx.update(grads, state.opt_state, state.params)
            new_params = optax.apply_updates(state.params, updates)
            return (
                state.replace(
                    params=new_params, batch_stats=new_stats, opt_state=new_opt
                ),
                loss,
            )

        def step_core(state, x_all, y_all, noise_all, idx, drop_key):
            """One batch update; gathers the batch AND its noise rows from
            the device-resident epoch arrays by index (usable both as a
            single dispatch and inside the chunked scan)."""
            return update(state, x_all[idx], y_all[idx], noise_all[idx],
                          drop_key)

        self._update = update
        self._step_core = step_core
        return jax.jit(step_core, donate_argnums=0)

    def chunk_step_fn(self, L: int):
        """Scan ``L`` batch updates inside ONE jitted dispatch. The RNG key
        rides the scan carry and is split per batch exactly as the host
        loop splits it, so the dropout-key sequence (and hence the
        trajectory) is identical to per-batch dispatch — the dispatch
        marshaling cost (~2.6 s/call remote, docs/PERF.md) is paid once per
        chunk instead of once per batch."""
        fn = self._chunk_jits.get(L)
        if fn is None:
            update = self._update

            @partial(jax.jit, donate_argnums=0)
            def chunk_step(state, x_all, y_all, noise_all, idx_stack, key):
                # ONE gather per epoch array for the whole chunk (round-4
                # anchor finding: per-iteration gathers from the big
                # device-resident fold dominate the wall); the scan then
                # consumes static (B, ...) slices.
                xb = x_all[idx_stack]
                yb = y_all[idx_stack]
                nb = noise_all[idx_stack]

                def body(carry, xs):
                    st, k = carry
                    x, y, nz = xs
                    k, dk = jax.random.split(k)
                    st, loss = update(st, x, y, nz, dk)
                    return (st, k), loss

                (state, key), losses = jax.lax.scan(
                    body, (state, key), (xb, yb, nb)
                )
                return state, key, losses

            fn = chunk_step
            self._chunk_jits[L] = fn
        return fn

    def _chunk_len(self, n_batches: int) -> int:
        c = self.train_cfg.dispatch_chunk
        return min(n_batches, c if c > 0 else 32)

    def _build_val_step(self):
        """Validation CCE over the whole val set, computed in fixed-size
        chunks via ``lax.map`` so peak activation memory stays at one
        chunk's forward (the reference evaluates the full val set in one
        ``model.fit`` validation pass, :601 — fine at its ~2% val split,
        but unbatched it would OOM at larger fractions). Numerics are
        exact: per-chunk masked CE *sums* divided by the true element
        count reproduce the single-apply mean bit-for-bit in f32 up to
        summation order."""
        model = self.model
        chunk = max(1, int(self.train_cfg.batch_size))

        def val_step(state, x, noise, y):
            variables = {"params": state.params,
                         "batch_stats": state.batch_stats}
            n = x.shape[0]
            n_chunks = -(-n // chunk)
            pad = n_chunks * chunk - n
            xp = jnp.pad(x, ((0, pad),) + ((0, 0),) * (x.ndim - 1))
            np_ = jnp.pad(noise, ((0, pad),) + ((0, 0),) * (noise.ndim - 1))
            yp = jnp.pad(y, ((0, pad),) + ((0, 0),) * (y.ndim - 1))
            valid = (jnp.arange(n_chunks * chunk) < n).astype(jnp.float32)

            def chunk_ce_sum(args):
                xc, nc, yc, mc = args
                out = model.apply(variables, xc, nc, train=False)
                probs = jnp.clip(out, KERAS_EPS, 1.0)
                ce = -jnp.sum(yc * jnp.log(probs), axis=-1)
                return jnp.sum(ce * mc.reshape((-1,) + (1,) * (ce.ndim - 1)))

            sums = jax.lax.map(
                chunk_ce_sum,
                (xp.reshape((n_chunks, chunk) + x.shape[1:]),
                 np_.reshape((n_chunks, chunk) + noise.shape[1:]),
                 yp.reshape((n_chunks, chunk) + y.shape[1:]),
                 valid.reshape(n_chunks, chunk)),
            )
            n_elem = n * int(np.prod(y.shape[1:-1]))
            return jnp.sum(sums) / n_elem

        self._val_core = val_step
        return jax.jit(val_step)

    # -- epoch loop ----------------------------------------------------------

    def fit(
        self,
        state: UResNetTrainState,
        x_train: np.ndarray,
        y_train_labels: np.ndarray,
        x_val: np.ndarray,
        y_val_labels: np.ndarray,
        n_epochs: int | None = None,
        logger=None,
        loss_history=None,
        val_loss_history=None,
        checkpoint_fn=None,
        rng_seed: int | None = None,
    ) -> UResNetTrainState:
        cfg = self.train_cfg
        n_epochs = n_epochs if n_epochs is not None else cfg.n_epochs
        seed = rng_seed if rng_seed is not None else cfg.seed
        key = jax.random.key(seed)

        def put(arr):
            return (
                meshlib.put_replicated(jnp.asarray(arr), self.mesh)
                if self.mesh is not None
                else jnp.asarray(arr)
            )

        x_all = put(x_train)
        y_all = put(one_hot(y_train_labels.astype(int), cfg.n_classes).astype(np.float32)
                    .reshape(y_train_labels.shape[:-1] + (cfg.n_classes,)))
        xv = put(x_val)
        yv = put(one_hot(y_val_labels.astype(int), cfg.n_classes).astype(np.float32)
                 .reshape(y_val_labels.shape[:-1] + (cfg.n_classes,)))
        key, vk = jax.random.split(key)
        # Fixed validation noise (reference :592).
        fixed_noise = jax.random.normal(
            vk, (x_val.shape[0], self.model_cfg.noise_size, 1)
        )

        shuffler = EpochShuffler(x_train.shape[0], cfg.batch_size, seed)
        t0 = time.time()
        timer = StepTimer()
        for epoch in range(n_epochs):
            idx_epoch = shuffler.epoch() if cfg.shuffle_each_epoch else (
                np.arange(shuffler.n_batches * cfg.batch_size)
                .reshape(shuffler.n_batches, cfg.batch_size).astype(np.int32)
            )
            # Fresh noise for the whole train set each epoch (reference :601).
            key, nk = jax.random.split(key)
            epoch_noise = jax.random.normal(
                nk, (x_train.shape[0], self.model_cfg.noise_size, 1)
            )
            n_batches = idx_epoch.shape[0]
            chunk_len = self._chunk_len(n_batches)
            losses = []
            if chunk_len == 1:
                for b in range(n_batches):
                    idx = jnp.asarray(idx_epoch[b])
                    if self._data_parallel:
                        idx = jax.device_put(
                            idx, meshlib.batch_sharding(self.mesh, 1))
                    key, dk = jax.random.split(key)
                    state, loss = self._step(
                        state, x_all, y_all, epoch_noise, idx, dk
                    )
                    losses.append(loss[None])
            else:
                # Full chunks + one remainder chunk (fixed sizes across
                # epochs -> exactly two compiled programs). The epoch's
                # losses are fetched in ONE transfer below.
                b = 0
                while b < n_batches:
                    L = min(chunk_len, n_batches - b)
                    idxs = jnp.asarray(idx_epoch[b : b + L])
                    if self._data_parallel:
                        idxs = jax.device_put(
                            idxs, meshlib.index_sharding(self.mesh, 2))
                    state, key, ls = self.chunk_step_fn(L)(
                        state, x_all, y_all, epoch_noise, idxs, key
                    )
                    losses.append(ls)
                    b += L
            train_loss = float(jnp.mean(jnp.concatenate(losses)))
            val_loss = float(self._val_step(state, xv, fixed_noise, yv))
            state = state.replace(epoch=state.epoch + 1)

            timer.step()
            if logger is not None:
                logger.log_scalar("loss", train_loss, epoch)
                logger.log_scalar("val_loss", val_loss, epoch)
                timer.log_to(logger, epoch)
            if loss_history is not None:
                loss_history.append(train_loss)
            if val_loss_history is not None:
                val_loss_history.append(val_loss)
            if checkpoint_fn is not None and (epoch + 1) % cfg.checkpoint_every == 0:
                checkpoint_fn(state, epoch)
            print(
                f"EPOCH {epoch + 1}/{n_epochs} loss={train_loss:.5f} "
                f"val_loss={val_loss:.5f} ({time.time() - t0:.1f}s)"
            )
        return state
