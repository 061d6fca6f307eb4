"""Device-resident dataset + epoch batching.

The reference holds a whole fold (~5k 256x256 slices) in host RAM and feeds
each batch through a feed-dict, paying a host->device copy per K.function
call (`...twoCritics_training_4fold.py:802-829`). TPU-first design instead
puts the fold in HBM once (sharded over the mesh's data axis) and gathers
batches on device by index inside the jitted step — the hot loop never
touches the host.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterable, Iterator

import jax
import jax.numpy as jnp
import numpy as np


class DeviceDataset:
    """Fold arrays resident in device memory.

    ``sharding`` (optional, a jax.sharding.NamedSharding) distributes the
    slice axis over the mesh's data axis; batches are index-gathered on
    device inside jit.
    """

    def __init__(self, arrays: dict[str, np.ndarray], sharding=None):
        self.n = next(iter(arrays.values())).shape[0]
        for k, v in arrays.items():
            if v.shape[0] != self.n:
                raise ValueError(f"array {k} has {v.shape[0]} rows, expected {self.n}")
        if sharding is not None:
            self.arrays = {
                k: jax.device_put(v, sharding) for k, v in arrays.items()
            }
        else:
            self.arrays = {k: jnp.asarray(v) for k, v in arrays.items()}
        self.sharding = sharding

    def __getitem__(self, key: str):
        return self.arrays[key]


class EpochShuffler:
    """Host-side index permutation per epoch (reference :783-787), emitting
    batch index arrays consumed by the on-device gather."""

    def __init__(self, n: int, batch_size: int, seed: int = 0):
        self.n = n
        self.batch_size = batch_size
        self.rng = np.random.default_rng(seed)
        self.n_batches = n // batch_size

    def epoch(self) -> np.ndarray:
        """Returns (n_batches, batch_size) int32 indices."""
        perm = self.rng.permutation(self.n)
        usable = self.n_batches * self.batch_size
        return perm[:usable].reshape(self.n_batches, self.batch_size).astype(np.int32)


def prefetch(iterable: Iterable, size: int = 2) -> Iterator:
    """Background-thread prefetch, for host-side pipelines (subject loading
    at test time); keeps the device busy while the next NIfTI decodes."""
    q: queue.Queue = queue.Queue(maxsize=size)
    sentinel = object()
    err: list[BaseException] = []

    def producer():
        try:
            for item in iterable:
                q.put(item)
        except BaseException as e:  # propagate into consumer
            err.append(e)
        finally:
            q.put(sentinel)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is sentinel:
            if err:
                raise err[0]
            return
        yield item
