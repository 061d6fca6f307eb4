"""Device mesh + sharding layout.

The reference is single-GPU/single-process (SURVEY.md §2.7: no NCCL, no
tf.distribute, folds run sequentially). The TPU-native scale-out is SPMD
data parallelism over ICI:

- mesh axes: ``data`` (batch sharding) x ``fold`` (independent folds in
  parallel — the 4 folds share nothing, so they map onto disjoint device
  groups with zero communication between them),
- parameters replicated over ``data``; XLA inserts the psum for gradient
  reduction from the sharding annotations alone (no hand-written
  collectives),
- the fold's slice dataset is device-resident (data/pipeline.py) either
  replicated (small folds: batch gathers are comm-free) or sharded over
  ``data`` when HBM-constrained.

Multi-host extends for free: build the mesh from ``jax.devices()`` spanning
hosts and the same annotations ride DCN.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
FOLD_AXIS = "fold"


def make_mesh(n_data: int = -1, n_fold: int = 1, devices=None) -> Mesh:
    """A (fold, data) mesh. ``n_data=-1`` uses all remaining devices."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data == -1:
        n_data = len(devices) // n_fold
    need = n_fold * n_data
    if need > len(devices):
        raise ValueError(f"mesh {n_fold}x{n_data} needs {need} devices, have {len(devices)}")
    arr = np.array(devices[:need]).reshape(n_fold, n_data)
    return Mesh(arr, (FOLD_AXIS, DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, ndim: int = 4) -> NamedSharding:
    """Shard the leading (batch) axis over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS, *([None] * (ndim - 1))))


def index_sharding(mesh: Mesh, ndim: int = 2) -> NamedSharding:
    """Shard the trailing (batch) axis of (D, B) index stacks."""
    return NamedSharding(mesh, P(*([None] * (ndim - 1)), DATA_AXIS))


def put_replicated(tree, mesh: Mesh):
    return jax.device_put(tree, replicated(mesh))


def put_batch(arr, mesh: Mesh):
    return jax.device_put(arr, batch_sharding(mesh, np.ndim(arr)))


def data_parallel(mesh: Mesh | None, batch_size: int | None = None) -> bool:
    """True when the mesh has a >1-way data axis to shard batches over.

    When ``batch_size`` is given it must divide evenly over the data axis —
    otherwise batch sharding is impossible and the trainer falls back to
    replicated execution (correct, just not scaled) with a warning."""
    n = mesh.shape.get(DATA_AXIS, 1) if mesh is not None else 1
    if n <= 1:
        return False
    if batch_size is not None and batch_size % n != 0:
        import warnings

        warnings.warn(
            f"batch_size={batch_size} is not divisible by the {n}-way "
            f"'{DATA_AXIS}' mesh axis; falling back to replicated batches "
            f"(no data parallelism). Use a batch size divisible by {n}.",
            stacklevel=2,
        )
        return False
    return True


def constrain_batch(a, mesh: Mesh, axis: int = 0):
    """Inside jit: pin ``a``'s batch axis to the data axis so the compute
    downstream is genuinely data-parallel (XLA derives the gradient psum for
    the replicated params from this annotation alone)."""
    spec = [None] * a.ndim
    spec[axis] = DATA_AXIS
    return jax.lax.with_sharding_constraint(a, NamedSharding(mesh, P(*spec)))
