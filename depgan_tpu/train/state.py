"""Training state pytrees.

The reference keeps all state implicit in the TF1 graph (weights in session
variables, Adam slots inside `get_updates`, counters as module globals,
`...twoCritics_training_4fold.py:47-49,549,568,594`). Here state is an
explicit, checkpointable pytree that flows through the jitted steps.
"""

from __future__ import annotations

from typing import Any

import jax
from flax import struct


@struct.dataclass
class GanTrainState:
    """Full two-critic WGAN-GP state: G + both critics + Adam slots."""

    g_params: Any
    g_stats: Any  # BatchNorm moving statistics
    g_opt: Any
    dy2_params: Any
    dy2_opt: Any
    ddem_params: Any
    ddem_opt: Any


@struct.dataclass
class Counters:
    """The reference's module-global iteration counters (reference :47-49).

    Host-side (they drive the warm-up schedule, which selects which compiled
    superstep runs); checkpointed alongside the device state so resume
    reproduces the schedule — including the faithful quirk that they are NOT
    reset between folds unless configured.
    """

    gen_iterations: int = 0
    crit_iterations: int = 0
    crit_dem_iterations: int = 0


@struct.dataclass
class UResNetTrainState:
    params: Any
    batch_stats: Any
    opt_state: Any
    epoch: int = 0


def tree_select(pred, new_tree, old_tree):
    """Elementwise select between two identical pytrees (used to mask
    optimizer updates for epoch-tail iterations that the reference skips)."""
    import jax.numpy as jnp

    return jax.tree.map(lambda a, b: jnp.where(pred, a, b), new_tree, old_tree)
