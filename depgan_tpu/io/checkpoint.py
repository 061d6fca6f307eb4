"""Orbax checkpointing of full training state + resume.

The reference persists only generator weights, overwriting one .h5 every
generator iteration, with no optimizer state and no resume logic
(`...twoCritics_training_4fold.py:892`; SURVEY.md §5). Here the FULL state
(generator + both critics + Adam slots + BN stats + iteration counters)
checkpoints atomically and training resumes exactly — including the warm-up
schedule, which depends on the restored counters.

A `save_h5` hook additionally exports the generator in the reference's
Keras .h5 format (io/h5_import.py) for drop-in compatibility with the
reference's testing scripts.
"""

from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Any

import jax
import numpy as np

from ..train.state import Counters
from . import h5_import


def _ocp():
    import orbax.checkpoint as ocp

    return ocp


class CheckpointManager:
    """Step-indexed checkpoints with retention, atomic via orbax."""

    def __init__(self, directory: str | Path, max_to_keep: int = 3):
        ocp = _ocp()
        self.directory = Path(directory).absolute()
        self.directory.mkdir(parents=True, exist_ok=True)
        self.manager = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True
            ),
        )

    def save(self, step: int, state: Any, counters: Counters | None = None,
             extra: dict | None = None) -> None:
        ocp = _ocp()
        meta = {"counters": dataclasses.asdict(counters) if counters else None,
                "extra": extra or {}}
        self.manager.save(
            step,
            args=ocp.args.Composite(
                state=ocp.args.StandardSave(state),
                meta=ocp.args.JsonSave(meta),
            ),
        )
        self.manager.wait_until_finished()

    def restore(self, state_template: Any, step: int | None = None):
        """Returns (state, counters, extra) restored onto the template's
        structure/sharding; ``step=None`` restores the latest."""
        ocp = _ocp()
        step = step if step is not None else self.manager.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoints in {self.directory}")
        restored = self.manager.restore(
            step,
            args=ocp.args.Composite(
                state=ocp.args.StandardRestore(state_template),
                meta=ocp.args.JsonRestore(),
            ),
        )
        meta = restored["meta"] or {}
        counters = (
            Counters(**meta["counters"]) if meta.get("counters") else Counters()
        )
        return restored["state"], counters, meta.get("extra", {})

    def latest_step(self):
        return self.manager.latest_step()

    def close(self):
        self.manager.close()


def load_generator_variables(directory: str | Path, step: int | None = None):
    """Template-free restore of just the generator variables from a
    single-fold training checkpoint directory (the ones ``run_gan_training``
    writes) — lets ``test-gan`` run straight off an orbax checkpoint with no
    .h5 export side-channel. Returns ``{"params", "batch_stats"}`` as host
    arrays; ``step=None`` restores the latest."""
    ocp = _ocp()
    directory = Path(directory).absolute()
    manager = ocp.CheckpointManager(directory)
    try:
        step = step if step is not None else manager.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoints in {directory}")
        restored = manager.restore(
            step,
            args=ocp.args.Composite(state=ocp.args.StandardRestore()),
        )
    finally:
        manager.close()
    state = restored["state"]
    for k in ("g_params", "g_stats"):
        if k not in state:
            raise ValueError(
                f"{directory} step {step} is not a GAN training checkpoint "
                f"(missing '{k}'; found {sorted(state)})"
            )
    return {
        "params": jax.tree.map(np.asarray, state["g_params"]),
        "batch_stats": jax.tree.map(np.asarray, state["g_stats"]),
    }


def export_generator_h5(state, path: str | Path) -> None:
    """Write the generator as a reference-compatible Keras weights file."""
    variables = {
        "params": jax.tree.map(np.asarray, state.g_params),
        "batch_stats": jax.tree.map(np.asarray, state.g_stats),
    }
    h5_import.export_keras_h5(variables, str(path))


def export_uresnet_h5(state, path: str | Path) -> None:
    variables = {
        "params": jax.tree.map(np.asarray, state.params),
        "batch_stats": jax.tree.map(np.asarray, state.batch_stats),
    }
    h5_import.export_keras_h5(variables, str(path))
