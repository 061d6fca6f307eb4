"""Configuration dataclasses.

Replaces the reference's top-of-script constants (layer L0):
`DEP-GAN_PROB_IM_twoCritics_training_4fold.py:16-50`,
`DEP-GAN_testing_4fold.py:12-37`, `DEP-UResNet-wNoises-training-4fold.py:17-27`,
`DEP-UResNet_testing_4fold.py:13-26`.
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass
from pathlib import Path
from typing import Any

# WMH thresholds: probability maps use 0.5, irregularity maps 0.178
# (reference: DEP-GAN_PROB_IM_twoCritics_training_4fold.py:26-29).
PM_THRESHOLD = 0.5
IM_THRESHOLD = 0.178

# Values of the wmh_subtracted_coded label maps
# (reference: README.md and DEP-UResNet-wNoises-training-4fold.py:454-459).
N_CHANGE_CLASSES = 4  # 0=background, 1=shrink, 2=grow, 3=stable


def _threshold_for(use_probability_map: bool) -> float:
    return PM_THRESHOLD if use_probability_map else IM_THRESHOLD


@dataclass(frozen=True)
class DataConfig:
    """Data manifests + preprocessing knobs.

    The manifest format is preserved verbatim from the reference: one
    modality per ``<modality>_fold<k>.txt`` file under ``manifest_dir``, one
    absolute NIfTI path per line, index-aligned across modalities, with
    missing files silently skipped (reference
    ``...twoCritics_training_4fold.py:613-666``).
    """

    manifest_dir: str = "train_data_server_fold"
    folds: tuple[int, ...] = (1, 2, 3, 4)
    image_size: int = 256
    # Number of generator input channels: 1 = map only, 2 = concat(map, FLAIR)
    # (reference :22, :718-722).
    n_input_channels: int = 1
    # True: probability maps (threshold 0.5); False: irregularity maps (0.178).
    use_probability_map: bool = True
    # Percentile used by the robust min-max normaliser (reference :704).
    norm_percentile: float = 0.0
    # Fraction of slices held out for validation (reference :742).
    val_fraction: float = 0.02
    split_seed: int = 42

    @property
    def wmh_threshold(self) -> float:
        return _threshold_for(self.use_probability_map)


@dataclass(frozen=True)
class ModelConfig:
    """Generator / critic architecture knobs (reference :34-45)."""

    image_size: int = 256
    noise_size: int = 32
    first_fm: int = 32  # feature maps of the first U-Net level
    n_input_channels: int = 1
    n_out: int = 1  # 1 (tanh DEM head) for GAN, 4 (softmax) for UResNet
    # 'gan' = Dropout(0.25) throughout (reference :399-485);
    # 'uresnet' = Dropout only on first decoder block
    # (DEP-UResNet-wNoises-training-4fold.py:388); 'none' disables dropout.
    dropout_mode: str = "gan"
    dropout_rate: float = 0.25
    # Compute dtype for the conv trunk. Params are always float32.
    compute_dtype: str = "float32"
    # Route hot blocks through Pallas kernels (ops/) instead of plain XLA.
    use_pallas: bool = False
    # With use_pallas: also route the critics' dis_2/dis_3 tail convs
    # through the s2d conv3 kernel (ops/fast_critic.FusedCritic tail_s2d).
    # Perf knob — semantics identical up to conv rounding (pinned by
    # tests/test_fast_critic.py::TestTailS2d + on-chip checks).
    critic_tail_s2d: bool = False


@dataclass(frozen=True)
class GanTrainConfig:
    """Two-critic WGAN-GP training (reference :34-50, :506-894)."""

    batch_size: int = 16
    n_epochs: int = 200  # 'niter', reference :38
    d_iters: int = 5  # critic steps per generator step, reference :36
    warmup_d_iters: int = 100  # reference :792-797
    warmup_until: int = 25  # gen_iterations below which warm-up applies
    warmup_every: int = 500  # gen_iterations % warmup_every == 0 re-warms
    gp_weight: float = 10.0  # 'delta', reference :37
    lr_d: float = 1e-4
    lr_g: float = 1e-4
    adam_b1: float = 0.0
    adam_b2: float = 0.9
    k_noise: int = 10  # best-of-k noise probe, reference :868
    # L1(DEM) / volume-MSE / Dice-loss weights (reference :574-592).
    l1_weight: float = 100.0
    vol_weight: float = 100.0
    dice_weight: float = 1.0
    # Reference quirk: the volume & Dice terms use a hard >= threshold and so
    # carry zero gradient (reference :581-589). 'hard' reproduces that;
    # 'soft' substitutes a sigmoid((x - t)/tau) surrogate that does train.
    threshold_mode: str = "hard"
    soft_threshold_tau: float = 0.02
    # Reference quirk: gen/crit iteration counters are module-global and never
    # reset between folds (reference :47-49,:506), so folds 2-4 skip warm-up.
    reset_counters_per_fold: bool = False
    # BatchNorm/Dropout behaviour inside the WGAN graphs. The reference's
    # K.function graphs run with Keras learning-phase 0, so BN uses its
    # (never-updated) moving statistics and Dropout is inactive
    # (...twoCritics_training_4fold.py:549-598 pass no learning phase).
    # 'frozen' reproduces that; 'batch' uses batch stats + updates them.
    bn_mode: str = "frozen"
    validate_every: int = 10  # gen iterations (reference :842)
    image_log_every: int = 500  # reference :858
    n_val_images: int = 50  # validation images per dump (reference :862 [:50])
    # The reference saves netG every generator iteration (reference :892);
    # checkpoint_every=1 reproduces that, default saves at sane intervals.
    checkpoint_every: int = 100
    # Supersteps between metric fetches. Each superstep's scalars are packed
    # into one device vector and fetched in a single batched transfer every
    # this-many supersteps (plus before any validation and at fit end), so
    # the dispatch pipeline never blocks on logging. Values/steps emitted
    # are identical to eager logging; 1 restores per-step fetching.
    metric_flush_every: int = 25
    # Steady supersteps scanned inside ONE device dispatch (trajectory-
    # identical to sequential dispatches; chunks end exactly at validation/
    # checkpoint boundaries and D-schedule changes). 0 = auto
    # (min(validate_every, metric_flush_every)); 1 = one dispatch per
    # superstep. Dispatch marshaling is ~2.6 s/call on the remote backend
    # vs 0.6 s of device compute (docs/PERF.md round 3) — chunking divides
    # that overhead by the chunk length.
    dispatch_chunk: int = 0
    seed: int = 0


@dataclass(frozen=True)
class UResNetTrainConfig:
    """Supervised trainer (DEP-UResNet-wNoises-training-4fold.py:17-27)."""

    batch_size: int = 16  # 'nb_samples'
    n_epochs: int = 200
    lr: float = 1e-4
    n_classes: int = N_CHANGE_CLASSES
    shuffle_each_epoch: bool = True
    checkpoint_every: int = 1  # epochs (reference saves every epoch, :620-625)
    # Batches scanned inside ONE device dispatch (same dispatch-marshaling
    # economics as GanTrainConfig.dispatch_chunk: ~2.6 s/call on the remote
    # backend). The host needs nothing mid-epoch, so chunks are free up to
    # compile count: epochs run as full chunks of this length plus one
    # remainder chunk (two compiled programs). Trajectory-identical to
    # per-batch dispatch (the in-scan RNG split sequence IS the host
    # sequence). 0 = auto (32); 1 = one dispatch per batch.
    dispatch_chunk: int = 0
    seed: int = 0


@dataclass(frozen=True)
class EvalConfig:
    """Inference + evaluation (DEP-GAN_testing_4fold.py:12-37,616-628)."""

    n_repeat: int = 10  # stochastic ensemble size
    use_probability_map: bool = True
    n_input_channels: int = 1
    output_dir: str = "outputs"
    seed: int = 0
    # Route inference through the MXU-optimised FastGenerator
    # (folded BN + fused Pallas s2d convs, ops/fast_gen.py).
    fast: bool = False

    @property
    def wmh_threshold(self) -> float:
        return _threshold_for(self.use_probability_map)


@dataclass(frozen=True)
class MeshConfig:
    """Device-mesh layout for pjit/shard_map data parallelism.

    The reference is single-GPU (SURVEY.md §2.7); here the batch axis shards
    over `data` and independent folds can shard over `fold`.
    """

    data_axis: str = "data"
    fold_axis: str = "fold"
    n_data: int = -1  # -1: all devices
    n_fold: int = 1


def to_dict(cfg: Any) -> dict:
    return dataclasses.asdict(cfg)


def save_config(cfg: Any, path: str | Path) -> None:
    Path(path).write_text(json.dumps(to_dict(cfg), indent=2))


def load_config(cls, path: str | Path):
    return cls(**json.loads(Path(path).read_text()))
