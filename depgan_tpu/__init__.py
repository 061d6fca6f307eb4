"""depgan_tpu — a TPU-native JAX framework for Disease Evolution Prediction.

Re-implements, TPU-first (JAX/XLA/Pallas/pjit), the capabilities of the
reference DEP-GAN / DEP-UResNet codebase (febrianrachmadi/dep-gan-im):

- DEP-GAN: two-critic WGAN-GP with a U-Net generator modulated by auxiliary
  noise (FiLM-style), predicting Disease Evolution Maps (DEM) of white matter
  hyperintensities between two MRI time points.
- DEP-UResNet: the same backbone as a supervised 4-class change segmenter
  (background / shrink / grow / stable).
- NIfTI manifest data pipeline, 4-fold train/test drivers, Keras-.h5 weight
  import, stochastic-ensemble inference, volumetric + 6-way Dice evaluation.

Layer map (see SURVEY.md §1): config -> data -> models -> train/eval -> io,
with `parallel/` providing the jax.sharding mesh layer and `ops/` the Pallas
kernels for the hot paths.
"""

__version__ = "0.1.0"
