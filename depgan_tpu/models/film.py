"""Auxiliary-noise encoder + FiLM-style site modulation.

The reference feeds noise z of shape (B, 32, 1) through two
Dense(32)+BN+ReLU layers (applied along the last axis, giving (B, 32, 32)),
flattens to (B, 1024), then produces a multiplicative (gamma) and additive
(beta) vector per modulation site via paired ``dense_bn`` layers
(`Gen_UNet2D`, `...twoCritics_training_4fold.py:357-395`).

At each site the trunk feature map (B, H, W, C) is modulated as
``relu(conv_bn(x) * gamma + beta)`` and residually added back. Keras'
merge-layer broadcasting left-pads the (B, C) vectors to (B, 1, 1, C)
(reference :403-404), i.e. classic FiLM broadcast over H, W — replicated
exactly here.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from .blocks import ConvBN, DenseBN, DenseBNRelu

# Modulation sites, in reference declaration order, mapped to their channel
# multiple (units = first_fm * multiple): reference :363-395.
SITES = {
    "m1": 1,
    "m2": 2,
    "m3": 3,
    "p4": 4,  # bottleneck; reference names its dense layers 'noise_2_*' bare
    "p3": 3,
    "p2": 2,
    "p1": 1,
}


def _site_suffix(kind: str, site: str) -> str:
    # Reference layer names: 'noise_2_add_m1' ... but the bottleneck pair is
    # plain 'noise_2_add'/'noise_2_mul' (reference :378-380).
    return f"noise_2_{kind}" if site == "p4" else f"noise_2_{kind}_{site}"


class NoiseEncoder(nn.Module):
    """z (B, noise_size, 1) -> {site: (gamma (B,C), beta (B,C))}."""

    first_fm: int = 32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, z, train: bool):
        h = DenseBNRelu(self.first_fm, "noise_1_add_f0", self.dtype, name="noise_1_add_f0")(z, train)
        h = DenseBNRelu(self.first_fm, "noise_1_add_f1", self.dtype, name="noise_1_add_f1")(h, train)
        h = h.reshape(h.shape[0], -1)  # Flatten (reference :360)

        mods = {}
        for site, mult in SITES.items():
            units = self.first_fm * mult
            gamma = DenseBN(units, _site_suffix("mul", site), self.dtype,
                            name=_site_suffix("mul", site))(h, train)
            beta = DenseBN(units, _site_suffix("add", site), self.dtype,
                           name=_site_suffix("add", site))(h, train)
            mods[site] = (gamma, beta)
        return mods


def film_modulate(x, gamma, beta):
    """relu(x * gamma + beta) with (B, C) -> (B, 1, 1, C) broadcast
    (reference :403-405)."""
    gamma = gamma[:, None, None, :]
    beta = beta[:, None, None, :]
    return nn.relu(x * gamma + beta)


class FilmSite(nn.Module):
    """One modulation site: conv_bn -> [dropout] -> FiLM -> residual add
    (reference :401-407 and the six analogous blocks).

    Returns ``trunk + relu(conv_bn(trunk) * gamma + beta)``.
    """

    features: int
    site: str
    dtype: Any = jnp.float32
    use_pallas: bool = False

    @nn.compact
    def __call__(self, trunk, gamma, beta, train: bool, dropout: nn.Module | None = None):
        h = ConvBN(self.features, 3, f"gen_noise_{self.site}", self.dtype,
                   name=f"block_gen_noise_{self.site}")(trunk, train)
        if dropout is not None:
            h = dropout(h)
        if self.use_pallas:
            from ..ops import film_pallas

            return film_pallas.film_residual(h, gamma, beta, trunk)
        return trunk + film_modulate(h, gamma, beta)
