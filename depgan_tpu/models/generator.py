"""Gen_UNet2D — the shared U-Net backbone of DEP-GAN and DEP-UResNet.

Faithful re-design of the reference generator
(`...twoCritics_training_4fold.py:349-498`; softmax variant
`DEP-UResNet-wNoises-training-4fold.py:291-428`):

- encoder: 3 levels (n, 2n, 3n feature maps) with max-pool downsamples,
- bottleneck at 4n,
- decoder: 3 levels with Deconv2x2 upsamples + skip concatenation,
- a FiLM noise-modulation site at every level (7 sites total),
- head: 1x1 conv -> tanh (nc_out=1, DEM in [-1, 1]) or softmax (nc_out=4).

Differences between the two published variants are config, not code:
``dropout_mode='gan'`` applies Dropout(0.25) at every site (reference
:399-485); ``'uresnet'`` only after the first decoder conv
(`DEP-UResNet-wNoises-training-4fold.py:388`); ``'none'`` disables dropout.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from ..config import ModelConfig
from .blocks import ConvBNRelu, max_pool_2x2, DeconvBNRelu, glorot
from .film import FilmSite, NoiseEncoder


class GenUNet2D(nn.Module):
    """U-Net generator with auxiliary-noise FiLM modulation.

    Call: ``model.apply(vars, x, z, train=..., rngs={'dropout': ...})`` with
    x (B, H, W, C_in) and z (B, noise_size, 1); returns (B, H, W, nc_out).
    """

    cfg: ModelConfig

    def _dropout(self, name: str, train: bool, stage: str):
        """Returns a dropout callable or None per the configured placement."""
        mode = self.cfg.dropout_mode
        active = (mode == "gan") or (mode == "uresnet" and name == "do_gen_1a")
        if not active:
            return None
        # In 'uresnet' mode the reference names the single dropout 'do_gen_1'.
        layer_name = "do_gen_1" if mode == "uresnet" else name
        drop = nn.Dropout(rate=self.cfg.dropout_rate, deterministic=not train,
                          name=layer_name)
        return drop

    @nn.compact
    def __call__(self, x, z, train: bool = False):
        cfg = self.cfg
        n = cfg.first_fm
        dtype = jnp.dtype(cfg.compute_dtype)
        x = x.astype(dtype)
        z = z.astype(dtype)

        mods = NoiseEncoder(n, dtype, name="noise_encoder")(z, train)

        def site(trunk, features, site_name, do_a, do_b, conv_in, conv_out):
            """One full level: conv_bn_relu -> dropout -> FiLM residual ->
            conv_bn_relu (reference :398-409 and analogous blocks)."""
            h = ConvBNRelu(features, 3, conv_in, dtype, name=f"block_{conv_in}")(trunk, train)
            d = self._dropout(do_a, train, "a")
            if d is not None:
                h = d(h)
            gamma, beta = mods[site_name]
            d_b = self._dropout(do_b, train, "b")
            h = FilmSite(features, site_name, dtype, cfg.use_pallas,
                         name=f"film_{site_name}")(h, gamma, beta, train, d_b)
            return ConvBNRelu(features, 3, conv_out, dtype, name=f"block_{conv_out}")(h, train)

        # Encoder (reference :397-435)
        conv_1 = site(x, n, "m1", "do_gen_a3", "do_gen_b3", "gen_0", "gen_1")
        pool_0 = max_pool_2x2(conv_1)
        conv_3 = site(pool_0, n * 2, "m2", "do_gen_a2", "do_gen_b2", "gen_2", "gen_3")
        pool_1 = max_pool_2x2(conv_3)
        conv_5 = site(pool_1, n * 3, "m3", "do_gen_a1", "do_gen_b1", "gen_4", "gen_5")
        pool_2 = max_pool_2x2(conv_5)

        # Bottleneck (reference :437-450)
        conv_7 = site(pool_2, n * 4, "p4", "do_gen_0a", "do_gen_0b", "gen_8", "gen_9")
        up = DeconvBNRelu(n * 4, "de_gen_9", dtype, name="block_de_gen_9")(conv_7, train)
        up = jnp.concatenate([up, conv_5], axis=-1)

        # Decoder (reference :452-491)
        conv_11 = site(up, n * 3, "p3", "do_gen_1a", "do_gen_1b", "gen_10", "gen_11")
        up = DeconvBNRelu(n * 3, "de_gen_11", dtype, name="block_de_gen_11")(conv_11, train)
        up = jnp.concatenate([up, conv_3], axis=-1)

        conv_15 = site(up, n * 2, "p2", "do_gen_2a", "do_gen_2b", "gen_14", "gen_15")
        up = DeconvBNRelu(n * 2, "de_gen_15", dtype, name="block_de_gen_15")(conv_15, train)
        up = jnp.concatenate([up, conv_1], axis=-1)

        conv_17 = site(up, n, "p1", "do_gen_3a", "do_gen_3b", "gen_16", "gen_17")

        # Segmentation head (reference :493-495)
        logits = nn.Conv(
            cfg.n_out, (1, 1), padding="SAME", kernel_init=glorot, dtype=dtype,
            name="gen_segmentation",
        )(conv_17)
        logits = logits.astype(jnp.float32)
        if cfg.n_out == 1:
            return jnp.tanh(logits)
        return nn.softmax(logits, axis=-1)


def make_generator(cfg: ModelConfig) -> GenUNet2D:
    return GenUNet2D(cfg)


def init_generator(cfg: ModelConfig, rng, batch: int = 1):
    """Initialise variables with dummy inputs of the configured shapes."""
    model = make_generator(cfg)
    x = jnp.zeros((batch, cfg.image_size, cfg.image_size, cfg.n_input_channels))
    z = jnp.zeros((batch, cfg.noise_size, 1))
    variables = model.init({"params": rng}, x, z, train=False)
    return model, variables
