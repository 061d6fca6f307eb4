"""Layer building blocks (L3) as Flax modules.

TPU-first re-design of the reference's Keras layer builders
(`dense_bn`, `conv2d_bn[_relu]`, `deconv2d_bn_relu`, ...;
`...twoCritics_training_4fold.py:255-312`). Semantics are kept
Keras-compatible so the shipped `.h5` weights import exactly:

- BatchNorm: momentum 0.99, epsilon 1e-3 (Keras defaults).
- Conv2D: SAME padding, glorot_uniform kernels, HWIO layout (same as Keras).
- Dense: he_normal kernels (reference :256).
- Conv2DTranspose(k=2, s=2, 'valid'): implemented as a single matmul +
  pixel-shuffle reshape (`Deconv2x2`) — each input pixel emits a 2x2 block,
  so the op maps straight onto the MXU instead of a strided scatter. The
  kernel parameter keeps Keras' (kh, kw, out, in) layout for import parity.

Module *names* mirror the reference layer names (e.g. ``conv2d_gen_0`` /
``bn_gen_0``), which makes the h5 importer (io/h5_import.py) a pure key walk.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

KERAS_BN_MOMENTUM = 0.99
KERAS_BN_EPS = 1e-3

glorot = nn.initializers.glorot_uniform()
he_normal = nn.initializers.he_normal()


def keras_bn(name: str, dtype=jnp.float32) -> nn.BatchNorm:
    """BatchNorm with Keras default hyperparameters.

    Note the reference's WGAN K.function graphs run with learning-phase 0, so
    BN there always consumes (never-updated) moving statistics
    (`...twoCritics_training_4fold.py:549-598`); callers select that via
    ``use_running_average``.
    """
    return nn.BatchNorm(
        momentum=KERAS_BN_MOMENTUM,
        epsilon=KERAS_BN_EPS,
        dtype=dtype,
        name=name,
    )


class ConvBNRelu(nn.Module):
    """conv2d_bn_relu (reference :285-290): Conv -> BN -> ReLU."""

    features: int
    kernel: int = 3
    suffix: str = ""
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        x = nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            padding="SAME",
            kernel_init=glorot,
            dtype=self.dtype,
            name=f"conv2d_{self.suffix}",
        )(x)
        x = keras_bn(f"bn_{self.suffix}", self.dtype)(x, use_running_average=not train)
        return nn.relu(x)


class ConvBN(nn.Module):
    """conv2d_bn (reference :293-297): Conv -> BN, no activation."""

    features: int
    kernel: int = 3
    suffix: str = ""
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        x = nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            padding="SAME",
            kernel_init=glorot,
            dtype=self.dtype,
            name=f"conv2d_{self.suffix}",
        )(x)
        return keras_bn(f"bn_{self.suffix}", self.dtype)(x, use_running_average=not train)


class ConvRelu(nn.Module):
    """conv2d_relu (reference :300-304): Conv -> ReLU, no BN.

    The critic is built exclusively from these — WGAN-GP forbids BN in the
    critic (`Dis_C2D_FCN1`, reference :316-345).
    """

    features: int
    kernel: int = 3
    suffix: str = ""
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            padding="SAME",
            kernel_init=glorot,
            dtype=self.dtype,
            name=f"conv2d_{self.suffix}",
        )(x)
        return nn.relu(x)


class DenseBN(nn.Module):
    """dense_bn (reference :255-259): Dense(he_normal) -> BN."""

    units: int
    suffix: str = ""
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        x = nn.Dense(
            self.units, kernel_init=he_normal, dtype=self.dtype,
            name=f"dense_{self.suffix}",
        )(x)
        return keras_bn(f"dense_bn_{self.suffix}", self.dtype)(
            x, use_running_average=not train
        )


class DenseBNRelu(nn.Module):
    """dense_bn_relu (reference :262-267)."""

    units: int
    suffix: str = ""
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        x = DenseBN(self.units, self.suffix, self.dtype, name=f"block_{self.suffix}")(
            x, train
        )
        return nn.relu(x)


class Deconv2x2(nn.Module):
    """Keras Conv2DTranspose(k=2, s=2, padding='valid') as matmul + reshape.

    out[b, 2i+di, 2j+dj, o] = sum_c x[b, i, j, c] * W[di, dj, o, c] + b[o]

    Because kernel size == stride, output blocks never overlap, so the
    transposed conv is exactly a per-pixel (C -> 4*O) matmul followed by a
    depth-to-space reshape — a pure MXU op with no scatter. The parameter is
    stored in Keras Conv2DTranspose layout (kh, kw, out, in) so the h5
    importer copies it verbatim (reference `deconv2d_bn_relu`, :307-312).
    """

    features: int
    suffix: str = ""
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        kernel = self.param(
            "kernel", glorot, (2, 2, self.features, in_ch), jnp.float32
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        b, h, w, _ = x.shape
        # (2, 2, O, C) -> (C, 2*2*O)
        w2 = jnp.transpose(kernel, (3, 0, 1, 2)).reshape(in_ch, 4 * self.features)
        y = jnp.dot(x.astype(self.dtype), w2.astype(self.dtype))
        y = y.reshape(b, h, w, 2, 2, self.features)
        y = jnp.transpose(y, (0, 1, 3, 2, 4, 5)).reshape(
            b, 2 * h, 2 * w, self.features
        )
        return y + bias.astype(self.dtype)


class DeconvBNRelu(nn.Module):
    """deconv2d_bn_relu (reference :307-312): Deconv2x2 -> BN -> ReLU."""

    features: int
    suffix: str = ""
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        x = Deconv2x2(self.features, self.suffix, self.dtype, name=f"deconv2d_{self.suffix}")(x)
        x = keras_bn(f"bn_{self.suffix}", self.dtype)(x, use_running_average=not train)
        return nn.relu(x)


def max_pool_2x2(x):
    """MaxPooling2D(pool_size=(2, 2)) (reference :321 etc.)."""
    return nn.max_pool(x, window_shape=(2, 2), strides=(2, 2))
