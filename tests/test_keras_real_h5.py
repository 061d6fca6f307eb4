"""Importer vs a GENUINE Keras-written .h5 (VERDICT r1 item 5).

Round 1 only ever tested io/h5_import.py against its own exporter — a
self-consistency loop. Here the fixture is written by actual Keras
(`model.save(..., .h5)`, the same call as the reference's
`...twoCritics_training_4fold.py:892`) over representative layer types:
Conv2D, BatchNormalization, Conv2DTranspose, weightless layers
(Input/Activation/Flatten) and an auto-named Dense. The test asserts both
weight transfer and forward-pass agreement, so it fails if Keras's real
on-disk conventions (nested `model_weights`, per-layer scoped dataset
paths, `layer_names`/`weight_names` attrs) or layer semantics (BN eps /
momentum, Conv2DTranspose kernel layout) differ from what the importer and
the Flax blocks assume.

A second variant rewrites the same file into the TF1-era Keras 2
conventions the shipped reference weights use (bytes attrs, ``:0`` variable
suffixes, ``dense_1`` auto-numbering, ``keras_version``/``backend`` root
attrs) and asserts the import is identical.
"""

import os

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

os.environ.setdefault("CUDA_VISIBLE_DEVICES", "")

import jax
import jax.numpy as jnp
from flax import linen as nn

from depgan_tpu.io import h5_import
from depgan_tpu.models.blocks import ConvBNRelu, Deconv2x2


def _keras_fixture(path, rng):
    """A genuine Keras model with the reference's layer-type mix, random
    (non-default) weights, saved via model.save to legacy HDF5."""
    from tensorflow import keras
    from tensorflow.keras import layers as kl

    inp = kl.Input((8, 8, 1), name="input_gen_chn_0")
    x = kl.Conv2D(4, 3, padding="same", name="conv2d_gen_0")(inp)
    x = kl.BatchNormalization(name="bn_gen_0")(x)
    x = kl.Activation("relu", name="relu_gen_0")(x)
    x = kl.Conv2DTranspose(2, 2, strides=2, padding="valid",
                           name="deconv2d_gen_p3")(x)
    x = kl.Flatten()(x)
    x = kl.Dense(1)(x)  # auto-named, like the critic's Dense (ref :342)
    model = keras.Model(inp, x)
    for w in model.weights:
        shape = w.shape
        if "moving_variance" in w.name or w.name == "variance":
            w.assign(rng.uniform(0.5, 1.5, shape).astype(np.float32))
        else:
            w.assign(rng.normal(0, 0.5, shape).astype(np.float32))
    model.save(str(path))
    return model


class FlaxTwin(nn.Module):
    """Same architecture from depgan_tpu blocks, reference-style names."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvBNRelu(4, 3, suffix="gen_0")(x, train)
        x = Deconv2x2(2, name="deconv2d_gen_p3")(x)
        x = x.reshape((x.shape[0], -1))
        return nn.Dense(1, name="head_dense")(x)


def _to_tf1_conventions(src, dst):
    """Rewrite a Keras-3-written legacy h5 into the TF1-era Keras 2 layout
    of the shipped reference weights: bytes attrs, ':0' weight-name
    suffixes, auto-numbered 'dense_1', keras_version/backend attrs."""
    import shutil

    import h5py

    shutil.copy(src, dst)
    renames = {"dense": "dense_1"}
    with h5py.File(dst, "r+") as f:
        f.attrs["keras_version"] = b"2.2.4"
        f.attrs["backend"] = b"tensorflow"
        g = f["model_weights"]
        g.attrs["keras_version"] = b"2.2.4"
        g.attrs["backend"] = b"tensorflow"
        names = [n.decode() if isinstance(n, bytes) else str(n)
                 for n in g.attrs["layer_names"]]
        new_names = [renames.get(n, n) for n in names]
        for old, new in renames.items():
            if old in g:
                g.move(old, new)
                if old in g[new]:  # inner variable-scope group
                    g[new].move(old, new)
        g.attrs["layer_names"] = np.array([n.encode() for n in new_names],
                                          dtype="S")
        for lname in new_names:
            lg = g[lname]
            wns = [w.decode() if isinstance(w, bytes) else str(w)
                   for w in lg.attrs.get("weight_names", [])]
            fixed = []
            for w in wns:
                for old, new in renames.items():
                    if w.startswith(old + "/"):
                        w = new + w[len(old):]
                lg.move(w, w + ":0")
                fixed.append((w + ":0").encode())
            lg.attrs["weight_names"] = np.array(fixed, dtype="S")


class TestRealKerasH5:
    @pytest.fixture(scope="class")
    def fixture(self, tmp_path_factory):
        rng = np.random.default_rng(42)
        path = tmp_path_factory.mktemp("keras") / "genuine_keras.h5"
        model = _keras_fixture(path, rng)
        x = rng.normal(0, 1, (2, 8, 8, 1)).astype(np.float32)
        y_keras = np.asarray(model(x))
        return path, x, y_keras

    def _import_and_run(self, h5_path, x):
        twin = FlaxTwin()
        variables = twin.init(jax.random.key(0), jnp.zeros((1, 8, 8, 1)))
        variables = h5_import.import_keras_h5(str(h5_path), variables)
        return variables, np.asarray(twin.apply(variables, jnp.asarray(x)))

    def test_import_and_forward_match_keras(self, fixture):
        path, x, y_keras = fixture
        variables, y_flax = self._import_and_run(path, x)
        # every weight actually transferred
        import h5py

        with h5py.File(path) as f:
            g = f["model_weights"]
            np.testing.assert_array_equal(
                np.asarray(g["conv2d_gen_0/conv2d_gen_0/kernel"]),
                np.asarray(variables["params"]["ConvBNRelu_0"]["conv2d_gen_0"]["kernel"]),
            )
            np.testing.assert_array_equal(
                np.asarray(g["bn_gen_0/bn_gen_0/moving_variance"]),
                np.asarray(variables["batch_stats"]["ConvBNRelu_0"]["bn_gen_0"]["var"]),
            )
            np.testing.assert_array_equal(
                np.asarray(g["deconv2d_gen_p3/deconv2d_gen_p3/kernel"]),
                np.asarray(variables["params"]["deconv2d_gen_p3"]["kernel"]),
            )
            # auto-named Dense found by unique-shape fallback
            np.testing.assert_array_equal(
                np.asarray(g["dense/dense/kernel"]),
                np.asarray(variables["params"]["head_dense"]["kernel"]),
            )
        # forward agreement pins BN eps/momentum semantics + deconv layout
        np.testing.assert_allclose(y_flax, y_keras, atol=2e-4)

    def test_tf1_era_conventions_variant(self, fixture, tmp_path):
        path, x, y_keras = fixture
        tf1_path = tmp_path / "tf1_style.h5"
        _to_tf1_conventions(path, tf1_path)
        _, y_flax = self._import_and_run(tf1_path, x)
        np.testing.assert_allclose(y_flax, y_keras, atol=2e-4)

    def test_strict_error_on_missing_layer(self, fixture):
        """strict import refuses a file that lacks a model layer."""
        path, x, _ = fixture

        class Bigger(nn.Module):
            @nn.compact
            def __call__(self, x):
                x = nn.Conv(4, (3, 3), name="conv2d_gen_0")(x)
                return nn.Conv(7, (5, 5), name="conv2d_extra")(x)

        variables = Bigger().init(jax.random.key(0), jnp.zeros((1, 8, 8, 1)))
        with pytest.raises(ValueError, match="no Keras source"):
            h5_import.import_keras_h5(str(path), variables)
