"""h5 import/export round-trips + independent torch golden forward pass
(SURVEY.md §4c — golden-value tests for the weight-import path)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from depgan_tpu.config import ModelConfig
from depgan_tpu.io import h5_import as h5io
from depgan_tpu.models import init_critic, init_generator

SMALL = ModelConfig(image_size=32, first_fm=8, noise_size=32, n_input_channels=1)


def randomize(variables, seed=0):
    """Random params + random positive BN stats, to make goldens non-trivial."""
    rng = np.random.default_rng(seed)

    def rnd(leaf, positive=False):
        arr = rng.normal(0.1, 0.5, size=leaf.shape).astype(np.float32)
        return np.abs(arr) + 0.5 if positive else arr

    out = {}
    for coll, tree in variables.items():
        out[coll] = jax.tree.map(
            lambda leaf: rnd(leaf, positive=(coll == "batch_stats")), tree
        )
    return out


class TestH5RoundTrip:
    def test_generator_roundtrip(self, tmp_path):
        model, variables = init_generator(SMALL, jax.random.key(0))
        variables = randomize(variables, 1)
        p = tmp_path / "gen.h5"
        h5io.export_keras_h5(variables, str(p))
        _, fresh = init_generator(SMALL, jax.random.key(42))
        imported = h5io.import_keras_h5(str(p), fresh)

        flat_a = h5io._flatten(variables["params"])
        flat_b = h5io._flatten(imported["params"])
        assert set(flat_a) == set(flat_b)
        for k in flat_a:
            np.testing.assert_array_equal(np.asarray(flat_a[k]), np.asarray(flat_b[k]), err_msg=str(k))
        # batch_stats restored too (Keras moving stats ship in the h5).
        flat_sa = h5io._flatten(variables["batch_stats"])
        flat_sb = h5io._flatten(imported["batch_stats"])
        for k in flat_sa:
            np.testing.assert_array_equal(np.asarray(flat_sa[k]), np.asarray(flat_sb[k]))

        # Imported model reproduces the source model's outputs exactly.
        x = jax.random.normal(jax.random.key(1), (2, 32, 32, 1))
        z = jax.random.normal(jax.random.key(2), (2, 32, 1))
        y_src = model.apply(variables, x, z, train=False)
        y_imp = model.apply(imported, x, z, train=False)
        np.testing.assert_array_equal(np.asarray(y_src), np.asarray(y_imp))

    def test_critic_roundtrip_with_autonamed_dense(self, tmp_path):
        """Keras auto-names the critic's final Dense; the importer must match
        it by unique shape signature (reference :342)."""
        import h5py

        cfg = ModelConfig(image_size=64)
        model, variables = init_critic(cfg, jax.random.key(0))
        variables = randomize(variables, 2)
        p = tmp_path / "critic.h5"
        h5io.export_keras_h5(variables, str(p))
        # Simulate Keras auto-naming: rename 'dis_dense' -> 'dense_1'.
        with h5py.File(p, "r+") as f:
            g = f["dis_dense"]
            f.copy(g, "dense_1")
            new = f["dense_1"]
            items = {}
            def collect(name, obj):
                if hasattr(obj, "shape"):
                    items[name] = np.asarray(obj)
            new.visititems(collect)
            for name, arr in items.items():
                leaf = name.split("/")[-1]
                new.create_dataset(f"dense_1/{leaf}", data=arr)
                del new[name]
            new.attrs["weight_names"] = np.array(
                [f"dense_1/{n.split('/')[-1]}".encode() for n in
                 h5io._decode(g.attrs["weight_names"])], dtype="S")
            del f["dis_dense"]
            names = [n for n in h5io._decode(f.attrs["layer_names"]) if n != "dis_dense"]
            f.attrs["layer_names"] = np.array([n.encode() for n in names + ["dense_1"]], dtype="S")

        _, fresh = init_critic(cfg, jax.random.key(9))
        imported = h5io.import_keras_h5(str(p), fresh)
        x = jax.random.normal(jax.random.key(3), (2, 64, 64, 1))
        np.testing.assert_allclose(
            np.asarray(model.apply(variables, x)),
            np.asarray(model.apply(imported, x)),
            rtol=1e-6,
        )

    def test_strict_raises_on_missing_layer(self, tmp_path):
        import h5py

        _, variables = init_critic(ModelConfig(image_size=32), jax.random.key(0))
        p = tmp_path / "empty.h5"
        with h5py.File(p, "w") as f:
            f.attrs["layer_names"] = np.array([], dtype="S")
        with pytest.raises(ValueError, match="no Keras source"):
            h5io.import_keras_h5(str(p), variables)

    def test_shape_mismatch_raises(self, tmp_path):
        import h5py

        _, variables = init_generator(SMALL, jax.random.key(0))
        p = tmp_path / "bad.h5"
        h5io.export_keras_h5(variables, str(p))
        with h5py.File(p, "r+") as f:
            del f["conv2d_gen_0"]["conv2d_gen_0/kernel:0"]
            f["conv2d_gen_0"].create_dataset(
                "conv2d_gen_0/kernel:0", data=np.zeros((5, 5, 1, 8), np.float32)
            )
        with pytest.raises(ValueError, match="shape"):
            h5io.import_keras_h5(str(p), variables)


# ---------------------------------------------------------------------------
# Independent torch reimplementation of Gen_UNet2D for golden comparison.
# ---------------------------------------------------------------------------


def torch_generator_forward(params, batch_stats, x_nhwc, z, n, nc_out):
    """Forward pass of the generator in torch (NCHW), reading the Flax tree.

    Independent of the JAX code path: plain torch functional ops implementing
    the reference architecture (`...twoCritics_training_4fold.py:349-498`).
    Inference mode: BN uses moving stats (eps 1e-3), dropout off.
    """
    import torch

    def t(a):
        return torch.from_numpy(np.asarray(a, dtype=np.float32))

    def conv(x, layer, tree, pad):
        w = t(tree[layer]["kernel"]).permute(3, 2, 0, 1)
        return torch.nn.functional.conv2d(x, w, t(tree[layer]["bias"]), padding=pad)

    def bn(x, layer, ptree, stree, dense=False):
        g, b = t(ptree[layer]["scale"]), t(ptree[layer]["bias"])
        m, v = t(stree[layer]["mean"]), t(stree[layer]["var"])
        if dense:
            return (x - m) / torch.sqrt(v + 1e-3) * g + b
        shape = (1, -1, 1, 1)
        return (x - m.view(shape)) / torch.sqrt(v.view(shape) + 1e-3) * g.view(shape) + b.view(shape)

    def conv_bn(x, suffix, relu):
        blk = params[f"block_{suffix}"]
        sblk = batch_stats[f"block_{suffix}"]
        h = conv(x, f"conv2d_{suffix}", blk, pad=1)
        h = bn(h, f"bn_{suffix}", blk, sblk)
        return torch.relu(h) if relu else h

    def dense_bn(h, suffix, container_p, container_s, relu=False):
        w = t(container_p[f"dense_{suffix}"]["kernel"])
        b = t(container_p[f"dense_{suffix}"]["bias"])
        h = h @ w + b
        h = bn(h, f"dense_bn_{suffix}", container_p, container_s, dense=True)
        return torch.relu(h) if relu else h

    enc_p, enc_s = params["noise_encoder"], batch_stats["noise_encoder"]
    h = t(z)
    for name in ("noise_1_add_f0", "noise_1_add_f1"):
        blk_p, blk_s = enc_p[name][f"block_{name}"], enc_s[name][f"block_{name}"]
        h = dense_bn(h, name, blk_p, blk_s, relu=True)
    h = h.reshape(h.shape[0], -1)

    def site_mod(site):
        suffix = "noise_2_mul" if site == "p4" else f"noise_2_mul_{site}"
        asuffix = "noise_2_add" if site == "p4" else f"noise_2_add_{site}"
        gamma = dense_bn(h, suffix, enc_p[suffix], enc_s[suffix])
        beta = dense_bn(h, asuffix, enc_p[asuffix], enc_s[asuffix])
        return gamma, beta

    def film_site(trunk, site):
        fp = params[f"film_{site}"][f"block_gen_noise_{site}"]
        fs = batch_stats[f"film_{site}"][f"block_gen_noise_{site}"]
        hh = conv(trunk, f"conv2d_gen_noise_{site}", fp, pad=1)
        hh = bn(hh, f"bn_gen_noise_{site}", fp, fs)
        gamma, beta = site_mod(site)
        hh = torch.relu(hh * gamma[:, :, None, None] + beta[:, :, None, None])
        return trunk + hh

    def level(x, site, cin, cout):
        hh = conv_bn(x, cin, relu=True)
        hh = film_site(hh, site)
        return conv_bn(hh, cout, relu=True)

    def deconv(x, suffix):
        blk = params[f"block_{suffix}"]
        sblk = batch_stats[f"block_{suffix}"]
        w = t(blk[f"deconv2d_{suffix}"]["kernel"]).permute(3, 2, 0, 1)  # (I,O,2,2)
        hh = torch.nn.functional.conv_transpose2d(
            x, w, t(blk[f"deconv2d_{suffix}"]["bias"]), stride=2
        )
        hh = bn(hh, f"bn_{suffix}", blk, sblk)
        return torch.relu(hh)

    pool = torch.nn.functional.max_pool2d

    x = t(x_nhwc).permute(0, 3, 1, 2)
    conv_1 = level(x, "m1", "gen_0", "gen_1")
    conv_3 = level(pool(conv_1, 2), "m2", "gen_2", "gen_3")
    conv_5 = level(pool(conv_3, 2), "m3", "gen_4", "gen_5")
    conv_7 = level(pool(conv_5, 2), "p4", "gen_8", "gen_9")
    up = torch.cat([deconv(conv_7, "de_gen_9"), conv_5], dim=1)
    conv_11 = level(up, "p3", "gen_10", "gen_11")
    up = torch.cat([deconv(conv_11, "de_gen_11"), conv_3], dim=1)
    conv_15 = level(up, "p2", "gen_14", "gen_15")
    up = torch.cat([deconv(conv_15, "de_gen_15"), conv_1], dim=1)
    conv_17 = level(up, "p1", "gen_16", "gen_17")

    w = t(params["gen_segmentation"]["kernel"]).permute(3, 2, 0, 1)
    seg = torch.nn.functional.conv2d(conv_17, w, t(params["gen_segmentation"]["bias"]))
    out = torch.tanh(seg) if nc_out == 1 else torch.softmax(seg, dim=1)
    return out.permute(0, 2, 3, 1).numpy()


class TestTorchGolden:
    def test_generator_matches_torch(self):
        model, variables = init_generator(SMALL, jax.random.key(0))
        variables = randomize(variables, 7)
        x = np.random.default_rng(3).normal(size=(2, 32, 32, 1)).astype(np.float32)
        z = np.random.default_rng(4).normal(size=(2, 32, 1)).astype(np.float32)
        y_jax = np.asarray(model.apply(variables, jnp.asarray(x), jnp.asarray(z), train=False))
        y_torch = torch_generator_forward(
            jax.tree.map(np.asarray, variables["params"]),
            jax.tree.map(np.asarray, variables["batch_stats"]),
            x, z, n=8, nc_out=1,
        )
        np.testing.assert_allclose(y_jax, y_torch, atol=2e-4)

    def test_softmax_variant_matches_torch(self):
        cfg = ModelConfig(image_size=32, first_fm=8, n_out=4, dropout_mode="uresnet")
        model, variables = init_generator(cfg, jax.random.key(0))
        variables = randomize(variables, 8)
        x = np.random.default_rng(5).normal(size=(1, 32, 32, 1)).astype(np.float32)
        z = np.random.default_rng(6).normal(size=(1, 32, 1)).astype(np.float32)
        y_jax = np.asarray(model.apply(variables, jnp.asarray(x), jnp.asarray(z), train=False))
        y_torch = torch_generator_forward(
            jax.tree.map(np.asarray, variables["params"]),
            jax.tree.map(np.asarray, variables["batch_stats"]),
            x, z, n=8, nc_out=4,
        )
        np.testing.assert_allclose(y_jax, y_torch, atol=2e-4)
