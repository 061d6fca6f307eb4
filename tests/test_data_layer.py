"""Unit tests for the L2 data layer (SURVEY.md §4a)."""

import numpy as np
import pytest

from depgan_tpu.data import manifest as mf
from depgan_tpu.data import nifti
from depgan_tpu.data import preprocess as pp


class TestNifti:
    def test_roundtrip_nii(self, tmp_path, tiny_volume):
        affine = np.diag([1.0, 2.0, 3.0, 1.0])
        affine[:3, 3] = [4, 5, 6]
        p = tmp_path / "vol.nii"
        nifti.save(tiny_volume, affine, p)
        loaded = nifti.load(p)
        np.testing.assert_allclose(loaded.image, tiny_volume, rtol=1e-6)
        np.testing.assert_allclose(loaded.affine, affine, rtol=1e-6)
        np.testing.assert_allclose(loaded.pixdim, [1.0, 2.0, 3.0], rtol=1e-5)

    def test_roundtrip_nii_gz(self, tmp_path, tiny_volume):
        p = tmp_path / "vol.nii.gz"
        nifti.save(tiny_volume, np.eye(4), p)
        loaded = nifti.load(p)
        np.testing.assert_allclose(loaded.image, tiny_volume, rtol=1e-6)

    def test_integer_dtype_preserved(self, tmp_path):
        vol = np.arange(24, dtype=np.int16).reshape(2, 3, 4)
        p = tmp_path / "labels.nii.gz"
        nifti.save(vol, np.eye(4), p)
        loaded = nifti.load(p)
        assert loaded.image.dtype == np.int16
        np.testing.assert_array_equal(loaded.image, vol)

    def test_scl_slope_applied(self, tmp_path, tiny_volume):
        # Write a file, patch scl_slope/inter in the header, reload.
        import struct

        p = tmp_path / "scaled.nii"
        nifti.save(tiny_volume, np.eye(4), p)
        raw = bytearray(p.read_bytes())
        struct.pack_into("<f", raw, 112, 2.0)  # scl_slope
        struct.pack_into("<f", raw, 116, 1.5)  # scl_inter
        p.write_bytes(bytes(raw))
        loaded = nifti.load(p)
        np.testing.assert_allclose(loaded.image, tiny_volume * 2.0 + 1.5, rtol=1e-5)

    def test_volume_to_slices_shape_and_content(self, tiny_volume):
        s = nifti.volume_to_slices(tiny_volume)
        assert s.shape == (6, 12, 10, 1)
        assert s.dtype == np.float32
        np.testing.assert_array_equal(s[3, :, :, 0], tiny_volume[:, :, 3])

    def test_save_orientation_roundtrip(self, tiny_volume):
        # data_prep_save(data_prep(v)) == v (reference :105-128).
        s = nifti.volume_to_slices(tiny_volume)
        back = nifti.slices_to_volume(s)
        np.testing.assert_array_equal(back, tiny_volume)


class TestPreprocess:
    def test_minmax_maps_to_unit_range(self, rng):
        img = rng.uniform(5, 50, size=(4, 8, 8)).astype(np.float32)
        out = pp.map_to_intensity_range(img, 0, 1)
        assert out.min() == pytest.approx(0.0, abs=1e-6)
        assert out.max() == pytest.approx(1.0, abs=1e-6)
        #

    def test_minmax_matches_reference_formula(self):
        img = np.array([[0.0, 5.0], [10.0, 20.0]])
        out = pp.map_to_intensity_range(img, 0, 1)
        np.testing.assert_allclose(out, img / 20.0)

    def test_minmax_percentile_clips(self, rng):
        img = rng.normal(size=1000).astype(np.float64)
        out = pp.map_to_intensity_range(img, 0, 1, percentiles=5)
        assert (out == 0).sum() > 0 and (out == 1).sum() > 0

    def test_zscore(self, rng):
        img = rng.normal(3.0, 2.0, size=(10, 10)).astype(np.float64)
        out = pp.zscore_normalise(img)
        assert abs(out.mean()) < 1e-9
        assert abs(out.std() - 1) < 1e-9

    def test_zscore_nan_to_num(self):
        img = np.zeros((4, 4))  # std == 0 -> NaN -> 0
        out = pp.zscore_normalise(img)
        np.testing.assert_array_equal(out, np.zeros((4, 4)))

    def test_zscore_all_masked_volume_no_warning(self):
        """An all-masked (constant) subject normalises to zeros without a
        divide-by-zero RuntimeWarning (VERDICT r1 weak #7)."""
        import warnings

        for img in (np.zeros((6, 6), np.float32), np.full((6, 6), 3.5)):
            with warnings.catch_warnings():
                warnings.simplefilter("error")
                out = pp.zscore_normalise(img)
            np.testing.assert_array_equal(out, np.zeros((6, 6)))

    def test_masking(self):
        img = np.ones((2, 3, 3, 1))
        icv = np.zeros_like(img)
        icv[:, 1] = 1
        out = pp.apply_brain_mask(img, icv)
        assert out.sum() == 6
        sl = np.zeros_like(img)
        sl[:, 1, 1] = 1
        out2 = pp.apply_lesion_mask(out, sl)
        assert out2.sum() == 4

    def test_clamp_negative(self):
        img = np.array([-1.0, 0.0, 0.5])
        np.testing.assert_array_equal(pp.clamp_negative(img), [0.0, 0.0, 0.5])

    def test_assemble_channels(self):
        m = np.ones((2, 4, 4, 1))
        f = np.full((2, 4, 4, 1), 2.0)
        assert pp.assemble_channels(m, f, 1).shape == (2, 4, 4, 1)
        out = pp.assemble_channels(m, f, 2)
        assert out.shape == (2, 4, 4, 2)
        assert out[0, 0, 0, 1] == 2.0

    def test_one_hot_roundtrip(self, rng):
        labels = rng.integers(0, 4, size=(3, 5, 5, 1))
        oh = pp.one_hot(labels, 4)
        assert oh.shape == (3, 5, 5, 1, 4)
        assert oh.sum() == labels.size
        back = pp.from_one_hot(np.squeeze(oh, 3).astype(np.float32))
        np.testing.assert_array_equal(back, np.squeeze(labels, -1))

    def test_from_one_hot_to_float_returns_max_prob(self):
        probs = np.zeros((1, 2, 2, 3), dtype=np.float32)
        probs[0, :, :, 0] = 0.2
        probs[0, :, :, 1] = 0.7
        probs[0, :, :, 2] = 0.1
        out = pp.from_one_hot(probs, to_float=True)
        np.testing.assert_allclose(out, np.full((2, 2), 0.7))


class TestManifest:
    def _write_manifests(self, tmp_path, files):
        d = tmp_path / "manifests"
        d.mkdir()
        for name, lines in files.items():
            (d / name).write_text("\n".join(lines) + "\n")
        return d

    def test_bundle_alignment_and_skip_missing(self, tmp_path):
        # Create two real files and one missing path.
        real1 = tmp_path / "a.nii"
        real2 = tmp_path / "b.nii"
        real1.touch()
        real2.touch()
        d = self._write_manifests(
            tmp_path,
            {
                "flair_1tp_fold1.txt": [str(real1), str(tmp_path / "missing.nii"), str(real2)],
                "icv_1tp_fold1.txt": ["icv_a", "icv_b", "icv_c"],
                "name_fold1.txt": ["SUBJ_A", "SUBJ_B", "SUBJ_C"],
            },
        )
        bundle = mf.ManifestBundle(
            d, 1, ("flair_1tp", "icv_1tp"), primary="flair_1tp", name_modality="name"
        )
        subs = list(bundle.subjects())
        assert [s.name for s in subs] == ["SUBJ_A", "SUBJ_C"]
        # Index alignment survives the skip.
        assert subs[1].path("icv_1tp") == "icv_c"
        assert subs[1].index == 2

    def test_optional_modality_exists(self, tmp_path):
        real = tmp_path / "sl.nii"
        real.touch()
        d = self._write_manifests(
            tmp_path,
            {
                "flair_1tp_fold2.txt": [str(real)],
                "sl_cleaned_1tp_fold2.txt": [str(tmp_path / "nope.nii")],
            },
        )
        bundle = mf.ManifestBundle(
            d, 2, ("flair_1tp", "sl_cleaned_1tp"), primary="flair_1tp"
        )
        (sub,) = bundle.subjects()
        assert sub.exists("flair_1tp")
        assert not sub.exists("sl_cleaned_1tp")


class TestPipeline:
    def test_epoch_shuffler_shapes(self):
        from depgan_tpu.data.pipeline import EpochShuffler

        sh = EpochShuffler(n=103, batch_size=16, seed=1)
        idx = sh.epoch()
        assert idx.shape == (6, 16)
        assert len(np.unique(idx)) == 96

    def test_device_dataset_gather(self):
        import jax.numpy as jnp

        from depgan_tpu.data.pipeline import DeviceDataset

        ds = DeviceDataset({"x": np.arange(20, dtype=np.float32).reshape(10, 2)})
        out = ds["x"][jnp.asarray([1, 3])]
        np.testing.assert_array_equal(np.asarray(out), [[2, 3], [6, 7]])

    def test_prefetch_yields_all(self):
        from depgan_tpu.data.pipeline import prefetch

        assert list(prefetch(range(10))) == list(range(10))

    def test_prefetch_propagates_errors(self):
        from depgan_tpu.data.pipeline import prefetch

        def gen():
            yield 1
            raise ValueError("boom")

        it = prefetch(gen())
        assert next(it) == 1
        with pytest.raises(ValueError):
            list(it)
