"""Tests for the evaluation subsystem: metrics math, ensemble predictor,
and a synthetic-subject end-to-end GAN/UResNet test run (the reference's
'testing scripts as integration tests', SURVEY.md §4)."""

import jax
import numpy as np
import pytest

from depgan_tpu.config import DataConfig, EvalConfig, ModelConfig
from depgan_tpu.data import nifti
from depgan_tpu.eval import metrics as M
from depgan_tpu.eval.predict import EnsemblePredictor, reconstruct_follow_up
from depgan_tpu.models import init_generator


class TestMetrics:
    def test_category_dice_perfect_and_disjoint(self):
        a = np.array([[1, 2], [3, 0]])
        assert M.category_dice(a, a, 1) == pytest.approx(1.0, abs=1e-6)
        b = np.array([[2, 1], [0, 3]])
        assert M.category_dice(b, a, 1) == pytest.approx(0.0, abs=1e-6)

    def test_dice_empty_class_is_one(self):
        # smooth/smooth = 1 when neither map contains the class.
        a = np.zeros((4, 4))
        assert M.category_dice(a, a, 2) == pytest.approx(1.0)

    def test_code_change_map(self):
        y1 = np.array([[0.9, 0.1], [0.9, 0.1]])
        y2 = np.array([[0.1, 0.9], [0.9, 0.1]])
        code = M.code_change_map(y2, y1, threshold=0.5)
        np.testing.assert_array_equal(code, [[1, 2], [3, 0]])

    def test_dice_suite_known_values(self):
        real = np.array([[1, 2, 3, 0]])
        fake = np.array([[1, 2, 0, 0]])
        d = M.dice_suite(fake, real)
        assert d["dice_1_shrink"] == pytest.approx(1.0, abs=1e-6)
        assert d["dice_2_grow"] == pytest.approx(1.0, abs=1e-6)
        assert d["dice_3_stable"] == pytest.approx(0.0, abs=1e-4)
        # whole WMH: real {1,2,3} vs fake {1,2} -> 2*2/(3+2)
        assert d["dice_4_wmh"] == pytest.approx(4 / 5, rel=1e-5)
        assert d["dice_5_changing"] == pytest.approx(1.0, abs=1e-6)
        assert d["avg_all_dice"] == pytest.approx((1 + 1 + 0) / 3, abs=1e-4)

    def test_volume_ml(self):
        mask = np.zeros((2, 3, 3))
        mask[0, 0, :2] = 1
        assert M.volume_ml(mask, np.array([2.0, 2.0, 5.0])) == pytest.approx(
            2 * 20.0 / 1000
        )

    def test_volumetric_direction_flags(self):
        r = M.volumetric_metrics(10.0, 12.0, 11.0)  # progressing, predicted up
        assert (r.prog, r.true_prog, r.true_pred, r.regg) == (1, 1, 1, 0)
        r = M.volumetric_metrics(10.0, 8.0, 9.0)  # regressing, predicted down
        assert (r.regg, r.true_regg, r.true_pred, r.prog) == (1, 1, 1, 0)
        r = M.volumetric_metrics(10.0, 8.0, 11.0)  # regressing, predicted up
        assert (r.true_pred, r.regg) == (0, 1)
        assert r.err_vol == pytest.approx(3.0)
        assert r.mse_vol == pytest.approx(9.0)

    def test_csv_row_layout(self):
        vol = M.volumetric_metrics(1.0, 2.0, 3.0)
        d = {k: 0.5 for k in (
            "dice_1_shrink", "dice_2_grow", "dice_3_stable", "dice_4_wmh",
            "dice_5_changing", "dice_6_stableonly", "avg_dice_56", "avg_all_dice")}
        row = M.csv_row(vol, d)
        assert len(row) == 18 == len(M.CSV_COLUMNS)
        assert row[5:8] == [1.0, 2.0, 3.0]


class TestPredictor:
    def test_ensemble_masked_mean(self):
        cfg = ModelConfig(image_size=32, first_fm=8)
        model, variables = init_generator(cfg, jax.random.key(0))
        pred = EnsemblePredictor(model, variables, n_repeat=3, seed=0)
        x = np.random.default_rng(0).normal(size=(4, 32, 32, 1)).astype(np.float32)
        mask = np.zeros((4, 32, 32), np.float32)
        mask[:, 8:24, 8:24] = 1
        out = pred.predict(x, mask)
        assert out.shape == (4, 32, 32, 1)
        assert np.abs(out[:, :8]).max() == 0.0  # masked out
        assert np.abs(out[:, 8:24, 8:24]).max() > 0.0

    def test_reconstruct_clip(self):
        y1 = np.array([0.9, -0.9])
        dem = np.array([0.5, -0.5])
        np.testing.assert_allclose(reconstruct_follow_up(y1, dem), [1.0, -1.0])

    def test_fast_predictor_matches_module_predictor(self):
        """fast=True routes through FastGenerator; outputs must agree with
        the module path to bf16 tolerance for identical noise streams."""
        cfg = ModelConfig(image_size=32, first_fm=8)
        model, variables = init_generator(cfg, jax.random.key(0))
        x = np.random.default_rng(1).normal(size=(4, 32, 32, 1)).astype(np.float32)
        mask = np.ones((4, 32, 32), np.float32)
        p_ref = EnsemblePredictor(model, variables, n_repeat=3, seed=7)
        p_fast = EnsemblePredictor(model, variables, n_repeat=3, seed=7,
                                   fast=True, model_cfg=cfg)
        out_ref = p_ref.predict(x, mask)
        out_fast = p_fast.predict(x, mask)
        assert np.max(np.abs(out_ref - out_fast)) < 0.05


def _write_synthetic_fold(tmp_path, n_subjects=2, size=16, n_slices=4, fold=1):
    """Create a minimal synthetic NIfTI dataset + manifests for one fold."""
    rng = np.random.default_rng(0)
    mdir = tmp_path / "manifests"
    mdir.mkdir(exist_ok=True)
    modality_files = {m: [] for m in (
        "flair_1tp", "iam_1tp", "wmh_prob_v2_1tp", "wmh_prob_v2_2tp",
        "icv_1tp", "icv_2tp", "wmh_1tp", "wmh_2tp",
        "wmh_subtracted_coded_2tp_1tp", "sl_cleaned_1tp", "sl_cleaned_2tp")}
    names = []
    affine = np.eye(4)
    for s in range(n_subjects):
        sd = tmp_path / f"subj{s}"
        sd.mkdir(exist_ok=True)
        vols = {
            "flair_1tp": rng.uniform(0, 100, (size, size, n_slices)),
            "iam_1tp": rng.uniform(0, 1, (size, size, n_slices)),
            "wmh_prob_v2_1tp": rng.uniform(0, 1, (size, size, n_slices)),
            "wmh_prob_v2_2tp": rng.uniform(0, 1, (size, size, n_slices)),
            "icv_1tp": np.ones((size, size, n_slices)),
            "icv_2tp": np.ones((size, size, n_slices)),
            "wmh_1tp": (rng.uniform(0, 1, (size, size, n_slices)) > 0.8).astype(np.float32),
            "wmh_2tp": (rng.uniform(0, 1, (size, size, n_slices)) > 0.8).astype(np.float32),
            "wmh_subtracted_coded_2tp_1tp": rng.integers(0, 4, (size, size, n_slices)).astype(np.float32),
            "sl_cleaned_1tp": None,  # missing file (optional modality)
            "sl_cleaned_2tp": None,
        }
        for m, v in vols.items():
            path = sd / f"{m}.nii.gz"
            if v is not None:
                nifti.save(v.astype(np.float32), affine, path)
            modality_files[m].append(str(path))
        names.append(f"SUBJ{s:03d}")
    for m, paths in modality_files.items():
        (mdir / f"{m}_fold{fold}.txt").write_text("\n".join(paths) + "\n")
    (mdir / f"name_fold{fold}.txt").write_text("\n".join(names) + "\n")
    return mdir


class TestEndToEndGanTesting:
    def test_run_gan_testing_synthetic(self, tmp_path):
        from depgan_tpu.eval.runner import run_gan_testing

        mdir = _write_synthetic_fold(tmp_path, n_subjects=2, size=16)
        data_cfg = DataConfig(manifest_dir=str(mdir), image_size=16)
        model_cfg = ModelConfig(image_size=16, first_fm=4)
        eval_cfg = EvalConfig(n_repeat=2, output_dir=str(tmp_path / "out"))

        def weights_for_fold(fold):
            return init_generator(model_cfg, jax.random.key(fold))

        results = run_gan_testing(
            model_cfg, data_cfg, eval_cfg, weights_for_fold, folds=(1,)
        )
        assert len(results) == 2
        out = tmp_path / "out"
        assert (out / "RECAP_evaluation_for_allData.csv").exists()
        assert (out / "SUBJ000_2tp_prob_fake.nii.gz").exists()
        assert (out / "SUBJ001_2tp_code_fake.nii.gz").exists()
        # CSV has one 18-col row per subject.
        rows = np.loadtxt(out / "RECAP_evaluation_for_allData.csv",
                          delimiter=",", skiprows=1)
        assert rows.shape == (2, 18)
        # Reload an output map and check the orientation round trip.
        code = nifti.load(out / "SUBJ000_2tp_code_fake.nii.gz")
        assert code.image.shape == (16, 16, 4)
        assert set(np.unique(code.image)).issubset({0.0, 1.0, 2.0, 3.0})


class TestEndToEndUResNetTesting:
    def test_run_uresnet_testing_synthetic(self, tmp_path):
        from depgan_tpu.eval.runner import run_uresnet_testing

        mdir = _write_synthetic_fold(tmp_path, n_subjects=1, size=16)
        data_cfg = DataConfig(manifest_dir=str(mdir), image_size=16)
        model_cfg = ModelConfig(image_size=16, first_fm=4, n_out=4,
                                dropout_mode="uresnet")
        eval_cfg = EvalConfig(n_repeat=2, output_dir=str(tmp_path / "out_u"))

        def weights_for_fold(fold):
            return init_generator(model_cfg, jax.random.key(fold))

        results = run_uresnet_testing(
            model_cfg, data_cfg, eval_cfg, weights_for_fold, folds=(1,)
        )
        assert len(results) == 1
        out = tmp_path / "out_u"
        assert (out / "vol_dsc_all.csv").exists()
        assert (out / "SUBJ000" / "SUBJ000_cls_map.nii.gz").exists()
        for c in range(4):
            assert (out / "SUBJ000" / f"SUBJ000_prb_map_c{c}.nii.gz").exists()
        cls = nifti.load(out / "SUBJ000" / "SUBJ000_cls_map.nii.gz")
        assert cls.image.dtype == np.int8
