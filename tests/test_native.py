"""Native C++ NIfTI reader vs the pure-numpy reader (cross-validation)."""

import numpy as np
import pytest

from depgan_tpu.data import nifti

native = pytest.importorskip("depgan_tpu.data.native")

pytestmark = pytest.mark.skipif(
    not native.available(), reason="libdepgan_native.so not built"
)


@pytest.fixture
def volumes(tmp_path, rng):
    paths = []
    arrays = []
    for i, (dtype, gz) in enumerate(
        [(np.float32, True), (np.float32, False), (np.int16, True),
         (np.uint8, False), (np.float64, True)]
    ):
        if np.issubdtype(dtype, np.integer):
            arr = rng.integers(0, 100, size=(7, 6, 5)).astype(dtype)
        else:
            arr = rng.normal(size=(7, 6, 5)).astype(dtype)
        affine = np.diag([1.0, 2.0, 3.0, 1.0])
        p = tmp_path / f"vol{i}.nii{'.gz' if gz else ''}"
        nifti.save(arr, affine, p)
        paths.append(p)
        arrays.append(arr)
    return paths, arrays


class TestNativeReader:
    def test_matches_pure_reader(self, volumes):
        paths, arrays = volumes
        for p, arr in zip(paths, arrays):
            vol_native = native.load_native(p)
            vol_pure = nifti.load(p)
            np.testing.assert_allclose(
                vol_native.image, vol_pure.image.astype(np.float32), rtol=1e-6
            )
            np.testing.assert_allclose(vol_native.pixdim, vol_pure.pixdim, rtol=1e-5)
            np.testing.assert_allclose(vol_native.affine, vol_pure.affine, rtol=1e-5)

    def test_load_many_threaded(self, volumes):
        paths, arrays = volumes
        vols = native.load_many(paths * 3, n_threads=4)
        assert len(vols) == len(paths) * 3
        for i, vol in enumerate(vols):
            np.testing.assert_allclose(
                vol.image, arrays[i % len(arrays)].astype(np.float32), rtol=1e-6
            )

    def test_missing_file_raises(self, tmp_path):
        with pytest.raises(IOError):
            native.load_native(tmp_path / "nope.nii.gz")

    def test_load_auto_prefers_native(self, volumes):
        paths, arrays = volumes
        vol = nifti.load_auto(paths[0])
        np.testing.assert_allclose(vol.image, arrays[0], rtol=1e-6)
