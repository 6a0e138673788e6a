"""NIfTI codec round-trip and golden-file checks (SURVEY.md §4 item 5)."""

import numpy as np
import pytest

from se_unet_airseg_tpu.io import read_nifti, write_nifti

import os

REF_DEMO = "/root/reference/demo_mask/CASE073.nii.gz"


@pytest.mark.parametrize("dtype", [np.uint8, np.int16, np.float32])
def test_roundtrip(tmp_path, dtype):
    rng = np.random.default_rng(0)
    arr = (rng.random((9, 8, 7)) * 100).astype(dtype)
    path = str(tmp_path / "vol.nii.gz")
    write_nifti(path, arr, spacing=(0.7, 0.8, 0.9), origin=(-10.0, 5.0, 2.5))
    v = read_nifti(path)
    np.testing.assert_array_equal(v.array, arr)
    np.testing.assert_allclose(v.spacing, (0.7, 0.8, 0.9), rtol=1e-6)
    np.testing.assert_allclose(v.origin, (-10.0, 5.0, 2.5), rtol=1e-6, atol=1e-6)


def test_roundtrip_uncompressed(tmp_path):
    arr = np.arange(24, dtype=np.int16).reshape(2, 3, 4)
    path = str(tmp_path / "vol.nii")
    write_nifti(path, arr)
    v = read_nifti(path)
    np.testing.assert_array_equal(v.array, arr)


def test_reproducible_bytes(tmp_path):
    arr = np.ones((4, 4, 4), np.uint8)
    p1, p2 = str(tmp_path / "a.nii.gz"), str(tmp_path / "b.nii.gz")
    write_nifti(p1, arr)
    write_nifti(p2, arr)
    assert open(p1, "rb").read() == open(p2, "rb").read()


@pytest.mark.skipif(not os.path.exists(REF_DEMO), reason="reference not mounted")
def test_reads_reference_demo_mask():
    v = read_nifti(REF_DEMO)
    # bundled CASE073 demo (reference README 512x512x533, binary mask)
    assert v.array.shape == (512, 512, 533)
    assert set(np.unique(v.array)) <= {0, 1}
    assert v.array.sum() > 100_000


def test_bool_cast(tmp_path):
    arr = np.zeros((3, 3, 3), bool)
    arr[1, 1, 1] = True
    path = str(tmp_path / "m.nii.gz")
    write_nifti(path, arr)
    v = read_nifti(path)
    assert v.array.dtype == np.uint8 and v.array.sum() == 1
