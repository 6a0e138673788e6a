"""CT preprocessing pipeline on a synthetic thorax phantom
(SURVEY.md §4 item 3: integration without real data)."""

import os

import numpy as np
import pytest

from se_unet_airseg_tpu.io import read_nifti, write_nifti
from se_unet_airseg_tpu.pipeline.preprocess import (
    clamp_histogram_peaks,
    largest_cc_midslice_fallback,
    lung_fields,
    preprocess_ct_volume,
    preprocess_mask_volume,
    two_peak_threshold,
)


def make_phantom(shape=(160, 160, 80)):
    """Body of soft tissue (~0 HU -> 1024 shifted) with two air-filled
    cavities (lung-density, overlapping the air histogram as in real
    CT) on an air background."""
    rng = np.random.default_rng(0)
    vol = rng.integers(14, 35, shape).astype(np.int16)  # air ~ -1000 HU
    yy, xx = np.mgrid[: shape[0], : shape[1]]
    cy, cx = shape[0] / 2, shape[1] / 2
    body = ((yy - cy) / (shape[0] * 0.45)) ** 2 + ((xx - cx) / (shape[1] * 0.4)) ** 2 <= 1
    # cavities must clear the reference's 2000-px area gate (real CTs
    # are 512^2; this phantom is 160^2, so lungs are relatively large)
    lung_l = ((yy - cy) / (shape[0] * 0.22)) ** 2 + ((xx - cx * 0.6) / (shape[1] * 0.13)) ** 2 <= 1
    lung_r = ((yy - cy) / (shape[0] * 0.22)) ** 2 + ((xx - cx * 1.4) / (shape[1] * 0.13)) ** 2 <= 1
    for z in range(5, shape[2] - 5):
        sl = rng.integers(14, 35, shape[:2]).astype(np.int16)
        sl[body] = 1024 + rng.integers(-20, 20)
        lung = lung_l | lung_r
        sl[lung] = rng.integers(30, 81, int(lung.sum()))  # -994..-944 HU
        vol[:, :, z] = sl
    return vol


def test_two_peak_threshold_separates_air_and_tissue():
    vol = make_phantom()
    T = two_peak_threshold(vol)
    assert 80 < T < 1004  # above lung density, below soft tissue


def test_lung_fields_finds_two_cavities():
    vol = make_phantom()
    T = two_peak_threshold(vol)
    L = lung_fields(vol, T)
    mid = L[:, :, 40]
    assert mid.sum() > 500  # both cavities found
    big = largest_cc_midslice_fallback(L)
    assert big.sum() > 0


def test_clamp_histogram_noop_when_min_above_threshold():
    vol = make_phantom()
    out = clamp_histogram_peaks(vol)
    np.testing.assert_array_equal(out, vol)


def test_clamp_histogram_fires_on_extreme_values():
    vol = make_phantom().astype(np.int16)
    vol[0, 0, :] = -2000
    out = clamp_histogram_peaks(vol)
    assert out.min() > -2000


def test_end_to_end_ct_and_mask(tmp_path):
    data_dir = tmp_path / "AFTER_DATA" / "data"
    mask_dir = tmp_path / "AFTER_DATA" / "mask"
    os.makedirs(data_dir)
    os.makedirs(mask_dir)

    vol = make_phantom() - 1024  # stored volumes are raw HU pre-shift
    src = tmp_path / "CASE001data.nii.gz"
    write_nifti(str(src), vol.transpose(2, 0, 1))  # (z,y,x) on disk, y==x triggers transpose heuristic

    name = preprocess_ct_volume(str(src), str(data_dir))
    assert name == "CASE001"
    cut = read_nifti(str(data_dir / "CASE001data_cut.nii.gz"))
    box = np.load(data_dir / "CASE001_box.npy")
    assert box.shape == (6, 2)
    # crop box spans the lungs with a 5-voxel margin
    assert (box[:3, 1] - box[:3, 0] > 10).all()
    assert cut.array.shape == tuple(box[:3, 1] - box[:3, 0])
    lung = read_nifti(str(data_dir / "CASE001_lung_mask.nii.gz"))
    assert lung.array.shape == cut.array.shape
    assert lung.array.sum() > 0

    # GT mask: a tube inside the left lung
    gt = np.zeros(vol.shape, np.uint8)
    gt[76:84, 40:48, 10:70] = 1  # tube inside the left lung cavity
    gt_src = tmp_path / "CASE001mask.nii.gz"
    write_nifti(str(gt_src), gt.transpose(2, 0, 1))
    preprocess_mask_volume(str(gt_src), str(mask_dir))
    mcut = read_nifti(str(mask_dir / "CASE001mask_cut.nii.gz"))
    assert mcut.array.shape == cut.array.shape
    assert mcut.array.sum() == gt.sum()  # tube fully inside the crop box
