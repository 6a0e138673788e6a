"""The four runnable entry points (reference __main__ blocks:
preprocessing.py:184-192, test.py:272-297, prediction.py:156-190,
train.py:849-917) driven on synthetic fixtures."""

import json
import os

import numpy as np
import pytest

from se_unet_airseg_tpu.io import read_nifti, write_nifti
from se_unet_airseg_tpu.models.se_unet import SEUNetConfig

from test_train_integration import make_tube_case


def _raw_case(rng, shape=(96, 96, 48)):
    """A raw (uncropped) CT in true HU with lungs dark enough — and
    LARGE enough (> 2000 px per slice, the reference get_l area
    threshold, util.py:140-148) — for the lung-field extraction to
    find a body + two cavities."""
    hu = np.full(shape, -1000.0, np.float32)  # air
    # lung_fields slices along the LAST axis; body + cavities live in
    # the leading two dims
    hu[4:92, 4:92, :] = 40.0  # body
    hu[12:82, 10:44, :] = -880.0  # left lung: 70x34 = 2380 px/slice
    hu[12:82, 52:86, :] = -880.0  # right lung
    hu += rng.normal(0, 5, shape).astype(np.float32)
    return hu


def test_preprocess_cli(tmp_path):
    from se_unet_airseg_tpu.cli.preprocess import main

    rng = np.random.default_rng(0)
    os.makedirs(tmp_path / "BEFORE_DATA" / "data")
    os.makedirs(tmp_path / "BEFORE_DATA" / "mask")
    hu = _raw_case(rng)
    write_nifti(str(tmp_path / "BEFORE_DATA" / "data" / "CASE001.nii.gz"),
                hu.astype(np.int16))
    mask = np.zeros((96, 96, 48), np.uint8)
    mask[20:40, 20:26, 10:40] = 1
    write_nifti(str(tmp_path / "BEFORE_DATA" / "mask" / "CASE001.nii.gz"), mask)

    main([
        "--input_data", str(tmp_path / "BEFORE_DATA" / "data"),
        "--output_data", str(tmp_path / "AFTER_DATA" / "data"),
        "--input_mask", str(tmp_path / "BEFORE_DATA" / "mask"),
        "--output_mask", str(tmp_path / "AFTER_DATA" / "mask"),
    ])
    out = os.listdir(tmp_path / "AFTER_DATA" / "data")
    assert any(f.endswith("data_cut.nii.gz") for f in out)
    assert any(f.endswith("_box.npy") for f in out)
    assert any(f.endswith("lung_mask.nii.gz") for f in out)
    assert os.listdir(tmp_path / "AFTER_DATA" / "mask")


@pytest.fixture(scope="module")
def cli_env(tmp_path_factory):
    """Cropped fixtures + a random checkpoint + a plausible LOG."""
    import jax

    from se_unet_airseg_tpu.models.se_unet import init_params
    from se_unet_airseg_tpu.pipeline.priors import save_skeletons_and_parses
    from se_unet_airseg_tpu.train.checkpoint import save_params

    root = tmp_path_factory.mktemp("cli")
    data_dir = root / "AFTER_DATA" / "data"
    mask_dir = root / "AFTER_DATA" / "mask"
    file_root = root / "data"
    for d in (data_dir, mask_dir, file_root):
        os.makedirs(d)
    rng = np.random.default_rng(3)
    names = ["CASE900"]
    for n in names:
        hu, mask = make_tube_case(rng)
        write_nifti(str(data_dir / f"{n}data_cut.nii.gz"),
                    (hu + 1024).astype(np.int16))
        write_nifti(str(mask_dir / f"{n}mask_cut.nii.gz"), mask)
    with open(file_root / "test.json", "w") as f:
        json.dump({"test": names}, f)
    save_skeletons_and_parses(
        str(mask_dir), str(file_root / "test.json"),
        str(file_root / "tree_parse_test"), str(file_root / "skeleton_test"),
        split="test",
    )
    params = init_params(jax.random.key(0), SEUNetConfig())
    model_dir = root / "saved_model" / "stage_three"
    save_params(params, str(model_dir), 0)
    save_params(params, str(model_dir), 1)
    os.makedirs(root / "LOG")
    with open(root / "LOG" / "log_stage_three.txt", "w") as f:
        # two epoch blocks; epoch 1 scores higher
        f.write("epoch:0\nTD: 50.0 (0.0), BD: 50.0 (0.0), DSC: 50.0 (0.0), "
                "Pre: 50.0 (0.0), Sen: 50.0 (0.0), Spe: 50.0 (0.0)\n\n")
        f.write("epoch:1\nTD: 90.0 (0.0), BD: 90.0 (0.0), DSC: 90.0 (0.0), "
                "Pre: 90.0 (0.0), Sen: 90.0 (0.0), Spe: 90.0 (0.0)\n\n")
    return {"root": root, "names": names}


def test_test_cli(cli_env):
    from se_unet_airseg_tpu.cli.test import main

    root = cli_env["root"]
    cwd = os.getcwd()
    os.chdir(root)
    try:
        main([
            "--data_root", str(root / "AFTER_DATA"),
            "--file_path", str(root / "data" / "test.json"),
            "--file_root", str(root / "data"),
            "--log_path", str(root / "LOG" / "log_stage_three.txt"),
            "--model_dir", str(root / "saved_model" / "stage_three"),
            "--result_savepath", str(root / "test_result"),
            "--testlog_savepath", str(root / "LOG" / "testlog.txt"),
            "--cube", "32", "--step", "16",
        ])
    finally:
        os.chdir(cwd)
    # the LOG says epoch 1 is best -> that checkpoint must be loadable
    out = read_nifti(
        str(root / "test_result" / "stage_three" / "CASE900.nii.gz")
    )
    assert out.array.shape == (48, 48, 48)
    assert os.path.exists(root / "LOG" / "testlog.txt")


def test_predict_cli(cli_env, tmp_path):
    from se_unet_airseg_tpu.cli.predict import main

    root = cli_env["root"]
    rng = np.random.default_rng(5)
    ct_dir = tmp_path / "example_dcm"
    os.makedirs(ct_dir)
    hu = rng.normal(30.0, 10.0, (48, 48, 48)).astype(np.float32)
    hu[20:28, 20:28, 4:44] = -950.0
    write_nifti(str(ct_dir / "PATIENT1.nii.gz"), hu.astype(np.int16))

    main([
        "--model", str(root / "saved_model" / "stage_three" / "SE_UNet_1.msgpack"),
        "--ct_dir", str(ct_dir),
        "--save_path", str(tmp_path / "predicted_airways"),
        "--cube", "32", "--step", "16",
    ])
    outs = os.listdir(tmp_path / "predicted_airways")
    assert any(f.endswith("_pred_mask.nii.gz") for f in outs)
