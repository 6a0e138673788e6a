"""run_full_curriculum smoke (reference train.py:849-917 end to end):
synthetic tube volumes, 1 epoch per stage, cube 32 — asserts the whole
L2 -> L5 -> L6 chain lands its on-disk contract (SURVEY.md §2.11)."""

import json
import os

import pytest

pytestmark = pytest.mark.slow

import numpy as np

from se_unet_airseg_tpu.io import write_nifti
from se_unet_airseg_tpu.models.se_unet import SEUNetConfig

from test_train_integration import make_tube_case


def test_full_curriculum_smoke(tmp_path):
    root = tmp_path
    data_dir = root / "AFTER_DATA" / "data"
    mask_dir = root / "AFTER_DATA" / "mask"
    file_root = root / "data"
    for d in (data_dir, mask_dir, file_root):
        os.makedirs(d)
    rng = np.random.default_rng(1)
    names = [f"CASE{i:03d}" for i in range(3)]
    for n in names:
        hu, mask = make_tube_case(rng)
        write_nifti(str(data_dir / f"{n}data_cut.nii.gz"),
                    (hu + 1024).astype(np.int16))
        write_nifti(str(mask_dir / f"{n}mask_cut.nii.gz"), mask)
    with open(file_root / "base_dict.json", "w") as f:
        json.dump({"0": {"train": names[:2], "val": names[2:]}}, f)
    with open(file_root / "test.json", "w") as f:
        json.dump({"test": names[2:]}, f)

    from se_unet_airseg_tpu.pipeline.priors import (
        save_lib_weights,
        save_skeletons_and_parses,
    )

    save_lib_weights(str(mask_dir), str(file_root / "LIB_weight"))
    for split, suffix in (("train", ""), ("val", "_val")):
        save_skeletons_and_parses(
            str(mask_dir), str(file_root / "base_dict.json"),
            str(file_root / f"tree_parse{suffix}"),
            str(file_root / f"skeleton{suffix}"), split=split,
        )

    from se_unet_airseg_tpu.pipeline.orchestrate import (
        PipelineConfig,
        run_full_curriculum,
    )

    cfg = PipelineConfig(
        data_root=str(root / "AFTER_DATA"),
        file_root=str(file_root),
        saved_model=str(root / "saved_model"),
        log_dir=str(root / "LOG"),
        epochs=(1, 1, 1),
        batch_size=2,
        cube=32,
        model_cfg=SEUNetConfig(),  # no remat: tiny crops
    )
    cwd = os.getcwd()
    os.chdir(root)
    try:
        run_full_curriculum(cfg)
    finally:
        os.chdir(cwd)

    # §2.11 on-disk contract checkpoints of every phase
    for stage in ("stage_one", "stage_two", "stage_three"):
        assert os.path.exists(
            root / "saved_model" / stage / "SE_UNet_0.msgpack"
        ), stage
        assert os.path.exists(root / "LOG" / f"log_{stage}.txt")
    for n in names:
        assert os.path.exists(file_root / "pred_1" / f"{n}.nii.gz")
        assert os.path.exists(file_root / "pred_2" / f"{n}.nii.gz")
    for n in names:  # break priors cover the train+val split
        assert os.path.exists(file_root / "BR_weight" / f"{n}.npy")
        assert os.path.exists(file_root / "br_skel" / f"{n}.npy")
    # DTI re-validation logs (reference train.py:913-917)
    assert os.path.exists(root / "LOG" / "log_stage_two.txt.dti")
    assert os.path.exists(root / "LOG" / "log_stage_three.txt.dti")
