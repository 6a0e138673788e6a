"""Auto-resume: kill-and-restart a stage-1 run, training continues."""

import json
import os

import numpy as np
import pytest

from se_unet_airseg_tpu.io import write_nifti
from se_unet_airseg_tpu.models.se_unet import SEUNetConfig


@pytest.fixture()
def tiny_env(tmp_path):
    data_dir = tmp_path / "AFTER_DATA" / "data"
    mask_dir = tmp_path / "AFTER_DATA" / "mask"
    file_root = tmp_path / "data"
    for d in (data_dir, mask_dir, file_root):
        os.makedirs(d)
    rng = np.random.default_rng(0)
    names = ["CASE000", "CASE001"]
    for n in names:
        hu = rng.normal(30, 10, (40, 40, 40)).astype(np.float32)
        mask = np.zeros((40, 40, 40), np.uint8)
        # odd-width tube + side branch: stable under tip-eroding thinning
        mask[18:21, 18:21, 4:36] = 1
        mask[18:21, 21:32, 18:21] = 1
        hu[mask == 1] = -950
        write_nifti(str(data_dir / f"{n}data_cut.nii.gz"), (hu + 1024).astype(np.int16))
        write_nifti(str(mask_dir / f"{n}mask_cut.nii.gz"), mask)
    with open(file_root / "base_dict.json", "w") as f:
        json.dump({"0": {"train": names[:1], "val": names[1:]}}, f)

    from se_unet_airseg_tpu.pipeline.priors import (
        save_lib_weights,
        save_skeletons_and_parses,
    )

    save_lib_weights(str(mask_dir), str(file_root / "LIB_weight"))
    save_skeletons_and_parses(
        str(mask_dir), str(file_root / "base_dict.json"),
        str(file_root / "tree_parse_val"), str(file_root / "skeleton_val"),
        split="val",
    )
    return tmp_path


def test_stage1_resumes_from_state(tiny_env):
    from se_unet_airseg_tpu.train.stages import StageConfig, train_stage1

    def cfg(epochs):
        return StageConfig(
            data_root=str(tiny_env / "AFTER_DATA"),
            file_root=str(tiny_env / "data"),
            file_path=str(tiny_env / "data" / "base_dict.json"),
            model_savepath=str(tiny_env / "saved_model" / "stage_one"),
            log_savepath=str(tiny_env / "LOG.txt"),
            epochs=epochs,
            batch_size=1,
            cube=24,
            model_cfg=SEUNetConfig(),
        )

    # "crash" after one epoch
    train_stage1(cfg(1))
    assert os.path.exists(
        os.path.join(str(tiny_env / "saved_model" / "stage_one"), "state_0.msgpack")
    )
    # restart targeting 3 epochs: must resume at epoch 1, not retrain 0
    state = train_stage1(cfg(3))
    saved = os.listdir(str(tiny_env / "saved_model" / "stage_one"))
    assert "SE_UNet_2.msgpack" in saved
    assert int(state.step) >= 3  # 1 + 2 resumed epochs x 1 volume
    # only the two newest full states are kept
    states = [f for f in saved if f.startswith("state_")]
    assert sorted(states) == ["state_1.msgpack", "state_2.msgpack"]
