"""End-to-end stage-1 training + prior generation on synthetic
tube-tree CT volumes (SURVEY.md §4 item 3) — no real data, no TPU."""

import json
import os

import numpy as np
import pytest

from se_unet_airseg_tpu.io import read_nifti, write_nifti
from se_unet_airseg_tpu.models.se_unet import SEUNetConfig


def make_tube_case(rng, shape=(48, 48, 48)):
    """CT (HU) with a bright-ish background body and a dark air tube;
    mask = the tube."""
    hu = rng.normal(30.0, 15.0, shape).astype(np.float32)  # soft tissue
    mask = np.zeros(shape, np.uint8)
    y = shape[0] // 2 + int(rng.integers(-6, 6))
    x = shape[1] // 2 + int(rng.integers(-6, 6))
    mask[y - 1 : y + 2, x - 1 : x + 2, 4:44] = 1  # odd width: stable skeleton
    # side branch
    mask[y - 1 : y + 2, x : x + 14, 22:25] = 1
    hu[mask == 1] = -950.0
    return hu, mask


@pytest.fixture(scope="module")
def synth_env(tmp_path_factory):
    root = tmp_path_factory.mktemp("synth")
    data_dir = root / "AFTER_DATA" / "data"
    mask_dir = root / "AFTER_DATA" / "mask"
    file_root = root / "data"
    for d in (data_dir, mask_dir, file_root):
        os.makedirs(d)
    rng = np.random.default_rng(0)
    names = [f"CASE{i:03d}" for i in range(3)]
    for n in names:
        hu, mask = make_tube_case(rng)
        write_nifti(str(data_dir / f"{n}data_cut.nii.gz"), (hu + 1024).astype(np.int16))
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
    save_skeletons_and_parses(
        str(mask_dir), str(file_root / "base_dict.json"),
        str(file_root / "tree_parse_val"), str(file_root / "skeleton_val"),
        split="val",
    )
    save_skeletons_and_parses(
        str(mask_dir), str(file_root / "base_dict.json"),
        str(file_root / "tree_parse"), str(file_root / "skeleton"),
        split="train",
    )
    return {
        "root": root,
        "data_root": str(root / "AFTER_DATA"),
        "file_root": str(file_root),
        "file_path": str(file_root / "base_dict.json"),
        "names": names,
    }


def test_priors_exist(synth_env):
    fr = synth_env["file_root"]
    for n in synth_env["names"]:
        assert os.path.exists(os.path.join(fr, "LIB_weight", n + ".npy"))
    assert os.listdir(os.path.join(fr, "skeleton_val"))
    parse = read_nifti(
        os.path.join(fr, "tree_parse_val", synth_env["names"][2] + "mask_cut.nii.gz")
    ).array
    assert parse.max() >= 1  # at least one branch id


def test_stage1_two_epochs_and_pred1(synth_env):
    from se_unet_airseg_tpu.train.stages import StageConfig, train_stage1
    from se_unet_airseg_tpu.pipeline.priors import save_stage_pred

    root = synth_env["root"]
    cfg = StageConfig(
        data_root=synth_env["data_root"],
        file_root=synth_env["file_root"],
        file_path=synth_env["file_path"],
        model_savepath=str(root / "saved_model" / "stage_one"),
        log_savepath=str(root / "LOG_stage_one.txt"),
        epochs=2,
        batch_size=2,
        cube=32,
        model_cfg=SEUNetConfig(),
    )
    state = train_stage1(cfg)
    # per-epoch checkpoints + final-epoch validation LOG block
    assert os.path.exists(os.path.join(cfg.model_savepath, "SE_UNet_0.msgpack"))
    assert os.path.exists(os.path.join(cfg.model_savepath, "SE_UNet_1.msgpack"))
    log = open(cfg.log_savepath).read()
    assert log.startswith("epoch:1")
    assert "TD:" in log

    # pred_1 generation over train+val (raw-logit threshold path)
    pred1_dir = os.path.join(synth_env["file_root"], "pred_1")
    save_stage_pred(
        state.params, cfg.model_cfg, synth_env["file_path"],
        synth_env["data_root"], pred1_dir,
    )
    for n in synth_env["names"]:
        v = read_nifti(os.path.join(pred1_dir, n + ".nii.gz"))
        assert v.array.shape == (48, 48, 48)
        assert set(np.unique(v.array)) <= {0, 1}
    synth_env["stage1_params"] = state.params


def test_stage2_one_epoch(synth_env):
    from se_unet_airseg_tpu.train.stages import StageConfig, train_stage2

    if "stage1_params" not in synth_env:
        pytest.skip("stage 1 test must run first")
    root = synth_env["root"]
    cfg = StageConfig(
        data_root=synth_env["data_root"],
        file_root=synth_env["file_root"],
        file_path=synth_env["file_path"],
        model_savepath=str(root / "saved_model" / "stage_two"),
        log_savepath=str(root / "LOG_stage_two.txt"),
        epochs=1,
        batch_size=2,
        cube=32,
        milestones=(40, 60),
        pred_path=os.path.join(synth_env["file_root"], "pred_1"),
        online_savepath=str(root / "online_hm_two"),
        start_params=synth_env["stage1_params"],
        model_cfg=SEUNetConfig(),
    )
    train_stage2(cfg)
    assert os.path.exists(os.path.join(cfg.model_savepath, "SE_UNet_0.msgpack"))
    # the online cache was filled and replayed
    assert len(os.listdir(os.path.join(cfg.online_savepath, "image"))) > 0
    log = open(cfg.log_savepath).read()
    assert "TD:" in log
