"""End-to-end stage-1 training + prior generation on synthetic
tube-tree CT volumes (SURVEY.md §4 item 3) — no real data, no TPU."""

import json
import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow

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


def test_stage3_end_to_end(synth_env):
    """Engineered-break pipeline (VERDICT r1 item 4): pred_2 = label
    with a gap cut from the main tube -> save_weight_break finds the
    break segment -> train_stage3 drives the atr loss -> run_test and
    network_prediction produce contract-conformant outputs."""
    import jax

    from se_unet_airseg_tpu.io import write_nifti as _write
    from se_unet_airseg_tpu.models.se_unet import init_params
    from se_unet_airseg_tpu.pipeline.priors import save_weight_break
    from se_unet_airseg_tpu.train.stages import StageConfig, train_stage3

    root = synth_env["root"]
    fr = synth_env["file_root"]
    dr = synth_env["data_root"]

    # ---- engineered pred_2: the GT tube with a 4-voxel axial gap ----
    pred2_dir = os.path.join(fr, "pred_2")
    pred1_dir = os.path.join(fr, "pred_1")
    os.makedirs(pred2_dir, exist_ok=True)
    os.makedirs(pred1_dir, exist_ok=True)
    for n in synth_env["names"]:
        mask = read_nifti(os.path.join(dr, "mask", n + "mask_cut.nii.gz")).array
        broken = (mask > 0).astype(np.uint8)
        broken[:, :, 30:34] = 0  # cut through the main tube
        _write(os.path.join(pred2_dir, n + ".nii.gz"), broken[None])
        # validation's hard-val mask reads pred_1 at every stage
        # (reference train.py:654-659, 674-675) — keep the test
        # hermetic when stage-1/2 tests were deselected
        if not os.path.exists(os.path.join(pred1_dir, n + ".nii.gz")):
            _write(os.path.join(pred1_dir, n + ".nii.gz"),
                   (mask > 0).astype(np.uint8)[None])

    # ---- break priors (reference weight_br.py:113-177) ----
    br_w = os.path.join(fr, "BR_weight")
    br_s = os.path.join(fr, "br_skel")
    save_weight_break(dr, pred2_dir, br_w, br_s, synth_env["file_path"])
    n0 = synth_env["names"][0]
    skel_coords = np.load(os.path.join(br_s, n0 + ".npy"))
    assert skel_coords.shape[0] == 3 and skel_coords.shape[1] > 0, (
        "engineered gap must produce a non-empty break skeleton"
    )
    w = np.load(os.path.join(br_w, n0 + ".npy"))
    assert w.dtype == np.float16 and float(w.max()) > 0.0

    # ---- stage 3, one epoch ----
    cfg = StageConfig(
        data_root=dr,
        file_root=fr,
        file_path=synth_env["file_path"],
        model_savepath=str(root / "saved_model" / "stage_three"),
        log_savepath=str(root / "LOG_stage_three.txt"),
        epochs=1,
        batch_size=2,
        cube=32,
        milestones=(40, 60),
        pred_path=pred2_dir,
        br_skel_path=br_s,
        br_weight_path=br_w,
        online_savepath=str(root / "online_hm_three"),
        start_params=synth_env.get(
            "stage1_params",
            init_params(jax.random.key(0), SEUNetConfig()),
        ),
        model_cfg=SEUNetConfig(),
    )
    state = train_stage3(cfg)
    assert os.path.exists(os.path.join(cfg.model_savepath, "SE_UNet_0.msgpack"))
    # the online cache carries the stage-3 skeleton channel
    assert len(os.listdir(os.path.join(cfg.online_savepath, "skel"))) > 0
    log = open(cfg.log_savepath).read()
    assert "TD:" in log
    synth_env["stage3_params"] = state.params


def test_validation_rng_fresh_per_epoch_and_runner_reuse(synth_env, tmp_path):
    """VERDICT r2 items 7+8: train-mode validation draws FRESH DropLayer
    noise each epoch (the reference draws per-call torch RNG,
    train.py:632 — epochs must rank under independent noise), and a
    shared runner is reused across epochs without re-tracing the
    whole-volume program."""
    import jax

    from se_unet_airseg_tpu.infer import engine as eng
    from se_unet_airseg_tpu.infer.sliding_window import SlidingWindowRunner
    from se_unet_airseg_tpu.models.se_unet import init_params

    names = [synth_env["names"][2]]

    class SpyRunner:
        def __init__(self):
            self.keys = []

        def set_params(self, params):
            return self

        def predict_trits(self, vol, *, h_thresh, l_thresh, rng, hu_shift):
            self.keys.append(rng)
            return np.zeros(vol.shape, np.uint8)

    spy = SpyRunner()
    for epoch in (0, 0, 1):
        eng.validate(
            None, SEUNetConfig(), names, synth_env["data_root"],
            synth_env["file_root"], epoch, str(tmp_path / "LOG.txt"),
            stage=1, runner=spy,
        )
    k0a, k0b, k1 = [np.asarray(jax.random.key_data(k)) for k in spy.keys]
    assert np.array_equal(k0a, k0b), "same epoch must replay the same noise"
    assert not np.array_equal(k0a, k1), "new epoch must draw fresh noise"

    # real-runner reuse: two epochs share ONE compiled volume program
    params = init_params(jax.random.key(0), SEUNetConfig())
    runner = SlidingWindowRunner(
        params, SEUNetConfig(), train_mode=True, cube=32, step=16, batch=4
    )
    for epoch in (0, 1):
        eng.validate(
            params, SEUNetConfig(), names, synth_env["data_root"],
            synth_env["file_root"], epoch, str(tmp_path / "LOG2.txt"),
            stage=1, runner=runner,
        )
    assert len(runner._volume_fns) == 1


def test_run_test_contract(synth_env):
    """run_test (reference test.py:67-234) on the synthetic test split:
    nii.gz per case in test_result/<stage>/, aggregate line appended."""
    from se_unet_airseg_tpu.data.splits import load_json_file
    from se_unet_airseg_tpu.infer.engine import run_test
    from se_unet_airseg_tpu.models.se_unet import init_params
    import jax

    root = synth_env["root"]
    params = synth_env.get(
        "stage3_params", init_params(jax.random.key(0), SEUNetConfig())
    )
    names = load_json_file(os.path.join(synth_env["file_root"], "test.json"), "-1")
    # test-split priors: reuse the val-side artifacts under _test names
    fr = synth_env["file_root"]
    from se_unet_airseg_tpu.pipeline.priors import save_skeletons_and_parses

    if not os.path.isdir(os.path.join(fr, "skeleton_test")):
        save_skeletons_and_parses(
            os.path.join(synth_env["data_root"], "mask"),
            os.path.join(fr, "test.json"),
            os.path.join(fr, "tree_parse_test"), os.path.join(fr, "skeleton_test"),
            split="test",
        )
    testlog = str(root / "testlog_stage_three.txt")
    result_dir = str(root / "test_result")
    cwd = os.getcwd()
    os.chdir(root)  # the boxplot lands in cwd like the reference
    try:
        metrics = run_test(
            params, SEUNetConfig(), names, synth_env["data_root"], fr,
            testlog, result_dir, cube=32, step=16,
        )
    finally:
        os.chdir(cwd)
    assert len(metrics) == len(names)
    for n in names:
        out = read_nifti(os.path.join(result_dir, "stage_three", n + ".nii.gz"))
        assert out.array.shape == (48, 48, 48)
    assert "TD:" in open(testlog).read()


def test_network_prediction_contract(synth_env, tmp_path):
    """Deployment path on a raw-HU volume (reference
    prediction.py:51-154): _pred_mask.nii.gz written."""
    import jax

    from se_unet_airseg_tpu.infer.engine import network_prediction
    from se_unet_airseg_tpu.models.se_unet import init_params

    rng = np.random.default_rng(7)
    hu = rng.normal(30.0, 15.0, (48, 48, 48)).astype(np.float32)
    hu[20:28, 20:28, 4:44] = -950.0
    raw = str(tmp_path / "PATIENT1.nii.gz")
    write_nifti(raw, hu.astype(np.int16))

    params = synth_env.get(
        "stage3_params", init_params(jax.random.key(0), SEUNetConfig())
    )
    out = network_prediction(
        params, SEUNetConfig(), raw, str(tmp_path / "pred_out"),
        cube=32, step=16,
    )
    assert os.path.exists(out)
    assert out.endswith("_pred_mask.nii.gz")
