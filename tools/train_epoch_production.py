"""Production-shape training-loop proof on the real TPU (VERDICT r4
item 5): one stage-2 epoch — 128^3 crops, B=8, the LIVE whole-volume
validation runner coexisting with the train state in HBM, the online
hard-mining replay pass — exactly the resident-set combination the
stage drivers run for 50 epochs (reference train.py:328-514), which
through round 4 had only ever run on CPU at toy shapes.

Builds a synthetic on-disk environment (tube CTs big enough for 128^3
crops, LIB weights, skeletons/parses for train+val, noisy pred_1
priors), then calls the REAL train_stage2 driver. The step wrapper is
make_resilient_step, so an HBM OOM would engage the full-remat
fallback and be visible in the log.

Usage: python tools/train_epoch_production.py [workdir]
       (default workdir /tmp/airseg_prod_epoch; reused across runs so
        compiles hit the persistent cache)
Output: per-step train log lines + [proof] summary lines. Paste into
ROADMAP/README as the committed record.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_tube_case(rng, shape=(192, 192, 224)):
    """Body-and-air-tube CT at a production-like extent (>=128 per
    axis so 128^3 crops exist); mask = the tube + one side branch."""
    hu = rng.normal(30.0, 15.0, shape).astype(np.float32)
    mask = np.zeros(shape, np.uint8)
    y = shape[0] // 2 + int(rng.integers(-20, 20))
    x = shape[1] // 2 + int(rng.integers(-20, 20))
    mask[y - 2 : y + 3, x - 2 : x + 3, 10 : shape[2] - 10] = 1
    mask[y - 2 : y + 3, x : x + 60, shape[2] // 2 : shape[2] // 2 + 5] = 1
    hu[mask == 1] = -950.0
    return hu, mask


def build_env(root: str, n_train=4, n_val=1):
    from se_unet_airseg_tpu.io import write_nifti
    from se_unet_airseg_tpu.pipeline.priors import (
        save_lib_weights,
        save_skeletons_and_parses,
    )

    data_dir = os.path.join(root, "AFTER_DATA", "data")
    mask_dir = os.path.join(root, "AFTER_DATA", "mask")
    file_root = os.path.join(root, "data")
    done_marker = os.path.join(root, ".env_done")
    names = [f"CASE{i:03d}" for i in range(n_train + n_val)]
    if os.path.exists(done_marker):
        return file_root, os.path.join(root, "AFTER_DATA")
    for d in (data_dir, mask_dir, file_root):
        os.makedirs(d, exist_ok=True)
    rng = np.random.default_rng(0)
    pred_dir = os.path.join(file_root, "pred_1")
    os.makedirs(pred_dir, exist_ok=True)
    for n in names:
        hu, mask = make_tube_case(rng)
        write_nifti(os.path.join(data_dir, f"{n}data_cut.nii.gz"),
                    (hu + 1024).astype(np.int16))
        write_nifti(os.path.join(mask_dir, f"{n}mask_cut.nii.gz"), mask)
        # pred_1: the stage-1 prediction prior — a mask with holes, so
        # hard-mining has FN voxels to chase ([1,D,H,W] on-disk shape)
        holes = rng.random(mask.shape) < 0.3
        write_nifti(os.path.join(pred_dir, f"{n}.nii.gz"),
                    (mask & ~holes).astype(np.uint8)[None])
    with open(os.path.join(file_root, "base_dict.json"), "w") as f:
        json.dump({"0": {"train": names[:n_train],
                         "val": names[n_train:]}}, f)
    t0 = time.time()
    save_lib_weights(mask_dir, os.path.join(file_root, "LIB_weight"))
    for split, suffix in (("train", ""), ("val", "_val")):
        save_skeletons_and_parses(
            mask_dir, os.path.join(file_root, "base_dict.json"),
            os.path.join(file_root, f"tree_parse{suffix}"),
            os.path.join(file_root, f"skeleton{suffix}"), split=split,
        )
    print(f"[proof] prior generation: {time.time() - t0:.0f}s")
    open(done_marker, "w").close()
    return file_root, os.path.join(root, "AFTER_DATA")


def main():
    root = sys.argv[1] if len(sys.argv) > 1 else "/tmp/airseg_prod_epoch"
    os.makedirs(root, exist_ok=True)

    from se_unet_airseg_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()

    import jax
    import jax.numpy as jnp

    print(f"[proof] devices: {jax.devices()}")
    file_root, data_root = build_env(root)

    from se_unet_airseg_tpu.models.se_unet import SEUNetConfig
    from se_unet_airseg_tpu.train.stages import StageConfig, train_stage2

    # fresh savepath per run: train_stage2 auto-resumes from existing
    # state checkpoints, which would skip the epoch we came to measure
    run_id = f"run_{os.getpid()}_{int(time.time())}"
    cfg = StageConfig(
        data_root=data_root,
        file_root=file_root,
        file_path=os.path.join(file_root, "base_dict.json"),
        model_savepath=os.path.join(root, "saved_model", run_id),
        log_savepath=os.path.join(root, "LOG", "log_stage_two.txt"),
        epochs=1,
        batch_size=8,
        cube=128,
        online_savepath=os.path.join(root, "online"),
        pred_path=os.path.join(file_root, "pred_1"),
        model_cfg=SEUNetConfig(compute_dtype=jnp.bfloat16, remat=True),
    )
    os.makedirs(cfg.model_savepath, exist_ok=True)
    os.makedirs(os.path.dirname(cfg.log_savepath), exist_ok=True)
    os.makedirs(cfg.online_savepath, exist_ok=True)

    t0 = time.time()
    state = train_stage2(cfg)
    wall = time.time() - t0
    n_steps = int(state.step)
    print(f"[proof] stage-2 epoch at 128^3 B=8 on "
          f"{jax.devices()[0].platform}: {wall:.0f}s wall, "
          f"{n_steps} optimizer steps (main pass + online replay), "
          f"live val runner coexisted with the train state")
    mode = os.environ.get("REMAT_SKIP_WHOLEBLOCK", "1")
    print(f"[proof] OK — epoch completed; step ran with "
          f"REMAT_SKIP_WHOLEBLOCK={mode}"
          + (" (full remat — the stage>=2 default after the measured"
             " 43.5 MB HBM overflow of the whole-block skip)"
             if mode == "0" else ""))


if __name__ == "__main__":
    main()
