"""tree_parsing CLI end-to-end on a synthetic Y-tree (no reference
mount needed): flags, artifact set, _time.txt format."""

import os

import numpy as np

from se_unet_airseg_tpu.io import write_nifti


def _y_tree_mask(shape=(96, 96, 96)):
    m = np.zeros(shape, np.uint8)
    m[46:49, 46:49, 6:50] = 1            # trachea (odd width)
    m[46:49, 20:49, 48:51] = 1           # left branch
    m[46:49, 48:76, 48:51] = 1           # right branch
    m[46:49, 20:23, 48:80] = 1           # left distal
    m[46:49, 73:76, 48:80] = 1           # right distal
    return m


def test_cli_ours_and_atm22(tmp_path):
    from se_unet_airseg_tpu.cli.tree_parsing import main

    pred_dir = tmp_path / "masks"
    out_ours = tmp_path / "ours"
    out_atm = tmp_path / "atm22"
    os.makedirs(pred_dir)
    # (z,y,x) on disk with y==x triggers the reference load heuristic
    write_nifti(str(pred_dir / "CASE001.nii.gz"), _y_tree_mask().transpose(2, 0, 1))

    main([
        "--pred_mask_path", str(pred_dir),
        "--save_path", str(out_ours),
        "--save_ATM22_path", str(out_atm),
        "--merge_t", "5",
    ])

    for f in ("CASE001_parse.npy", "CASE001_parse_map.nii.gz",
              "CASE001_time.txt", "CASE001.stl", "CASE001_line.png",
              "CASE001_parse.png"):
        assert os.path.exists(out_ours / f), f
    report = open(out_ours / "CASE001_time.txt").read()
    assert "Centerline segment time" in report
    assert "Airway tree parse time" in report
    assert "Number of branches" in report
    n = int(report.splitlines()[-1].split()[-1])
    assert 3 <= n <= 9  # Y-tree: trachea + 2 + distals after merging

    # ATM22 side emits the reference's full artifact set
    # (tree_parsing.py:80-210): STL + PNG + GIF + parse map + report
    for f in ("CASE001_parse_map.nii.gz", "CASE001_time.txt",
              "CASE001.stl", "CASE001.png", "CASE001_model.png",
              "CASE001.gif"):
        assert os.path.exists(out_atm / f), f
    atm_report = open(out_atm / "CASE001_time.txt").read()
    assert "Centerline segment time" in atm_report

    # parse maps cover the mask
    from se_unet_airseg_tpu.io import read_nifti

    parse = read_nifti(str(out_ours / "CASE001_parse_map.nii.gz")).array
    mask = _y_tree_mask().transpose(1, 2, 0)  # loader transposed (1,2,0)
    assert (parse > 0).sum() == mask.sum()
