"""LOG emission/selection round-trip + topology on synthetic trees."""

import numpy as np

from se_unet_airseg_tpu.train.logbook import (
    append_epoch,
    best_epoch,
    best_epoch_recall,
    best_epoch_test,
    format_epoch_line,
)
from se_unet_airseg_tpu.post.topology import (
    Branch,
    detect_order,
    grade,
    merging,
    subsection,
)


def _case(td, bd, dsc, pre, sen, spe):
    return {"TD": td, "BD": bd, "DSC": dsc, "Pre": pre, "Sen": sen, "Spe": spe}


def test_log_roundtrip_and_selection(tmp_path):
    log = str(tmp_path / "log.txt")
    # epoch 0: mediocre; epoch 1: best recall; epoch 2: best TD/BD
    append_epoch(log, 0, [_case(80, 70, 85, 80, 75, 99)])
    append_epoch(log, 1, [_case(82, 72, 86, 81, 95, 99)])
    append_epoch(log, 2, [_case(95, 93, 84, 80, 70, 99)])
    lines = open(log).read().splitlines()
    assert lines[0] == "epoch:0"
    assert lines[1].startswith("TD: 80.0000 (0.0000), BD: 70.0000")
    assert lines[2] == ""
    assert best_epoch_recall(log) == 1  # Sen-weighted
    assert best_epoch(log) == 2  # TD/BD-weighted
    assert best_epoch_test(log) == 2


def test_format_line_aggregates_std():
    line = format_epoch_line([_case(80, 70, 85, 80, 75, 99),
                              _case(90, 80, 95, 90, 85, 99)])
    assert "TD: 85.0000 (5.0000)" in line


def _tree_points():
    """Y-shaped synthetic skeleton: trunk along z then two branches."""
    pts = [(10, 10, z) for z in range(0, 12)]
    pts += [(10 + i, 10 + i, 12 + i) for i in range(1, 8)]
    pts += [(10 - i, 10 - i, 12 + i) for i in range(1, 8)]
    pts.append((10, 10, 12))
    return np.array(sorted(set(pts), key=lambda p: p[2]))


def test_subsection_splits_at_junction():
    branches = subsection(_tree_points())
    real = [b for b in branches if len(b.member) > 0]
    assert len(real) == 3  # trunk + 2 children
    trunk = real[0]
    assert trunk.father == 0
    kids = [b for b in branches if b.father == trunk.index]
    assert len(kids) == 2


def test_merging_removes_short_leaves():
    branches = subsection(_tree_points())
    # add a 2-voxel twig as a child of the trunk
    twig = Branch(len(branches) + 1, (10, 10, 5), [(11, 10, 5)], father=1)
    merged = merging(branches + [twig], len_thre=5)
    assert all(len(b) > 5 or b.end is not None for b in merged)
    assert not any(b.start == (10, 10, 5) and len(b.member) == 1 for b in merged)


def test_grade_assigns_hierarchical_codes():
    branches = subsection(_tree_points())
    branches = [b for b in branches if len(b.member) > 0]
    # re-index sequentially as merging would
    g = grade(branches)
    assert g[0]["code"] == "0"
    assert {g[1]["code"], g[2]["code"]} == {"00", "01"}
    # y-rule: branch with larger start-y gets '01'
    y1, y2 = branches[1].start[1], branches[2].start[1]
    want1 = "01" if y1 > y2 else "00"
    assert g[1]["code"] == want1


def test_detect_order():
    vol = np.zeros((32, 32, 40), np.uint8)
    vol[14:18, 14:18, 2:10] = 1  # thin trachea low z
    vol[4:28, 4:28, 30:38] = 1  # wide canopy high z
    assert detect_order(vol) == 1
    assert detect_order(vol[:, :, ::-1]) == 0
