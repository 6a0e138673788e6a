"""Anatomical regrade on a clean synthetic bronchial tree."""

import numpy as np

from se_unet_airseg_tpu.post.regrade import AnatomicalRegrader
from se_unet_airseg_tpu.post.topology import Branch


def _branch(idx, start, end, father, n=20):
    start = np.asarray(start, float)
    end = np.asarray(end, float)
    member = [tuple(np.round(start + (end - start) * t / n).astype(int))
              for t in range(1, n)]
    return Branch(idx, tuple(start.astype(int)), member, father,
                  end=tuple(end.astype(int)))


def _tree(order=0):
    """Trachea at low z going +z; right main toward -y, left toward +y
    (axis convention (y, x, z), matching the parser)."""
    zs = 1 if order == 0 else -1
    b = []
    b.append(_branch(1, (100, 100, 10), (100, 100, 50), 0))           # trachea '0'
    b.append(_branch(2, (100, 100, 50), (100, 60, 70), 1))            # right '00' (-y)
    b.append(_branch(3, (100, 100, 50), (100, 140, 70), 1))           # left '01' (+y)
    # right upper (000): up + (-y); right middle/lower (001): down-ish
    b.append(_branch(4, (100, 60, 70), (100, 30, 68), 2))             # '000' (-y, z~0.1)
    b.append(_branch(5, (100, 60, 70), (110, 40, 70 + 30 * zs), 2))   # '001' (-y, +z)
    # left: 010 superior (goes -z relative), 011 inferior (+z)
    b.append(_branch(6, (100, 140, 70), (100, 170, 60 - 20 * zs + 20), 3))
    b.append(_branch(7, (100, 140, 70), (100, 170, 70 + 30 * zs), 3))
    return b


def _codes(branches):
    from se_unet_airseg_tpu.post.topology import grade

    return grade(branches)


def test_main_bronchi_left_right_by_direction():
    branches = _tree()
    codes = _codes(branches)
    # force the initial grade codes swapped to prove regrade fixes them
    codes[1]["code"], codes[2]["code"] = "01", "00"
    for c in codes[3:5]:
        c["father_code"] = "01"
    for c in codes[5:7]:
        c["father_code"] = "00"
    # descendants' codes must be consistent prefixes of their father
    codes[3]["code"], codes[4]["code"] = "010", "011"
    codes[5]["code"], codes[6]["code"] = "000", "001"

    g, flags = AnatomicalRegrader(branches, codes, order=0).run()
    # branch 2 heads -y -> right ('00'); branch 3 heads +y -> left ('01')
    assert g[1]["code"].startswith("00")
    assert g[2]["code"].startswith("01")


def test_flags_fire_on_geometry_mismatch():
    branches = _tree()
    codes = _codes(branches)
    # make the right-main children point nowhere near the templates
    branches[3] = _branch(4, (100, 60, 70), (100, 60, 30), 2)   # straight -z
    branches[4] = _branch(5, (100, 60, 70), (100, 60, 110), 2)  # straight +z
    g, flags = AnatomicalRegrader(branches, codes, order=0).run()
    assert flags["rb123"] == 1  # right-main children demoted
    # push-down inserted a generation under '00'
    assert any(c["code"].startswith("001") for c in g[3:5])


def test_regrade_keeps_count_and_hierarchy():
    branches = _tree()
    codes = _codes(branches)
    g, _ = AnatomicalRegrader(branches, codes, order=0).run()
    assert len(g) == len(branches)
    # every non-root father code is a proper prefix of the child code
    for c in g:
        if c["father_code"] not in ("-1",):
            assert c["code"].startswith(c["father_code"])
