"""Pinned branch-count parity on the reference's bundled demo masks.

The reference records 274 branches for CASE073 under the "Ours" parser
(reference README.md:111-119, commented results table); CASE091 has no
published number, so its count is pinned at the value this
implementation produces (194) to catch regressions. Parity depends on
reproducing the reference's traversal quirks exactly (unstable
z-argsort tie order, sibling member accumulation in subsection,
reversed single-child collapse in merging) — see post/topology.py.
"""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow

DEMO = "/root/reference/demo_mask"


def _ours_branch_count(path: str) -> int:
    from se_unet_airseg_tpu.cli.tree_parsing import load_like_reference
    from se_unet_airseg_tpu.post.topology import TopologyTree, detect_order

    pred, _ = load_like_reference(path)
    order = detect_order(pred)
    tree = TopologyTree(pred, order, 5, remerge_l=["000"])
    tree.sub()
    tree.merge()
    tree.grade()
    tree.regrade()
    if tree.flags.get("rb23") == 1 or tree.flags.get("rb12") == 1:
        tree.remerge()
        tree.regrade()
    return tree.branch_count


@pytest.mark.skipif(not os.path.isdir(DEMO), reason="demo masks not mounted")
def test_case073_ours_branch_parity():
    assert _ours_branch_count(os.path.join(DEMO, "CASE073.nii.gz")) == 274


@pytest.mark.skipif(not os.path.isdir(DEMO), reason="demo masks not mounted")
def test_case091_ours_branch_pinned():
    assert _ours_branch_count(os.path.join(DEMO, "CASE091.nii.gz")) == 194
