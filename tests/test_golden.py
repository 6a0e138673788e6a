"""Vendored golden micro-fixtures for the native post-processing lib
(VERDICT r3 item 8): committed oracle outputs (tests/golden/
post_goldens.npz, generated once by tests/golden/generate_goldens.py)
lock EDT/CC/fill-holes semantics to fixed arrays independent of the
runtime scipy version, and pin the Lee-thinning skeleton bit-for-bit.
Reference call sites: weight_br.py:132,159 (EDT+indices),
util.py:58-75 (26-CC + fill holes), ske_and_parse.py:83 (skeleton)."""

import os

import numpy as np
import pytest

from se_unet_airseg_tpu.post import (
    connected_components,
    edt_with_indices,
    skeletonize_3d,
)

GOLD = os.path.join(os.path.dirname(__file__), "golden", "post_goldens.npz")


@pytest.fixture(scope="module")
def gold():
    return np.load(GOLD)


@pytest.mark.parametrize("i", [0, 1, 2])
def test_edt_matches_golden(gold, i):
    m = gold[f"edt{i}_in"]
    dist, idx = edt_with_indices(m, return_indices=True)
    np.testing.assert_allclose(dist, gold[f"edt{i}_dist"],
                               rtol=1e-5, atol=1e-5)
    # nearest-zero indices are tie-ambiguous: require (a) the indexed
    # voxel is background (or self where m==0), and (b) its distance
    # equals the EDT — the oracle's exact ids need not match
    zz, yy, xx = np.meshgrid(*[np.arange(s) for s in m.shape],
                             indexing="ij")
    d2 = ((idx[0] - zz) ** 2 + (idx[1] - yy) ** 2
          + (idx[2] - xx) ** 2).astype(np.float64)
    np.testing.assert_allclose(np.sqrt(d2), gold[f"edt{i}_dist"],
                               rtol=1e-5, atol=1e-5)
    assert (m[idx[0], idx[1], idx[2]] == 0).all()


def _canon_partition(labels):
    flat = labels.ravel()
    out = np.zeros_like(flat, dtype=np.int32)
    nxt = 1
    seen = {}
    for i in np.flatnonzero(flat):
        l = flat[i]
        if l not in seen:
            seen[l] = nxt
            nxt += 1
        out[i] = seen[l]
    return out.reshape(labels.shape)


@pytest.mark.parametrize("i", [0, 1])
@pytest.mark.parametrize("conn", [26, 6])
def test_cc_matches_golden(gold, i, conn):
    m = gold[f"cc{i}_in"]
    labels, _ = connected_components(m, connectivity=conn)
    np.testing.assert_array_equal(
        _canon_partition(labels), gold[f"cc{i}_l{conn}"]
    )


def test_fill_holes_matches_golden(gold):
    from scipy import ndimage

    got = ndimage.binary_fill_holes(gold["fill0_in"]).astype(np.uint8)
    np.testing.assert_array_equal(got, gold["fill0_out"])


def test_skeleton_matches_golden(gold):
    got = skeletonize_3d(gold["skel0_in"]).astype(np.uint8)
    np.testing.assert_array_equal(got, gold["skel0_out"])
