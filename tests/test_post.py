"""Native post-processing kernels vs scipy oracles + semantics checks."""

import numpy as np
import pytest
from scipy import ndimage

from se_unet_airseg_tpu.post import (
    connected_components,
    dti,
    edt_with_indices,
    largest_component,
    native_available,
    skeletonize_3d,
)


def test_cc_matches_scipy_26_and_6():
    rng = np.random.default_rng(0)
    m = (rng.random((30, 31, 32)) > 0.7).astype(np.uint8)
    lab, n = connected_components(m, 26)
    slab, sn = ndimage.label(m, structure=np.ones((3, 3, 3)))
    assert n == sn
    for c in range(1, sn + 1):
        ours = lab[slab == c]
        assert (ours == ours[0]).all(), "partition differs from scipy"
    _, n6 = connected_components(m, 6)
    _, sn6 = ndimage.label(m)
    assert n6 == sn6


def test_largest_component():
    m = np.zeros((10, 10, 10), np.uint8)
    m[1:3, 1:3, 1:3] = 1  # 8 voxels
    m[6:9, 6:9, 6:9] = 1  # 27 voxels
    big = largest_component(m)
    assert big.sum() == 27 and big[7, 7, 7] == 1 and big[1, 1, 1] == 0
    assert largest_component(np.zeros((4, 4, 4), np.uint8)).sum() == 0


def test_edt_matches_scipy():
    rng = np.random.default_rng(1)
    m = (rng.random((20, 21, 22)) > 0.4).astype(np.uint8)
    d, idx = edt_with_indices(m)
    sd = ndimage.distance_transform_edt(m)
    np.testing.assert_allclose(d, sd, rtol=1e-5, atol=1e-4)
    # nearest indices may break ties differently; induced distances must agree
    grid = np.indices(m.shape)
    dist_from_idx = np.sqrt(((grid - idx) ** 2).sum(axis=0))
    np.testing.assert_allclose(dist_from_idx, sd, rtol=1e-5, atol=1e-4)


@pytest.mark.skipif(not native_available(), reason="native lib not built")
def test_skeleton_tube_reduces_to_line():
    tube = np.zeros((40, 7, 7), np.uint8)
    tube[2:38, 2:5, 2:5] = 1
    sk = skeletonize_3d(tube)
    assert 30 <= sk.sum() <= 40
    assert (sk.astype(bool) & ~tube.astype(bool)).sum() == 0
    _, n = connected_components(sk, 26)
    assert n == 1  # thinning preserves connectivity


@pytest.mark.skipif(not native_available(), reason="native lib not built")
def test_skeleton_preserves_topology_on_Y_junction():
    vol = np.zeros((40, 40, 9), np.uint8)
    vol[2:20, 19:22, 3:6] = 1  # trunk
    vol[19:38, 5:8, 3:6] = 1
    vol[18:22, 5:22, 3:6] = 1  # connect branch1
    vol[19:38, 33:36, 3:6] = 1
    vol[18:22, 20:36, 3:6] = 1  # connect branch2
    _, n_in = connected_components(vol, 26)
    sk = skeletonize_3d(vol)
    _, n_out = connected_components(sk, 26)
    assert n_in == n_out == 1
    assert sk.sum() >= 40  # roughly the total centerline length


def test_dti_one_sweep_chain_propagation():
    # raster order lets a promoted voxel immediately promote the next one
    p = np.zeros((5, 5, 5), np.float32)
    p[2, 2, 2] = 0.9
    p[2, 2, 3] = 0.45
    p[2, 2, 4] = 0.45
    out = dti(p, 0.5, 0.4)
    assert out[2, 2, 2] == out[2, 2, 3] == out[2, 2, 4] == 1
    # but an isolated band voxel with no seeded neighbor stays off
    p2 = np.zeros((5, 5, 5), np.float32)
    p2[2, 2, 3] = 0.45
    assert dti(p2, 0.5, 0.4).sum() == 0


def test_dti_matches_python_fallback():
    # both implementations perform the same in-place raster sweep, so
    # they must agree voxel-for-voxel
    from se_unet_airseg_tpu.post._native import _dti_python

    rng = np.random.default_rng(2)
    p = rng.random((12, 13, 14)).astype(np.float32)
    a = dti(p, 0.5, 0.35)
    b = _dti_python(p, 0.5, 0.35)
    np.testing.assert_array_equal(a, b)


def test_fill_holes_matches_scipy_2d_and_3d():
    from se_unet_airseg_tpu.post import fill_holes

    rng = np.random.default_rng(3)
    m3 = (rng.random((18, 19, 20)) > 0.55).astype(np.uint8)
    np.testing.assert_array_equal(
        fill_holes(m3), ndimage.binary_fill_holes(m3).astype(np.uint8)
    )
    m2 = (rng.random((40, 41)) > 0.5).astype(np.uint8)
    np.testing.assert_array_equal(
        fill_holes(m2), ndimage.binary_fill_holes(m2).astype(np.uint8)
    )
    # a hollow cube: the cavity fills, the outside stays empty
    box = np.zeros((9, 9, 9), np.uint8)
    box[2:7, 2:7, 2:7] = 1
    box[3:6, 3:6, 3:6] = 0
    assert fill_holes(box)[4, 4, 4] == 1 and fill_holes(box)[0, 0, 0] == 0


def test_dilation_erosion_closing_match_scipy():
    from se_unet_airseg_tpu.post import binary_closing, binary_dilation

    rng = np.random.default_rng(4)
    m = (rng.random((15, 16, 17)) > 0.7).astype(np.uint8)
    np.testing.assert_array_equal(
        binary_dilation(m), ndimage.binary_dilation(m).astype(np.uint8)
    )
    np.testing.assert_array_equal(
        binary_closing(m), ndimage.binary_closing(m).astype(np.uint8)
    )


def test_box_convolve27_matches_scipy_reflect():
    from se_unet_airseg_tpu.post import box_convolve27

    rng = np.random.default_rng(5)
    v = rng.random((9, 10, 11)).astype(np.float32)
    ours = box_convolve27(v)
    ref = ndimage.convolve(v, np.ones((3, 3, 3), np.float32))
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_find_objects_matches_scipy():
    from se_unet_airseg_tpu.post import find_objects

    rng = np.random.default_rng(6)
    lab = rng.integers(0, 6, (12, 13, 14)).astype(np.int32)
    lab[lab == 3] = 0  # a label id with no voxels -> None entry
    ours = find_objects(lab, max_label=7)
    ref = ndimage.find_objects(lab, max_label=7)
    assert ours == ref
