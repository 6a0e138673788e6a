"""Marching-tetrahedra isosurface + binary STL writer."""

import struct

import numpy as np
import pytest

from se_unet_airseg_tpu.post import native_available
from se_unet_airseg_tpu.post.mesh import (
    export_mask_stl,
    marching_surface,
    write_binary_stl,
)

pytestmark = pytest.mark.skipif(not native_available(), reason="no native lib")


def _sphere_grid(n=24, r=8.0):
    g = np.mgrid[:n, :n, :n].astype(np.float64)
    c = (n - 1) / 2
    return np.sqrt(((g - c) ** 2).sum(axis=0)), c


def test_smooth_isosurface_area_matches_sphere():
    dist, _ = _sphere_grid()
    tris = marching_surface((8.0 - dist).astype(np.float32), 0.0)
    a = tris[:, 1] - tris[:, 0]
    b = tris[:, 2] - tris[:, 0]
    area = 0.5 * np.linalg.norm(np.cross(a, b), axis=1).sum()
    want = 4 * np.pi * 64
    assert abs(area - want) / want < 0.05


def test_binary_mask_surface_exists_and_bounds():
    dist, c = _sphere_grid()
    mask = (dist < 8).astype(np.float32)
    tris = marching_surface(mask, 0.5)
    assert len(tris) > 200
    # vertices stay inside the voxel grid and near the shell
    assert tris.min() >= 0 and tris.max() <= 23
    radii = np.linalg.norm(tris.reshape(-1, 3) - c, axis=1)
    assert 6.5 < radii.min() and radii.max() < 9.5


def test_stl_round_trip(tmp_path):
    dist, c = _sphere_grid()
    mask = (dist < 8).astype(np.float32)
    path = str(tmp_path / "m.stl")
    n = export_mask_stl(path, mask, center=(c, c, c), scale=10.0)
    raw = open(path, "rb").read()
    count = struct.unpack("<I", raw[80:84])[0]
    assert count == n
    assert len(raw) == 84 + 50 * count
    # first vertex is centered/scaled: |v| <= 24/10
    v = np.array(struct.unpack_from("<3f", raw, 84 + 12))
    assert np.linalg.norm(v) < 2.4


def test_empty_mask_gives_empty_stl(tmp_path):
    path = str(tmp_path / "e.stl")
    n = export_mask_stl(path, np.zeros((8, 8, 8), np.float32))
    assert n == 0
    raw = open(path, "rb").read()
    assert len(raw) == 84
