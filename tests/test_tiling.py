"""Tile-position generation parity (reference data.py:731-773)."""

import numpy as np

from se_unet_airseg_tpu.data import pad_positions_to_batch, tile_positions


def test_axis_clamping_inexact():
    pos = tile_positions((300, 128, 256), cube=128, step=64)
    xs = sorted({p[0] for p in pos})
    assert xs == [0, 64, 128, 172]  # last window clamped to 300-128
    ys = sorted({p[1] for p in pos})
    assert ys == [0]
    zs = sorted({p[2] for p in pos})
    assert zs == [0, 64, 128]
    assert len(pos) == 4 * 1 * 3


def test_raster_order_matches_reference():
    pos = tile_positions((192, 192, 192), cube=128, step=64)
    # x-major, then y, then z — the reference's triple-nested loop order
    assert pos.tolist() == [
        [x, y, z] for x in [0, 64] for y in [0, 64] for z in [0, 64]
    ]


def test_pad_to_batch_repeats_first():
    pos = tile_positions((192, 128, 128), cube=128, step=64)  # 2 tiles
    padded = pad_positions_to_batch(pos, 8)
    assert len(padded) == 8
    assert (padded[2:] == pos[0]).all()
    # already-aligned lists are untouched
    assert len(pad_positions_to_batch(padded, 8)) == 8


def test_small_volume_exact_fit():
    pos = tile_positions((128, 128, 128), cube=128, step=64)
    assert pos.tolist() == [[0, 0, 0]]
