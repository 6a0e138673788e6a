"""Sliding-window tile-position generation.

This is the reference's long-input mechanism (its analog of sequence-
length scaling, SURVEY.md §5.7): fixed 128^3 cubes at stride 64 with
boundary windows clamped inward so the last window ends exactly at the
volume edge, and the position list padded to a multiple of the batch
size by repeating the first position (duplicates cancel in the
overlap-count normalization). Semantics match reference
data.py:731-773 exactly — locked by unit test against hand-derived
cases.
"""

from __future__ import annotations

import numpy as np


def _axis_starts(extent: int, cube: int, step: int) -> list[int]:
    if extent < cube:
        raise ValueError(f"volume extent {extent} smaller than cube {cube}")
    rem = (extent - cube) % step
    n = (extent - cube) // step + (1 if rem == 0 else 2)
    starts = []
    for i in range(n):
        lo = step * i
        if lo + cube > extent:
            lo = extent - cube
        starts.append(lo)
    return starts


def tile_positions(shape, cube: int = 128, step: int = 64) -> np.ndarray:
    """All (x, y, z) tile starts for a (D, H, W) volume, raster order."""
    xs = _axis_starts(shape[0], cube, step)
    ys = _axis_starts(shape[1], cube, step)
    zs = _axis_starts(shape[2], cube, step)
    pos = [(x, y, z) for x in xs for y in ys for z in zs]
    return np.asarray(pos, dtype=np.int32)


def pad_positions_to_batch(pos: np.ndarray, batch: int) -> np.ndarray:
    """Pad to a multiple of `batch` by repeating the first position."""
    if len(pos) % batch == 0:
        return pos
    n_pad = batch - (len(pos) % batch)
    return np.concatenate([pos, np.repeat(pos[:1], n_pad, axis=0)], axis=0)
