"""Sliding-window engine parity with the reference tiling scheme
(reference data.py:731-773, prediction.py:83-101): boundary windows
clamp inward into real data; border tiles never see synthetic-air
padding. Locked by reassembling the same tiles with numpy and
comparing the full averaged volume, borders included (VERDICT r1
item 6)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from se_unet_airseg_tpu.data.tiling import tile_positions
from se_unet_airseg_tpu.infer import SlidingWindowRunner
from se_unet_airseg_tpu.models import SEUNetConfig, init_params
from se_unet_airseg_tpu.models.se_unet import apply_fast
from se_unet_airseg_tpu.ops import hu_dual_window


def test_engine_matches_numpy_reassembly_on_clamped_grid():
    cube, step = 32, 16
    cfg = SEUNetConfig()
    params = init_params(jax.random.key(0), cfg)
    rng = np.random.default_rng(3)
    # non-multiples of step in every axis; all >= cube so no pad at all
    vol = (rng.random((48, 40, 33)) * 1400.0 - 1000.0).astype(np.float32)

    runner = SlidingWindowRunner(params, cfg, cube=cube, step=step, batch=2)
    got = runner.predict_hu(vol)

    # numpy reassembly on the ORIGINAL extents with clamped positions
    vol2 = np.asarray(hu_dual_window(jnp.asarray(vol)))
    pred = np.zeros(vol.shape, np.float32)
    cnt = np.zeros(vol.shape, np.float32)
    for x, y, z in tile_positions(vol.shape, cube, step):
        tile = vol2[x : x + cube, y : y + cube, z : z + cube]
        out = apply_fast(params, jnp.asarray(tile)[None], cfg=cfg, train=False)
        p = np.asarray(jax.nn.sigmoid(out[1][0, ..., 0].astype(jnp.float32)))
        pred[x : x + cube, y : y + cube, z : z + cube] += p
        cnt[x : x + cube, y : y + cube, z : z + cube] += 1.0
    expected = pred / np.maximum(cnt, 1.0)

    np.testing.assert_allclose(got, expected, rtol=2e-4, atol=2e-5)
    # border regions specifically (the round-1 failure mode): last
    # step-sized slab along each axis
    np.testing.assert_allclose(
        got[-step:], expected[-step:], rtol=2e-4, atol=2e-5
    )
    np.testing.assert_allclose(
        got[:, :, -step:], expected[:, :, -step:], rtol=2e-4, atol=2e-5
    )


def test_undersized_volume_pads_to_one_cube_only():
    cube, step = 32, 16
    cfg = SEUNetConfig()
    params = init_params(jax.random.key(1), cfg)
    vol = (np.random.default_rng(5).random((32, 32, 20)) * 500.0).astype(
        np.float32
    )
    runner = SlidingWindowRunner(params, cfg, cube=cube, step=step)
    out = runner.predict_hu(vol)
    assert out.shape == vol.shape
    assert np.isfinite(out).all()


def test_engine_bm_kernels_match_default():
    """The whole windowed engine (tiling + dual windowing + forward +
    overlap average) under batch-minor layout with the fused Pallas
    kernels (interpret mode on CPU) equals the default path."""
    cube, step = 32, 16
    cfg = SEUNetConfig()
    cfg_bm = SEUNetConfig(batch_minor=True, use_pallas_epi=True)
    params = init_params(jax.random.key(0), cfg)
    vol = (np.random.default_rng(5).random((40, 33, 40)) * 1400.0
           - 1000.0).astype(np.float32)
    got0 = SlidingWindowRunner(params, cfg, cube=cube, step=step,
                               batch=2).predict_hu(vol)
    got1 = SlidingWindowRunner(params, cfg_bm, cube=cube, step=step,
                               batch=2).predict_hu(vol)
    np.testing.assert_allclose(np.asarray(got1), np.asarray(got0),
                               atol=2e-5, rtol=1e-4)


def test_engine_s2d_io_route_matches_legacy(monkeypatch):
    """The s2d-resident volume route (fold volume once, gather/window/
    forward/accumulate in s2d layout, unfold once) equals the per-tile
    relayout route bit-for-bit on an even-extent volume, and actually
    engages (route eligibility asserted, not assumed)."""
    cube, step = 32, 16
    cfg = SEUNetConfig()
    params = init_params(jax.random.key(0), cfg)
    vol = (np.random.default_rng(7).random((64, 48, 64)) * 1400.0
           - 1000.0).astype(np.float32)

    monkeypatch.setenv("SW_S2D", "0")
    legacy = SlidingWindowRunner(params, cfg, cube=cube, step=step,
                                 batch=2).predict_hu(vol)
    monkeypatch.setenv("SW_S2D", "1")
    r = SlidingWindowRunner(params, cfg, cube=cube, step=step, batch=2)
    pos = tile_positions(vol.shape, cube, step)
    assert r._s2d_io_ok(vol.shape, pos)
    got = r.predict_hu(vol)
    np.testing.assert_allclose(np.asarray(got), np.asarray(legacy),
                               atol=1e-6, rtol=1e-6)


def test_engine_s2d_io_skips_odd_volumes(monkeypatch):
    """Odd extents / odd clamped positions keep the legacy route (the
    reference's clamped tiling yields odd positions there)."""
    cfg = SEUNetConfig()
    params = init_params(jax.random.key(0), cfg)
    monkeypatch.setenv("SW_S2D", "1")
    r = SlidingWindowRunner(params, cfg, cube=32, step=16, batch=2)
    pos = tile_positions((48, 40, 33), 32, 16)
    assert not r._s2d_io_ok((48, 40, 33), pos)
    vol = (np.random.default_rng(5).random((48, 40, 33)) * 1400.0
           - 1000.0).astype(np.float32)
    out = r.predict_hu(vol)
    assert out.shape == vol.shape and np.isfinite(out).all()


def test_trit_pack_roundtrip_and_density():
    """Base-3 5-voxel/byte packing: losslessly inverted by
    unpack_trits, and the packed payload is ceil(n/5) bytes (the
    device->host download this engine ships per volume)."""
    from se_unet_airseg_tpu.infer.sliding_window import unpack_trits

    shape = (7, 9, 11)
    r = np.random.default_rng(0)
    avg = r.random(shape).astype(np.float32)
    packed = np.asarray(
        SlidingWindowRunner._trit_pack(
            jnp.asarray(avg), jnp.ones(shape, jnp.float32), 0.6, 0.3
        )
    )
    n = int(np.prod(shape))
    assert packed.dtype == np.uint8
    assert packed.size == -(-n // 5)
    trits = unpack_trits(packed, n, shape)
    ref = (avg >= 0.3).astype(np.uint8) + (avg >= 0.6).astype(np.uint8)
    np.testing.assert_array_equal(trits, ref)


def test_trit_summary_roundtrip_fetches_only_mixed_chunks():
    """Block-constant codec: decode reproduces the trit field exactly
    while fetching payload chunks only where a block is mixed."""
    from se_unet_airseg_tpu.infer.sliding_window import (
        BLOCKS_PER_CHUNK,
        VOX_PER_BLOCK,
        decode_trit_summary,
    )

    r = np.random.default_rng(7)
    # 40 blocks + a ragged tail: constant-0 background, one constant-2
    # slab, and two mixed regions straddling block boundaries
    n = 40 * VOX_PER_BLOCK + 1234
    avg = np.zeros(n, np.float32)
    avg[5 * VOX_PER_BLOCK : 9 * VOX_PER_BLOCK] = 0.9            # const 2
    mix = slice(12 * VOX_PER_BLOCK + 100, 13 * VOX_PER_BLOCK + 50)
    avg[mix] = r.random(mix.stop - mix.start)                   # mixed
    avg[-200:] = 0.5                                            # tail mixed
    shape = (n,)
    summary, chunks, payload = SlidingWindowRunner._trit_summary(
        jnp.asarray(avg), jnp.float32(1.0), 0.6, 0.3
    )
    fetch_log = []

    def fetch(i):
        fetch_log.append(i)
        return np.asarray(chunks[i])

    got = decode_trit_summary(np.asarray(summary), fetch, n, shape)
    ref = (avg >= 0.3).astype(np.uint8) + (avg >= 0.6).astype(np.uint8)
    np.testing.assert_array_equal(got, ref)

    s = np.asarray(summary)
    mixed_blocks = np.flatnonzero((s >> 2) != (s & 3))
    assert sorted(fetch_log) == sorted(
        np.unique(mixed_blocks // BLOCKS_PER_CHUNK).tolist()
    )
    # the two engineered mixed regions -> far fewer chunks than total
    assert len(fetch_log) < len(chunks)

    # the whole-payload buffer agrees with the chunk split, and the
    # adaptive fetcher picks the chunk route here (sparse mixed set)
    # but the one-copy payload route on a dense field — both decoding
    # to the same trit volume
    from se_unet_airseg_tpu.infer.sliding_window import make_chunk_fetcher

    np.testing.assert_array_equal(
        np.asarray(payload),
        np.concatenate([np.asarray(c) for c in chunks]),
    )
    got2 = decode_trit_summary(
        s, make_chunk_fetcher(s, chunks, payload), n, shape)
    np.testing.assert_array_equal(got2, ref)
    dense = r.random(n).astype(np.float32)  # mixed nearly everywhere
    s2, ch2, pay2 = SlidingWindowRunner._trit_summary(
        jnp.asarray(dense), jnp.float32(1.0), 0.6, 0.3
    )
    s2 = np.asarray(s2)
    fetcher = make_chunk_fetcher(s2, ch2, pay2)
    got3 = decode_trit_summary(s2, fetcher, n, shape)
    ref3 = (dense >= 0.3).astype(np.uint8) + (dense >= 0.6).astype(np.uint8)
    np.testing.assert_array_equal(got3, ref3)


def test_predict_trits_summary_matches_packed_path():
    """Engine-level: the block-constant codec download reconstructs
    the SAME trit volume as the dense base-3 path."""
    from se_unet_airseg_tpu.infer.sliding_window import unpack_trits

    cube, step = 32, 16
    cfg = SEUNetConfig()
    params = init_params(jax.random.key(2), cfg)
    vol = (np.random.default_rng(9).random((48, 40, 33)) * 1400.0
           - 1000.0).astype(np.float32)
    runner = SlidingWindowRunner(params, cfg, cube=cube, step=step, batch=2)
    got = runner.predict_trits(vol, h_thresh=0.5, l_thresh=0.35)
    packed, padded_shape, orig = runner.predict_trits_device(
        vol, h_thresh=0.5, l_thresh=0.35
    )
    ref = unpack_trits(
        np.asarray(packed), int(np.prod(padded_shape)), padded_shape
    )[: orig[0], : orig[1], : orig[2]]
    np.testing.assert_array_equal(got, ref)
