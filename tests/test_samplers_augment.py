"""Crop samplers + augmentations (reference data.py:40-252 semantics)."""

import numpy as np

from se_unet_airseg_tpu.data.augment import (
    augment_crops,
    random_color,
    random_flip,
    random_rotate,
)
from se_unet_airseg_tpu.data.samplers import (
    centered_random_crop,
    hard_sample,
    location_crop,
    random_crop,
)


def _vols(shape=(40, 44, 48)):
    rng = np.random.default_rng(0)
    return {
        "img": rng.random(shape).astype(np.float32),
        "label": (rng.random(shape) > 0.9).astype(np.float32),
    }


def test_random_crop_bounds_and_shape():
    rng = np.random.default_rng(1)
    vols = _vols()
    for _ in range(20):
        c = random_crop(vols, 16, rng)
        assert c["img"].shape == (16, 16, 16)
        assert c["label"].shape == (16, 16, 16)


def test_location_crop_contains_neighborhood_of_target():
    rng = np.random.default_rng(2)
    vols = _vols()
    loc = (np.array([20]), np.array([22]), np.array([24]))
    hits = 0
    for _ in range(50):
        c = location_crop(vols, loc, 16, rng)
        assert c["img"].shape == (16, 16, 16)
        hits += 1
    assert hits == 50  # never raises near edges


def test_location_crop_clamps_at_volume_edge():
    rng = np.random.default_rng(3)
    vols = _vols()
    loc = (np.array([39]), np.array([43]), np.array([47]))  # far corner
    for _ in range(20):
        c = location_crop(vols, loc, 16, rng)
        assert c["img"].shape == (16, 16, 16)


def test_hard_sample_fallbacks():
    rng = np.random.default_rng(4)
    vols = _vols()
    empty = (np.array([], int),) * 3
    some = (np.array([20]), np.array([20]), np.array([20]))
    # both sets empty -> uniform crop
    c = hard_sample(vols, empty, empty, 16, rng)
    assert c["img"].shape == (16, 16, 16)
    # only small-airway set available -> used
    c = hard_sample(vols, empty, some, 16, rng)
    assert c["img"].shape == (16, 16, 16)


def test_centered_random_crop_stage1_semantics():
    rng = np.random.default_rng(5)
    vols = _vols((32, 32, 32))
    for _ in range(10):
        c = centered_random_crop(vols, 32, rng)  # exact fit
        np.testing.assert_array_equal(c["img"], vols["img"])


def test_random_flip_never_identity():
    rng = np.random.default_rng(6)
    a = np.arange(27, dtype=np.float32).reshape(3, 3, 3)
    for _ in range(30):
        (f,) = random_flip([a], rng)
        assert not np.array_equal(f, a)
        assert sorted(f.reshape(-1)) == sorted(a.reshape(-1))


def test_random_rotate_is_90_degrees():
    rng = np.random.default_rng(7)
    a = np.arange(2 * 3 * 3, dtype=np.float32).reshape(2, 3, 3)
    (r,) = random_rotate([a], rng)
    assert r.shape == (2, 3, 3)
    # applying the same rotation 4 times returns to start
    b = a
    state = np.random.default_rng(7)
    for _ in range(4):
        (b,) = random_rotate([b], np.random.default_rng(7))
    np.testing.assert_array_equal(b, a)


def test_augment_applies_jointly():
    rng = np.random.default_rng(8)
    a = np.arange(64, dtype=np.float32).reshape(4, 4, 4)
    b = a * 2
    out_a, out_b = augment_crops([a, b], rng)
    np.testing.assert_array_equal(out_b, out_a * 2)  # same transform


def test_random_color_range():
    rng = np.random.default_rng(9)
    a = np.ones((4, 4, 4), np.float32)
    out = random_color(a, rng, rate=0.2)
    assert 0.6 <= out.mean() <= 1.4


def test_small_airway_sampler_matches_reference_set():
    """The rejection sampler must accept exactly the voxels of the
    reference's materialized set {EDT(label)*skel < 2} (data.py:305,
    bug-compatible `<2`)."""
    from scipy import ndimage

    from se_unet_airseg_tpu.data.samplers import small_airway_sampler

    rng = np.random.default_rng(0)
    # thick tube with a skeleton line: interior skeleton voxels have
    # EDT >= 2 and must be REJECTED, everything else accepted
    label = np.zeros((12, 12, 12), np.uint8)
    label[2:10, 2:10, 2:10] = 1
    skel = np.zeros_like(label)
    skel[6, 6, 2:10] = 1  # deep inside: EDT ~ 4
    skel[2, 2, 2:10] = 1  # on the corner edge: EDT = 1

    dis = ndimage.distance_transform_edt(label)
    ref_ok = (dis * skel) < 2

    draw = small_airway_sampler(label, skel, rng)
    seen = set()
    for _ in range(4000):
        p = draw()
        assert p is not None
        assert ref_ok[p], f"sampler accepted out-of-set voxel {p}"
        seen.add(p)
    # the accepted points must cover both skel-free and edge-skeleton
    # voxels (i.e. it is not just sampling the complement of skel)
    assert ref_ok[2, 2, 5]
    assert any(skel[p] for p in seen), "edge skeleton voxels are in-set"
