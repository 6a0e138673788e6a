"""Closed-form tests of losses and ATM22 metrics (SURVEY.md §4 item 1)."""

import numpy as np

import jax.numpy as jnp

from se_unet_airseg_tpu import losses, metrics


def test_dice_loss_closed_form():
    pred = jnp.asarray([1.0, 0.5, 0.0, 0.0])
    tgt = jnp.asarray([1.0, 1.0, 0.0, 1.0])
    # inter = 1.5, sums = 1.5 + 3 -> 1 - (2*1.5+1)/(4.5+1)
    want = 1 - (2 * 1.5 + 1) / (1.5 + 3 + 1)
    np.testing.assert_allclose(float(losses.dice_loss(pred, tgt)), want, rtol=1e-6)


def test_dice_loss_perfect_is_zero():
    t = jnp.asarray(np.random.default_rng(0).random((4, 4, 4)) > 0.5, jnp.float32)
    assert float(losses.dice_loss(t, t)) < 1e-5


def test_general_union_loss_matches_reference_formula():
    rng = np.random.default_rng(1)
    p = rng.random((5, 5, 5)).astype(np.float32)
    t = (rng.random((5, 5, 5)) > 0.6).astype(np.float32)
    w = rng.random((5, 5, 5)).astype(np.float32)
    alpha, beta, s1, s2 = 0.2, 0.8, 1e-4, 1e-4
    wi = t * s1 + (1 - t) * s2
    inter = (w * ((p + wi) ** 0.7) * t).sum()
    union = (w * (alpha * p + beta * t)).sum()
    want = 1 - (inter + 1.0) / (union + 1.0)
    got = float(losses.general_union_loss(jnp.asarray(p), jnp.asarray(t), jnp.asarray(w)))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_atr_loss_matches_reference_formula():
    rng = np.random.default_rng(2)
    p = rng.random((4, 4, 4)).astype(np.float32)
    s = (rng.random((4, 4, 4)) > 0.7).astype(np.float32)
    w = rng.random((4, 4, 4)).astype(np.float32)
    ps = p * s
    want = 1 - ((w * ps * s).sum() + 1.0) / ((w * (ps + s)).sum() + 1.0)
    got = float(losses.atr_loss(jnp.asarray(p), jnp.asarray(s), jnp.asarray(w)))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_stage_mixes():
    rng = np.random.default_rng(3)
    shp = (2, 8, 8, 8)
    p_en, p_de = (jnp.asarray(rng.random(shp), jnp.float32) for _ in range(2))
    t = jnp.asarray(rng.random(shp) > 0.5, jnp.float32)
    w = jnp.asarray(rng.random(shp), jnp.float32)
    sk = jnp.asarray(rng.random(shp) > 0.9, jnp.float32)
    s1 = float(losses.stage1_loss(p_en, p_de, t))
    assert abs(s1 - float(losses.dice_loss(p_de, t) + losses.dice_loss(p_en, t))) < 1e-6
    s2 = float(losses.stage2_loss(p_en, p_de, t, w))
    want2 = float(
        losses.general_union_loss(p_de, t, w) + 0.5 * losses.general_union_loss(p_en, t, w)
    )
    assert abs(s2 - want2) < 1e-6
    s3 = float(losses.stage3_loss(p_en, p_de, t, w, sk))
    want3 = want2 + 0.5 * float(losses.atr_loss(p_en, sk, w) + losses.atr_loss(p_de, sk, w))
    assert abs(s3 - want3) < 1e-6


def test_metrics_toy_volume():
    # 3-branch toy: branch ids 1,2,3 along z-columns of a 4x4x6 volume
    label = np.zeros((4, 4, 6), np.uint8)
    skel = np.zeros_like(label)
    parse = np.zeros_like(label, dtype=np.uint16)
    for bid, x in [(1, 0), (2, 1), (3, 2)]:
        label[x, 1, :] = 1
        skel[x, 1, :] = 1
        parse[x, 1, :] = bid
    pred = label.copy()
    pred[2, 1, :] = 0  # miss branch 3 entirely
    pred[1, 1, 5] = 0  # branch 2: 5/6 covered -> >=0.8 still detected

    total, det, bd = metrics.branch_detected(pred, parse, skel)
    assert (total, det) == (3, 2)
    np.testing.assert_allclose(bd, round(200 / 3, 2))

    td = metrics.tree_length_detected(pred, skel)
    np.testing.assert_allclose(td, round(11 / 18 * 100, 2))

    dsc = metrics.dice_score(pred, label)
    np.testing.assert_allclose(dsc, round(2 * 11 / (11 + 18) * 100, 2), atol=0.01)

    assert metrics.precision(pred, label) == 100.0
    assert metrics.specificity(pred, label) == 100.0
    m = metrics.evaluation_suite(pred, label, parse, skel)
    assert set(m) == {"TD", "BD", "DSC", "Pre", "Sen", "Spe"}
    # selection scores are plain affine combinations
    np.testing.assert_allclose(
        metrics.stage3_selection_score(m),
        0.3 * m["TD"] + 0.3 * m["BD"] + 0.2 * m["DSC"] + 0.2 * m["Pre"],
    )
