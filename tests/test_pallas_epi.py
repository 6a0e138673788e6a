"""Parity of the fused Pallas epilogue block (interpret mode on CPU)
against the pure-XLA composition: conv + phase gather + InstanceNorm
+ LeakyReLU + SE gates, and its custom_vjp backward."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from se_unet_airseg_tpu.ops.pallas_s2d import (
    _xla_gated_composition,
    phased_gated_block,
)
from se_unet_airseg_tpu.ops.s2d import phased_conv_weights, se_gate_weights


def _make_block(seed, n, cis, co, gates):
    r = np.random.default_rng(seed)
    ci_orig = sum(cis) // 8
    w_all, b_all = phased_conv_weights(
        jnp.asarray(r.standard_normal((3, 3, 3, ci_orig, co),
                                      np.float32) * 0.1),
        jnp.asarray(r.standard_normal(co, np.float32) * 0.1),
        tuple(c // 8 for c in cis) if len(cis) > 1 else None,
    )
    xs = tuple(
        jnp.asarray(r.standard_normal((2, n, n, n, c), np.float32))
        for c in cis
    )
    wgs, oh = [], None
    for _ in range(gates):
        wse = jnp.asarray(r.standard_normal((co, 1), np.float32) * 0.1)
        wg, oh_ = se_gate_weights(wse, jnp.float32)
        wgs.append(jnp.pad(wg, ((0, 0), (0, 128 - wg.shape[1]))))
        oh = jnp.pad(oh_, ((0, 128 - oh_.shape[0]), (0, 0)))
    return xs, w_all, b_all, jnp.stack(wgs), oh


@pytest.mark.parametrize(
    "n,cis,co,gates",
    [
        (8, (128,), 16, 1),          # dc6-like (one input, one gate)
        (8, (64, 64), 16, 2),        # dc3-like (plain concat, two gates)
    ],
)
def test_epilogue_matches_xla(n, cis, co, gates):
    xs, w_all, b_all, wgs, oh = _make_block(0, n, cis, co, gates)
    out_p = phased_gated_block(xs, w_all, b_all, wgs, oh)
    out_x = _xla_gated_composition(xs, w_all, b_all, wgs, oh)
    np.testing.assert_allclose(
        np.asarray(out_p), np.asarray(out_x), atol=2e-6, rtol=1e-5
    )


def test_epilogue_grads_match_xla():
    xs, w_all, b_all, wgs, oh = _make_block(1, 8, (64, 64), 16, 1)

    def loss_p(a, b, w):
        return jnp.sum(phased_gated_block((a, b), w, b_all, wgs, oh) ** 2)

    def loss_x(a, b, w):
        return jnp.sum(
            _xla_gated_composition((a, b), w, b_all, wgs, oh) ** 2
        )

    gp = jax.grad(loss_p, argnums=(0, 1, 2))(*xs, w_all)
    gx = jax.grad(loss_x, argnums=(0, 1, 2))(*xs, w_all)
    for a, b in zip(gp, gx):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-5, rtol=1e-4
        )


def test_model_epilogue_path_matches_default():
    """apply_fast with use_pallas_epi=True (interpret mode on CPU)
    equals the default fast path."""
    from se_unet_airseg_tpu.models import SEUNetConfig, init_params
    from se_unet_airseg_tpu.models.se_unet import apply_fast

    cfg = SEUNetConfig()
    cfg_epi = SEUNetConfig(use_pallas_epi=True)
    params = init_params(jax.random.key(0), cfg)
    x = jnp.asarray(
        np.random.default_rng(0).random((1, 16, 16, 16, 2), np.float32)
    )
    a = apply_fast(params, x, cfg=cfg, train=False)
    b = apply_fast(params, x, cfg=cfg_epi, train=False)
    for ya, yb in zip(a, b):
        np.testing.assert_allclose(
            np.asarray(ya), np.asarray(yb), atol=2e-5, rtol=1e-4
        )


def _make_gathered_bm(seed, n, co, gates, b=8):
    r = np.random.default_rng(seed)
    y = jnp.asarray(r.standard_normal((n, n, n, b, 8 * co), np.float32))
    wgs, oh = [], None
    for _ in range(gates):
        wse = jnp.asarray(r.standard_normal((co, 1), np.float32) * 0.1)
        wg, oh_ = se_gate_weights(wse, jnp.float32)
        wgs.append(jnp.pad(wg, ((0, 0), (0, 128 - wg.shape[1]))))
        oh = jnp.pad(oh_, ((0, 128 - oh_.shape[0]), (0, 0)))
    return y, (jnp.stack(wgs) if gates else None), oh


@pytest.mark.parametrize("gates", [0, 1, 2])
def test_bm_gated_norm_matches_batch_major(gates):
    """The batch-minor gathered epilogue equals both its own XLA
    composition and the proven batch-major kernel on the transposed
    tensor (b=8, c8=128 so the Mosaic-eligible kernel path runs)."""
    from se_unet_airseg_tpu.ops.pallas_s2d import (
        _xla_gated_norm_composition_bm,
        gated_norm_block,
        gated_norm_block_bm,
    )

    y, wgs, oh = _make_gathered_bm(3 + gates, 8, 16, gates)
    out = gated_norm_block_bm(y, wgs, oh)
    ref = _xla_gated_norm_composition_bm(y, wgs, oh)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-6, rtol=1e-5)
    y_bmaj = jnp.transpose(y, (3, 0, 1, 2, 4))
    ref2 = gated_norm_block(y_bmaj, wgs, oh)
    np.testing.assert_allclose(
        np.asarray(jnp.transpose(out, (3, 0, 1, 2, 4))), np.asarray(ref2),
        atol=2e-6, rtol=1e-5,
    )


def test_bm_gated_norm_grads_match():
    from se_unet_airseg_tpu.ops.pallas_s2d import (
        _xla_gated_norm_composition_bm,
        gated_norm_block_bm,
    )

    y, wgs, oh = _make_gathered_bm(9, 8, 16, 1)

    gp = jax.grad(lambda t: jnp.sum(gated_norm_block_bm(t, wgs, oh) ** 2))(y)
    gx = jax.grad(
        lambda t: jnp.sum(_xla_gated_norm_composition_bm(t, wgs, oh) ** 2)
    )(y)
    np.testing.assert_allclose(np.asarray(gp), np.asarray(gx),
                               atol=2e-5, rtol=1e-4)


def test_model_bm_epilogue_path_matches_default():
    """apply_fast with batch_minor=True + use_pallas_epi=True
    (interpret mode on CPU) equals the default fast path."""
    from se_unet_airseg_tpu.models import SEUNetConfig, init_params
    from se_unet_airseg_tpu.models.se_unet import (
        apply_fast, prepare_fast_params,
    )

    cfg = SEUNetConfig()
    cfg_epi = SEUNetConfig(batch_minor=True, use_pallas_epi=True)
    params = init_params(jax.random.key(0), cfg)
    x = jnp.asarray(
        np.random.default_rng(1).random((8, 16, 16, 16, 2), np.float32)
    )
    fp = jax.jit(lambda p: prepare_fast_params(p, cfg_epi, n=8))(params)
    a = apply_fast(params, x, cfg=cfg, train=False)
    b = apply_fast(params, x, cfg=cfg_epi, train=False, fast_params=fp)
    for ya, yb in zip(a, b):
        np.testing.assert_allclose(
            np.asarray(ya), np.asarray(yb), atol=2e-5, rtol=1e-4
        )


def _make_block_bm(seed, n, cis, co, gates, b=8):
    r = np.random.default_rng(seed)
    ci_orig = sum(cis) // 8
    w_all, b_all = phased_conv_weights(
        jnp.asarray(r.standard_normal((3, 3, 3, ci_orig, co),
                                      np.float32) * 0.1),
        jnp.asarray(r.standard_normal(co, np.float32) * 0.1),
        tuple(c // 8 for c in cis) if len(cis) > 1 else None,
    )
    xs = tuple(
        jnp.asarray(r.standard_normal((n, n, n, b, c), np.float32))
        for c in cis
    )
    wgs, oh = [], None
    for _ in range(gates):
        wse = jnp.asarray(r.standard_normal((co, 1), np.float32) * 0.1)
        wg, oh_ = se_gate_weights(wse, jnp.float32)
        wgs.append(jnp.pad(wg, ((0, 0), (0, 128 - wg.shape[1]))))
        oh = jnp.pad(oh_, ((0, 128 - oh_.shape[0]), (0, 0)))
    return xs, w_all, b_all, jnp.stack(wgs), oh


@pytest.mark.parametrize(
    "n,cis,co,gates",
    [
        (8, (128,), 16, 1),
        (8, (64, 64), 16, 2),
    ],
)
def test_bm_phased_epilogue_matches_xla(n, cis, co, gates):
    from se_unet_airseg_tpu.ops.pallas_s2d import (
        _xla_phased_gated_composition_bm,
        phased_gated_block_bm,
    )

    xs, w_all, b_all, wgs, oh = _make_block_bm(5, n, cis, co, gates)
    out_p = phased_gated_block_bm(xs, w_all, b_all, wgs, oh)
    out_x = _xla_phased_gated_composition_bm(xs, w_all, b_all, wgs, oh)
    np.testing.assert_allclose(
        np.asarray(out_p), np.asarray(out_x), atol=2e-6, rtol=1e-5
    )
    # and against the proven batch-major kernel on transposed inputs
    xs_bmaj = tuple(jnp.transpose(t, (3, 0, 1, 2, 4)) for t in xs)
    ref = phased_gated_block(xs_bmaj, w_all, b_all, wgs, oh)
    np.testing.assert_allclose(
        np.asarray(jnp.transpose(out_p, (3, 0, 1, 2, 4))), np.asarray(ref),
        atol=2e-6, rtol=1e-5,
    )


def test_bm_phased_epilogue_grads_match():
    from se_unet_airseg_tpu.ops.pallas_s2d import (
        _xla_phased_gated_composition_bm,
        phased_gated_block_bm,
    )

    xs, w_all, b_all, wgs, oh = _make_block_bm(6, 8, (64, 64), 16, 1)

    def loss_p(a, b, w):
        return jnp.sum(phased_gated_block_bm((a, b), w, b_all, wgs, oh) ** 2)

    def loss_x(a, b, w):
        return jnp.sum(
            _xla_phased_gated_composition_bm((a, b), w, b_all, wgs, oh) ** 2
        )

    gp = jax.grad(loss_p, argnums=(0, 1, 2))(*xs, w_all)
    gx = jax.grad(loss_x, argnums=(0, 1, 2))(*xs, w_all)
    for a, b in zip(gp, gx):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-5, rtol=1e-4
        )


def _make_dil2_bm(seed, n, ci, co, gates, b=8):
    from se_unet_airseg_tpu.ops.s2d import dil2_dense_weight

    r = np.random.default_rng(seed)
    x = jnp.asarray(r.standard_normal((n, n, n, b, 8 * ci), np.float32))
    w = jnp.asarray(r.standard_normal((3, 3, 3, ci, co), np.float32) * 0.1)
    bias = jnp.asarray(r.standard_normal(co, np.float32) * 0.1)
    wd = dil2_dense_weight(w, jnp.float32)
    bg = jnp.tile(bias, 8)
    wgs, oh = [], None
    for _ in range(gates):
        wse = jnp.asarray(r.standard_normal((co, 1), np.float32) * 0.1)
        wg, oh_ = se_gate_weights(wse, jnp.float32)
        wgs.append(jnp.pad(wg, ((0, 0), (0, 128 - wg.shape[1]))))
        oh = jnp.pad(oh_, ((0, 128 - oh_.shape[0]), (0, 0)))
    return x, wd, bg, jnp.stack(wgs), oh


@pytest.mark.parametrize("ci,co,gates", [(16, 32, 1), (32, 32, 2),
                                         (32, 64, 2)])
def test_bm_dil2_gated_block_matches_xla(ci, co, gates):
    """The fused bm dil-2 kernel (double-buffered conv+stats) +
    finalize equals the XLA composition at the model's three dil-2
    block shapes (scaled down; the ncb channel split is exercised by
    co=64 -> c8o=512 with the test-size VMEM budget)."""
    from se_unet_airseg_tpu.ops.pallas_s2d import (
        _xla_dil2_gated_composition_bm,
        dil2_conv_stats_bm,
        dil2_gated_block_bm,
    )

    x, wd, bg, wgs, oh = _make_dil2_bm(11 + ci + gates, 8, ci, co, gates)
    assert dil2_conv_stats_bm(x, wd, bg) is not None  # kernel, not fallback
    out = dil2_gated_block_bm(x, wd, bg, wgs, oh)
    ref = _xla_dil2_gated_composition_bm(x, wd, bg, wgs, oh)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


def test_bm_dil2_gated_block_grads_match():
    from se_unet_airseg_tpu.ops.pallas_s2d import (
        _xla_dil2_gated_composition_bm,
        dil2_gated_block_bm,
    )

    x, wd, bg, wgs, oh = _make_dil2_bm(42, 4, 16, 16, 1)
    gp = jax.grad(
        lambda t, w: jnp.sum(dil2_gated_block_bm(t, w, bg, wgs, oh) ** 2),
        argnums=(0, 1),
    )(x, wd)
    gx = jax.grad(
        lambda t, w: jnp.sum(
            _xla_dil2_gated_composition_bm(t, w, bg, wgs, oh) ** 2
        ),
        argnums=(0, 1),
    )(x, wd)
    for a, b in zip(gp, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-5, rtol=1e-4)


@pytest.mark.parametrize("cis,co", [((16,), 16), ((16, 16), 32)])
def test_bm_phased_conv_ext_matches_xla(cis, co):
    """The double-buffered ungathered bm phased-conv kernel equals the
    summed per-input XLA convs (plain-concat linearity), including the
    multi-input DMA slots."""
    from se_unet_airseg_tpu.ops.conv import conv3d
    from se_unet_airseg_tpu.ops.pallas_s2d import phased_conv_ext_bm

    r = np.random.default_rng(sum(cis) + co)
    w = jnp.asarray(
        r.standard_normal((3, 3, 3, sum(cis), co), np.float32) * 0.1)
    bias = jnp.asarray(r.standard_normal(co, np.float32) * 0.1)
    w_all, b_all = phased_conv_weights(
        w, bias, tuple(cis) if len(cis) > 1 else None)
    xs = [jnp.asarray(r.standard_normal((8, 8, 8, 8, 8 * c), np.float32))
          for c in cis]
    got = phased_conv_ext_bm(xs, w_all, b_all)
    assert got is not None
    ref, off = None, 0
    for t in xs:
        k = t.shape[-1]
        yt = conv3d(t, w_all[:, :, :, off : off + k, :],
                    b_all if ref is None else None, padding=1,
                    batch_minor=True)
        ref = yt if ref is None else ref + yt
        off += k
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


def test_bm_phased_finalize_matches_gathered():
    """phased_finalize_bm (gather inside the finalize read) equals the
    gather-concat + gated_norm_finalize_bm route and the XLA math."""
    from se_unet_airseg_tpu.ops.pallas_s2d import (
        _xla_gated_norm_composition_bm,
        phased_finalize_bm,
    )

    r = np.random.default_rng(7)
    n, co, b = 8, 16, 8
    y_ext = jnp.asarray(
        r.standard_normal((n + 1, n + 1, n + 1, b, 8 * co), np.float32))
    wse = jnp.asarray(r.standard_normal((co, 1), np.float32) * 0.1)
    wg, oh = se_gate_weights(wse, jnp.float32)
    wgs = jnp.stack([jnp.pad(wg, ((0, 0), (0, 128 - wg.shape[1])))])
    ohp = jnp.pad(oh, ((0, 128 - oh.shape[0]), (0, 0)))
    # gather reference
    sls = []
    s1 = s2 = 0.0
    from itertools import product
    for q, (a, bb, c) in enumerate(product(range(2), repeat=3)):
        sl = y_ext[a : a + n, bb : bb + n, c : c + n, :,
                   q * co : (q + 1) * co]
        sls.append(sl)
        s1 = s1 + jnp.sum(sl, axis=(0, 1, 2), dtype=jnp.float32)
        s2 = s2 + jnp.sum(jnp.square(sl), axis=(0, 1, 2), dtype=jnp.float32)
    y = jnp.concatenate(sls, axis=-1)
    nvox = 8.0 * n * n * n
    mean = s1 / nvox
    var = jnp.maximum(s2 / nvox - jnp.square(mean), 0.0)
    scale = 1.0 / jnp.sqrt(var + 1e-5)
    scale8 = jnp.tile(scale, (1, 8))
    shift8 = jnp.tile(mean * scale, (1, 8))
    got = phased_finalize_bm(y_ext, scale8, shift8, wgs, ohp)
    assert got is not None
    ref = _xla_gated_norm_composition_bm(y, wgs, ohp)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


def test_bm_phased_conv_kgrid_matches_xla():
    """The k-grid pconv variant (inputs as inner grid dim, persistent
    accumulator) equals the summed per-input XLA convs."""
    from se_unet_airseg_tpu.ops.conv import conv3d
    from se_unet_airseg_tpu.ops.pallas_s2d import (
        _pconv_bm_pick_kgrid,
        _pconv_kgrid_forward,
    )

    r = np.random.default_rng(13)
    n, cis, co = 8, (16, 16), 32
    w = jnp.asarray(
        r.standard_normal((3, 3, 3, sum(cis), co), np.float32) * 0.1)
    bias = jnp.asarray(r.standard_normal(co, np.float32) * 0.1)
    w_all, b_all = phased_conv_weights(w, bias, cis)
    xs = [jnp.asarray(r.standard_normal((n, n, n, 8, 8 * c), np.float32))
          for c in cis]
    kg = _pconv_bm_pick_kgrid(n + 1, n + 2, 8, [8 * c for c in cis],
                              8 * co, 4)
    assert kg is not None
    got = _pconv_kgrid_forward(xs, w_all, b_all, kg[1])
    ref, off = None, 0
    for t in xs:
        k = t.shape[-1]
        yt = conv3d(t, w_all[:, :, :, off : off + k, :],
                    b_all if ref is None else None, padding=1,
                    batch_minor=True)
        ref = yt if ref is None else ref + yt
        off += k
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


def test_tbm_gated_norm_matches_batch_major():
    """The transposed-batch-minor wrapper (s2d interface, bm kernel
    behind bitcast transposes) equals the plain s2d kernel, on both
    the eligible shape and the fallback shape (B not 8-aligned)."""
    from se_unet_airseg_tpu.ops.pallas_s2d import (
        gated_norm_block,
        gated_norm_block_tbm,
    )

    y, wgs, oh = _make_gathered_bm(21, 8, 16, 1)
    y_bmaj = jnp.transpose(y, (3, 0, 1, 2, 4))  # (8, n, n, n, 128)
    got = gated_norm_block_tbm(y_bmaj, wgs, oh)
    ref = gated_norm_block(y_bmaj, wgs, oh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-6, rtol=1e-5)
    got1 = gated_norm_block_tbm(y_bmaj[:1], wgs, oh)  # fallback path
    ref1 = gated_norm_block(y_bmaj[:1], wgs, oh)
    np.testing.assert_allclose(np.asarray(got1), np.asarray(ref1),
                               atol=2e-6, rtol=1e-5)


@pytest.mark.parametrize(
    "n,cis,co,gates",
    [
        (8, (128,), 16, 1),
        (8, (64, 64), 16, 2),
    ],
)
def test_tbm_phased_epilogue_matches_xla(n, cis, co, gates):
    """phased_gated_block_tbm (conv on the s2d emitter, bm epilogue
    behind transposes) equals the XLA composition and the plain s2d
    kernel, at B=8 (kernel) and B=2 (fallback)."""
    from se_unet_airseg_tpu.ops.pallas_s2d import (
        _xla_gated_composition,
        phased_gated_block,
        phased_gated_block_tbm,
    )

    xs, w_all, b_all, wgs, oh = _make_block_bm(25, n, cis, co, gates)
    xs_bmaj = tuple(jnp.transpose(t, (3, 0, 1, 2, 4)) for t in xs)
    got = phased_gated_block_tbm(xs_bmaj, w_all, b_all, wgs, oh)
    ref = _xla_gated_composition(xs_bmaj, w_all, b_all, wgs, oh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-6, rtol=1e-5)
    ref2 = phased_gated_block(xs_bmaj, w_all, b_all, wgs, oh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref2),
                               atol=2e-6, rtol=1e-5)
    xs_b2 = tuple(t[:2] for t in xs_bmaj)  # fallback: B=2 not 8-aligned
    got_b2 = phased_gated_block_tbm(xs_b2, w_all, b_all, wgs, oh)
    ref_b2 = _xla_gated_composition(xs_b2, w_all, b_all, wgs, oh)
    np.testing.assert_allclose(np.asarray(got_b2), np.asarray(ref_b2),
                               atol=2e-6, rtol=1e-5)


def test_tbm_phased_epilogue_grads_match():
    from se_unet_airseg_tpu.ops.pallas_s2d import (
        _xla_gated_composition,
        phased_gated_block_tbm,
    )

    xs, w_all, b_all, wgs, oh = _make_block_bm(26, 8, (64, 64), 16, 1)
    xs_bmaj = tuple(jnp.transpose(t, (3, 0, 1, 2, 4)) for t in xs)

    def loss_p(a, b, w):
        return jnp.sum(
            phased_gated_block_tbm((a, b), w, b_all, wgs, oh) ** 2)

    def loss_x(a, b, w):
        return jnp.sum(
            _xla_gated_composition((a, b), w, b_all, wgs, oh) ** 2)

    gp = jax.grad(loss_p, argnums=(0, 1, 2))(*xs_bmaj, w_all)
    gx = jax.grad(loss_x, argnums=(0, 1, 2))(*xs_bmaj, w_all)
    for a, b in zip(gp, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-5, rtol=1e-4)


def test_phase_slice_stats_ie_matches_direct():
    """Inclusion-exclusion boundary-corrected phase-slice stats equal
    the direct 8-slice reductions (up to f32 reassociation)."""
    from itertools import product

    from se_unet_airseg_tpu.ops.pallas_s2d import phase_slice_stats_ie

    r = np.random.default_rng(0)
    B, n, co = 3, 6, 5
    m = n + 1
    y = jnp.asarray(r.standard_normal((B, m, m, m, 8 * co)), jnp.float32)
    s1r = np.zeros((B, co), np.float64)
    s2r = np.zeros((B, co), np.float64)
    yn = np.asarray(y, np.float64)
    for q, (a, b, c) in enumerate(product(range(2), repeat=3)):
        sl = yn[:, a : a + n, b : b + n, c : c + n, q * co : (q + 1) * co]
        s1r += sl.sum(axis=(1, 2, 3))
        s2r += (sl**2).sum(axis=(1, 2, 3))
    s1, s2 = phase_slice_stats_ie(y, co)
    np.testing.assert_allclose(np.asarray(s1), s1r, rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(s2), s2r, rtol=1e-4, atol=1e-3)
