"""Hand-written epilogue backwards (EPI_MANBWD) vs the autodiff of the
XLA composition — the gradients must be identical up to fp
reassociation (the manual path reorders the InstanceNorm-backward sums
and recomputes statistics off the gathered fat tensor)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from se_unet_airseg_tpu.ops.pallas_s2d import (
    _gated_core_bwd,
    _manual_phased_gated_bwd,
    _xla_gated_composition,
    _xla_gated_norm_composition,
    _xla_gated_norm_composition_bm,
)
from se_unet_airseg_tpu.ops.s2d import phased_conv_weights, se_gate_weights


def _gate_params(key, co, n_gates, dtype):
    wgs, oh = [], None
    for g in range(n_gates):
        w_se = jax.random.normal(jax.random.fold_in(key, g),
                                 (co, 1), jnp.float32) * 0.2
        wg, oh = se_gate_weights(w_se.astype(dtype), dtype)
        wgs.append(jnp.pad(wg, ((0, 0), (0, 128 - wg.shape[1]))))
    return jnp.stack(wgs), jnp.pad(oh, ((0, 128 - oh.shape[0]), (0, 0)))


@pytest.mark.parametrize("n_gates", [1, 2])
@pytest.mark.parametrize("bm", [False, True])
def test_gated_norm_manual_bwd_matches_composition(n_gates, bm):
    co, n, b = 4, 6, 2
    dt = jnp.float32
    key = jax.random.key(0)
    shape = (n, n, n, b, 8 * co) if bm else (b, n, n, n, 8 * co)
    y = jax.random.normal(jax.random.fold_in(key, 1), shape, dt)
    wgs, oh = _gate_params(jax.random.fold_in(key, 2), co, n_gates, dt)
    ct = jax.random.normal(jax.random.fold_in(key, 3), shape, dt)

    comp = (_xla_gated_norm_composition_bm if bm
            else _xla_gated_norm_composition)
    _, vjp = jax.vjp(comp, y, wgs, oh)
    ref = vjp(ct)
    got = _gated_core_bwd(y, wgs, oh, ct, bm=bm, exact_doh=True)
    for g, r, name in zip(got, ref, ("dy", "dwgs", "doh")):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(r), rtol=2e-4, atol=2e-5,
            err_msg=name)


@pytest.mark.parametrize("n_splits", [1, 2])
def test_phased_gated_manual_bwd_matches_composition(n_splits):
    co, n, b, n_gates = 4, 6, 2, 2
    dt = jnp.float32
    key = jax.random.key(10)
    cis = (8, 16)[:n_splits]
    xs = tuple(
        jax.random.normal(jax.random.fold_in(key, i), (b, n, n, n, ci), dt)
        for i, ci in enumerate(cis)
    )
    w = jax.random.normal(jax.random.fold_in(key, 7),
                          (3, 3, 3, sum(c // 8 for c in cis), co),
                          jnp.float32) * 0.3
    bias = jax.random.normal(jax.random.fold_in(key, 8), (co,), jnp.float32)
    w_all, b_all = phased_conv_weights(
        w.astype(dt), bias.astype(dt),
        tuple(c // 8 for c in cis) if n_splits > 1 else None)
    wgs, oh = _gate_params(jax.random.fold_in(key, 9), co, n_gates, dt)
    ct = jax.random.normal(jax.random.fold_in(key, 11),
                           (b, n, n, n, 8 * co), dt)

    _, vjp = jax.vjp(_xla_gated_composition, xs, w_all, b_all, wgs, oh)
    ref = vjp(ct)
    got = _manual_phased_gated_bwd((xs, w_all, b_all, wgs, oh), ct,
                                   exact_doh=True)
    names = ("dxs", "dw_all", "db_all", "dwgs", "doh")
    for g, r, name in zip(got, ref, names):
        for ga, ra in zip(jax.tree.leaves(g), jax.tree.leaves(r)):
            np.testing.assert_allclose(
                np.asarray(ga), np.asarray(ra), rtol=3e-4, atol=3e-5,
                err_msg=name)


@pytest.mark.parametrize("gather", ["pallas", "xla"])
def test_phased_manual_bwd_pallas_gather(monkeypatch, gather):
    """The Pallas gather-normalize route of the manual backward
    (EPI_MANBWD_GATHER=pallas, engaged when n%8==0 and a tile fits;
    the conv replay switches to the x-padded-to-8 extent) must produce
    the same gradients as the XLA composition."""
    monkeypatch.setenv("EPI_MANBWD_GATHER", gather)
    co, n, b, n_gates = 4, 8, 2, 2
    dt = jnp.float32
    key = jax.random.key(21)
    xs = (jax.random.normal(jax.random.fold_in(key, 0),
                            (b, n, n, n, 16), dt),)
    w = jax.random.normal(jax.random.fold_in(key, 1),
                          (3, 3, 3, 2, co), jnp.float32) * 0.3
    bias = jax.random.normal(jax.random.fold_in(key, 2), (co,), jnp.float32)
    w_all, b_all = phased_conv_weights(w.astype(dt), bias.astype(dt), None)
    wgs, oh = _gate_params(jax.random.fold_in(key, 3), co, n_gates, dt)
    ct = jax.random.normal(jax.random.fold_in(key, 4),
                           (b, n, n, n, 8 * co), dt)

    _, vjp = jax.vjp(_xla_gated_composition, xs, w_all, b_all, wgs, oh)
    ref = vjp(ct)
    got = _manual_phased_gated_bwd((xs, w_all, b_all, wgs, oh), ct,
                                   exact_doh=True)
    for g, r, name in zip(got, ref, ("dxs", "dw_all", "db_all", "dwgs",
                                     "doh")):
        for ga, ra in zip(jax.tree.leaves(g), jax.tree.leaves(r)):
            np.testing.assert_allclose(
                np.asarray(ga), np.asarray(ra), rtol=3e-4, atol=3e-5,
                err_msg=name)


def test_model_grads_match_with_whole_dense_blocks(monkeypatch):
    """EPI_WHOLE_DENSE=1 routes the dense/grouped s2d SSE blocks
    through the whole-block custom_vjp (input-only residuals, conv
    replay + manual core backward) — full-model gradients under remat
    must match the composition route."""
    from se_unet_airseg_tpu.models import SEUNetConfig, init_params
    from se_unet_airseg_tpu.models.se_unet import apply_fast

    cfg = SEUNetConfig(use_pallas_epi=True, remat=True)
    params = init_params(jax.random.key(6), cfg)
    x = jax.random.normal(jax.random.key(7), (1, 16, 16, 16, 2),
                          jnp.float32)

    def loss(p):
        en, de = apply_fast(p, x, cfg=cfg)
        return jnp.sum(jnp.square(en)) + jnp.sum(jnp.square(de))

    monkeypatch.setenv("EPI_WHOLE_DENSE", "0")
    g_ref = jax.grad(loss)(params)
    monkeypatch.setenv("EPI_WHOLE_DENSE", "1")
    g_whole = jax.grad(loss)(params)
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_whole)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-5)


def test_model_grads_match_with_manual_bwd(monkeypatch):
    """apply_fast full-model gradients: EPI_MANBWD on vs off (both
    through the custom_vjp epilogue blocks on CPU)."""
    from se_unet_airseg_tpu.models import SEUNetConfig, init_params
    from se_unet_airseg_tpu.models.se_unet import apply_fast

    cfg = SEUNetConfig(use_pallas_epi=True)
    params = init_params(jax.random.key(4), cfg)
    x = jax.random.normal(jax.random.key(5), (1, 16, 16, 16, 2),
                          jnp.float32)

    def loss(p):
        en, de = apply_fast(p, x, cfg=cfg)
        return jnp.sum(jnp.square(en)) + jnp.sum(jnp.square(de))

    monkeypatch.setenv("EPI_MANBWD", "0")
    g_ref = jax.grad(loss)(params)
    monkeypatch.setenv("EPI_MANBWD", "1")
    g_man = jax.grad(loss)(params)
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_man)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-5)
