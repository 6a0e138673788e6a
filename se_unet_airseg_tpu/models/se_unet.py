"""Scale-Enhanced U-Net, TPU-native functional JAX implementation.

Re-designed from the behavior of the reference PyTorch model
(reference SE_UNet.py:9-242): a 4-level encoder–decoder over 2-channel
dual-windowed CT crops in which

  * every conv block is Conv3x3x3 -> InstanceNorm -> LeakyReLU followed
    by one (`SSEConv`) or two (`SSEConv2`) spatial squeeze-excitation
    gates (1x1x1 conv -> sigmoid -> multiply), plus a 2-channel 1x1x1
    "side" head upsampled to full resolution (deep supervision);
  * each encoder level fuses its three block outputs with a 1x1x1
    CATConv and adds a detail-injection CATConv of the (pooled) raw
    input;
  * two prediction heads consume the concatenation of all side
    outputs: `pred_en` from the 12 encoder sides (24 ch), `pred_de`
    from the 6 decoder sides (12 ch), each behind channel-dropout
    (DropLayer, threshold 0.3) and a 1x1x1 conv. Raw logits out.

Differences from the reference that are *layout/engine*, not behavior:
  * NDHWC everywhere (TPU-native); weights DHWIO.
  * Parameters are a flat pytree of dicts — pure functions, pjit-ready.
  * DropLayer uses explicit JAX PRNG keys instead of global torch RNG.
  * Activations may run in bfloat16 (norm statistics stay float32).

Channel plan (in -> out per level), identical to the reference:
  enc L1: 2->8->16->32(dil2), cat(56)->32, + inj(2->32)   sides x3 @ s=1
  enc L2: 32->32->32(dil2)->64(dil2), cat(128)->64, + inj sides x3 @ s=2
  enc L3: 64->64->64(dil2)->64(dil2), cat(192)->64, + inj sides x3 @ s=4
  bottleneck: 64->64->64->64, cat(192)->64               sides x3 @ s=8
  dec L3: cat(128)->64->64, cat(128)->64                 sides x2 @ s=4
  dec L2: cat(128)->64->32, cat(96)->32                  sides x2 @ s=2
  dec L1: cat(64)->32->16, cat(48)->16                   sides x2 @ s=1
"""

from __future__ import annotations

import dataclasses
import math
import os
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import conv3d, instance_norm, leaky_relu, max_pool3d, upsample_trilinear

Params = dict[str, Any]


@dataclasses.dataclass(frozen=True)
class SEUNetConfig:
    in_channels: int = 2
    n_classes: int = 1
    side_channels: int = 2  # out_channel2 in the reference
    drop_threshold: float = 0.3
    compute_dtype: Any = jnp.float32  # bfloat16 for the fast path
    # rematerialize each conv block in backward — trades ~30% extra
    # FLOPs for the activation memory of a 128^3 crop fitting in HBM
    remat: bool = False
    # fused Pallas phased-conv+stats kernels for the s2d blocks.
    # None currently resolves to OFF: XLA's phased conv runs at ~58%
    # MXU at the dc5 shape and the v2 kernel still trails it (120 vs
    # 50 ms — per-step DMA latency over thousands of small grid
    # steps); see ROADMAP.
    use_pallas: bool | None = None
    # fused Pallas EPILOGUE for the phased s2d blocks: the conv stays
    # on XLA's MXU-hot emitter, but phase gather + InstanceNorm +
    # LeakyReLU + SE gate(s) run as one double-buffered kernel pass
    # instead of XLA's ~5 full-tensor round trips. None resolves to
    # the PALLAS_EPI env var (default ON on TPU backends).
    use_pallas_epi: bool | None = None
    # dilation-2 s2d blocks: "grouped" runs the 8 sub-grid convs as
    # ONE feature_group_count=8 conv in the native s2d layout
    # (bitwise-equal to the polyphase path, none of its two
    # full-tensor transposes); "polyphase" keeps the transpose form.
    dil2_mode: str = "grouped"
    # batch-minor fast path: all apply_fast interior tensors are
    # (D, H, W, B, C) — the TPU conv emitter's native order — so the
    # {4,0,3,2,1} relayout copies XLA inserts around every conv in
    # batch-major layout vanish. None resolves to the FASTPATH_BM env
    # var (default OFF until the Pallas epilogues are ported).
    batch_minor: bool | None = None


# ---------------------------------------------------------------------------
# Initialization. PyTorch Conv3d default init is kaiming_uniform(a=sqrt(5)),
# i.e. U(-b, b) with b = 1/sqrt(fan_in); bias likewise U(-1/sqrt(fan_in), ...).
# We reproduce that distribution so freshly-initialized nets train the same.
# ---------------------------------------------------------------------------


def _conv_init(key, k: int, cin: int, cout: int, bias: bool) -> Params:
    fan_in = cin * k * k * k
    bound = 1.0 / math.sqrt(fan_in)
    kw, kb = jax.random.split(key)
    p: Params = {
        "w": jax.random.uniform(
            kw, (k, k, k, cin, cout), jnp.float32, -bound, bound
        )
    }
    if bias:
        p["b"] = jax.random.uniform(kb, (cout,), jnp.float32, -bound, bound)
    return p


def _sse_init(key, cin: int, cout: int, side: int, n_gates: int) -> Params:
    keys = jax.random.split(key, 2 + n_gates)
    p: Params = {
        "conv": _conv_init(keys[0], 3, cin, cout, bias=True),
        "side": _conv_init(keys[1], 1, cout, side, bias=True),
    }
    for g in range(n_gates):
        p[f"se{g}"] = _conv_init(keys[2 + g], 1, cout, 1, bias=False)
    return p


def _cat_init(key, cin: int, cout: int) -> Params:
    return {"conv": _conv_init(key, 1, cin, cout, bias=False)}


def init_params(key, cfg: SEUNetConfig = SEUNetConfig()) -> Params:
    """Build the full parameter pytree (float32 master copy)."""
    s = cfg.side_channels
    ic = cfg.in_channels
    spec: list[tuple[str, str, tuple]] = [
        # encoder level 1
        ("ec1", "sse1", (ic, 8)),
        ("ec2", "sse1", (8, 16)),
        ("ec3", "sse1", (16, 32)),
        ("ec33", "cat", (56, 32)),
        ("x33", "cat", (ic, 32)),
        # encoder level 2
        ("ec4", "sse2", (32, 32)),
        ("ec5", "sse2", (32, 32)),
        ("ec6", "sse2", (32, 64)),
        ("ec63", "cat", (128, 64)),
        ("x63", "cat", (ic, 64)),
        # encoder level 3
        ("ec7", "sse2", (64, 64)),
        ("ec8", "sse2", (64, 64)),
        ("ec9", "sse2", (64, 64)),
        ("ec93", "cat", (192, 64)),
        ("x93", "cat", (ic, 64)),
        # bottleneck
        ("ec10", "sse2", (64, 64)),
        ("ec11", "sse2", (64, 64)),
        ("ec12", "sse2", (64, 64)),
        ("ec123", "cat", (192, 64)),
        # decoder
        ("dc1", "sse2", (128, 64)),
        ("dc2", "sse2", (64, 64)),
        ("dc22", "cat", (128, 64)),
        ("dc3", "sse2", (128, 64)),
        ("dc4", "sse2", (64, 32)),
        ("dc42", "cat", (96, 32)),
        ("dc5", "sse1", (64, 32)),
        ("dc6", "sse1", (32, 16)),
        ("dc62", "cat", (48, 16)),
    ]
    keys = jax.random.split(key, len(spec) + 2)
    params: Params = {}
    for k, (name, kind, (cin, cout)) in zip(keys, spec):
        if kind == "cat":
            params[name] = _cat_init(k, cin, cout)
        else:
            params[name] = _sse_init(k, cin, cout, s, 1 if kind == "sse1" else 2)
    params["head_en"] = _conv_init(keys[-2], 1, 12 * s, cfg.n_classes, bias=True)
    params["head_de"] = _conv_init(keys[-1], 1, 6 * s, cfg.n_classes, bias=True)
    return params


def num_params(params: Params) -> int:
    return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------


def _sse_block(p: Params, x, *, dilation: int, up: int, n_gates: int,
               want_side: bool = True, bm: bool = False):
    """Conv3 -> IN -> LeakyReLU -> SE gate(s) -> (features, side@full-res).
    `bm`: batch-minor (D,H,W,B,C) tensors (fast-path levels 3/4)."""
    e = conv3d(x, p["conv"]["w"], p["conv"]["b"], padding=dilation,
               dilation=dilation, batch_minor=bm)
    e = leaky_relu(instance_norm(e, batch_minor=bm))
    for g in range(n_gates):
        gate = jax.nn.sigmoid(conv3d(e, p[f"se{g}"]["w"], batch_minor=bm))
        e = e * gate
    if not want_side:
        return e, None
    side = conv3d(e, p["side"]["w"], p["side"]["b"], batch_minor=bm)
    side = upsample_trilinear(side, up) if not bm else (
        side if up == 1 else _upsample_bm_err(up))
    return e, side


def _upsample_bm_err(up):
    raise NotImplementedError(
        "batch-minor _sse_block side upsample (fast path uses up=1)"
    )


def _cat_block(p: Params, x, bm: bool = False):
    return leaky_relu(
        instance_norm(conv3d(x, p["conv"]["w"], batch_minor=bm),
                      batch_minor=bm)
    )


def _drop_layer(key, x, threshold: float, train: bool):
    """Channel dropout: per-(batch,channel) Bernoulli mask, rescaled by
    C / (mask.sum() + 0.01) where the sum runs over the whole mask
    (reference SE_UNet.py:84-97)."""
    if not train:
        return x
    b, _, _, _, c = x.shape
    r = jax.random.uniform(key, (b, 1, 1, 1, c), jnp.float32)
    mask = (r >= threshold).astype(jnp.float32)
    scale = c / (jnp.sum(mask) + 0.01)
    return x * (mask * scale).astype(x.dtype)


def apply(
    params: Params,
    x: jnp.ndarray,
    *,
    cfg: SEUNetConfig = SEUNetConfig(),
    train: bool = False,
    rng: jax.Array | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Forward pass on NDHWC input (B, D, H, W, in_channels).

    Returns raw-logit heads `(pred_en, pred_de)` at full resolution,
    matching the reference's `(pred0, pred1)` output contract
    (reference SE_UNet.py:181-238).
    """
    dt = cfg.compute_dtype
    p = jax.tree.map(lambda a: a.astype(dt) if a.dtype == jnp.float32 else a, params)
    x = x.astype(dt)
    cat = lambda *ts: jnp.concatenate(ts, axis=-1)

    if cfg.remat:
        def _sse_block(pb, xb, *, dilation, up, n_gates, _f=globals()["_sse_block"]):
            return jax.checkpoint(
                lambda p_, x_: _f(p_, x_, dilation=dilation, up=up, n_gates=n_gates)
            )(pb, xb)

        _cat_block = jax.checkpoint(globals()["_cat_block"])
    else:
        _sse_block = globals()["_sse_block"]
        _cat_block = globals()["_cat_block"]

    # encoder level 1 (full res)
    e0, s0 = _sse_block(p["ec1"], x, dilation=1, up=1, n_gates=1)
    e1, s1 = _sse_block(p["ec2"], e0, dilation=1, up=1, n_gates=1)
    e1_1, s2 = _sse_block(p["ec3"], e1, dilation=2, up=1, n_gates=1)
    e1 = _cat_block(p["ec33"], cat(e1_1, e0, e1))
    e1 = e1 + _cat_block(p["x33"], x)
    e2 = max_pool3d(e1)
    x = max_pool3d(x)

    # encoder level 2 (1/2)
    e2, s3 = _sse_block(p["ec4"], e2, dilation=1, up=2, n_gates=2)
    e3, s4 = _sse_block(p["ec5"], e2, dilation=2, up=2, n_gates=2)
    e3_1, s5 = _sse_block(p["ec6"], e3, dilation=2, up=2, n_gates=2)
    e3 = _cat_block(p["ec63"], cat(e3_1, e2, e3))
    e3 = e3 + _cat_block(p["x63"], x)
    e4 = max_pool3d(e3)
    x = max_pool3d(x)

    # encoder level 3 (1/4)
    e4, s6 = _sse_block(p["ec7"], e4, dilation=1, up=4, n_gates=2)
    e5, s7 = _sse_block(p["ec8"], e4, dilation=2, up=4, n_gates=2)
    e5_1, s8 = _sse_block(p["ec9"], e5, dilation=2, up=4, n_gates=2)
    e5 = _cat_block(p["ec93"], cat(e5_1, e4, e5))
    e5 = e5 + _cat_block(p["x93"], x)
    e6 = max_pool3d(e5)

    # bottleneck (1/8)
    e6, s9 = _sse_block(p["ec10"], e6, dilation=1, up=8, n_gates=2)
    e7, s10 = _sse_block(p["ec11"], e6, dilation=1, up=8, n_gates=2)
    e7_1, s11 = _sse_block(p["ec12"], e7, dilation=1, up=8, n_gates=2)
    e7 = _cat_block(p["ec123"], cat(e7_1, e6, e7))

    # decoder level 3 (1/4)
    e8 = upsample_trilinear(e7, 2)
    d0, s12 = _sse_block(p["dc1"], cat(e8, e5), dilation=1, up=4, n_gates=2)
    d0_1, s13 = _sse_block(p["dc2"], d0, dilation=1, up=4, n_gates=2)
    d0 = _cat_block(p["dc22"], cat(d0_1, d0))

    # decoder level 2 (1/2)
    d1 = upsample_trilinear(d0, 2)
    d1, s14 = _sse_block(p["dc3"], cat(d1, e3), dilation=1, up=2, n_gates=2)
    d1_1, s15 = _sse_block(p["dc4"], d1, dilation=1, up=2, n_gates=2)
    d1 = _cat_block(p["dc42"], cat(d1_1, d1))

    # decoder level 1 (full res)
    d2 = upsample_trilinear(d1, 2)
    d2, s16 = _sse_block(p["dc5"], cat(d2, e1), dilation=1, up=1, n_gates=1)
    d2_1, s17 = _sse_block(p["dc6"], d2, dilation=1, up=1, n_gates=1)
    d2 = _cat_block(p["dc62"], cat(d2_1, d2))
    del d2  # decoder trunk feeds only side outputs beyond this point

    sides_en = cat(s0, s1, s2, s3, s4, s5, s6, s7, s8, s9, s10, s11)
    sides_de = cat(s12, s13, s14, s15, s16, s17)

    if train:
        if rng is None:
            raise ValueError("train=True requires an rng key for DropLayer")
        k_en, k_de = jax.random.split(rng)
    else:
        k_en = k_de = None
    sides_en = _drop_layer(k_en, sides_en, cfg.drop_threshold, train)
    sides_de = _drop_layer(k_de, sides_de, cfg.drop_threshold, train)

    pred_en = conv3d(sides_en, p["head_en"]["w"], p["head_en"]["b"])
    pred_de = conv3d(sides_de, p["head_de"]["w"], p["head_de"]["b"])
    return pred_en, pred_de


# ---------------------------------------------------------------------------
# Fast TPU path: space-to-depth at the full-resolution level.
#
# Numerically equivalent to `apply` (same params, same math, fp
# reassociation only — locked by tests/test_fast_path.py), but the
# 128^3 tensors with 2..56 channels never materialize: level 1 runs in
# (64^3, 16..448)-channel s2d layout where the MXU/VPU lanes are
# actually filled. Dilated convs use exact polyphase decomposition;
# side outputs from deeper levels upsample straight into s2d layout.
# ---------------------------------------------------------------------------


def _se_chain(p: Params, e, n_gates: int, pre):
    """Apply the block's SE gate(s), precomputed weights when given."""
    from ..ops.s2d import se_gate_s2d, se_gate_s2d_pre

    for g in range(n_gates):
        if pre is not None:
            e = se_gate_s2d_pre(e, pre[f"se{g}_wg"], pre["se_onehot"])
        else:
            e = se_gate_s2d(e, p[f"se{g}"]["w"][0, 0, 0])
    return e


def prepare_fast_params(params: Params, cfg: SEUNetConfig,
                        n: int | None = None) -> Params:
    """Precompute every weight transform `apply_fast` needs — s2d
    kernel lifts, phase-stacked kernels (with concat interleaves
    folded), block-diagonal pointwise/SE weights, and (given `n`, the
    s2d grid size = cube/2) the interpolation matrices.

    Why this exists: computed inside the traced program these
    transforms (a) re-run every forward and (b) embed their numpy lift
    tensors as HLO constants, which the relayed TPU backend streams
    from host memory on EVERY execution (~6.5 ms tunnel latency each —
    a profiled 100+ ms/iter of the round-2 forward). The runner calls
    this ONCE and passes the result as device-resident arguments; the
    training path calls it in-trace (differentiable — gradients flow
    through the lifts, so the step is unchanged numerically).
    """
    from ..ops.resize import _interp_matrix
    from ..ops.s2d import (
        _interp_pair,
        bias_to_s2d,
        conv3_weight_to_s2d,
        grouped_pointwise_multi_weight,
        phased_conv_weights,
        se_gate_weights,
    )

    dt = cfg.compute_dtype
    p = jax.tree.map(
        lambda a: a.astype(dt) if a.dtype == jnp.float32 else a, params
    )
    fp: Params = {}

    def se_entries(name: str, n_gates: int) -> Params:
        e: Params = {}
        onehot = None
        wg_pads = []
        for g in range(n_gates):
            wg, onehot = se_gate_weights(p[name][f"se{g}"]["w"][0, 0, 0], dt)
            e[f"se{g}_wg"] = wg
            wg_pads.append(jnp.pad(wg, ((0, 0), (0, 128 - wg.shape[1]))))
        e["se_onehot"] = onehot
        # zero-padded gate weights for the fused Pallas epilogues: the
        # (8Co, 8) kron gate padded to 128 lanes (sub-128-lane matmul
        # outputs fail Mosaic layout inference), and the (8, 8Co)
        # one-hot broadcast padded to 128 rows (zero rows drop the
        # sigmoid(0)=0.5 of the padding lanes)
        e["epi_wgs"] = jnp.stack(wg_pads)
        e["epi_oh"] = jnp.pad(
            onehot, ((0, 128 - onehot.shape[0]), (0, 0))
        )
        return e

    # full-res lifted blocks (dense 3^3 block kernel)
    for name in ("ec1", "ec2"):
        fp[name] = {
            "w": conv3_weight_to_s2d(p[name]["conv"]["w"]),
            "b": bias_to_s2d(p[name]["conv"]["b"]),
            **se_entries(name, 1),
        }
    # dilation-2 blocks: grouped-conv weights (weights tiled across the
    # 8 sub-position groups) + pre-expanded SE gates; narrow blocks
    # (ec3) get the block-diagonal dense kernel instead (see
    # _sse_block_s2d_dil2)
    from ..ops.s2d import dil2_dense_weight

    # per-shape partial-dense group counts (loop-slope A/Bs, see
    # ops.s2d.dil2_group_weight): ng groups of 8/ng phases, block-diag
    # dense within each group — the measured sweet spot per block
    from ..ops.s2d import dil2_group_weight

    _dil2_ng = {"ec3": 2, "ec5": 2, "ec6": 4}
    for name, gates in (("ec3", 1), ("ec5", 2), ("ec6", 2)):
        w = p[name]["conv"]["w"]
        fp[name] = {
            # block-diagonal dense kernel: the train path and the
            # fused bm Pallas kernel use it; eval uses the partial-
            # dense grouped kernel below
            "wdense": dil2_dense_weight(w, dt),
            # ng is recovered from the static kernel shape at the use
            # site (ints in the pytree would become traced leaves
            # under a jitted prepare_fast_params)
            "wgroup": dil2_group_weight(w, _dil2_ng[name], dt),
            "bg": jnp.tile(p[name]["conv"]["b"], 8),
            # raw dense kernel + per-gate (Co,1) SE kernels for the
            # polyphase-batch route (mode "pp")
            "w_pp": w,
            "b_pp": p[name]["conv"]["b"],
            **{f"se{g}_w": p[name][f"se{g}"]["w"][0, 0, 0]
               for g in range(gates)},
            **se_entries(name, gates),
        }
    # phased blocks; in_splits = original channel counts of the plain
    # concat feeding them (channel plan in the module docstring)
    for name, gates, splits in (
        ("ec4", 2, None),
        ("dc3", 2, (64, 64)),   # cat(up(d0), e3s)
        ("dc4", 2, None),
        ("dc5", 1, (32, 32)),   # cat(up(d1), e1)
        ("dc6", 1, None),
    ):
        w_all, b_all = phased_conv_weights(
            p[name]["conv"]["w"], p[name]["conv"]["b"], splits
        )
        fp[name] = {"w_all": w_all, "b_all": b_all, **se_entries(name, gates)}
    # s2d CATConv blocks: dense block-diagonal pointwise weights
    for name, counts in (
        ("ec33", (32, 8, 16)),  # cat(e1_1, e0, e1)
        ("x33", (2,)),
        ("ec63", (64, 32, 32)),  # cat(e3_1s, e2s, e3s)
        ("x63", (2,)),
        ("dc42", (32, 64)),     # cat(d1_1s, d1s)
    ):
        fp[name] = {
            "wd": grouped_pointwise_multi_weight(
                p[name]["conv"]["w"][0, 0, 0], counts, dt
            )
        }
    if n is not None:
        interp = {
            (n // 2, n): jnp.asarray(_interp_pair(n // 2, n)),
            (n, 2 * n): jnp.asarray(_interp_pair(n, 2 * n)),
            (n // 2, 2 * n): jnp.asarray(_interp_pair(n // 2, 2 * n)),
            (n // 4, 2 * n): jnp.asarray(_interp_pair(n // 4, 2 * n)),
        }
        fp["interp"] = interp
        fp["interp_tri"] = jnp.asarray(_interp_matrix(n // 4, n // 2))
    return fp


def _sse_block_s2d(p: Params, x, want_side: bool = True, n_gates: int = 1,
                   pre=None, use_epi: bool = False, bm: bool = False):
    """SSEConv (one SE gate) on an s2d tensor via the block-lifted
    dense 3^3 conv — the XLA path for the narrow full-res encoder
    blocks (ec1/ec2). The lift costs 8x the original FLOPs but (at
    Ci<=16) those are negligible, and unlike the phased formulation it
    needs NO pad/8-slice/concat memory traffic on the full-res
    tensors (routing ec1/ec2 through the phased path measurably
    regressed the engine bench 13.8 -> 10.7 tiles/s)."""
    from ..ops.s2d import (
        bias_to_s2d,
        conv3_weight_to_s2d,
        grouped_pointwise,
        instance_norm_s2d,
    )

    if pre is not None:
        wb, bb = pre["w"], pre["b"]
    else:
        wb = conv3_weight_to_s2d(p["conv"]["w"])
        bb = bias_to_s2d(p["conv"]["b"])
    if use_epi and pre is not None and "epi_wgs" in pre and not bm:
        from ..ops.pallas_s2d import dense_gated_block, whole_dense_enabled

        if whole_dense_enabled():
            # whole-block custom_vjp (input-only residuals): skips the
            # checkpoint's epilogue replay in backward
            e = dense_gated_block(x, wb, bb, pre["epi_wgs"],
                                  pre["epi_oh"])
            if not want_side:
                return e, None
            side = grouped_pointwise(e, p["side"]["w"][0, 0, 0],
                                     p["side"]["b"])
            return e, side
    e = conv3d(x, wb, bb, padding=1, batch_minor=bm)
    if use_epi and pre is not None and "epi_wgs" in pre:
        from ..ops.pallas_s2d import pick_gated_norm_block

        epi_fn = pick_gated_norm_block(bm)
        e = epi_fn(e, pre["epi_wgs"], pre["epi_oh"])
    else:
        from ..ops.s2d import instance_norm_s2d_bm

        norm = instance_norm_s2d_bm if bm else instance_norm_s2d
        e = leaky_relu(norm(e))
        e = _se_chain(p, e, n_gates, pre)
    if not want_side:
        return e, None
    side = grouped_pointwise(e, p["side"]["w"][0, 0, 0], p["side"]["b"])
    return e, side


def _sse_block_s2d_dil2(p: Params, x, want_side: bool = True,
                        n_gates: int = 1, use_pallas: bool = False,
                        pre=None, mode: str = "grouped",
                        use_epi: bool = False, bm: bool = False):
    """SSEConv with dilation 2 on an s2d tensor: a dil-2 conv on the
    full grid is exactly 8 independent dil-1 convs on the sub-grids.

    mode "grouped" (default): ONE feature_group_count=8 conv in the
    native s2d layout (group g = sub-position g; weights tiled across
    groups) — bitwise-equal to the polyphase path with none of its two
    full-tensor 6-D transposes. mode "polyphase": sub-positions become
    batch entries (to_polyphase/from_polyphase); statistics reduce in
    polyphase layout before the transpose back (reducing after it
    forced f32 relayout copies, ~35 ms/iter at the ec3 shape).
    Pallas path: per-position im2col conv in one fused kernel
    (ops/pallas_s2d.dil2_conv_stats)."""
    from ..ops.s2d import (
        dil2_dense_weight,
        from_polyphase,
        grouped_pointwise,
        instance_norm_from_stats,
        instance_norm_s2d,
        to_polyphase,
    )

    if mode == "pp" and not bm:
        # polyphase-batch route: phases ride the batch axis so the
        # conv is dense (K=27*Ci on the MXU, no 8x phase
        # block-diagonal / group lane padding) — see
        # ops.s2d.dil2_polyphase_block
        from ..ops.s2d import dil2_polyphase_block

        if pre is not None and "w_pp" in pre:
            w_pp, b_pp = pre["w_pp"], pre["b_pp"]
            wses = [pre[f"se{g}_w"] for g in range(n_gates)]
        else:
            w_pp = p["conv"]["w"].astype(x.dtype)
            b_pp = p["conv"]["b"].astype(x.dtype)
            wses = [p[f"se{g}"]["w"][0, 0, 0].astype(x.dtype)
                    for g in range(n_gates)]
        e = dil2_polyphase_block(x, w_pp, b_pp, wses)
        if not want_side:
            return e, None
        side = grouped_pointwise(e, p["side"]["w"][0, 0, 0], p["side"]["b"])
        return e, side
    if use_pallas and not bm:
        from ..ops.pallas_s2d import dil2_conv_stats

        y, s1, s2 = dil2_conv_stats(x, p["conv"]["w"], p["conv"]["b"])
        e = leaky_relu(instance_norm_from_stats(y, s1, s2))
    elif mode == "grouped" or bm:
        if (use_epi and pre is not None and "wdense" in pre
                and "epi_wgs" in pre
                and os.environ.get("PALLAS_DIL2BM", "0") == "1"):
            # fused Pallas path: block-diag dense conv + stats in one
            # double-buffered kernel, streamed finalize epilogue. bm
            # callers hit the kernel directly; s2d callers route
            # through it behind transpose bitcasts (tbm wrapper).
            from ..ops.pallas_s2d import (
                dil2_gated_block_bm,
                dil2_gated_block_tbm,
                tbm_enabled,
            )

            e = None
            if bm:
                e = dil2_gated_block_bm(x, pre["wdense"], pre["bg"],
                                        pre["epi_wgs"], pre["epi_oh"])
            elif tbm_enabled():
                e = dil2_gated_block_tbm(x, pre["wdense"], pre["bg"],
                                         pre["epi_wgs"], pre["epi_oh"])
            if e is not None:
                if not want_side:
                    return e, None
                return e, grouped_pointwise(e, p["side"]["w"][0, 0, 0],
                                            p["side"]["b"])
        w = p["conv"]["w"]
        # Formulation (loop-slope device A/Bs, ROADMAP r4a): the TPU
        # grouped-conv emitter pads each 16-64-lane group to 128, so
        # the block-diagonal DENSE conv beats it despite 8x the
        # (structurally zero) FLOPs — it runs AT the lifted-work MXU
        # speed-of-light (ec3: 19.2 vs 52.0 ms, ec5: 4.9 vs 6.6).
        # ec6's grouped conv alone is 3 ms faster (6.5 vs 9.6) but
        # drags ~8 ms of relayout copies around it (fusion.50 +
        # conv-input copy, round-4 profile), and the grouped autodiff
        # dgrad/wgrad in training inherit the pathological emitter
        # (11.6 ms each at B=2) — dense everywhere, always.
        if (not bm and use_epi and pre is not None and "epi_wgs" in pre
                and ("wgroup" in pre or "wdense" in pre)):
            from ..ops.pallas_s2d import (
                dense_gated_block,
                whole_dense_enabled,
            )

            if whole_dense_enabled():
                # whole-block custom_vjp route (see _sse_block_s2d)
                if "wgroup" in pre:
                    wg_p, bg = pre["wgroup"], pre["bg"]
                    ng = (8 * w.shape[3]) // wg_p.shape[3]
                else:
                    wg_p, bg, ng = pre["wdense"], pre["bg"], 1
                e = dense_gated_block(x, wg_p, bg, pre["epi_wgs"],
                                      pre["epi_oh"], ng)
                if not want_side:
                    return e, None
                return e, grouped_pointwise(e, p["side"]["w"][0, 0, 0],
                                            p["side"]["b"])
        if not bm and pre is not None and "wgroup" in pre:
            # partial-dense grouped kernel — (8/ng)x lift instead of
            # 8x (ops.s2d.dil2_group_weight A/Bs: conv ec3 -18%,
            # ec5 -51%, ec6 -60%; fwd+bwd grad probes win too:
            # 56.9->45.1 / 14.1->7.5 / 28.9->11.4 ms — the ng=2/4
            # group emitters keep >=64-lane groups, unlike the
            # pathological groups=8 one). Train uses it through the
            # in-trace differentiable weight lift.
            wg_p, bg = pre["wgroup"], pre["bg"]
            ng = (8 * w.shape[3]) // wg_p.shape[3]
            y = conv3d(x, wg_p, bg, padding=1, groups=ng)
        else:
            if pre is not None and "wdense" in pre:
                wd, bg = pre["wdense"], pre["bg"]
            else:
                wd = dil2_dense_weight(w, x.dtype)
                bg = jnp.tile(p["conv"]["b"], 8)
            y = conv3d(x, wd, bg, padding=1, batch_minor=bm)
        if use_epi and pre is not None and "epi_wgs" in pre:
            from ..ops.pallas_s2d import pick_gated_norm_block

            epi_fn = pick_gated_norm_block(bm)
            e = epi_fn(y, pre["epi_wgs"], pre["epi_oh"])
            if not want_side:
                return e, None
            from ..ops.s2d import grouped_pointwise as _gp

            return e, _gp(e, p["side"]["w"][0, 0, 0], p["side"]["b"])
        if bm:
            from ..ops.s2d import instance_norm_s2d_bm

            e = leaky_relu(instance_norm_s2d_bm(y))
        else:
            e = leaky_relu(instance_norm_s2d(y))
    else:
        b = x.shape[0]
        xp = to_polyphase(x)
        y = conv3d(xp, p["conv"]["w"], p["conv"]["b"], padding=1)
        co = y.shape[-1]
        # per-(polyphase-batch, channel) sums regroup to the p-major
        # (b, 8*Co) layout instance_norm_from_stats expects
        s1 = jnp.sum(y, axis=(1, 2, 3), dtype=jnp.float32).reshape(b, 8 * co)
        s2 = jnp.sum(
            jnp.square(y.astype(jnp.float32)), axis=(1, 2, 3)
        ).reshape(b, 8 * co)
        e = from_polyphase(y)
        e = leaky_relu(instance_norm_from_stats(e, s1, s2))
    e = _se_chain(p, e, n_gates, pre)
    if not want_side:
        return e, None
    side = grouped_pointwise(e, p["side"]["w"][0, 0, 0], p["side"]["b"])
    return e, side


def _cat_block_s2d(p: Params, x, pre=None, use_epi: bool = False,
                   bm: bool = False):
    """CATConv on one s2d tensor or a LIST of them: a list is consumed
    as a plain channel concat with the interleave permutation folded
    into the block-diagonal pointwise weight (zero data movement for
    the cat itself)."""
    from ..ops.s2d import (
        grouped_pointwise_multi,
        grouped_pointwise_multi_pre,
        instance_norm_s2d,
        instance_norm_s2d_bm,
    )

    xs = list(x) if isinstance(x, (list, tuple)) else [x]
    if pre is not None:
        y = grouped_pointwise_multi_pre(xs, pre["wd"])
    else:
        y = grouped_pointwise_multi(xs, p["conv"]["w"][0, 0, 0])
    if use_epi:
        from ..ops.pallas_s2d import pick_gated_norm_block

        return pick_gated_norm_block(bm)(y, None, None)
    norm = instance_norm_s2d_bm if bm else instance_norm_s2d
    return leaky_relu(norm(y))


def _sse_block_s2d_phased(p: Params, x, want_side: bool = True,
                          n_gates: int = 1, use_pallas: bool = False,
                          pre=None, use_epi: bool = False,
                          bm: bool = False):
    """SSEConv (one SE gate) on an s2d tensor via the per-output-phase
    conv decomposition — used for all full-res and 1/2-res blocks. A
    list input is a plain concat; the interleave goes into the lifted
    kernel rows. With `use_pallas` the conv (pad + 2^3 block conv +
    phase gather) and the InstanceNorm statistics run as one fused TPU
    kernel (ops/pallas_s2d.py)."""
    from ..ops.s2d import (
        conv3_s2d_phased_fused,
        conv3_s2d_phased_fused_bm,
        grouped_pointwise,
        instance_norm_from_stats,
        phased_conv_weights,
    )

    xs = list(x) if isinstance(x, (list, tuple)) else [x]
    splits = tuple(t.shape[-1] // 8 for t in xs) if len(xs) > 1 else None
    total_c = sum(t.shape[-1] for t in xs)
    # Mosaic rejects the kernel's sub-lane-width vectors ("unsupported
    # shape cast") below the 128-lane tile — keep narrow blocks
    # (ec1/ec2) on the XLA composition
    use_pallas = (
        use_pallas
        and not bm
        and total_c >= 128
        and 8 * p["conv"]["w"].shape[4] >= 128
    )
    if pre is not None:
        w_all, b_all = pre["w_all"], pre["b_all"]
    else:
        w_all, b_all = phased_conv_weights(
            p["conv"]["w"], p["conv"]["b"], splits
        )
    if bm:
        if use_epi and pre is not None and "epi_wgs" in pre:
            from ..ops.pallas_s2d import phased_gated_block_bm

            e = phased_gated_block_bm(
                tuple(xs), w_all, b_all, pre["epi_wgs"], pre["epi_oh"]
            )
        else:
            e = conv3_s2d_phased_fused_bm(xs, w_all, b_all)
            e = _se_chain(p, e, n_gates, pre)
    elif use_epi and pre is not None and "epi_wgs" in pre:
        from ..ops.pallas_s2d import pick_phased_gated_block

        # conv on XLA, gather+IN+LReLU+SE as one fused Pallas pass
        e = pick_phased_gated_block()(
            tuple(xs), w_all, b_all, pre["epi_wgs"], pre["epi_oh"]
        )
    elif use_pallas:
        from ..ops.pallas_s2d import phased_conv_stats

        xc = xs[0] if len(xs) == 1 else jnp.concatenate(xs, axis=-1)
        y, s1, s2 = phased_conv_stats(
            xc, w_all.reshape(8, *w_all.shape[3:]),
            b_all.astype(jnp.float32),
        )
        e = leaky_relu(instance_norm_from_stats(y, s1, s2))
        e = _se_chain(p, e, n_gates, pre)
    else:
        # list input: the concat folds into per-input kernel row slices
        e = conv3_s2d_phased_fused(xs, w_all, b_all)
        e = _se_chain(p, e, n_gates, pre)
    if not want_side:
        return e, None
    side = grouped_pointwise(e, p["side"]["w"][0, 0, 0], p["side"]["b"])
    return e, side


def _s2d_cat(*tensors):
    """Channel-concat of s2d tensors per sub-position (matches the
    reference's full-res torch.cat order). Layout-agnostic: only the
    trailing channel axis is touched."""
    parts = [
        t.reshape(*t.shape[:-1], 8, t.shape[-1] // 8) for t in tensors
    ]
    y = jnp.concatenate(parts, axis=-1)
    return y.reshape(*y.shape[:-2], -1)


def _composed_head(metas, head_p, key, threshold: float, train: bool,
                   interp=None, bm: bool = False, s2d_out: bool = False):
    """Deep-supervision head WITHOUT materializing side outputs.

    The reference head is conv1x1(DropLayer(cat(upsample(side_i)))):
    every stage is linear, and align_corners interpolation rows sum to
    1, so the whole thing folds into
        sum_i upsample(feat_i @ (w_side_i @ (m_i * W_head_i))) + bias
    with the DropLayer mask m entering as a per-batch reweighting of
    the composed projection. Exactly equal to the reference head (fp
    reassociation only) while skipping 2-channel side tensors, their
    upsamples and the 24-channel concat.

    `metas`: ordered (feat, block_params, kind, scale); kind 's2d' has
    feat (B,n,n,n,8Ci), kind 'std' has feat (B,m,m,m,Ci) needing
    upsample by `scale` (grouped per scale before upsampling).
    Returns (B, 2n, 2n, 2n, 1) logits.
    """
    from ..ops.s2d import (
        depth_to_space,
        depth_to_space_bm,
        depth_to_space_exit_bm,
        upsample_to_s2d,
        upsample_to_s2d_bm,
    )

    d2s = depth_to_space_bm if bm else depth_to_space
    up_s2d = upsample_to_s2d_bm if bm else upsample_to_s2d
    c_total = head_p["w"].shape[3]
    hw = head_p["w"][0, 0, 0, :, 0].astype(jnp.float32)  # (C,)
    batch = metas[0][0].shape[3 if bm else 0]
    if train:
        r = jax.random.uniform(key, (batch, 1, 1, 1, c_total), jnp.float32)
        mask = (r >= threshold).astype(jnp.float32)
        scale = c_total / (jnp.sum(mask) + 0.01)
        hw_eff = (mask * scale)[:, 0, 0, 0, :] * hw[None, :]  # (B, C)
    else:
        # eval: mask is identity; weights stay batch-independent so
        # XLA can hoist the tiny side@head compositions
        hw_eff = hw[None, :]  # (1, C) broadcastable

    total = None  # (B, n, n, n, 8) f32
    per_scale: dict[int, jnp.ndarray] = {}
    bias = jnp.zeros((batch,), jnp.float32) + head_p["b"].astype(jnp.float32)[0]
    ch = 0
    for feat, bp, kind, sc in metas:
        w_side = bp["side"]["w"][0, 0, 0].astype(jnp.float32)  # (Ci, 2)
        b_side = bp["side"]["b"].astype(jnp.float32)  # (2,)
        whe = hw_eff[:, ch : ch + 2]  # (B or 1, 2)
        ch += 2
        bias = bias + jnp.einsum("e,be->b", b_side, whe)
        eye8 = jnp.eye(8, dtype=jnp.float32)
        if not train:
            w1 = w_side @ whe[0]  # (Ci,) f32
            if kind in ("s2d", "s2d_up"):
                # per-position projection as ONE kron matmul — a
                # (…, 8, Ci) lane-splitting reshape forces a relayout
                # copy of the full-res feature tensors
                c8 = feat.shape[-1]
                wk = jnp.einsum("pq,c->pcq", eye8, w1).reshape(c8, 8)
                contrib = jnp.einsum(
                    "...k,kp->...p", feat, wk.astype(feat.dtype),
                    precision=jax.lax.Precision.HIGHEST,
                ).astype(jnp.float32)
                if kind == "s2d":
                    total = contrib if total is None else total + contrib
                else:
                    # s2d at a coarser grid: unfold to that grid's full
                    # resolution, then the per-scale upsample handles it
                    c6 = d2s(contrib)
                    per_scale[sc] = c6 if sc not in per_scale else per_scale[sc] + c6
            else:
                contrib = jnp.einsum(
                    "dhwbc,c->dhwb" if bm else "bdhwc,c->bdhw",
                    feat, w1.astype(feat.dtype)
                )[..., None].astype(jnp.float32)
                per_scale[sc] = contrib if sc not in per_scale else per_scale[sc] + contrib
            continue
        w_eff = jnp.einsum("ce,be->bc", w_side, whe)  # (B, Ci) f32
        if kind in ("s2d", "s2d_up"):
            c8 = feat.shape[-1]
            b_ = feat.shape[3 if bm else 0]
            wk = jnp.einsum("pq,bc->bpcq", eye8, w_eff).reshape(b_, c8, 8)
            contrib = jnp.einsum(
                "dhwbk,bkp->dhwbp" if bm else "bdhwk,bkp->bdhwp",
                feat, wk.astype(feat.dtype),
                precision=jax.lax.Precision.HIGHEST,
            ).astype(jnp.float32)
            if kind == "s2d":
                total = contrib if total is None else total + contrib
            else:
                c6 = d2s(contrib)
                per_scale[sc] = c6 if sc not in per_scale else per_scale[sc] + c6
            continue
        else:
            contrib = jnp.einsum(
                "dhwbc,bc->dhwb" if bm else "bdhwc,bc->bdhw",
                feat, w_eff.astype(feat.dtype)
            )[..., None].astype(jnp.float32)
            per_scale[sc] = contrib if sc not in per_scale else per_scale[sc] + contrib
    for sc, acc in per_scale.items():
        m = acc.shape[0 if bm else 1]
        pair = interp.get((m, m * sc)) if interp else None
        up = up_s2d(acc.astype(jnp.float32), sc, pair=pair)
        total = up if total is None else total + up
    if s2d_out:
        # caller keeps the head in s2d layout (sliding-window engine:
        # the per-batch full-res depth_to_space relayout moves to one
        # per-volume unfold) — bias broadcasts over the 8 cell lanes
        bshape = (1, 1, 1, -1, 1) if bm else (-1, 1, 1, 1, 1)
        return total + bias.reshape(bshape)
    # total is (B,n,n,n,8) == (..., 8*1): d2s yields (B,2n,2n,2n,1)
    pred = depth_to_space_exit_bm(total) if bm else depth_to_space(total)
    return pred + bias.reshape(-1, 1, 1, 1, 1)


def _drop_layer_s2d(key, x_s2d, threshold: float, train: bool,
                    bm: bool = False):
    """DropLayer on an s2d tensor; identical realization to
    `_drop_layer` on the depth_to_space image for the same key
    (the mask is always DRAWN in the batch-major shape so both
    layouts see the same channels dropped)."""
    if not train:
        return x_s2d
    if bm:
        d, h, w, b, c8 = x_s2d.shape
    else:
        b, d, h, w, c8 = x_s2d.shape
    c = c8 // 8
    r = jax.random.uniform(key, (b, 1, 1, 1, c), jnp.float32)
    mask = (r >= threshold).astype(jnp.float32)
    scale = c / (jnp.sum(mask) + 0.01)
    if bm:
        m = (mask * scale).reshape(b, 1, c)
        y = x_s2d.reshape(d, h, w, b, 8, c) * m.astype(x_s2d.dtype)
        return y.reshape(d, h, w, b, c8)
    m = (mask * scale).reshape(b, 1, 1, 1, 1, c)
    y = x_s2d.reshape(b, d, h, w, 8, c) * m.astype(x_s2d.dtype)
    return y.reshape(b, d, h, w, c8)


def apply_fast(
    params: Params,
    x: jnp.ndarray,
    *,
    cfg: SEUNetConfig = SEUNetConfig(),
    train: bool = False,
    rng: jax.Array | None = None,
    fast_params: Params | None = None,
    x_is_s2d: bool = False,
    heads_s2d: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """TPU-optimized forward; same contract as `apply`.

    Requires D, H, W divisible by 8 (as does `apply`).

    `x_is_s2d`: the input is already the s2d entry tensor
    (B, D/2, H/2, W/2, 8*C) with phase-major lanes — the sliding-window
    engine gathers tiles from an s2d-resident volume, skipping the
    per-batch entry relayout. `heads_s2d`: return both heads in s2d
    layout (B, D/2, H/2, W/2, 8*n_classes) instead of full-res voxel
    layout (the engine accumulates overlaps in s2d and unfolds once
    per volume). Both are engine knobs; neither changes values.

    `fast_params`: the prepare_fast_params(params, cfg) pytree. Pass it
    (precomputed once, device-resident) on inference hot paths; when
    None it is computed in-trace from `params` (differentiable — the
    training path relies on this).
    """
    from ..ops.s2d import (
        depth_to_space,
        depth_to_space_bm,
        max_pool_s2d,
        s2d_entry_bm,
        space_to_depth,
        space_to_depth_bm,
        upsample_to_s2d,
        upsample_to_s2d_bm,
    )

    dt = cfg.compute_dtype
    p = jax.tree.map(lambda a: a.astype(dt) if a.dtype == jnp.float32 else a, params)
    x = x.astype(dt)
    fp = fast_params if fast_params is not None else prepare_fast_params(params, cfg)
    interp = fp.get("interp", {})
    cat = lambda *ts: jnp.concatenate(ts, axis=-1)
    # auto currently resolves to off — see SEUNetConfig.use_pallas
    upl = bool(cfg.use_pallas)
    # the dil-2 kernel trips a Mosaic concat limitation ("offset
    # mismatch on non-concat dimension") — opt-in separately until the
    # im2col build is restructured
    upl_dil2 = upl and os.environ.get("PALLAS_DIL2", "0") == "1"
    # fused Pallas epilogue for the phased blocks (conv stays on XLA)
    if cfg.use_pallas_epi is None:
        epi = (jax.default_backend() in ("tpu", "axon")
               and os.environ.get("PALLAS_EPI", "1") == "1")
    else:
        epi = bool(cfg.use_pallas_epi)
    # batch-minor interior layout (see SEUNetConfig.batch_minor)
    if cfg.batch_minor is None:
        bm = os.environ.get("FASTPATH_BM", "0") == "1"
    else:
        bm = bool(cfg.batch_minor)
    # per-block dil-2 formulation: DIL2_MODE overrides cfg.dil2_mode
    # globally, DIL2_MODE_EC{3,5,6} per block ("grouped" | "polyphase"
    # | "pp"; pp = polyphase-batch, not available under bm)
    _d2m = os.environ.get("DIL2_MODE", cfg.dil2_mode)
    d2m = {k: os.environ.get(f"DIL2_MODE_{k.upper()}", _d2m)
           for k in ("ec3", "ec5", "ec6")}
    up_s2d = upsample_to_s2d_bm if bm else upsample_to_s2d

    if cfg.remat:
        # rematerialize each block in backward so 128^3 crop training
        # fits single-chip HBM on the fast path too.
        #
        # REMAT_SKIP_WHOLEBLOCK=1: calls routed ENTIRELY through a
        # whole-block custom_vjp (phased_gated_block[_bm],
        # dil2_gated_block_bm) skip the checkpoint — their vjp residuals
        # are the block INPUTS (= the remat boundary values, saved
        # either way) and their backward recomputes from those inputs
        # via the XLA composition, so checkpointing them adds a Pallas
        # forward replay the backward never consumes. Default ON since
        # round 4 (A/B: 1091 -> 1035 ms/step at B=8 128^3; gradients
        # bitwise-equal, test_remat_skip_wholeblock_grads_match; the
        # B=8 HBM fit needed max_pool_s2d's fat-concat custom bwd).
        skip_whole = os.environ.get("REMAT_SKIP_WHOLEBLOCK", "1") == "1"

        def _phased_whole(kw):
            pre_ = kw.get("pre")
            return bool(kw.get("use_epi")) and pre_ is not None \
                and "epi_wgs" in pre_

        def _dense_whole(kw):
            # matches the dense_gated_block route in _sse_block_s2d:
            # whole-block custom_vjp, residuals = inputs, no side
            # output computed outside it
            if kw.get("want_side", True) or kw.get("bm"):
                return False
            if not _phased_whole(kw):
                return False
            from ..ops.pallas_s2d import whole_dense_enabled

            return whole_dense_enabled()

        def _dil2_whole_dense(kw):
            # matches the dense_gated_block route in _sse_block_s2d_dil2
            if not _dense_whole(kw):
                return False
            if kw.get("mode", "grouped") == "pp" or kw.get("use_pallas"):
                return False
            pre_ = kw["pre"]
            return "wgroup" in pre_ or "wdense" in pre_

        def _dil2_whole(kw):
            if not (_phased_whole(kw) and "wdense" in kw["pre"]
                    and os.environ.get("PALLAS_DIL2BM", "0") == "1"):
                return False
            if bool(kw.get("bm")):
                return True
            from ..ops.pallas_s2d import tbm_enabled

            return tbm_enabled()

        # size-based selective remat: blocks whose INPUT tensors are
        # small keep their activations (no recompute in backward) —
        # only the full-res blocks, whose activations dominate HBM,
        # pay the recompute. REMAT_MIN_MB=0 checkpoints everything.
        min_bytes = float(os.environ.get("REMAT_MIN_MB", "0")) * 1e6

        def _wrap(f, whole_pred=None):
            def wrapped(pb, xb, **kw):
                if skip_whole and whole_pred is not None and whole_pred(kw):
                    return f(pb, xb, **kw)
                if min_bytes:
                    nbytes = sum(t.size * t.dtype.itemsize
                                 for t in jax.tree.leaves(xb))
                    if nbytes < min_bytes:
                        return f(pb, xb, **kw)
                return jax.checkpoint(lambda p_, x_: f(p_, x_, **kw))(pb, xb)
            return wrapped

        _sse_block_s2d = _wrap(globals()["_sse_block_s2d"], _dense_whole)
        _sse_block_s2d_dil2 = _wrap(
            globals()["_sse_block_s2d_dil2"],
            lambda kw: _dil2_whole(kw) or _dil2_whole_dense(kw))
        _sse_block_s2d_phased = _wrap(globals()["_sse_block_s2d_phased"],
                                      _phased_whole)
        _sse_block = _wrap(globals()["_sse_block"])
        # _wrap (not bare jax.checkpoint): pre/use_epi/bm stay closed
        # over, so the static bools never become traced leaves
        _cat_block_s2d = _wrap(globals()["_cat_block_s2d"])
        _cat_block = _wrap(globals()["_cat_block"])
    else:
        _sse_block_s2d = globals()["_sse_block_s2d"]
        _sse_block_s2d_dil2 = globals()["_sse_block_s2d_dil2"]
        _sse_block_s2d_phased = globals()["_sse_block_s2d_phased"]
        _sse_block = globals()["_sse_block"]
        _cat_block_s2d = globals()["_cat_block_s2d"]
        _cat_block = globals()["_cat_block"]

    # ---- encoder level 1 (s2d) ----
    if x_is_s2d:
        if bm:
            raise ValueError("x_is_s2d requires the non-bm fast path")
        xs = x  # caller already produced the (…, 16) entry tensor
    else:
        xs = s2d_entry_bm(x) if bm else space_to_depth(x)  # (…, 16)
    # ec1/ec2 use the block-lifted dense 3^3 kernel: the lift's 8x
    # structural-zero FLOPs are negligible at Ci<=16 and the phased
    # (lift-free) alternative measurably lost in round 2
    # (13.8 -> 10.7 tiles/s) and trips a Mosaic 64-lane slice limit
    # under the round-4 kernel set — removed.
    e0, _ = _sse_block_s2d(p["ec1"], xs, want_side=False, pre=fp["ec1"],
                           use_epi=epi, bm=bm)
    e1, _ = _sse_block_s2d(p["ec2"], e0, want_side=False, pre=fp["ec2"],
                           use_epi=epi, bm=bm)
    e1_1, _ = _sse_block_s2d_dil2(p["ec3"], e1, want_side=False,
                                  use_pallas=upl_dil2, pre=fp["ec3"],
                                  mode=d2m["ec3"], use_epi=epi, bm=bm)
    f0, f1, f2 = e0, e1, e1_1  # head features
    e1 = _cat_block_s2d(p["ec33"], [e1_1, e0, e1], pre=fp["ec33"],
                        use_epi=epi, bm=bm)
    e1 = e1 + _cat_block_s2d(p["x33"], xs, pre=fp["x33"], use_epi=epi, bm=bm)
    # ---- encoder level 2 (s2d at 32^3 blocks: 256-512 channels) ----
    # (the slice-first pool+s2d fusion and the train-only pool_down
    # gate both measured net losses — ROADMAP r4d; max_pool_s2d's
    # custom_vjp now emits the backward as one fat 8C-lane concat
    # instead, which is what the thin-lane temps actually needed)
    s2d_l = space_to_depth_bm if bm else space_to_depth
    e2s = s2d_l(max_pool_s2d(e1))
    x2s = s2d_l(max_pool_s2d(xs))
    e2s, _ = _sse_block_s2d_phased(p["ec4"], e2s, want_side=False, n_gates=2,
                                   use_pallas=upl, pre=fp["ec4"],
                                   use_epi=epi, bm=bm)
    e3s, _ = _sse_block_s2d_dil2(p["ec5"], e2s, want_side=False, n_gates=2,
                                 use_pallas=upl_dil2, pre=fp["ec5"],
                                 mode=d2m["ec5"], use_epi=epi, bm=bm)
    e3_1s, _ = _sse_block_s2d_dil2(p["ec6"], e3s, want_side=False, n_gates=2,
                                   use_pallas=upl_dil2, pre=fp["ec6"],
                                   mode=d2m["ec6"], use_epi=epi, bm=bm)
    f3, f4, f5 = e2s, e3s, e3_1s
    e3s = _cat_block_s2d(p["ec63"], [e3_1s, e2s, e3s], pre=fp["ec63"],
                         use_epi=epi, bm=bm)
    e3s = e3s + _cat_block_s2d(p["x63"], x2s, pre=fp["x63"], use_epi=epi,
                               bm=bm)
    e4 = max_pool_s2d(e3s)
    x3 = max_pool_s2d(x2s)

    # ---- encoder level 3 (1/4) ----
    e4, _ = _sse_block(p["ec7"], e4, dilation=1, up=1, n_gates=2,
                       want_side=False, bm=bm)
    e5, _ = _sse_block(p["ec8"], e4, dilation=2, up=1, n_gates=2,
                       want_side=False, bm=bm)
    e5_1, _ = _sse_block(p["ec9"], e5, dilation=2, up=1, n_gates=2,
                         want_side=False, bm=bm)
    f6, f7, f8 = e4, e5, e5_1
    e5 = _cat_block(p["ec93"], cat(e5_1, e4, e5), bm=bm)
    e5 = e5 + _cat_block(p["x93"], x3, bm=bm)
    e6 = max_pool3d(e5, batch_minor=bm)

    # ---- bottleneck (1/8) ----
    e6, _ = _sse_block(p["ec10"], e6, dilation=1, up=1, n_gates=2,
                       want_side=False, bm=bm)
    e7, _ = _sse_block(p["ec11"], e6, dilation=1, up=1, n_gates=2,
                       want_side=False, bm=bm)
    e7_1, _ = _sse_block(p["ec12"], e7, dilation=1, up=1, n_gates=2,
                         want_side=False, bm=bm)
    f9, f10, f11 = e6, e7, e7_1
    e7 = _cat_block(p["ec123"], cat(e7_1, e6, e7), bm=bm)

    # ---- decoder level 3 (1/4) ----
    if bm:
        from ..ops.resize import upsample_trilinear_bm

        e8 = upsample_trilinear_bm(e7, 2, mat=fp.get("interp_tri"))
    else:
        e8 = upsample_trilinear(e7, 2, mat=fp.get("interp_tri"))
    d0, _ = _sse_block(p["dc1"], cat(e8, e5), dilation=1, up=1, n_gates=2,
                       want_side=False, bm=bm)
    d0_1, _ = _sse_block(p["dc2"], d0, dilation=1, up=1, n_gates=2,
                         want_side=False, bm=bm)
    f12, f13 = d0, d0_1
    d0 = _cat_block(p["dc22"], cat(d0_1, d0), bm=bm)

    # ---- decoder level 2 (s2d at 32^3 blocks) ----
    m = d0.shape[0 if bm else 1]
    d1s = up_s2d(d0, 2, pair=interp.get((m, 2 * m)))
    d1s, _ = _sse_block_s2d_phased(p["dc3"], [d1s, e3s], want_side=False,
                                   n_gates=2, use_pallas=upl, pre=fp["dc3"],
                                   use_epi=epi, bm=bm)
    d1_1s, _ = _sse_block_s2d_phased(p["dc4"], d1s, want_side=False,
                                     n_gates=2, use_pallas=upl, pre=fp["dc4"],
                                     use_epi=epi, bm=bm)
    f14, f15 = d1s, d1_1s
    d1s = _cat_block_s2d(p["dc42"], [d1_1s, d1s], pre=fp["dc42"],
                         use_epi=epi, bm=bm)

    # ---- decoder level 1 (full res, all in s2d) ----
    # (the fused d2s+upsample slab form — UP_FOLD_D2S — measured a
    # loss against d2s + slab-form upsample_to_s2d both rounds it was
    # tried: r3 neutral-at-best, r4 34.56 vs 36.19 tiles/s — deleted)
    d1f = depth_to_space_bm(d1s) if bm else depth_to_space(d1s)
    m = d1f.shape[0 if bm else 1]
    up_s = up_s2d(d1f, 2, pair=interp.get((m, 2 * m)))  # (n^3, 8*32)
    d2, _ = _sse_block_s2d_phased(p["dc5"], [up_s, e1], want_side=False,
                                  use_pallas=upl, pre=fp["dc5"],
                                  use_epi=epi, bm=bm)
    d2_1, _ = _sse_block_s2d_phased(p["dc6"], d2, want_side=False,
                                    use_pallas=upl, pre=fp["dc6"],
                                    use_epi=epi, bm=bm)
    f16, f17 = d2, d2_1
    # dc62's output feeds nothing in the reference forward (its result
    # is dead after SE_UNet.py:230) — skipped here; XLA would DCE it.

    if train:
        if rng is None:
            raise ValueError("train=True requires an rng key for DropLayer")
        k_en, k_de = jax.random.split(rng)
    else:
        k_en = k_de = None

    metas_en = [
        (f0, p["ec1"], "s2d", 1), (f1, p["ec2"], "s2d", 1), (f2, p["ec3"], "s2d", 1),
        (f3, p["ec4"], "s2d_up", 2), (f4, p["ec5"], "s2d_up", 2), (f5, p["ec6"], "s2d_up", 2),
        (f6, p["ec7"], "std", 4), (f7, p["ec8"], "std", 4), (f8, p["ec9"], "std", 4),
        (f9, p["ec10"], "std", 8), (f10, p["ec11"], "std", 8), (f11, p["ec12"], "std", 8),
    ]
    metas_de = [
        (f12, p["dc1"], "std", 4), (f13, p["dc2"], "std", 4),
        (f14, p["dc3"], "s2d_up", 2), (f15, p["dc4"], "s2d_up", 2),
        (f16, p["dc5"], "s2d", 1), (f17, p["dc6"], "s2d", 1),
    ]
    pred_en = _composed_head(metas_en, p["head_en"], k_en, cfg.drop_threshold,
                             train, interp=interp, bm=bm, s2d_out=heads_s2d)
    pred_de = _composed_head(metas_de, p["head_de"], k_de, cfg.drop_threshold,
                             train, interp=interp, bm=bm, s2d_out=heads_s2d)
    return pred_en.astype(jnp.float32), pred_de.astype(jnp.float32)
