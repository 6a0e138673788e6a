"""Space-to-depth (s2d) machinery for the full-resolution UNet level.

Why: the reference model's level-1 layers run 3^3 convs at 128^3 with
2..56 channels. On TPU the channel axis maps to the 128-wide lane
dimension, so C=2..32 tensors waste 4-64x of both bandwidth and MXU
columns — measured at 0.2-3 TF/s. Folding each 2x2x2 spatial block
into channels (factor-2 space-to-depth) turns those tensors into
(64^3, 16..448)-channel tensors, which the MXU and VPU can actually
fill. This module provides the *exact* algebraic rewrites so the fast
path is bit-compatible (up to fp reassociation) with the reference
semantics:

  * `space_to_depth`/`depth_to_space`: (B, 2n, 2n, 2n, C) <->
    (B, n, n, n, 8C), sub-position-major channel layout
    p = dz*4 + dy*2 + dx.
  * `conv3_weight_to_s2d`: lift a dense 3^3 stride-1 pad-1 kernel to
    an equivalent 3^3 *block* kernel on s2d tensors (weights gain the
    8x8 sub-position structure; zero-padded taps reproduce SAME
    padding exactly for even extents).
  * dilation-2 convs are polyphase-decomposed instead: a dil-2 3^3
    conv on the full grid is exactly 8 independent dil-1 3^3 convs on
    the 8 sub-grids (no FLOP overhead).
  * `instance_norm_s2d`: InstanceNorm statistics per ORIGINAL channel
    — i.e. over (spatial x 8 sub-positions).
  * `upsample_to_s2d`: PyTorch align_corners=True trilinear upsample
    from a coarse grid straight INTO s2d layout (the interpolation
    matrix split into even/odd output rows), so full-res side outputs
    never materialize in the lane-hostile (128^3, 2) layout.

Used by `models.se_unet.apply_fast`; parity with the reference path is
locked by tests/test_fast_path.py.
"""

from __future__ import annotations

import os
from functools import lru_cache
from itertools import product

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from .resize import _interp_matrix

HP = lax.Precision.HIGHEST


def space_to_depth(x: jnp.ndarray) -> jnp.ndarray:
    """(B, 2n, 2n, 2n, C) -> (B, n, n, n, 8C), p-major channels."""
    b, d, h, w, c = x.shape
    x = x.reshape(b, d // 2, 2, h // 2, 2, w // 2, 2, c)
    x = x.transpose(0, 1, 3, 5, 2, 4, 6, 7)  # (b, n, n, n, 2, 2, 2, c)
    return x.reshape(b, d // 2, h // 2, w // 2, 8 * c)


def depth_to_space(x: jnp.ndarray) -> jnp.ndarray:
    """(B, n, n, n, 8C) -> (B, 2n, 2n, 2n, C)."""
    b, d, h, w, c8 = x.shape
    c = c8 // 8
    x = x.reshape(b, d, h, w, 2, 2, 2, c)
    x = x.transpose(0, 1, 4, 2, 5, 3, 6, 7)
    return x.reshape(b, 2 * d, 2 * h, 2 * w, c)


@lru_cache(maxsize=None)
def _block_lift_tensor() -> np.ndarray:
    """M[Sz,Sy,Sx, p_in, p_out, dz,dy,dx] in {0,1}: tap (d) of output
    sub-position (p_out) reads input sub-position (p_in) at block
    offset (S)."""
    m = np.zeros((3, 3, 3, 8, 8, 3, 3, 3), np.float32)
    for a, bb, c in product(range(2), repeat=3):
        q = a * 4 + bb * 2 + c
        for dz, dy, dx in product((-1, 0, 1), repeat=3):
            sz, az = divmod(a + dz + 2, 2)
            sy, ay = divmod(bb + dy + 2, 2)
            sx, ax = divmod(c + dx + 2, 2)
            p = az * 4 + ay * 2 + ax
            m[sz, sy, sx, p, q, dz + 1, dy + 1, dx + 1] = 1.0
    return m


def conv3_weight_to_s2d(w: jnp.ndarray) -> jnp.ndarray:
    """(3,3,3,Ci,Co) -> (3,3,3,8Ci,8Co) block kernel (dil=1, pad=1)."""
    ci, co = w.shape[3], w.shape[4]
    m = jnp.asarray(_block_lift_tensor(), w.dtype)
    wp = jnp.einsum("ZYXpqdef,defio->ZYXpiqo", m, w, precision=HP)
    return wp.reshape(3, 3, 3, 8 * ci, 8 * co)


def bias_to_s2d(b: jnp.ndarray) -> jnp.ndarray:
    """(Co,) -> (8Co,) tiled per sub-position."""
    return jnp.tile(b, 8)


def grouped_pointwise(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray | None = None):
    """1x1x1 conv on an s2d tensor. Weights (Ci, Co) are shared across
    sub-positions; formulated as ONE dense (..., 8Ci) @ (8Ci, 8Co)
    matmul with a block-diagonal kron weight. The 8x redundant zeros
    cost MXU cycles the chip has to spare — what it does NOT have to
    spare is the HBM relayout a (…, 8, Ci)-reshaped batched-matmul
    formulation forces on every big tensor (55% of forward device time
    was layout copies before this rewrite)."""
    co = w.shape[1]
    wd = jnp.kron(jnp.eye(8, dtype=x.dtype), w.astype(x.dtype))  # (8Ci, 8Co)
    y = jnp.einsum("...i,io->...o", x, wd, precision=HP)
    if b is not None:
        y = y + jnp.tile(b, 8).astype(y.dtype)
    return y


def instance_norm_s2d(x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """InstanceNorm over (D,H,W,8 sub-positions) per original channel.

    Equivalent to ops.norms.instance_norm on the depth_to_space image.
    All full-size tensor traffic stays 5-D in the native (…, 8C)
    layout; only the (B, C8) reduction results are regrouped."""
    b, d, h, w, c8 = x.shape
    c = c8 // 8
    n = d * h * w * 8
    # one-pass statistics: var = E[x^2] - E[x]^2 in f32. The
    # mean-subtracted two-pass form forces XLA to materialize a full
    # f32 copy of x fused with whatever transpose produced it (the
    # dil-2 polyphase path paid ~35 ms/iter for that); both reduces
    # here fuse convert+square into one read of the bf16 tensor.
    s1 = jnp.sum(x, axis=(1, 2, 3), dtype=jnp.float32)  # (b, c8)
    s2 = jnp.sum(
        jnp.square(x.astype(jnp.float32)), axis=(1, 2, 3)
    )  # (b, c8)
    mean = jnp.sum(s1.reshape(b, 8, c), axis=1) / n  # (b, c)
    ex2 = jnp.sum(s2.reshape(b, 8, c), axis=1) / n
    var = jnp.maximum(ex2 - jnp.square(mean), 0.0)
    scale = lax.rsqrt(var + eps)  # (b, c)
    scale8 = jnp.tile(scale, (1, 8))[:, None, None, None, :]
    shift8 = jnp.tile(mean * scale, (1, 8))[:, None, None, None, :]
    return (x.astype(jnp.float32) * scale8 - shift8).astype(x.dtype)


def dil2_group_weight(w: jnp.ndarray, ng: int, dtype) -> jnp.ndarray:
    """Partial-dense lift of a dil-2 kernel for a groups=ng conv: ng
    groups of 8/ng sub-positions, block-diagonal dense WITHIN each
    group — (3,3,3,Ci,Co) -> (3,3,3,(8/ng)Ci, 8Co), group g's output
    slice holding that group's dense block. Lift (8/ng)x instead of
    the full dense 8x; groups stay 128-lane aligned when
    (8/ng)*Ci >= 128. Loop-slope A/Bs (v5e, per 8-tile batch):
    ec3 ng=2 15.6 vs dense 19.0 ms; ec5 ng=2 2.4 vs 4.9; ec6 ng=4
    3.8 vs 9.6."""
    ci, co = w.shape[3], w.shape[4]
    per = 8 // ng
    wd = dil2_dense_weight(w, dtype)  # (3,3,3,8ci,8co) block-diagonal
    return jnp.concatenate(
        [wd[:, :, :, g * per * ci : (g + 1) * per * ci,
            g * per * co : (g + 1) * per * co]
         for g in range(ng)], axis=4)


def se_gate_weights(w_se: jnp.ndarray, dtype):
    """Precompute the (wg, onehot) pair consumed by se_gate_s2d_pre.
    `w_se` is the reference (Ci, 1) kernel (no bias).

    INVARIANT the manual epilogue backward relies on: `onehot` is a
    CONSTANT kron(I8, ones) expansion matrix, never derived from a
    trainable parameter. pallas_s2d's EPI_MANBWD path returns a zero
    cotangent for it (exact_doh=False) — correct only while this stays
    constant; if a trainable gate-expansion is ever introduced, route
    it through exact_doh=True or extend the manual backward."""
    ci = w_se.shape[0]
    eye = jnp.eye(8, dtype=dtype)
    wg = jnp.kron(eye, w_se.astype(dtype))  # (8Ci, 8)
    onehot = jnp.kron(eye, jnp.ones((1, ci), dtype))  # (8, 8Ci)
    return wg, onehot


def se_gate_s2d_pre(x: jnp.ndarray, wg: jnp.ndarray, onehot: jnp.ndarray):
    """se_gate_s2d with precomputed weights (no in-trace kron)."""
    import jax

    gate = jax.nn.sigmoid(jnp.einsum("...i,ip->...p", x, wg, precision=HP))
    return x * jnp.einsum("...p,pj->...j", gate, onehot, precision=HP)


def se_gate_s2d(x: jnp.ndarray, w_se: jnp.ndarray) -> jnp.ndarray:
    """Spatial squeeze-excitation on an s2d tensor: per ORIGINAL voxel
    gate sigmoid(<features, w>) broadcast over that voxel's channels.
    `w_se` is the reference (Ci, 1) kernel (no bias).

    5-D formulation: gate = x @ kron(I8, w) gives the 8 per-position
    gates; the broadcast back over each position's channels is a
    second one-hot matmul (8, 8Ci) — both stay in the native layout."""
    wg, onehot = se_gate_weights(w_se, x.dtype)
    return se_gate_s2d_pre(x, wg, onehot)


def _max_pool_s2d_fwd_tree(x: jnp.ndarray) -> jnp.ndarray:
    *lead, c8 = x.shape
    c = c8 // 8
    if os.environ.get("POOL_FWD") == "reshape":
        # measured LOSER (round-5 voltime A/B: 38.17 vs 39.10
        # tiles/s): the p-major lane regroup + single-axis reduce
        # beats neither the chain's fusion nor its layout. Kept as
        # the record; the chain stays the default.
        return jnp.max(x.reshape(*lead, 8, c), axis=-2)
    out = x[..., :c]
    for p in range(1, 8):
        out = jnp.maximum(out, x[..., p * c : (p + 1) * c])
    return out


@jax.custom_vjp
def max_pool_s2d(x: jnp.ndarray) -> jnp.ndarray:
    """MaxPool3d(2,2) of the underlying image: max over sub-positions.
    (B, n, n, n, 8C) -> (B, n, n, n, C) — as a maximum tree over the 8
    per-position channel slices (one fused elementwise pass, no 6-D
    relayout).

    custom_vjp: the maximum tree's automatic backward materializes
    per-pair select/mul temps in the thin (C-lane) shape, which the
    (8,128) lane tiling pads 4-64x — they were both ~27 ms/step of
    the 128^3 train backward and the HBM straw that OOM'd the
    REMAT_SKIP_WHOLEBLOCK config (round-4 step profile + OOM dump).
    The manual backward emits dx as ONE fat 8C-lane concat, with the
    cotangent split EVENLY among tied maxima (exact ties are measure-
    zero in the conv-activation inputs; jnp.maximum's chain rule would
    split them 2^-depth per pair instead)."""
    return _max_pool_s2d_fwd_tree(x)


def _max_pool_s2d_vjp_fwd(x):
    return _max_pool_s2d_fwd_tree(x), (x,)


def _max_pool_s2d_vjp_bwd(res, g):
    """POOL_BWD selects the emission (trace-time, like EPI_*).
    Round-5 B=8 128^3 A/Bs: the round-4 "concat" form is the ONLY one
    that fits HBM — it stays the default despite its ~40 ms of split
    fusions (the step runs within ~120 MB of the 15.75 G ceiling, so
    every alternative's extra temp is fatal):
      "concat" (default): 8 thin eq temps feeding one fat concat;
      "fat": full-width where over lane-tiled broadcasts — XLA
        MATERIALIZES the jnp.tile broadcasts as 1 GB HLO temps
        (measured 17.01 G, OOM by 1.26 G);
      "pallas": VMEM-local Pallas mask pass (max_pool_s2d_bwd_mask) —
        the fat mask is a fresh 1.07 GB allocation the fused forms
        never make (OOM by 121 M; input aliasing forced copies and
        got worse, 246 M over). Kept for smaller-footprint configs."""
    (x,) = res
    c = x.shape[-1] // 8
    mode = os.environ.get("POOL_BWD", "concat")
    if mode == "pallas":
        from .pallas_s2d import max_pool_s2d_bwd_mask

        m = max_pool_s2d_bwd_mask(x)
        if m is not None:
            return (m * jnp.tile(g, (1,) * (g.ndim - 1) + (8,)),)
    out = _max_pool_s2d_fwd_tree(x)  # recompute: a few fused maxima
    eq = [
        (x[..., p * c : (p + 1) * c] == out).astype(g.dtype)
        for p in range(8)
    ]
    cnt = eq[0]
    for p in range(1, 8):
        cnt = cnt + eq[p]
    if mode != "concat":
        # every operand of the final fusion is full 8C-lane width:
        # the lane-tiled out/gs are broadcast reads XLA keeps inside
        # the fusion, so x is read once and dx written once
        reps = (1,) * (g.ndim - 1) + (8,)
        gs8 = jnp.tile(g / cnt, reps)
        return (jnp.where(x == jnp.tile(out, reps), gs8,
                          jnp.zeros((), g.dtype)),)
    gs = g / cnt
    return (jnp.concatenate([gs * e for e in eq], axis=-1),)


max_pool_s2d.defvjp(_max_pool_s2d_vjp_fwd, _max_pool_s2d_vjp_bwd)


def _pool_down(x, c8: int, spatial_slice):
    """Shared core of max_pool_s2d_down[_bm]: per output sub-position
    take the stride-2 spatial slice FIRST (full 8C lanes), then reduce
    the 8 input sub-positions with a maximum tree, and concat the 8
    results p-major. Equivalent to space_to_depth(max_pool_s2d(x)) but
    no thin C-lane tensor at the pre-pool resolution ever materializes
    — the thin max-tree temps the composition creates are lane-padded
    up to 4-64x by the (8,128) tiling and showed up as the dominant
    HBM temps in the 128^3 train-step backward."""
    c = c8 // 8
    outs = []
    for pz in (0, 1):
        for py in (0, 1):
            for px in (0, 1):
                sp = spatial_slice(x, pz, py, px)
                m = sp[..., :c]
                for q in range(1, 8):
                    m = jnp.maximum(m, sp[..., q * c : (q + 1) * c])
                outs.append(m)
    return jnp.concatenate(outs, axis=-1)


def max_pool_s2d_down(x: jnp.ndarray) -> jnp.ndarray:
    """Fused max_pool_s2d + space_to_depth:
    (B, n, n, n, 8C) -> (B, n/2, n/2, n/2, 8C)."""
    return _pool_down(
        x, x.shape[-1],
        lambda t, pz, py, px: t[:, pz::2, py::2, px::2, :],
    )


def max_pool_s2d_down_bm(x: jnp.ndarray) -> jnp.ndarray:
    """Fused max_pool_s2d + space_to_depth_bm:
    (n, n, n, B, 8C) -> (n/2, n/2, n/2, B, 8C)."""
    return _pool_down(
        x, x.shape[-1],
        lambda t, pz, py, px: t[pz::2, py::2, px::2, :, :],
    )


@lru_cache(maxsize=None)
def _interp_pair(n_in: int, n_out_full: int) -> np.ndarray:
    """(2, n_out_full//2, n_in): even/odd rows of the align_corners
    interpolation matrix."""
    m = _interp_matrix(n_in, n_out_full)
    return np.stack([m[0::2], m[1::2]])


def upsample_to_s2d(x: jnp.ndarray, scale: int, out_full: int | None = None,
                    pair=None):
    """Trilinear align_corners upsample of (B, m, m, m, C) by `scale`,
    emitted directly in s2d layout (B, m*scale/2, ..., 8C).

    Matches upsample_trilinear + space_to_depth exactly. `pair` is the
    precomputed (2, m*scale/2, m) even/odd interpolation matrix (cubic
    volumes share it across axes); passing it keeps the traced program
    free of host-streamed constants (each costs a tunnel round-trip
    per execution on relayed TPU hosts)."""
    b, d, h, w, c = x.shape
    if c >= 8 and os.environ.get("UP_SLABS", "1") == "1":
        # per-parity slab emission: no 8-D parity axes, no packing
        # reshape — see upsample_to_s2d_slabs. Default ON since round
        # 4: the single-chain form's pack reshape materializes two
        # 1.07 GB copies at the dc5-input shape (r4 fwd HLO,
        # s2d.py:264/266) and the slab form measured 33.49 -> 34.07
        # tiles/s (voltime A/B). UP_SLABS=0 keeps the single-chain
        # form (bit-identical values either way).
        return upsample_to_s2d_slabs(x, scale, pair=pair)
    dtype = x.dtype
    # bf16 path: contract in bf16 (MXU accumulates f32) — the f32
    # staging tensors cost ~2x the HBM traffic of the whole chain and
    # the activations are bf16-quantized on either side anyway. The
    # f32 path keeps f32 operands (bit-parity with the reference).
    ct = jnp.bfloat16 if dtype == jnp.bfloat16 else jnp.float32
    if pair is not None:
        md = mh = mw = pair.astype(ct)
    else:
        md = jnp.asarray(_interp_pair(d, d * scale), ct)
        mh = jnp.asarray(_interp_pair(h, h * scale), ct)
        mw = jnp.asarray(_interp_pair(w, w * scale), ct)
    y = x.astype(ct)
    # each contraction EMITS its parity axis directly in the final
    # (b, D, H, W, az, ey, fx, c) order, so the s2d regroup below is a
    # pure reshape — the previous parity-major ordering needed an 8-D
    # transpose afterwards, a profiled ~30 ms/iter relayout copy
    y = jnp.einsum("aDd,bdhwc->bDhwac", md, y, precision=HP)
    y = jnp.einsum("eHh,bDhwac->bDHwaec", mh, y, precision=HP)
    y = jnp.einsum("fWw,bDHwaec->bDHWaefc", mw, y, precision=HP)
    n = d * scale // 2
    return y.reshape(b, n, n, n, 8 * c).astype(dtype)


def upsample_to_s2d_slabs(x: jnp.ndarray, scale: int, pair=None):
    """`upsample_to_s2d` emitted as 8 per-parity slab chains + ONE
    minor-axis concat.

    The single-chain form (above) appends the three parity axes to the
    tensor and reshape-packs them into channels at the end; on TPU that
    reshape is a 32->256-lane relayout XLA materializes as two copies
    (profiled ~11 ms/batch at the dc5 shape). Here every intermediate
    keeps the plain (B, n, n, n, C) shape — each parity chain contracts
    the SAME rows of the interpolation matrices in the same order, so
    values are bit-identical — and the only layout change left is the
    final p-major channel concat, which XLA writes directly into the
    consumer's operand buffer."""
    b, d, h, w, c = x.shape
    dtype = x.dtype
    ct = jnp.bfloat16 if dtype == jnp.bfloat16 else jnp.float32
    if pair is not None:
        md = mh = mw = pair.astype(ct)
    else:
        md = jnp.asarray(_interp_pair(d, d * scale), ct)
        mh = jnp.asarray(_interp_pair(h, h * scale), ct)
        mw = jnp.asarray(_interp_pair(w, w * scale), ct)
    y = x.astype(ct)
    za = [jnp.einsum("Dd,bdhwc->bDhwc", md[a], y, precision=HP)
          for a in range(2)]
    zae = [jnp.einsum("Hh,bDhwc->bDHwc", mh[e], za[a], precision=HP)
           for a in range(2) for e in range(2)]
    slabs = [jnp.einsum("Ww,bDHwc->bDHWc", mw[f], zae[a * 2 + e],
                        precision=HP)
             for a in range(2) for e in range(2) for f in range(2)]
    n = d * scale // 2
    out = jnp.concatenate(slabs, axis=-1)
    return out.astype(dtype).reshape(b, n, n, n, 8 * c)


def _phase_lift_tensor(a: int, b: int, c: int) -> np.ndarray:
    """Mq[sz',sy',sx', p_in, dz,dy,dx] in {0,1} for output sub-position
    (a,b,c): which original tap each of the 2^3 block taps x 8 input
    sub-positions contributes."""
    m = np.zeros((2, 2, 2, 8, 3, 3, 3), np.float32)
    for szp, syp, sxp in product(range(2), repeat=3):
        for az, ay, ax in product(range(2), repeat=3):
            dz = a - 2 + 2 * szp + az
            dy = b - 2 + 2 * syp + ay
            dx = c - 2 + 2 * sxp + ax
            if all(-1 <= d <= 1 for d in (dz, dy, dx)):
                p = az * 4 + ay * 2 + ax
                m[szp, syp, sxp, p, dz + 1, dy + 1, dx + 1] = 1.0
    return m


def phased_conv_weights(
    w: jnp.ndarray,
    b: jnp.ndarray | None = None,
    in_splits: tuple | None = None,
):
    """Lift a dense (3,3,3,Ci,Co) kernel to the phase-stacked 2^3
    block kernel: returns (w_all (2,2,2,8Ci,8Co), b_all (8Co,)) with
    output channels q-major (q = phase) and, when `in_splits` is given,
    input rows permuted for a PLAIN concat of s2d tensors."""
    ci, co = w.shape[3], w.shape[4]
    kernels = []
    for a, bb, c in product(range(2), repeat=3):
        m = jnp.asarray(_phase_lift_tensor(a, bb, c), w.dtype)
        wq = jnp.einsum("ZYXpdef,defio->ZYXpio", m, w, precision=HP)
        kernels.append(wq.reshape(2, 2, 2, 8 * ci, co))
    w_all = jnp.concatenate(kernels, axis=-1)  # (2,2,2, 8Ci, 8Co)
    if in_splits is not None:
        perm = np.asarray(plain_to_interleaved_perm(tuple(in_splits)))
        w_all = w_all[:, :, :, perm, :]
    b_all = jnp.tile(b, 8) if b is not None else None
    return w_all, b_all


def conv3_s2d_phased_pre(x: jnp.ndarray, w_all: jnp.ndarray,
                         b_all: jnp.ndarray | None = None):
    """conv3_s2d_phased with the phase-stacked kernel precomputed
    (w_all (2,2,2,8Ci,8Co), b_all (8Co,))."""
    from .conv import conv3d

    co = w_all.shape[-1] // 8
    n = x.shape[1]
    y = conv3d(x, w_all, b_all, padding=1)  # (B, n+1, n+1, n+1, 8Co)
    outs = []
    for q, (a, bb, c) in enumerate(product(range(2), repeat=3)):
        outs.append(
            y[:, a : a + n, bb : bb + n, c : c + n, q * co : (q + 1) * co]
        )
    return jnp.concatenate(outs, axis=-1)


def conv3_s2d_phased_fused(x, w_all: jnp.ndarray,
                           b_all: jnp.ndarray | None, eps: float = 1e-5):
    """Phased conv + InstanceNorm + LeakyReLU with the phase gather
    deferred: the statistics reduce straight off the conv's (n+1)^3
    phase-stacked output slices, and normalize+activation is emitted
    per phase INSIDE the final concat — one output pass where the
    gather-then-normalize order costs two full-tensor round trips.
    Equals leaky_relu(instance_norm_s2d(conv3_s2d_phased_pre(...))) up
    to fp reassociation of the channel sums.

    `x` may be a LIST of s2d tensors forming a plain concat (w_all
    built with the matching in_splits): convolution is linear in the
    input channels, so conv(concat(a,b), W) = conv(a, W_a) +
    conv(b, W_b) — the concatenated tensor never materializes (the
    dc5-input concat alone cost ~47 ms/volume as an XLA pad+max
    fusion)."""
    from .conv import conv3d
    from .norms import leaky_relu

    xs = list(x) if isinstance(x, (list, tuple)) else [x]
    co = w_all.shape[-1] // 8
    n = xs[0].shape[1]
    y = None
    off = 0
    for t in xs:
        k = t.shape[-1]
        yt = conv3d(t, w_all[:, :, :, off : off + k, :],
                    b_all if y is None else None, padding=1)
        y = yt if y is None else y + yt
        off += k
    # y: (B, n+1, n+1, n+1, 8Co)
    slices, s1, s2 = [], 0.0, 0.0
    for q, (a, bb, c) in enumerate(product(range(2), repeat=3)):
        sl = y[:, a : a + n, bb : bb + n, c : c + n, q * co : (q + 1) * co]
        slices.append(sl)
        s1 = s1 + jnp.sum(sl, axis=(1, 2, 3), dtype=jnp.float32)
        s2 = s2 + jnp.sum(jnp.square(sl.astype(jnp.float32)), axis=(1, 2, 3))
    nvox = 8 * n * n * n
    mean = s1 / nvox  # (B, Co) per ORIGINAL channel
    var = jnp.maximum(s2 / nvox - jnp.square(mean), 0.0)
    scale = lax.rsqrt(var + eps)[:, None, None, None, :]
    shift = (mean[:, None, None, None, :]) * scale
    acts = [
        leaky_relu(sl.astype(jnp.float32) * scale - shift).astype(xs[0].dtype)
        for sl in slices
    ]
    return jnp.concatenate(acts, axis=-1)


def conv3_s2d_phased(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: jnp.ndarray | None = None,
    in_splits: tuple | None = None,
):
    """Dense 3^3 dil-1 pad-1 conv applied to an s2d tensor, emitted in
    s2d layout. Exactly equals
    space_to_depth(conv3d(depth_to_space(x), w, b, padding=1)).

    All 8 output sub-positions are computed by ONE 2^3 block conv whose
    output channels stack the 8 phase kernels (N = 8*Co fills the MXU
    lanes); each phase then takes a shifted spatial slice of the
    (n+1)^3 VALID-conv output. ~2.4x the original FLOPs — far cheaper
    than the 8x of a dense 3^3 block kernel, with full-width lanes.

    `in_splits`: if `x` is a PLAIN channel-concat of s2d tensors with
    these original channel counts (see grouped_pointwise_multi), the
    interleave permutation is folded into the lifted kernel's input
    rows — the concat itself then needs no data movement.
    """
    w_all, b_all = phased_conv_weights(w, b, in_splits)
    return conv3_s2d_phased_pre(x, w_all, b_all)


def instance_norm_from_stats(
    y: jnp.ndarray,
    s1: jnp.ndarray,
    s2: jnp.ndarray,
    eps: float = 1e-5,
) -> jnp.ndarray:
    """InstanceNorm of an s2d tensor from precomputed per-channel
    (sum, sum-of-squares) — the outputs of pallas_s2d.phased_conv_stats
    — via the one-pass var = E[y^2] - E[y]^2 (f32 accumulation; the
    fused kernel sums the pre-bf16-rounding f32 conv values)."""
    b, d, h, w, c8 = y.shape
    c = c8 // 8
    n = d * h * w * 8
    mean = jnp.sum(s1.reshape(b, 8, c), axis=1) / n  # (b, c)
    ex2 = jnp.sum(s2.reshape(b, 8, c), axis=1) / n
    var = jnp.maximum(ex2 - jnp.square(mean), 0.0)
    scale = lax.rsqrt(var + eps)
    scale8 = jnp.tile(scale, (1, 8))[:, None, None, None, :]
    shift8 = jnp.tile(mean * scale, (1, 8))[:, None, None, None, :]
    return (y.astype(jnp.float32) * scale8 - shift8).astype(y.dtype)


def dil2_dense_weight(w: jnp.ndarray, dtype) -> jnp.ndarray:
    """Block-diagonal dense lift of a dil-2 s2d kernel: (3,3,3,Ci,Co)
    -> (3,3,3,8Ci,8Co) with w on the 8 (group, group) blocks and zeros
    elsewhere. Used for narrow blocks where the grouped-conv emitter's
    per-group lane padding costs more than 8x structurally-zero FLOPs
    (differentiable — the training path builds it in-trace)."""
    eye = jnp.eye(8, dtype=dtype)
    wd = jnp.einsum("dhwio,gk->dhwgiko", w.astype(dtype), eye)
    k, ci, co = w.shape[0], w.shape[3], w.shape[4]
    return wd.reshape(k, k, k, 8 * ci, 8 * co)


def grouped_pointwise_multi_weight(
    w: jnp.ndarray, channel_counts: tuple, dtype
) -> jnp.ndarray:
    """Precompute the dense block-diagonal weight grouped_pointwise_multi
    applies: W[off8_t + p*c_t + i, p*co + o] = w[cum_t + i, o]."""
    eye = jnp.eye(8, dtype=dtype)
    parts = []
    cum = 0
    for c_t in channel_counts:
        parts.append(jnp.kron(eye, w[cum : cum + c_t].astype(dtype)))
        cum += c_t
    return jnp.concatenate(parts, axis=0)  # (sum 8c_t, 8Co)


def grouped_pointwise_multi_pre(xs: list, wd: jnp.ndarray,
                                b: jnp.ndarray | None = None):
    """grouped_pointwise_multi with the weight precomputed. The concat
    never materializes: the matmul is linear in the input channels, so
    each tensor contracts against its own row block of `wd` and the
    partial products sum."""
    y = None
    off = 0
    for t in xs:
        k = t.shape[-1]
        yt = jnp.einsum("...i,io->...o", t, wd[off : off + k], precision=HP)
        y = yt if y is None else y + yt
        off += k
    if b is not None:
        y = y + jnp.tile(b, 8).astype(y.dtype)
    return y


def grouped_pointwise_multi(
    xs: list, w: jnp.ndarray, b: jnp.ndarray | None = None
):
    """1x1x1 conv applied to the CONCAT (in original-channel order) of
    several s2d tensors — without interleaving them. The tensors are
    concatenated plainly (each keeps its own p-major channel block) and
    the interleave permutation is folded into the block-diagonal
    weight: W[off8_t + p*c_t + i, p*co + o] = w[cum_t + i, o].
    Exactly equals grouped_pointwise(s2d-interleaved-cat(xs), w, b)."""
    counts = tuple(t.shape[-1] // 8 for t in xs)
    wd = grouped_pointwise_multi_weight(w, counts, xs[0].dtype)
    return grouped_pointwise_multi_pre(xs, wd, b)


@lru_cache(maxsize=None)
def plain_to_interleaved_perm(channel_counts: tuple) -> tuple:
    """perm[plain_idx] = interleaved_idx for a plain concat of s2d
    tensors with ORIGINAL channel counts `channel_counts`: plain index
    off8_t + p*c_t + i corresponds to interleaved index
    p*C + cum_t + i (C = sum of counts)."""
    C = sum(channel_counts)
    perm = []
    cum = 0
    for c_t in channel_counts:
        for p in range(8):
            for i in range(c_t):
                perm.append(p * C + cum + i)
        cum += c_t
    return tuple(perm)


# --------------- batch-minor ((D,H,W,B,C)) variants ----------------
#
# The TPU conv emitter's preferred physical layout puts batch in the
# sublane (second-minor) dimension: fed NDHWC tensors it inserts a
# {4,0,3,2,1} relayout copy before AND after every convolution (a
# profiled ~70 ms/batch of the inference forward). Batch-minor
# (D,H,W,B,C) logical order makes the DEFAULT row-major layout BE the
# conv-native one, so convs, reduces, concats and pointwise matmuls
# all agree and the relayouts vanish. The channel-last ops above
# (grouped_pointwise*, se_gate_s2d*, max_pool_s2d, the stats
# helpers' (B, C8) results) are layout-agnostic and shared.


def s2d_entry_bm(x: jnp.ndarray) -> jnp.ndarray:
    """Batch-major image (B, 2n, 2n, 2n, C) -> batch-minor s2d
    (n, n, n, B, 8C) in ONE transpose."""
    b, d, h, w, c = x.shape
    x = x.reshape(b, d // 2, 2, h // 2, 2, w // 2, 2, c)
    x = x.transpose(1, 3, 5, 0, 2, 4, 6, 7)  # (n, n, n, b, 2, 2, 2, c)
    return x.reshape(d // 2, h // 2, w // 2, b, 8 * c)


def space_to_depth_bm(x: jnp.ndarray) -> jnp.ndarray:
    """(2n, 2n, 2n, B, C) -> (n, n, n, B, 8C), p-major channels."""
    d, h, w, b, c = x.shape
    x = x.reshape(d // 2, 2, h // 2, 2, w // 2, 2, b, c)
    x = x.transpose(0, 2, 4, 6, 1, 3, 5, 7)
    return x.reshape(d // 2, h // 2, w // 2, b, 8 * c)


def depth_to_space_bm(x: jnp.ndarray) -> jnp.ndarray:
    """(n, n, n, B, 8C) -> (2n, 2n, 2n, B, C), staying batch-minor."""
    d, h, w, b, c8 = x.shape
    c = c8 // 8
    x = x.reshape(d, h, w, b, 2, 2, 2, c)
    x = x.transpose(0, 4, 1, 5, 2, 6, 3, 7)
    return x.reshape(2 * d, 2 * h, 2 * w, b, c)


def depth_to_space_exit_bm(x: jnp.ndarray) -> jnp.ndarray:
    """(n, n, n, B, 8C) -> batch-major (B, 2n, 2n, 2n, C)."""
    d, h, w, b, c8 = x.shape
    c = c8 // 8
    x = x.reshape(d, h, w, b, 2, 2, 2, c)
    x = x.transpose(3, 0, 4, 1, 5, 2, 6, 7)
    return x.reshape(b, 2 * d, 2 * h, 2 * w, c)


def instance_norm_s2d_bm(x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """instance_norm_s2d on a batch-minor s2d tensor."""
    d, h, w, b, c8 = x.shape
    s1 = jnp.sum(x, axis=(0, 1, 2), dtype=jnp.float32)  # (b, c8)
    s2 = jnp.sum(jnp.square(x.astype(jnp.float32)), axis=(0, 1, 2))
    return instance_norm_from_stats_bm(x, s1, s2, eps)


def instance_norm_from_stats_bm(
    y: jnp.ndarray,
    s1: jnp.ndarray,
    s2: jnp.ndarray,
    eps: float = 1e-5,
) -> jnp.ndarray:
    """instance_norm_from_stats for batch-minor tensors: s1/s2 are the
    per-(B, 8C) sums over the spatial axes (0, 1, 2)."""
    d, h, w, b, c8 = y.shape
    c = c8 // 8
    n = d * h * w * 8
    mean = jnp.sum(s1.reshape(b, 8, c), axis=1) / n  # (b, c)
    ex2 = jnp.sum(s2.reshape(b, 8, c), axis=1) / n
    var = jnp.maximum(ex2 - jnp.square(mean), 0.0)
    scale = lax.rsqrt(var + eps)
    scale8 = jnp.tile(scale, (1, 8))  # (b, c8): broadcasts over d,h,w
    shift8 = jnp.tile(mean * scale, (1, 8))
    return (y.astype(jnp.float32) * scale8 - shift8).astype(y.dtype)


def upsample_to_s2d_bm(x: jnp.ndarray, scale: int, pair=None):
    """upsample_to_s2d on a batch-minor (m, m, m, B, C) tensor ->
    (m*scale/2, ..., B, 8C); each contraction emits its parity axis in
    final order, as in the batch-major version."""
    d, h, w, b, c = x.shape
    dtype = x.dtype
    ct = jnp.bfloat16 if dtype == jnp.bfloat16 else jnp.float32
    if pair is not None:
        md = mh = mw = pair.astype(ct)
    else:
        md = jnp.asarray(_interp_pair(d, d * scale), ct)
        mh = jnp.asarray(_interp_pair(h, h * scale), ct)
        mw = jnp.asarray(_interp_pair(w, w * scale), ct)
    y = x.astype(ct)
    y = jnp.einsum("aDd,dhwbc->Dhwbac", md, y, precision=HP)
    y = jnp.einsum("eHh,Dhwbac->DHwbaec", mh, y, precision=HP)
    y = jnp.einsum("fWw,DHwbaec->DHWbaefc", mw, y, precision=HP)
    n = d * scale // 2
    return y.reshape(n, n, n, b, 8 * c).astype(dtype)


def conv3_s2d_phased_fused_bm(x, w_all: jnp.ndarray,
                              b_all: jnp.ndarray | None, eps: float = 1e-5):
    """conv3_s2d_phased_fused on batch-minor s2d tensors (or a list of
    them forming a plain concat)."""
    from .conv import conv3d
    from .norms import leaky_relu

    xs = list(x) if isinstance(x, (list, tuple)) else [x]
    co = w_all.shape[-1] // 8
    n = xs[0].shape[0]
    y = None
    off = 0
    for t in xs:
        k = t.shape[-1]
        yt = conv3d(t, w_all[:, :, :, off : off + k, :],
                    b_all if y is None else None, padding=1,
                    batch_minor=True)
        y = yt if y is None else y + yt
        off += k
    # y: (n+1, n+1, n+1, B, 8Co)
    slices, s1, s2 = [], 0.0, 0.0
    for q, (a, bb, c) in enumerate(product(range(2), repeat=3)):
        sl = y[a : a + n, bb : bb + n, c : c + n, :, q * co : (q + 1) * co]
        slices.append(sl)
        s1 = s1 + jnp.sum(sl, axis=(0, 1, 2), dtype=jnp.float32)
        s2 = s2 + jnp.sum(jnp.square(sl.astype(jnp.float32)), axis=(0, 1, 2))
    nvox = 8 * n * n * n
    mean = s1 / nvox  # (B, Co) per ORIGINAL channel
    var = jnp.maximum(s2 / nvox - jnp.square(mean), 0.0)
    scale = lax.rsqrt(var + eps)  # (B, Co): broadcasts over d,h,w
    shift = mean * scale
    acts = [
        leaky_relu(sl.astype(jnp.float32) * scale - shift).astype(xs[0].dtype)
        for sl in slices
    ]
    return jnp.concatenate(acts, axis=-1)


def dil2_polyphase_block(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray,
                         wses, eps: float = 1e-5) -> jnp.ndarray:
    """Full dil-2 SSE block computed in POLYPHASE-BATCH layout:
    to_polyphase -> dense 3^3 dil-1 conv -> InstanceNorm (statistics
    regrouped over the 8 phase batch-entries) -> LeakyReLU -> SE
    gate(s) -> from_polyphase. Input/output are s2d (B, n, n, n, 8C).

    Why: with phases on the batch axis the dil-2 conv is a plain dense
    conv — K = 27*Ci im2col depth on the MXU, no 8x phase
    block-diagonal (block-diag dense) and no 8x per-group lane padding
    (grouped emitter). The only waste left is the N=Co<128 lane
    padding (2-4x), a 2-4x issued-FLOP reduction over both s2d
    formulations; the polyphase transposes are ~0.1-1 ms and adjacent
    blocks' from/to_polyphase pairs cancel under CSE. Matches
    reference SE_UNet.py SSEConv (dil=2) semantics exactly; numerics
    equal the grouped path up to conv accumulation order.

    `wses` is the list of raw (Co, 1) SE kernels (reference layout,
    no bias); the per-voxel spatial gate is layout-invariant — a
    polyphase voxel IS one original voxel."""
    import jax

    from .conv import conv3d
    from .norms import leaky_relu

    bsz = x.shape[0]
    xp = to_polyphase(x)
    y = conv3d(xp, w, b, padding=1)
    co = y.shape[-1]
    nvox = 8 * y.shape[1] * y.shape[2] * y.shape[3]
    # one-pass f32 stats (see instance_norm_s2d for why), summed over
    # space per phase-entry then over the 8 phases of each volume
    s1 = jnp.sum(y, axis=(1, 2, 3), dtype=jnp.float32)  # (8B, co)
    s2 = jnp.sum(jnp.square(y.astype(jnp.float32)), axis=(1, 2, 3))
    mean = s1.reshape(bsz, 8, co).sum(axis=1) / nvox  # (B, co)
    ex2 = s2.reshape(bsz, 8, co).sum(axis=1) / nvox
    var = jnp.maximum(ex2 - jnp.square(mean), 0.0)
    scale = lax.rsqrt(var + eps)
    scale8 = jnp.repeat(scale, 8, axis=0)[:, None, None, None, :]
    shift8 = jnp.repeat(mean * scale, 8, axis=0)[:, None, None, None, :]
    e = (y.astype(jnp.float32) * scale8 - shift8).astype(y.dtype)
    e = leaky_relu(e)
    for w_se in wses:
        gate = jax.nn.sigmoid(
            jnp.einsum("...i,io->...o", e, w_se, precision=HP)
        )
        e = e * gate
    return from_polyphase(e)


def to_polyphase(x: jnp.ndarray) -> jnp.ndarray:
    """s2d (B, n, n, n, 8C) -> (B*8, n, n, n, C): sub-positions become
    batch entries (for dilation-2 polyphase convs)."""
    b, d, h, w, c8 = x.shape
    c = c8 // 8
    x = x.reshape(b, d, h, w, 8, c).transpose(0, 4, 1, 2, 3, 5)
    return x.reshape(b * 8, d, h, w, c)


def from_polyphase(x: jnp.ndarray) -> jnp.ndarray:
    """Inverse of to_polyphase."""
    b8, d, h, w, c = x.shape
    b = b8 // 8
    x = x.reshape(b, 8, d, h, w, c).transpose(0, 2, 3, 4, 1, 5)
    return x.reshape(b, d, h, w, 8 * c)
