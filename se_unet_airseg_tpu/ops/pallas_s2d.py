"""Pallas TPU kernels for the s2d conv blocks.

The XLA formulation of the phased s2d conv (ops/s2d.py
conv3_s2d_phased — the workhorse of the full-res levels, replacing
reference SE_UNet.py:9-35 Conv3d at 128^3) costs three full HBM round
trips beyond the conv itself: the pad-to-(n+1) input write, and the
8-way phase slice + concat of the output. A TPU profile of the forward
put >50% of device time into exactly this kind of layout traffic.

`phased_conv_stats` runs the whole thing as ONE kernel:

  * grid over (batch, z-tiles, y-tiles); each step DMAs an
    (tz+2, ty+2, n+2) haloed tile of the pre-padded input into VMEM;
  * the 2^3-tap block conv is 8 MXU matmuls with N = 8*Co lanes (the
    full phase-stacked width), accumulated in f32;
  * the per-phase spatial gather (the "slice+concat") is VMEM index
    math on the accumulator — it never touches HBM;
  * per-channel sum / sum-of-squares (the InstanceNorm statistics the
    next op needs) are accumulated across grid steps into (B, Cout)
    outputs, so the norm's two full-tensor reduction passes disappear.

The backward pass reuses the XLA composition via jax.custom_vjp (exact
same math; the kernel is forward-only). On non-TPU backends the kernel
runs in interpreter mode, keeping CPU tests hermetic.
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _use_interpret() -> bool:
    return jax.default_backend() not in ("tpu", "axon")


def _pad8(v: int) -> int:
    return -(-v // 8) * 8


def _vmem_estimate(tz, ty, n, cin, cout_blk, out_itemsize=2, tx=None) -> int:
    """Rough scoped-VMEM footprint of one phased-kernel grid step:
    Mosaic pads sublane extents to 8 and keeps the dot temporary, the
    sliced operand, and double-buffered blocked in/outs live together.
    Calibrated against the 'scoped allocation ... exceeded 16M' OOMs
    of the remote compile helper. `tx` is the x-tile (defaults to the
    untiled full extent n)."""
    if tx is None:
        tx = n
    xw = _pad8(tx + 2) if tx < n else _pad8(n + 2)
    xs = (tz + 2) * (ty + 2) * xw * cin * 2
    acc = (tz + 1) * (ty + 1) * _pad8(tx + 1) * cout_blk * 4
    xsl = (tz + 1) * (ty + 1) * _pad8(tx + 1) * cin * 2
    out2 = 2 * tz * ty * tx * cout_blk * out_itemsize
    w2 = 2 * 8 * cin * cout_blk * 2
    return xs + 2 * acc + xsl + out2 + w2


def _pick_tile3(n: int, cin: int, cout_blk: int):
    """(tz, ty, tx) for the x-tiled phased kernel: maximize the useful
    compute fraction tz*ty*tx / ((tz+1)(ty+1)(tx+1)) under the VMEM
    budget (the (t+1)/t halo recompute was the round-2 kernel's main
    loss: VMEM forced (2,4)-voxel tiles at 64^3). Returns None when
    nothing divides n within budget."""
    budget = 11 * 1024 * 1024
    best, best_frac = None, 0.0
    for tz in (2, 4, 8, 16, 32):
        for ty in (2, 4, 8, 16, 32):
            for tx in (8, 16, 32, 64):
                if n % tz or n % ty or n % tx:
                    continue
                if _vmem_estimate(tz, ty, n, cin, cout_blk, tx=tx) > budget:
                    continue
                frac = (tz * ty * tx) / ((tz + 1) * (ty + 1) * (tx + 1))
                # mild penalty for DMA read amplification
                amp = ((tz + 2) * (ty + 2) * (tx + 8)) / (tz * ty * tx)
                score = frac / (1.0 + 0.1 * amp)
                if score > best_frac:
                    best, best_frac = (tz, ty, tx), score
    return best


def _pick_tile(n: int, cin: int, cout_blk: int,
               estimate=None) -> tuple[int, int] | None:
    """(tz, ty) dividing n with the largest tile volume whose scoped
    VMEM estimate fits the 16 MB limit with headroom, or None when no
    candidate divides n within budget (odd extents from non-default
    --cube values): callers then fall back to the XLA composition
    rather than launch a grid that silently underwrites the output."""
    budget = 11 * 1024 * 1024
    est = estimate or _vmem_estimate
    best, best_vol = None, 0
    for tz in (2, 4, 8, 16):
        for ty in (2, 4, 8, 16, 32):
            if n % tz or n % ty:
                continue
            if est(tz, ty, n, cin, cout_blk) <= budget:
                if tz * ty > best_vol:
                    best, best_vol = (tz, ty), tz * ty
    return best


def _pick_nsplit(n: int, cin: int, cout: int) -> int:
    """Smallest output-channel split (1/2/4/8 blocks) whose best
    x-tiled grid reaches a decent useful-compute fraction (splitting
    costs an extra full read of x per block, so prefer ncb=1)."""
    for ncb in (1, 2, 4, 8):
        tile = _pick_tile3(n, cin, cout // ncb)
        if tile is None:
            continue
        tz, ty, tx = tile
        frac = (tz * ty * tx) / ((tz + 1) * (ty + 1) * (tx + 1))
        if frac > 0.55:
            return ncb
    return 8


def _phased_kernel(tz, ty, tx, n, cin, co, ppb, out_dtype,
                   x_hbm, w_ref, b_ref, out_ref, s1_ref, s2_ref,
                   xs, acc_ref, sem):
    # Grid: (ncb output-channel blocks, batch, z-tiles, y-tiles,
    # x-tiles); each channel block covers `ppb` phases (ppb*co lanes).
    # The x DMA starts at xi*tx (8-aligned since tx % 8 == 0) and reads
    # tx+8 sublanes (slice widths of an HBM ref must be 8-aligned);
    # only the first tx+2 are consumed.
    # The f32 accumulator lives in a VMEM scratch REF — keeping the
    # (tz+1, ty+1, tx+1, Cblk) intermediate out of SSA values bounds
    # Mosaic's register pressure (a value-form accumulator OOM-killed
    # the remote compile helper at the model's hot shapes).
    nc = pl.program_id(0)
    b = pl.program_id(1)
    zi = pl.program_id(2)
    yi = pl.program_id(3)
    xi = pl.program_id(4)

    dma = pltpu.make_async_copy(
        x_hbm.at[b, pl.ds(zi * tz, tz + 2), pl.ds(yi * ty, ty + 2),
                 pl.ds(xi * tx, tx + 8)],
        xs,
        sem,
    )
    dma.start()
    dma.wait()

    for s in range(8):
        sz, sy, sx = (s >> 2) & 1, (s >> 1) & 1, s & 1
        xsl = xs[sz : sz + tz + 1, sy : sy + ty + 1, sx : sx + tx + 1, :]
        part = lax.dot_general(
            xsl,
            w_ref[s],
            (((3,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if s == 0:
            acc_ref[...] = part + b_ref[0].astype(jnp.float32)
        else:
            acc_ref[...] += part

    first = jnp.logical_and(
        jnp.logical_and(b == 0, zi == 0), jnp.logical_and(yi == 0, xi == 0)
    )

    @pl.when(first)
    def _():
        s1_ref[...] = jnp.zeros_like(s1_ref)
        s2_ref[...] = jnp.zeros_like(s2_ref)

    # per-phase gather out of the accumulator + statistics (the stats
    # refs hold this channel block's (B, Cblk) slice — resident across
    # the (b, zi, yi, xi) sweep; the row update is one full-width
    # access: lane-sliced RMW of a VMEM ref crashes the Mosaic
    # vector.load lowering). Mosaic constraint: dynamic offsets on the
    # sublane (x) dim must be provably 8-aligned, so the x-parity
    # shift uses STATIC slices; z/y offsets may be dynamic (pl.ds)
    # when the channel-block index makes the global phase traced.
    s1_parts, s2_parts = [], []
    for ql in range(ppb):
        if ppb == 8:
            q = ql  # single channel block: everything static
            az, ay, ax = (q >> 2) & 1, (q >> 1) & 1, q & 1
            blk = acc_ref[az : az + tz, ay : ay + ty, ax : ax + tx,
                          ql * co : (ql + 1) * co]
        else:
            q = nc * ppb + ql
            az, ay = (q >> 2) & 1, (q >> 1) & 1
            ch = slice(ql * co, (ql + 1) * co)
            both = acc_ref[pl.ds(az, tz), pl.ds(ay, ty), :, ch]
            if ppb > 1:
                # phases come in (x=0, x=1) pairs within a block
                blk = both[:, :, ql % 2 : ql % 2 + tx, :]
            else:
                blk = jnp.where(
                    (q & 1) == 0, both[:, :, 0:tx, :], both[:, :, 1 : tx + 1, :]
                )
        out_ref[0, :, :, :, ql * co : (ql + 1) * co] = blk.astype(out_dtype)
        s1_parts.append(jnp.sum(blk, axis=(0, 1, 2))[None])
        s2_parts.append(jnp.sum(jnp.square(blk), axis=(0, 1, 2))[None])
    row = (pl.ds(b, 1), slice(None))
    s1_ref[row] += (s1_parts[0] if ppb == 1
                    else jnp.concatenate(s1_parts, axis=1))
    s2_ref[row] += (s2_parts[0] if ppb == 1
                    else jnp.concatenate(s2_parts, axis=1))


def _pallas_forward(x, w_all, b_all):
    """x (B, n, n, n, Cin) -> (y (B, n, n, n, Cout) in x.dtype,
    s1, s2 (B, Cout) f32). w_all (8, Cin, Cout) phase-stacked taps
    (s-major: s = sz*4+sy*2+sx), b_all (Cout,)."""
    bsz, n, _, _, cin = x.shape
    cout = w_all.shape[2]
    co = cout // 8
    ncb = _pick_nsplit(n, cin, cout)
    cblk = cout // ncb
    ppb = 8 // ncb
    tile = _pick_tile3(n, cin, cblk)
    if tile is None:  # nothing divides n within the VMEM budget
        return _xla_composition(x, w_all, b_all)
    tz, ty, tx = tile
    # x extent of the padded volume: start offsets xi*tx are 8-aligned
    # and every tile reads tx+8 sublanes, so the pad must reach n+8
    xw = max(_pad8(n + 2), n + 8)

    xpad = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, xw - n - 1), (0, 0)))
    kernel = partial(_phased_kernel, tz, ty, tx, n, cin, co, ppb, x.dtype)

    flops = 2 * bsz * (n + 1) ** 3 * 8 * cin * cout
    y, s1, s2 = pl.pallas_call(
        kernel,
        grid=(ncb, bsz, n // tz, n // ty, n // tx),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((8, cin, cblk), lambda nc, b, i, j, k: (0, 0, nc),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cblk), lambda nc, b, i, j, k: (0, nc),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, tz, ty, tx, cblk),
                         lambda nc, b, i, j, k: (b, i, j, k, nc),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bsz, cblk), lambda nc, b, i, j, k: (0, nc),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bsz, cblk), lambda nc, b, i, j, k: (0, nc),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bsz, n, n, n, cout), x.dtype),
            jax.ShapeDtypeStruct((bsz, cout), jnp.float32),
            jax.ShapeDtypeStruct((bsz, cout), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((tz + 2, ty + 2, tx + 8, cin), x.dtype),
            pltpu.VMEM((tz + 1, ty + 1, tx + 1, cblk), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=x.size * 2 * 2,
            transcendentals=0,
        ),
        interpret=_use_interpret(),
    )(xpad, w_all, b_all[None])
    return y, s1, s2


def _dil2_kernel(tz, ty, n, ci, co, out_dtype,
                 x_hbm, w_ref, b_ref, out_ref, s1_ref, s2_ref,
                 xs, sem):
    """Dilation-2 3^3 conv on an s2d tensor = an independent dil-1 3^3
    conv per sub-position (same reference kernel for all 8). Each
    position gathers its 27 haloed taps into an im2col strip and runs
    ONE matmul with K = 27*Ci — the polyphase transposes
    (to_polyphase/from_polyphase, two full HBM shuffles) disappear."""
    b = pl.program_id(0)
    zi = pl.program_id(1)
    yi = pl.program_id(2)

    dma = pltpu.make_async_copy(
        x_hbm.at[b, pl.ds(zi * tz, tz + 2), pl.ds(yi * ty, ty + 2)],
        xs,
        sem,
    )
    dma.start()
    dma.wait()

    first = jnp.logical_and(b == 0, jnp.logical_and(zi == 0, yi == 0))

    @pl.when(first)
    def _():
        s1_ref[...] = jnp.zeros_like(s1_ref)
        s2_ref[...] = jnp.zeros_like(s2_ref)

    s1_parts, s2_parts = [], []
    for p in range(8):
        xp = xs[:, :, :, p * ci : (p + 1) * ci]  # (tz+2, ty+2, xw, Ci)
        taps = []
        for dz in range(3):
            for dy in range(3):
                for dx in range(3):
                    taps.append(
                        xp[dz : dz + tz, dy : dy + ty, dx : dx + n, :]
                    )
        xim = jnp.concatenate(taps, axis=-1)  # (tz, ty, n, 27*Ci)
        y = lax.dot_general(
            xim,
            w_ref[...],
            (((3,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        y = y + b_ref[0].astype(jnp.float32)
        out_ref[0, :, :, :, p * co : (p + 1) * co] = y.astype(out_dtype)
        s1_parts.append(jnp.sum(y, axis=(0, 1, 2))[None])
        s2_parts.append(jnp.sum(jnp.square(y), axis=(0, 1, 2))[None])
    row = (pl.ds(b, 1), slice(None))
    s1_ref[row] += jnp.concatenate(s1_parts, axis=1)
    s2_ref[row] += jnp.concatenate(s2_parts, axis=1)


def _pallas_dil2_forward(x, w, b):
    """x (B, n, n, n, 8Ci) s2d; w (3,3,3,Ci,Co) reference dil-2
    kernel; b (Co,). Returns (y (B,n,n,n,8Co), s1, s2 (B,8Co) f32)."""
    bsz, n, _, _, cin = x.shape
    ci, co = w.shape[3], w.shape[4]
    cout = 8 * co

    def _dil2_vmem(tz, ty, n_, cin_, cblk_):
        # the phased estimate plus the (tz, ty, n, 27*Ci) im2col strip
        # each sub-position materializes in VMEM
        return (_vmem_estimate(tz, ty, n_, cin_, cblk_)
                + tz * ty * n_ * 27 * ci * 2)

    tile = _pick_tile(n, cin, max(cout, cin), estimate=_dil2_vmem)
    if tile is None:
        return _xla_dil2_composition(x, w, b)
    tz, ty = tile
    xw = -(-(n + 2) // 8) * 8

    xpad = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, xw - n - 1), (0, 0)))
    wg = w.reshape(27 * ci, co)
    b_all = (b if b is not None else jnp.zeros((co,), x.dtype)).astype(
        jnp.float32
    )
    kernel = partial(_dil2_kernel, tz, ty, n, ci, co, x.dtype)

    flops = 2 * bsz * n * n * n * 27 * cin * co
    y, s1, s2 = pl.pallas_call(
        kernel,
        grid=(bsz, n // tz, n // ty),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((27 * ci, co), lambda b, i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, co), lambda b, i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, tz, ty, n, cout),
                         lambda b, i, j: (b, i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bsz, cout), lambda b, i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bsz, cout), lambda b, i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bsz, n, n, n, cout), x.dtype),
            jax.ShapeDtypeStruct((bsz, cout), jnp.float32),
            jax.ShapeDtypeStruct((bsz, cout), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((tz + 2, ty + 2, xw, cin), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=x.size * 2 * 2,
            transcendentals=0,
        ),
        interpret=_use_interpret(),
    )(xpad, wg, b_all[None])
    return y, s1, s2


def _xla_dil2_composition(x, w, b):
    """Polyphase XLA math for the dil-2 backward pass."""
    from .conv import conv3d
    from .s2d import from_polyphase, to_polyphase

    xp = to_polyphase(x)
    y = from_polyphase(conv3d(xp, w, b, padding=1))
    yf = y.astype(jnp.float32)
    s1 = jnp.sum(yf, axis=(1, 2, 3))
    s2 = jnp.sum(jnp.square(yf), axis=(1, 2, 3))
    return y, s1, s2


@jax.custom_vjp
def dil2_conv_stats(x, w, b):
    """Fused dilation-2 s2d conv + per-channel (sum, sum-of-squares).
    Forward = Pallas kernel; backward = exact XLA polyphase
    composition."""
    return _pallas_dil2_forward(x, w, b)


def _dil2_fwd(x, w, b):
    return _pallas_dil2_forward(x, w, b), (x, w, b)


def _dil2_bwd(res, cts):
    x, w, b = res
    _, vjp = jax.vjp(_xla_dil2_composition, x, w, b)
    return vjp(tuple(cts))


dil2_conv_stats.defvjp(_dil2_fwd, _dil2_bwd)


def _epi_pick_tile(n: int, cout: int) -> tuple[int, int] | None:
    """(tz, ty) for the epilogue kernel. VMEM: double-buffered haloed
    input tile + bf16 assembly scratch + double-buffered output block
    + the transient f32 value of the full-width normalize (Mosaic
    keeps it live while storing back)."""
    budget = 9 * 1024 * 1024
    xw = _pad8(n + 1)
    best, best_vol = None, 0
    for tz in (4, 8, 16):
        for ty in (4, 8, 16):
            if n % tz or n % ty:
                continue
            xs2 = 2 * (tz + 1) * (ty + 1) * xw * cout * 2
            acc = tz * ty * n * cout * 2
            out2 = 2 * tz * ty * n * cout * 2
            val = tz * ty * n * cout * 4
            if xs2 + acc + out2 + val <= budget and tz * ty > best_vol:
                best, best_vol = (tz, ty), tz * ty
    return best


def _epilogue_kernel(tz, ty, n, co, n_gates, nz, ny, out_dtype,
                     y_hbm, scale_ref, shift_ref, wg_ref, oh_ref,
                     out_ref, xs, acc_ref, sems, relu=True):
    """Phase gather + InstanceNorm affine + LeakyReLU + SE gate(s) in
    one pass over the conv's extended (n+1)^3 output.

    Grid (B, n/tz, n/ty); per step a double-buffered DMA brings the
    (tz+1, ty+1, n+1, 8Co) haloed tile in while the previous tile
    computes. The 8 phase windows are static sublane-shifted slices
    stored into the assembly scratch's lane blocks (the proven pattern
    of _phased_kernel — Mosaic rejects lane-CONCAT of shifted slices,
    but lane-blocked stores are fine). Gates use the padded-N trick:
    sigmoid(e @ wg[.., :128]) has full 128 lanes, and the zero-padded
    one-hot rows drop the sigmoid(0)=0.5 garbage on re-expansion."""
    b = pl.program_id(0)
    zi = pl.program_id(1)
    yi = pl.program_id(2)
    step = (b * nz + zi) * ny + yi
    total = pl.num_programs(0) * nz * ny

    def get_dma(slot, bb, zz, yy):
        return pltpu.make_async_copy(
            y_hbm.at[bb, pl.ds(zz * tz, tz + 1), pl.ds(yy * ty, ty + 1)],
            xs.at[slot],
            sems.at[slot],
        )

    slot = lax.rem(step, 2)
    nxt = step + 1
    b2 = lax.div(nxt, nz * ny)
    r = lax.rem(nxt, nz * ny)
    zi2 = lax.div(r, ny)
    yi2 = lax.rem(r, ny)

    @pl.when(step == 0)
    def _():
        get_dma(0, b, zi, yi).start()

    @pl.when(nxt < total)
    def _():
        get_dma(1 - slot, b2, zi2, yi2).start()

    get_dma(slot, b, zi, yi).wait()

    # assemble the 8 phase windows into lane blocks of the scratch
    for q in range(8):
        az, ay, ax = (q >> 2) & 1, (q >> 1) & 1, q & 1
        acc_ref[:, :, :, q * co : (q + 1) * co] = xs[
            slot, az : az + tz, ay : ay + ty, ax : ax + n,
            q * co : (q + 1) * co,
        ]
    e = acc_ref[...].astype(jnp.float32)
    e = e * scale_ref[0, 0] - shift_ref[0, 0]
    if relu:
        # torch default slope
        e = jnp.where(e >= 0, e, 0.01 * e).astype(out_dtype)
    else:
        e = e.astype(out_dtype)
    for g in range(n_gates):
        logits = lax.dot_general(
            e, wg_ref[g], (((3,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        gate = jax.nn.sigmoid(logits).astype(out_dtype)
        gb = lax.dot_general(
            gate, oh_ref[...], (((3,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(out_dtype)
        e = e * gb
    out_ref[0] = e


def phased_finalize(y_ext, scale8, shift8, wgs, oh):
    """y_ext (B, n+1, n+1, n+1, 8Co) extended phased-conv output ->
    gated activations (B, n, n, n, 8Co).

    scale8/shift8: (B, 8Co) f32, the InstanceNorm affine per
    phase-channel (phase-tiled); wgs (G, 8Co, 128) zero-padded SE
    kernels; oh (128, 8Co) zero-padded per-phase one-hot broadcast."""
    bsz = y_ext.shape[0]
    n = y_ext.shape[1] - 1
    xw = y_ext.shape[3]  # x extent; n+8 when conv-emitted pre-aligned
    cout = y_ext.shape[-1]
    co = cout // 8
    n_gates = wgs.shape[0]
    if xw % 8:
        return None  # unaligned minor spatial dim: Mosaic DMA rejects
    tile = _epi_pick_tile(n, cout)
    if tile is None:
        return None
    tz, ty = tile
    nz, ny = n // tz, n // ty
    kernel = partial(_epilogue_kernel, tz, ty, n, co, n_gates, nz, ny,
                     y_ext.dtype)
    return pl.pallas_call(
        kernel,
        grid=(bsz, nz, ny),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            # per-batch affine rows, sublane-replicated x8 (a (1, C)
            # block has sublane extent 1, which Mosaic rejects)
            pl.BlockSpec((1, 8, cout), lambda b, i, j: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, cout), lambda b, i, j: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_gates, cout, 128), lambda b, i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((128, cout), lambda b, i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, tz, ty, n, cout), lambda b, i, j: (b, i, j, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((bsz, n, n, n, cout), y_ext.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, tz + 1, ty + 1, xw, cout), y_ext.dtype),
            pltpu.VMEM((tz, ty, n, cout), y_ext.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * bsz * n * n * n * cout * 128 * 2 * n_gates,
            bytes_accessed=y_ext.size * 2 * 2,
            transcendentals=bsz * n * n * n * 128,
        ),
        interpret=_use_interpret(),
    )(
        y_ext,
        jnp.tile(scale8[:, None, :], (1, 8, 1)),
        jnp.tile(shift8[:, None, :], (1, 8, 1)),
        wgs,
        oh,
    )


def phased_normalize(y_ext, scale8, shift8):
    """Phase gather + InstanceNorm affine ONLY (no LeakyReLU, no
    gates): y_ext (B, n+1, n+1, xw, 8Co) -> normalized pre-activation
    `a` (B, n, n, n, 8Co) in one haloed streaming pass.

    Built for the manual phased backward (_manual_phased_gated_bwd):
    XLA emits the same gather-normalize as 8 per-phase Co-lane
    slice+convert fusions plus a concat (~50 ms of the round-5 B=8
    128^3 step profile — thin 16/32-lane stores pad 4-8x); this is the
    forward epilogue kernel with the nonlinearity and gate chain
    compiled out. Returns None when no tile fits (caller falls back to
    the XLA composition)."""
    bsz = y_ext.shape[0]
    n = y_ext.shape[1] - 1
    xw = y_ext.shape[3]
    cout = y_ext.shape[-1]
    co = cout // 8
    if xw % 8:
        return None  # unaligned minor spatial dim: Mosaic DMA rejects
    tile = _epi_pick_tile(n, cout)
    if tile is None:
        return None
    tz, ty = tile
    nz, ny = n // tz, n // ty
    kernel = partial(_epilogue_kernel, tz, ty, n, co, 0, nz, ny,
                     y_ext.dtype, relu=False)
    return pl.pallas_call(
        kernel,
        grid=(bsz, nz, ny),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, 8, cout), lambda b, i, j: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, cout), lambda b, i, j: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout, 128), lambda b, i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((128, cout), lambda b, i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, tz, ty, n, cout), lambda b, i, j: (b, i, j, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((bsz, n, n, n, cout), y_ext.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, tz + 1, ty + 1, xw, cout), y_ext.dtype),
            pltpu.VMEM((tz, ty, n, cout), y_ext.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * bsz * n * n * n * cout,
            bytes_accessed=y_ext.size * 2 * 2,
            transcendentals=0,
        ),
        interpret=_use_interpret(),
    )(
        y_ext,
        jnp.tile(scale8[:, None, :], (1, 8, 1)),
        jnp.tile(shift8[:, None, :], (1, 8, 1)),
        jnp.zeros((1, cout, 128), y_ext.dtype),
        jnp.zeros((128, cout), y_ext.dtype),
    )


def _pool_mask_kernel(c, x_ref, o_ref):
    """dx/dg mask of max_pool_s2d in ONE VMEM-local pass: recompute
    the 8-way maximum tree, emit M[p] = (x_p == max) / n_ties as the
    fat 8C-lane tensor. The caller multiplies by the (lane-tiled)
    upstream cotangent — XLA's emission of the same math splits into
    several fusions that re-read x (~40 ms of the round-5 B=8 128^3
    step at the level-1 pool pair vs ~3.5 ms speed-of-light)."""
    # compare in f32: Mosaic has no bf16 cmpf on this target, and the
    # f32 compare of bf16-rounded values is exact either way
    x = x_ref[0].astype(jnp.float32)
    out = x[..., :c]
    for p in range(1, 8):
        out = jnp.maximum(out, x[..., p * c : (p + 1) * c])
    f32 = jnp.float32
    cnt = (x[..., :c] == out).astype(f32)
    for p in range(1, 8):
        cnt = cnt + (x[..., p * c : (p + 1) * c] == out).astype(f32)
    inv = 1.0 / cnt
    for p in range(8):
        eq = x[..., p * c : (p + 1) * c] == out
        o_ref[0, :, :, :, p * c : (p + 1) * c] = jnp.where(
            eq, inv, 0.0
        ).astype(o_ref.dtype)


def max_pool_s2d_bwd_mask(x):
    """(B, n, n, n, 8C) -> M with dx = M * tile8(g); None when no tile
    fits (caller falls back to the XLA composition)."""
    if x.ndim != 5 or x.shape[-1] % 128:
        return None
    b, d, h, w, c8 = x.shape
    c = c8 // 8
    # Mosaic keeps the f32 cast of the block, the 8 compare/select
    # temps and the double-buffered in/out blocks live together on the
    # kernel stack (measured: a (8,8,64,256) bf16 block wanted 35.5M
    # scoped VMEM) — budget ~16x the raw block bytes
    budget = 9 * 1024 * 1024
    tile = None
    for tz in (8, 4, 2, 1):
        for ty in (8, 4, 2, 1):
            if d % tz or h % ty:
                continue
            if 16 * tz * ty * w * c8 * x.dtype.itemsize <= budget:
                tile = (tz, ty)
                break
        if tile:
            break
    if tile is None:
        return None
    tz, ty = tile
    return pl.pallas_call(
        partial(_pool_mask_kernel, c),
        grid=(b, d // tz, h // ty),
        in_specs=[
            pl.BlockSpec((1, tz, ty, w, c8), lambda i, j, k: (i, j, k, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, tz, ty, w, c8), lambda i, j, k: (i, j, k, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        # reuse x's buffer for the mask: x (the pool residual) has its
        # last use here, and a fresh 8C-lane mask allocation put the
        # B=8 128^3 step 121 MB over HBM at compile time
        input_output_aliases={0: 0},
        cost_estimate=pl.CostEstimate(
            flops=16 * x.size,
            bytes_accessed=x.size * x.dtype.itemsize * 2,
            transcendentals=0,
        ),
        interpret=_use_interpret(),
    )(x)


def _gathered_kernel(n_gates, out_dtype, y_ref, scale_ref, shift_ref,
                     *rest):
    """IN affine + LeakyReLU + SE gate(s) on an ALREADY-GATHERED s2d
    tensor (dil-2 grouped convs, dense-lift convs, CATConv pointwise):
    no halo, so Mosaic's automatic block pipelining double-buffers the
    streaming; one read + one write per element."""
    if n_gates:
        wg_ref, oh_ref, out_ref = rest
    else:
        (out_ref,) = rest
    e = y_ref[0].astype(jnp.float32)
    e = e * scale_ref[0, 0] - shift_ref[0, 0]
    e = jnp.where(e >= 0, e, 0.01 * e).astype(out_dtype)
    for g in range(n_gates):
        logits = lax.dot_general(
            e, wg_ref[g], (((3,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        gate = jax.nn.sigmoid(logits).astype(out_dtype)
        gb = lax.dot_general(
            gate, oh_ref[...], (((3,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(out_dtype)
        e = e * gb
    out_ref[0] = e


def _gathered_pick_tile(n: int, c: int) -> tuple[int, int] | None:
    budget = 9 * 1024 * 1024
    best, best_vol = None, 0
    for tz in (4, 8, 16):
        for ty in (4, 8, 16):
            if n % tz or n % ty:
                continue
            s = tz * ty * n * c
            if 8 * s + 4 * s <= budget and tz * ty > best_vol:
                best, best_vol = (tz, ty), tz * ty
    return best


def gated_norm_finalize(y, scale8, shift8, wgs, oh):
    """y (B, n, n, n, C) s2d conv output -> IN+LeakyReLU+SE gates in
    one streamed Pallas pass. wgs/oh as in phased_finalize; wgs may
    have 0 gates (CATConv blocks). Returns None when the shape misses
    Mosaic's tiling constraints (callers fall back to XLA)."""
    bsz, n = y.shape[0], y.shape[1]
    c = y.shape[-1]
    n_gates = int(wgs.shape[0]) if wgs is not None else 0
    if c % 128 or n % 8:
        return None
    tile = _gathered_pick_tile(n, c)
    if tile is None:
        return None
    tz, ty = tile
    kernel = partial(_gathered_kernel, n_gates, y.dtype)
    in_specs = [
        pl.BlockSpec((1, tz, ty, n, c), lambda b, i, j: (b, i, j, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 8, c), lambda b, i, j: (b, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 8, c), lambda b, i, j: (b, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [
        y,
        jnp.tile(scale8[:, None, :], (1, 8, 1)),
        jnp.tile(shift8[:, None, :], (1, 8, 1)),
    ]
    if n_gates:
        in_specs += [
            pl.BlockSpec((n_gates, c, 128), lambda b, i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((128, c), lambda b, i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ]
        args += [wgs, oh]
    return pl.pallas_call(
        kernel,
        grid=(bsz, n // tz, n // ty),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, tz, ty, n, c), lambda b, i, j: (b, i, j, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(y.shape, y.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * y.size * 128 * 2 * max(n_gates, 1),
            bytes_accessed=y.size * 2 * 2,
            transcendentals=y.size // 8 * max(n_gates, 1),
        ),
        interpret=_use_interpret(),
    )(*args)


def _xla_gated_norm_composition(y, wgs, oh):
    """Pure-XLA reference/backward of the gathered epilogue."""
    from .norms import leaky_relu
    from .s2d import HP, instance_norm_s2d

    e = leaky_relu(instance_norm_s2d(y))
    n_gates = int(wgs.shape[0]) if wgs is not None else 0
    for g in range(n_gates):
        gate = jax.nn.sigmoid(
            jnp.einsum("...i,ip->...p", e, wgs[g, :, :8].astype(e.dtype),
                       precision=HP)
        )
        e = e * jnp.einsum("...p,pj->...j", gate, oh[:8].astype(e.dtype),
                           precision=HP)
    return e


def _pallas_gated_norm_forward(y, wgs, oh, eps=1e-5):
    b = y.shape[0]
    c8 = y.shape[-1]
    c = c8 // 8
    nvox = y.shape[1] * y.shape[2] * y.shape[3] * 8
    yf32 = y.astype(jnp.float32)
    s1 = jnp.sum(yf32, axis=(1, 2, 3))  # (B, 8c)
    s2 = jnp.sum(jnp.square(yf32), axis=(1, 2, 3))
    mean = jnp.sum(s1.reshape(b, 8, c), axis=1) / nvox
    ex2 = jnp.sum(s2.reshape(b, 8, c), axis=1) / nvox
    var = jnp.maximum(ex2 - jnp.square(mean), 0.0)
    scale = lax.rsqrt(var + eps)
    scale8 = jnp.tile(scale, (1, 8))
    shift8 = jnp.tile(mean * scale, (1, 8))
    out = gated_norm_finalize(y, scale8, shift8, wgs, oh)
    if out is None:
        return _xla_gated_norm_composition(y, wgs, oh)
    return out


@jax.custom_vjp
def gated_norm_block(y, wgs, oh):
    """Fused gathered-s2d epilogue: InstanceNorm + LeakyReLU + SE
    gate(s) as one Pallas streaming pass (2 HBM passes total incl.
    the XLA stats reduce, vs XLA's ~4). Backward = XLA composition."""
    return _pallas_gated_norm_forward(y, wgs, oh)


def _gn_fwd(y, wgs, oh):
    return _pallas_gated_norm_forward(y, wgs, oh), (y, wgs, oh)


def _gn_bwd(res, ct):
    y, wgs, oh = res
    if manbwd_enabled():
        return _gated_core_bwd(y, wgs, oh, ct, bm=False)
    _, vjp = jax.vjp(_xla_gated_norm_composition, y, wgs, oh)
    return vjp(ct)


gated_norm_block.defvjp(_gn_fwd, _gn_bwd)


def _xla_gated_composition(xs, w_all, b_all, wgs, oh):
    """Pure-XLA math of the gated phased block (conv + IN + LeakyReLU
    + SE gates) — the backward path and the CPU/test reference. The
    padded gate weights carry the exact unpadded kernels in their
    first 8 gate lanes / rows."""
    from .s2d import HP, conv3_s2d_phased_fused

    e = conv3_s2d_phased_fused(list(xs), w_all, b_all)
    for g in range(wgs.shape[0]):
        gate = jax.nn.sigmoid(
            jnp.einsum("...i,ip->...p", e, wgs[g, :, :8].astype(e.dtype),
                       precision=HP)
        )
        e = e * jnp.einsum("...p,pj->...j", gate, oh[:8].astype(e.dtype),
                           precision=HP)
    return e


def _xla_gated_composition_fatbwd(xs, w_all, b_all, wgs, oh):
    """Same math as _xla_gated_composition, structured gather-FIRST:
    the conv's phase slices concat into the fat (…, 8Co) tensor BEFORE
    InstanceNorm/LeakyReLU/SE, so the autodiff backward of those ops
    stays in 8Co lanes. The per-slice form (conv3_s2d_phased_fused)
    normalizes inside the concat — one pass cheaper FORWARD, but its
    backward materializes 8 thin Co-lane tensors per block, which the
    (8,128) lane tiling pads 4-8x (~60 ms of the round-4 step
    profile's elementwise fusions). MEASURED: routing the phased
    custom_vjp backwards through this form OOMs HBM at B=8 128^3 —
    the gathered fat tensor becomes a saved residual that outweighs
    the thin-lane padding it removes. Kept as the record + for
    smaller-crop configs; equals the per-slice form up to f32
    reassociation of the channel sums."""
    from itertools import product as _product

    from .conv import conv3d
    from .norms import leaky_relu
    from .s2d import HP, instance_norm_s2d

    xs = list(xs)
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
    e = jnp.concatenate(
        [y[:, a : a + n, bb : bb + n, c : c + n, q * co : (q + 1) * co]
         for q, (a, bb, c) in enumerate(_product(range(2), repeat=3))],
        axis=-1,
    )
    e = leaky_relu(instance_norm_s2d(e))
    for g in range(wgs.shape[0]):
        gate = jax.nn.sigmoid(
            jnp.einsum("...i,ip->...p", e, wgs[g, :, :8].astype(e.dtype),
                       precision=HP)
        )
        e = e * jnp.einsum("...p,pj->...j", gate, oh[:8].astype(e.dtype),
                           precision=HP)
    return e


def _pallas_gated_forward(xs, w_all, b_all, wgs, oh, eps=1e-5):
    """XLA conv (list partial sums) + XLA window stats + Pallas fused
    epilogue. Falls back to the full XLA composition when no tile
    fits."""
    from itertools import product as _product

    from .conv import conv3d

    xs = list(xs)
    co = w_all.shape[-1] // 8
    n = xs[0].shape[1]
    # x-axis right-pad to 8: the conv emits an (n+1+7)-wide x extent so
    # the kernel's HBM DMA reads a full (8-aligned) minor-most spatial
    # dim — Mosaic rejects 65-wide slices of a 72-padded memref. Costs
    # ~1% extra conv FLOPs on zeros; saves a full-tensor XLA pad pass.
    pad = ((1, 1), (1, 1), (1, 8))
    y = None
    off = 0
    for t in xs:
        k = t.shape[-1]
        yt = conv3d(t, w_all[:, :, :, off : off + k, :],
                    b_all if y is None else None, padding=pad)
        y = yt if y is None else y + yt
        off += k
    # Border-corrected window stats: 8 shifted-slice reduces force XLA
    # to materialize a full gathered 6-D intermediate in a hostile
    # layout (profiled 36 ms/batch at dc5 scale). Instead reduce the
    # whole (n+1)^3 extent ONCE (dense, HBM-speed) and subtract the
    # boundary slabs each phase window excludes via inclusion-
    # exclusion — planes/edges/corners are O(1/n) of the volume.
    f32 = jnp.float32
    # n>=48: border-corrected dense stats (below) win by avoiding the
    # materialized 6-D gather XLA builds for the 8 shifted-slice
    # reduces; at small n the 26 tiny correction reduces cost more
    # than they save (A/B: dc6 -2.5 ms, dc5 -3.5 ms, ec4 +4.5 ms).
    mode = os.environ.get("EPI_STATS") or ("border" if n >= 48 else "slice")
    if mode == "slice":
        s1, s2 = 0.0, 0.0
        for q, (a, bb, c) in enumerate(_product(range(2), repeat=3)):
            sl = y[:, a : a + n, bb : bb + n, c : c + n,
                   q * co : (q + 1) * co]
            s1 = s1 + jnp.sum(sl, axis=(1, 2, 3), dtype=f32)
            s2 = s2 + jnp.sum(jnp.square(sl.astype(f32)), axis=(1, 2, 3))
        return _finish_phased(y, s1, s2, n, wgs, oh, xs, w_all, b_all, eps)
    yb = y[:, :, :, : n + 1]  # drop the x alignment pad (bias-nonzero)

    def _sums(t, axes):
        return (jnp.sum(t, axis=axes, dtype=f32),
                jnp.sum(jnp.square(t.astype(f32)), axis=axes))

    F = _sums(yb, (1, 2, 3))
    Pz = {k: _sums(yb[:, k], (1, 2)) for k in (0, n)}
    Py = {k: _sums(yb[:, :, k], (1, 2)) for k in (0, n)}
    Px = {k: _sums(yb[:, :, :, k], (1, 2)) for k in (0, n)}
    Ezy = {(i, j): _sums(yb[:, i, j], (1,)) for i in (0, n) for j in (0, n)}
    Ezx = {(i, j): _sums(yb[:, i, :, j], (1,))
           for i in (0, n) for j in (0, n)}
    Eyx = {(i, j): _sums(yb[:, :, i, j], (1,))
           for i in (0, n) for j in (0, n)}
    Cr = {(i, j, k): (yb[:, i, j, k].astype(f32),
                      jnp.square(yb[:, i, j, k].astype(f32)))
          for i in (0, n) for j in (0, n) for k in (0, n)}
    s1, s2 = 0.0, 0.0
    for q, (a, bb, c) in enumerate(_product(range(2), repeat=3)):
        # phase window [a:a+n) excludes plane z=n when a==0, z=0 when a==1
        kz, ky, kx = (0 if a else n), (0 if bb else n), (0 if c else n)
        sl = slice(q * co, (q + 1) * co)
        for acc_i in (0, 1):
            w = (F[acc_i] - Pz[kz][acc_i] - Py[ky][acc_i] - Px[kx][acc_i]
                 + Ezy[(kz, ky)][acc_i] + Ezx[(kz, kx)][acc_i]
                 + Eyx[(ky, kx)][acc_i] - Cr[(kz, ky, kx)][acc_i])
            if acc_i == 0:
                s1 = s1 + w[:, sl]
            else:
                s2 = s2 + w[:, sl]
    return _finish_phased(y, s1, s2, n, wgs, oh, xs, w_all, b_all, eps)


def _finish_phased(y, s1, s2, n, wgs, oh, xs, w_all, b_all, eps):
    nvox = 8 * n * n * n
    mean = s1 / nvox  # (B, Co) per ORIGINAL channel (phases share)
    var = jnp.maximum(s2 / nvox - jnp.square(mean), 0.0)
    scale = lax.rsqrt(var + eps)
    scale8 = jnp.tile(scale, (1, 8))
    shift8 = jnp.tile(mean * scale, (1, 8))
    out = phased_finalize(y, scale8, shift8, wgs, oh)
    if out is None:
        return _xla_gated_composition(tuple(xs), w_all, b_all, wgs, oh)
    return out


@jax.custom_vjp
def phased_gated_block(xs, w_all, b_all, wgs, oh):
    """Fused phased s2d conv block: conv (XLA, MXU-hot) + phase
    gather + InstanceNorm + LeakyReLU + SE gate(s) as ONE Pallas
    epilogue pass (vs XLA's ~5 full-tensor round trips). `xs` is a
    tuple of s2d tensors forming a plain concat. Backward = exact XLA
    composition."""
    return _pallas_gated_forward(xs, w_all, b_all, wgs, oh)


def _gated_fwd(xs, w_all, b_all, wgs, oh):
    return _pallas_gated_forward(xs, w_all, b_all, wgs, oh), (
        xs, w_all, b_all, wgs, oh)


def _gated_bwd(res, ct):
    if manbwd_enabled():
        return _manual_phased_gated_bwd(res, ct)
    xs, w_all, b_all, wgs, oh = res
    _, vjp = jax.vjp(_xla_gated_composition, xs, w_all, b_all, wgs, oh)
    return vjp(ct)


phased_gated_block.defvjp(_gated_fwd, _gated_bwd)


def _xla_composition(x, w_all, b_all):
    """Reference XLA math for the backward pass: pad-1 conv with the
    (2,2,2) phase-stacked kernel, 8-way shifted slice + concat, stats."""
    from .conv import conv3d

    n = x.shape[1]
    cout = w_all.shape[2]
    co = cout // 8
    w = w_all.reshape(2, 2, 2, *w_all.shape[1:])
    y_full = conv3d(x, w, b_all, padding=1)
    outs = []
    for q in range(8):
        a, bq, c = (q >> 2) & 1, (q >> 1) & 1, q & 1
        outs.append(
            y_full[:, a : a + n, bq : bq + n, c : c + n,
                   q * co : (q + 1) * co]
        )
    y = jnp.concatenate(outs, axis=-1)
    yf = y.astype(jnp.float32)
    s1 = jnp.sum(yf, axis=(1, 2, 3))
    s2 = jnp.sum(jnp.square(yf), axis=(1, 2, 3))
    return y, s1, s2


@jax.custom_vjp
def phased_conv_stats(x, w_all, b_all):
    """Fused phased s2d conv + per-channel (sum, sum-of-squares).

    Forward runs the Pallas kernel; gradients come from the exact XLA
    composition (same math up to f32-vs-bf16 accumulation of the
    statistics)."""
    return _pallas_forward(x, w_all, b_all)


def _fwd(x, w_all, b_all):
    return _pallas_forward(x, w_all, b_all), (x, w_all, b_all)


def _bwd(res, cts):
    x, w_all, b_all = res
    _, vjp = jax.vjp(_xla_composition, x, w_all, b_all)
    return vjp(tuple(cts))


phased_conv_stats.defvjp(_fwd, _bwd)


# -------------- batch-minor (D, H, W, B, C) epilogue ---------------
#
# In batch-minor layout the trailing (B, C8) dims are exactly one
# (sublane, lane) Mosaic tile when B == 8, so spatial z/y tiling is
# free of every alignment constraint the batch-major kernels had to
# dodge: blocks are (tz, ty, w, B, C8) with automatic double-buffered
# pipelining, and the SE gate matmuls run on (tz, ty, w*B, C8) rows.


def _gathered_pick_tile_bm(d: int, h: int, w: int, b: int,
                           c8: int) -> tuple[int, int] | None:
    budget = 9 * 1024 * 1024
    best, best_vol = None, 0
    for tz in (1, 2, 4, 8, 16):
        for ty in (1, 2, 4, 8, 16):
            if d % tz or h % ty:
                continue
            s = tz * ty * w * b * c8
            if 8 * s + 4 * s <= budget and tz * ty > best_vol:
                best, best_vol = (tz, ty), tz * ty
    return best


def _gathered_kernel_bm(n_gates, out_dtype, y_ref, scale_ref, shift_ref,
                        *rest):
    """IN affine + LeakyReLU + SE gate(s) on a batch-minor gathered
    s2d tensor; one read + one write per element (no halo)."""
    if n_gates:
        wg_ref, oh_ref, out_ref = rest
    else:
        (out_ref,) = rest
    e = y_ref[...].astype(jnp.float32)
    e = e * scale_ref[...] - shift_ref[...]
    e = jnp.where(e >= 0, e, 0.01 * e).astype(out_dtype)
    if n_gates:
        tz, ty, w, b, c8 = e.shape
        e = e.reshape(tz, ty, w * b, c8)
        for g in range(n_gates):
            logits = lax.dot_general(
                e, wg_ref[g], (((3,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            gate = jax.nn.sigmoid(logits).astype(out_dtype)
            gb = lax.dot_general(
                gate, oh_ref[...], (((3,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(out_dtype)
            e = e * gb
        e = e.reshape(tz, ty, w, b, c8)
    out_ref[...] = e


def gated_norm_finalize_bm(y, scale8, shift8, wgs, oh):
    """y (d, h, w, B, C8) batch-minor s2d conv output -> IN+LeakyReLU
    +SE gates in one streamed Pallas pass. scale8/shift8 are (B, C8)
    f32 phase-tiled affines. Returns None when the shape misses the
    Mosaic constraints (callers fall back to the XLA composition)."""
    d, h, w, b, c8 = y.shape
    n_gates = int(wgs.shape[0]) if wgs is not None else 0
    if c8 % 128 or b % 8:
        return None
    tile = _gathered_pick_tile_bm(d, h, w, b, c8)
    if tile is None:
        return None
    tz, ty = tile
    kernel = partial(_gathered_kernel_bm, n_gates, y.dtype)
    in_specs = [
        pl.BlockSpec((tz, ty, w, b, c8), lambda i, j: (i, j, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((b, c8), lambda i, j: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((b, c8), lambda i, j: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [y, scale8, shift8]
    if n_gates:
        in_specs += [
            pl.BlockSpec((n_gates, c8, 128), lambda i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((128, c8), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ]
        args += [wgs, oh]
    return pl.pallas_call(
        kernel,
        grid=(d // tz, h // ty),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (tz, ty, w, b, c8), lambda i, j: (i, j, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(y.shape, y.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * y.size * 128 * 2 * max(n_gates, 1),
            bytes_accessed=y.size * 2 * 2,
            transcendentals=y.size // 8 * max(n_gates, 1),
        ),
        interpret=_use_interpret(),
    )(*args)


def _xla_gated_norm_composition_bm(y, wgs, oh):
    """Pure-XLA reference/backward of the batch-minor epilogue."""
    from .norms import leaky_relu
    from .s2d import HP, instance_norm_s2d_bm

    e = leaky_relu(instance_norm_s2d_bm(y))
    n_gates = int(wgs.shape[0]) if wgs is not None else 0
    for g in range(n_gates):
        gate = jax.nn.sigmoid(
            jnp.einsum("...i,ip->...p", e, wgs[g, :, :8].astype(e.dtype),
                       precision=HP)
        )
        e = e * jnp.einsum("...p,pj->...j", gate, oh[:8].astype(e.dtype),
                           precision=HP)
    return e


def _pallas_gated_norm_forward_bm(y, wgs, oh, eps=1e-5):
    d, h, w, b, c8 = y.shape
    c = c8 // 8
    nvox = d * h * w * 8
    yf32 = y.astype(jnp.float32)
    s1 = jnp.sum(yf32, axis=(0, 1, 2))  # (B, C8)
    s2 = jnp.sum(jnp.square(yf32), axis=(0, 1, 2))
    mean = jnp.sum(s1.reshape(b, 8, c), axis=1) / nvox
    ex2 = jnp.sum(s2.reshape(b, 8, c), axis=1) / nvox
    var = jnp.maximum(ex2 - jnp.square(mean), 0.0)
    scale = lax.rsqrt(var + eps)
    scale8 = jnp.tile(scale, (1, 8))
    shift8 = jnp.tile(mean * scale, (1, 8))
    out = gated_norm_finalize_bm(y, scale8, shift8, wgs, oh)
    if out is None:
        return _xla_gated_norm_composition_bm(y, wgs, oh)
    return out


@jax.custom_vjp
def gated_norm_block_bm(y, wgs, oh):
    """Fused batch-minor gathered-s2d epilogue: InstanceNorm +
    LeakyReLU + SE gate(s) as one Pallas streaming pass. Backward =
    XLA composition (exact same math)."""
    return _pallas_gated_norm_forward_bm(y, wgs, oh)


def _gnbm_fwd(y, wgs, oh):
    return _pallas_gated_norm_forward_bm(y, wgs, oh), (y, wgs, oh)


def _gnbm_bwd(res, ct):
    y, wgs, oh = res
    if manbwd_enabled():
        return _gated_core_bwd(y, wgs, oh, ct, bm=True)
    _, vjp = jax.vjp(_xla_gated_norm_composition_bm, y, wgs, oh)
    return vjp(ct)


gated_norm_block_bm.defvjp(_gnbm_fwd, _gnbm_bwd)


def _xla_phased_gated_composition_bm(xs, w_all, b_all, wgs, oh):
    """Pure-XLA math of the batch-minor gated phased block (backward
    path and CPU/test reference)."""
    from .s2d import HP, conv3_s2d_phased_fused_bm

    e = conv3_s2d_phased_fused_bm(list(xs), w_all, b_all)
    for g in range(int(wgs.shape[0])):
        gate = jax.nn.sigmoid(
            jnp.einsum("...i,ip->...p", e, wgs[g, :, :8].astype(e.dtype),
                       precision=HP)
        )
        e = e * jnp.einsum("...p,pj->...j", gate, oh[:8].astype(e.dtype),
                           precision=HP)
    return e


def _phased_gated_forward_bm(xs, w_all, b_all, wgs, oh, eps=1e-5):
    """Batch-minor phased block: conv on XLA's MXU-hot emitter, phase
    gather + statistics as one XLA fusion, and the normalize + LeakyReLU
    + SE gates as the streamed Pallas pass (1R+1W)."""
    from .conv import conv3d
    from itertools import product as _product

    xs = list(xs)
    co = w_all.shape[-1] // 8
    n = xs[0].shape[0]
    b = xs[0].shape[3]
    y_ext = None
    if os.environ.get("PALLAS_PCONV_BM", "1") == "1":
        # double-buffered Pallas conv to the ungathered output; None
        # when the shape misses the VMEM budget (e.g. dc3's 1024
        # input lanes) -> keep the XLA conv
        y_ext = phased_conv_ext_bm(xs, w_all, b_all)
    if y_ext is None:
        off = 0
        for t in xs:
            k = t.shape[-1]
            yt = conv3d(t, w_all[:, :, :, off : off + k, :],
                        b_all if y_ext is None else None, padding=1,
                        batch_minor=True)
            y_ext = yt if y_ext is None else y_ext + yt
            off += k
    # y_ext: (n+1, n+1, n+1, B, 8Co). Statistics from the phase slices
    # (one fused XLA read pass over y_ext — the gathered y is NOT
    # built unless the direct finalize can't run).
    slices, s1, s2 = [], 0.0, 0.0
    for q, (a, bb, c) in enumerate(_product(range(2), repeat=3)):
        sl = y_ext[a : a + n, bb : bb + n, c : c + n, :,
                   q * co : (q + 1) * co]
        slices.append(sl)
        s1 = s1 + jnp.sum(sl, axis=(0, 1, 2), dtype=jnp.float32)
        s2 = s2 + jnp.sum(jnp.square(sl.astype(jnp.float32)), axis=(0, 1, 2))
    nvox = 8 * n * n * n
    mean = s1 / nvox  # (B, Co) per ORIGINAL channel
    var = jnp.maximum(s2 / nvox - jnp.square(mean), 0.0)
    scale = lax.rsqrt(var + eps)
    scale8 = jnp.tile(scale, (1, 8))
    shift8 = jnp.tile(mean * scale, (1, 8))
    if os.environ.get("PALLAS_PFIN_BM", "1") == "1":
        out = phased_finalize_bm(y_ext, scale8, shift8, wgs, oh)
        if out is not None:
            return out
    y = jnp.concatenate(slices, axis=-1)  # (n, n, n, B, 8Co) phase-major
    out = gated_norm_finalize_bm(y, scale8, shift8, wgs, oh)
    if out is None:
        return _xla_phased_gated_composition_bm(xs, w_all, b_all, wgs, oh)
    return out


@jax.custom_vjp
def phased_gated_block_bm(xs, w_all, b_all, wgs, oh):
    """Fused batch-minor phased block epilogue; backward is the exact
    XLA composition."""
    return _phased_gated_forward_bm(xs, w_all, b_all, wgs, oh)


def _pgbm_fwd(xs, w_all, b_all, wgs, oh):
    return (_phased_gated_forward_bm(xs, w_all, b_all, wgs, oh),
            (xs, w_all, b_all, wgs, oh))


def _pgbm_bwd(res, ct):
    # Deliberately NOT routed through _manual_phased_gated_bwd
    # (EPI_MANBWD): that path assumes batch-major s2d xs, while this
    # block's xs are batch-minor — the manual IN-backward's fused
    # stats reductions are written against the batch-major axis order.
    # The bm blocks are off the production train path (EPI_TBM wraps
    # the batch-major kernels instead), so the exact XLA-composition
    # vjp stays the backward here.
    xs, w_all, b_all, wgs, oh = res
    _, vjp = jax.vjp(_xla_phased_gated_composition_bm, xs, w_all, b_all,
                     wgs, oh)
    return vjp(ct)


phased_gated_block_bm.defvjp(_pgbm_fwd, _pgbm_bwd)


# --------- transposed-batch-minor ("tbm") epilogue wrappers ----------
# The TPU conv emitter's preferred physical layout for an s2d tensor
# (B, d, h, w, C8) is {4,0,3,2,1} — byte-identical to the transposed
# (d, h, w, B, C8) tensor in default layout. The plain s2d Pallas
# epilogues force default {4,3,2,1,0} operands/results, so XLA inserts
# full-tensor relayout copies around every call (profiled: ~1.1 s of
# the 1.59 s whole-volume program was relayout copy / copy-done wait).
# These wrappers keep the conv on the fast s2d emitter and hand the
# BATCH-MINOR kernels a jnp.transpose of its output, which layout
# assignment lowers to a bitcast — same kernels, zero relayouts.


def tbm_enabled() -> bool:
    return os.environ.get("EPI_TBM", "1") == "1"


def gated_norm_block_tbm(y, wgs, oh):
    """s2d-interface gathered epilogue routed through the batch-minor
    kernel via transposes (see block comment above)."""
    if y.shape[-1] % 128 or y.shape[0] % 8:
        return gated_norm_block(y, wgs, oh)  # bm kernel can't run
    e = gated_norm_block_bm(jnp.transpose(y, (1, 2, 3, 0, 4)), wgs, oh)
    return jnp.transpose(e, (3, 0, 1, 2, 4))


def whole_dense_enabled() -> bool:
    """EPI_WHOLE_DENSE routes the dense/grouped s2d SSE blocks through
    the whole-block custom_vjp below (trace-time flag, like every
    EPI_*). Off by default until the on-chip A/B decides."""
    return os.environ.get("EPI_WHOLE_DENSE", "0") == "1"


def _dense_gated_forward(x, wb, bb, wgs, oh, groups):
    from .conv import conv3d

    y = conv3d(x, wb, bb, padding=1, groups=groups)
    return pick_gated_norm_block(False)(y, wgs, oh)


@partial(jax.custom_vjp, nondiff_argnums=(5,))
def dense_gated_block(x, wb, bb, wgs, oh, groups=1):
    """Whole-block dense/grouped s2d SSE block: conv (XLA) + gathered
    epilogue (Pallas, tbm-routed) with INPUT-ONLY vjp residuals.

    Purpose: under cfg.remat the composition (conv + gated_norm_block)
    is wrapped in jax.checkpoint, whose backward REPLAYS the whole
    forward — including the epilogue's full-tensor Pallas pass whose
    result the manual core backward never consumes (it recomputes the
    normalized value from y itself). This block stores only its inputs
    (= the remat boundary values, saved either way), replays just the
    conv, and runs _gated_core_bwd directly — one fewer full-tensor
    pass per block at identical HBM footprint. Pairs with
    REMAT_SKIP_WHOLEBLOCK via _dense_whole in models/se_unet.py."""
    return _dense_gated_forward(x, wb, bb, wgs, oh, groups)


def _dgb_fwd(x, wb, bb, wgs, oh, groups):
    return _dense_gated_forward(x, wb, bb, wgs, oh, groups), (
        x, wb, bb, wgs, oh)


def _dgb_bwd(groups, res, ct):
    from .conv import conv3d

    x, wb, bb, wgs, oh = res
    y, vjp = jax.vjp(
        lambda x_, w_, b_: conv3d(x_, w_, b_, padding=1, groups=groups),
        x, wb, bb)
    if manbwd_enabled():
        dy, dwgs, doh = _gated_core_bwd(y, wgs, oh, ct, bm=False)
    else:
        _, evjp = jax.vjp(_xla_gated_norm_composition, y, wgs, oh)
        dy, dwgs, doh = evjp(ct)
    dx, dw, db = vjp(dy)
    return dx, dw, db, dwgs, doh


dense_gated_block.defvjp(_dgb_fwd, _dgb_bwd)


def phase_slice_stats_ie(y, co):
    """Per-original-channel InstanceNorm sums of the 8 phase slices of
    a phased conv's EXT output, via inclusion-exclusion on boundary
    planes instead of 8 full-tensor slice reductions.

    `y` is the batch-major ext output (B, m, m, m, 8co), m = n+1; the
    phase-q slice is y[:, a:a+n, b:b+n, c:c+n, q*co:(q+1)*co] with
    (a, b, c) the bits of q. Each slice's sum equals the FULL sum minus
    the one excluded plane per axis, with edge/corner correction terms
    (inclusion-exclusion). The full (B, 8co) reductions consume the
    conv output directly, so XLA fuses them into the conv fusion
    itself (measured: the ec3 dense conv+stats emit as ONE fusion);
    the correction terms read only boundary planes (~5% of the
    tensor). Returns (s1, s2): (B, co) f32 sums over all 8 slices.

    Replaces the 8-slice reduction in _pallas_gated_forward_tbm whose
    separate full-tensor stats fusions cost ~6 ms/batch at the dc5/dc6
    shapes (round-4 profile, fusion.5/.13)."""
    f32 = jnp.float32
    B, m = y.shape[0], y.shape[1]
    n = m - 1

    def _sums(t, axes):
        return (jnp.sum(t, axis=axes, dtype=f32),
                jnp.sum(jnp.square(t.astype(f32)), axis=axes))

    s1f, s2f = _sums(y, (1, 2, 3))  # (B, 8co) — fuses into the conv
    # boundary planes at index 0 and n per spatial axis -> (B, 8co)
    planes = {}
    for ax in (1, 2, 3):
        for idx in (0, n):
            planes[(ax, idx)] = _sums(
                lax.index_in_dim(y, idx, ax, keepdims=False), (1, 2)
            )
    # edges: two axes pinned -> (B, 8co)
    edges = {}
    for ax1, ax2 in ((1, 2), (1, 3), (2, 3)):
        for i1 in (0, n):
            for i2 in (0, n):
                t = lax.index_in_dim(y, i1, ax1, keepdims=False)
                t = lax.index_in_dim(t, i2, ax2 - 1, keepdims=False)
                edges[(ax1, i1, ax2, i2)] = _sums(t, (1,))
    # corners -> (B, 8co)
    corners = {}
    for iz in (0, n):
        for iy in (0, n):
            for ix in (0, n):
                t = y[:, iz, iy, ix, :]
                corners[(iz, iy, ix)] = (
                    t.astype(f32), jnp.square(t.astype(f32))
                )

    s1 = jnp.zeros((B, co), f32)
    s2 = jnp.zeros((B, co), f32)
    from itertools import product as _product

    for q, (a, bb, c) in enumerate(_product(range(2), repeat=3)):
        # excluded boundary index per axis: the end NOT covered
        ez, ey, ex = (n if a == 0 else 0), (n if bb == 0 else 0), \
            (n if c == 0 else 0)
        sl = slice(q * co, (q + 1) * co)
        for k, (full, pz, py, px, ezy, ezx, eyx, crn) in enumerate(
            zip(
                (s1f, s2f),
                planes[(1, ez)], planes[(2, ey)], planes[(3, ex)],
                edges[(1, ez, 2, ey)], edges[(1, ez, 3, ex)],
                edges[(2, ey, 3, ex)], corners[(ez, ey, ex)],
            )
        ):
            corr = (full - pz - py - px + ezy + ezx + eyx - crn)[:, sl]
            if k == 0:
                s1 = s1 + corr
            else:
                s2 = s2 + corr
    return s1, s2


def _pallas_gated_forward_tbm(xs, w_all, b_all, wgs, oh, eps=1e-5):
    """Phased block: conv (list partial sums) on the fast s2d emitter,
    then phase-slice stats + streamed finalize in batch-minor view."""
    from itertools import product as _product

    from .conv import conv3d

    xs = list(xs)
    # bm kernels slice sublane-dim blocks: need the batch (sublane
    # under the transposed view) 8-aligned — B=2 entry shapes trip
    # Mosaic's (2,1) bf16 tiling otherwise
    if xs[0].shape[0] % 8 or (w_all.shape[-1] % 128):
        return _pallas_gated_forward(tuple(xs), w_all, b_all, wgs, oh)
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
    # (B, n+1, n+1, n+1, 8co) -> bm view; bitcast under {4,0,3,2,1}
    y_bm = jnp.transpose(y, (1, 2, 3, 0, 4))
    # phase-slice stats via inclusion-exclusion on the batch-MAJOR
    # tensor: the full-tensor reductions fuse into the conv fusion
    # itself, the corrections read only boundary planes (~5%) — vs
    # the direct 8-slice reduction's separate full-tensor stats pass
    # (~6 ms/batch at dc5/dc6, round-4 profile fusion.5/.13)
    s1, s2 = phase_slice_stats_ie(y, co)
    nvox = 8 * n * n * n
    mean = s1 / nvox  # (B, Co) per ORIGINAL channel (phases share)
    var = jnp.maximum(s2 / nvox - jnp.square(mean), 0.0)
    scale = lax.rsqrt(var + eps)
    scale8 = jnp.tile(scale, (1, 8))
    shift8 = jnp.tile(mean * scale, (1, 8))
    out = phased_finalize_bm(y_bm, scale8, shift8, wgs, oh)
    if out is None:
        yg = jnp.concatenate(
            [y_bm[a : a + n, bb : bb + n, c : c + n, :,
                  q * co : (q + 1) * co]
             for q, (a, bb, c) in enumerate(_product(range(2), repeat=3))],
            axis=-1,
        )
        out = gated_norm_finalize_bm(yg, scale8, shift8, wgs, oh)
    if out is None:
        return _xla_gated_composition(tuple(xs), w_all, b_all, wgs, oh)
    return jnp.transpose(out, (3, 0, 1, 2, 4))


@jax.custom_vjp
def phased_gated_block_tbm(xs, w_all, b_all, wgs, oh):
    """Fused phased s2d block with the batch-minor epilogue behind
    transposes; backward is the exact s2d XLA composition."""
    return _pallas_gated_forward_tbm(xs, w_all, b_all, wgs, oh)


def _pgtbm_fwd(xs, w_all, b_all, wgs, oh):
    return (_pallas_gated_forward_tbm(xs, w_all, b_all, wgs, oh),
            (xs, w_all, b_all, wgs, oh))


def _pgtbm_bwd(res, ct):
    if manbwd_enabled():
        return _manual_phased_gated_bwd(res, ct)
    xs, w_all, b_all, wgs, oh = res
    _, vjp = jax.vjp(_xla_gated_composition, xs, w_all, b_all, wgs, oh)
    return vjp(ct)


phased_gated_block_tbm.defvjp(_pgtbm_fwd, _pgtbm_bwd)


def pick_gated_norm_block(bm: bool):
    if bm:
        return gated_norm_block_bm
    return gated_norm_block_tbm if tbm_enabled() else gated_norm_block


def pick_phased_gated_block():
    """Non-bm callers only (bm callers pass bm-layout xs)."""
    return phased_gated_block_tbm if tbm_enabled() else phased_gated_block


# ------------- batch-minor fused dilation-2 conv + stats -------------
#
# The dil-2 s2d blocks (ec3/ec5/ec6, reference SE_UNet.py:36-63 with
# dilation=2 at 128^3/64^3) are the model's worst MXU citizens under
# XLA: the grouped-conv emitter pads each 16-64 lane group to 128
# (4-8x wasted columns), and the block-diagonal dense rewrite runs the
# 8x-FLOP kernel at only ~40-47% of peak, plus a separate full-tensor
# statistics read. This kernel runs the SAME block-diagonal dense
# matmuls (full 128-wide lanes, structural zeros accepted) but at MXU
# rates, with
#   * cross-grid-step double-buffered HBM->VMEM DMA of the haloed
#     input tiles (the round-2 conv kernels serialized start();wait()
#     inside each step — ~16 us of dead time per step at the model's
#     shapes, the reason they lost to XLA);
#   * the 27 taps as 27 accumulating (M, C8) @ (C8, Cblk) MXU calls
#     with weights VMEM-resident (an optional output-channel split
#     keeps each resident slice under the scoped-VMEM budget);
#   * InstanceNorm statistics accumulated across steps into (B, C8o)
#     outputs, so the XLA stats pass over y disappears.
# In batch-minor layout the (B, C) minor dims are whole Mosaic tiles,
# the DMA slices only the two outermost dims (always legal), and the
# tap shifts are row-granular static slices.


def _dil2_bm_pick(d, h, nx, b, c8, c8o, itemsize):
    """(tz, ty, ncb) for the bm dil-2 kernel, or None. Prefers the
    fewest grid steps whose scratch fits the ~10.8 MB practical scoped
    budget (see ROADMAP: 'exceeded 16M vmem' calibration)."""
    budget = int(10.8 * 1024 * 1024)
    best = None
    for ncb in (1, 2, 4):
        if c8o % (ncb * 128):
            continue
        cblk = c8o // ncb
        for tz in (8, 4, 2, 1):
            for ty in (8, 4, 2, 1):
                if d % tz or h % ty:
                    continue
                xs = 2 * (tz + 2) * (ty + 2) * (nx + 2) * b * c8 * itemsize
                acc = tz * ty * nx * b * cblk * 4
                wd = 27 * c8 * cblk * itemsize
                out = 2 * tz * ty * nx * b * cblk * itemsize
                if xs + acc + wd + out > budget:
                    continue
                steps = ncb * (d // tz) * (h // ty)
                if best is None or steps < best[0]:
                    best = (steps, tz, ty, ncb)
    return None if best is None else best[1:]


def _dil2_kernel_bm(tz, ty, nx, ncb, out_dtype,
                    x_hbm, w_ref, b_ref, y_ref, s1_ref, s2_ref,
                    xs, acc, sem):
    nc = pl.program_id(0)
    zi = pl.program_id(1)
    yi = pl.program_id(2)
    nz = pl.num_programs(1)
    ny = pl.num_programs(2)
    step = (nc * nz + zi) * ny + yi
    total = ncb * nz * ny
    slot = lax.rem(step, 2)

    def dma(s_idx, z, y_):
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(z * tz, tz + 2), pl.ds(y_ * ty, ty + 2)],
            xs.at[s_idx],
            sem.at[s_idx],
        )

    @pl.when(step == 0)
    def _():
        dma(0, zi, yi).start()

    nxt = step + 1
    lin = lax.rem(nxt, nz * ny)
    z2 = lin // ny
    y2 = lax.rem(lin, ny)

    @pl.when(nxt < total)
    def _():
        dma(lax.rem(nxt, 2), z2, y2).start()

    dma(slot, zi, yi).wait()

    from itertools import product as _product

    for t, (dz, dy, dx) in enumerate(_product(range(3), repeat=3)):
        sl = xs[slot, dz : dz + tz, dy : dy + ty, dx : dx + nx]
        part = lax.dot_general(
            sl, w_ref[t], (((4,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if t == 0:
            acc[...] = part + b_ref[0].astype(jnp.float32)
        else:
            acc[...] += part

    y_ref[...] = acc[...].astype(out_dtype)
    p1 = jnp.sum(acc[...], axis=(0, 1, 2))
    p2 = jnp.sum(jnp.square(acc[...]), axis=(0, 1, 2))

    @pl.when(jnp.logical_and(zi == 0, yi == 0))
    def _():
        s1_ref[...] = jnp.zeros_like(s1_ref)
        s2_ref[...] = jnp.zeros_like(s2_ref)

    s1_ref[...] += p1
    s2_ref[...] += p2


def dil2_conv_stats_bm(x, wd, bg):
    """x (d, h, w, B, C8) batch-minor s2d; wd (3,3,3,C8,C8o) the
    block-diagonal dense dil-2 kernel (see s2d.dil2_dense_weight);
    bg (C8o,) tiled bias. Returns (y (d,h,w,B,C8o), s1, s2 (B,C8o)
    f32 sums) or None when no tile fits the Mosaic/VMEM constraints."""
    d, h, nx, b, c8 = x.shape
    c8o = wd.shape[-1]
    if c8 % 128 or c8o % 128:
        return None
    pick = _dil2_bm_pick(d, h, nx, b, c8, c8o, x.dtype.itemsize)
    if pick is None:
        return None
    tz, ty, ncb = pick
    cblk = c8o // ncb
    xpad = jnp.pad(x, ((1, 1), (1, 1), (1, 1), (0, 0), (0, 0)))
    w27 = wd.reshape(27, c8, c8o)
    kernel = partial(_dil2_kernel_bm, tz, ty, nx, ncb, x.dtype)
    y, s1, s2 = pl.pallas_call(
        kernel,
        grid=(ncb, d // tz, h // ty),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((27, c8, cblk), lambda nc, i, j: (0, 0, nc),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cblk), lambda nc, i, j: (0, nc),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tz, ty, nx, b, cblk),
                         lambda nc, i, j: (i, j, 0, 0, nc),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b, cblk), lambda nc, i, j: (0, nc),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b, cblk), lambda nc, i, j: (0, nc),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((d, h, nx, b, c8o), x.dtype),
            jax.ShapeDtypeStruct((b, c8o), jnp.float32),
            jax.ShapeDtypeStruct((b, c8o), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, tz + 2, ty + 2, nx + 2, b, c8), x.dtype),
            pltpu.VMEM((tz, ty, nx, b, cblk), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * 27 * d * h * nx * b * c8 * c8o,
            bytes_accessed=(1 + ncb) * x.size * x.dtype.itemsize
            + d * h * nx * b * c8o * x.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=_use_interpret(),
    )(xpad, w27, bg.astype(jnp.float32)[None])
    return y, s1, s2


def _pfin_bm_pick(m, b, c8o, itemsize):
    """(tz, ty) for the bm phased finalize, or None. Tiles the n = m-1
    output rows; the haloed y_ext read block is (tz+1, ty+1, m)."""
    budget = int(10.5 * 1024 * 1024)
    n = m - 1
    best = None
    for tz in (8, 4, 2, 1):
        for ty in (8, 4, 2, 1):
            if n % tz or n % ty:
                continue
            xs = 2 * (tz + 1) * (ty + 1) * m * b * c8o * itemsize
            acc = tz * ty * n * b * c8o * itemsize
            out = 2 * tz * ty * n * b * c8o * itemsize
            if xs + acc + out > budget:
                continue
            if best is None or tz * ty > best[0]:
                best = (tz * ty, tz, ty)
    return None if best is None else best[1:]


def _pfin_kernel_bm(tz, ty, n, co, n_gates, out_dtype,
                    y_hbm, scale_ref, shift_ref, wg_ref, oh_ref,
                    out_ref, xs, acc_ref, sems):
    """Phase gather + IN affine + LeakyReLU + SE gate(s) in one pass
    over the UNGATHERED batch-minor (n+1)^3 conv output: the gathered
    y tensor never touches HBM. Gather = lane-blocked stores of
    row-shifted slices (the proven _epilogue_kernel pattern; shifts
    are on leading dims in bm, far from the sublane constraints)."""
    zi = pl.program_id(0)
    yi = pl.program_id(1)
    ny = pl.num_programs(1)
    step = zi * ny + yi
    total = pl.num_programs(0) * ny
    slot = lax.rem(step, 2)

    def get_dma(s_idx, zz, yy):
        return pltpu.make_async_copy(
            y_hbm.at[pl.ds(zz * tz, tz + 1), pl.ds(yy * ty, ty + 1)],
            xs.at[s_idx],
            sems.at[s_idx],
        )

    @pl.when(step == 0)
    def _():
        get_dma(0, zi, yi).start()

    nxt = step + 1
    zi2 = nxt // ny
    yi2 = lax.rem(nxt, ny)

    @pl.when(nxt < total)
    def _():
        get_dma(lax.rem(nxt, 2), zi2, yi2).start()

    get_dma(slot, zi, yi).wait()

    for q in range(8):
        az, ay, ax = (q >> 2) & 1, (q >> 1) & 1, q & 1
        acc_ref[:, :, :, :, q * co : (q + 1) * co] = xs[
            slot, az : az + tz, ay : ay + ty, ax : ax + n, :,
            q * co : (q + 1) * co,
        ]
    e = acc_ref[...].astype(jnp.float32)
    e = e * scale_ref[...] - shift_ref[...]
    e = jnp.where(e >= 0, e, 0.01 * e).astype(out_dtype)
    if n_gates:
        sz = e.shape
        e = e.reshape(sz[0], sz[1], sz[2] * sz[3], sz[4])
        for g in range(n_gates):
            logits = lax.dot_general(
                e, wg_ref[g], (((3,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            gate = jax.nn.sigmoid(logits).astype(out_dtype)
            gb = lax.dot_general(
                gate, oh_ref[...], (((3,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(out_dtype)
            e = e * gb
        e = e.reshape(sz)
    out_ref[...] = e


def phased_finalize_bm(y_ext, scale8, shift8, wgs, oh):
    """y_ext (n+1, n+1, n+1, B, 8Co) batch-minor extended phased-conv
    output -> gathered gated activations (n, n, n, B, 8Co) in ONE
    streamed pass (the intermediate gathered y never materializes).
    scale8/shift8 (B, 8Co) f32 phase-tiled affines; wgs/oh as in
    gated_norm_finalize_bm. None when no tile fits."""
    m = y_ext.shape[0]
    b = y_ext.shape[3]
    c8o = y_ext.shape[-1]
    n = m - 1
    co = c8o // 8
    n_gates = int(wgs.shape[0]) if wgs is not None else 0
    if c8o % 128:
        return None
    pick = _pfin_bm_pick(m, b, c8o, y_ext.dtype.itemsize)
    if pick is None:
        return None
    tz, ty = pick
    kernel = partial(_pfin_kernel_bm, tz, ty, n, co, n_gates, y_ext.dtype)
    in_specs = [
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec((b, c8o), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((b, c8o), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
    ]
    args = [y_ext, scale8, shift8]
    if n_gates:
        in_specs += [
            pl.BlockSpec((n_gates, c8o, 128), lambda i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((128, c8o), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ]
        args += [wgs, oh]
    else:
        # keep the kernel arity fixed: zero-size placeholders
        in_specs += [
            pl.BlockSpec((1, c8o, 128), lambda i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((128, c8o), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ]
        args += [jnp.zeros((1, c8o, 128), y_ext.dtype),
                 jnp.zeros((128, c8o), y_ext.dtype)]
    return pl.pallas_call(
        kernel,
        grid=(n // tz, n // ty),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tz, ty, n, b, c8o),
                               lambda i, j: (i, j, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, n, n, b, c8o), y_ext.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, tz + 1, ty + 1, m, b, c8o), y_ext.dtype),
            pltpu.VMEM((tz, ty, n, b, c8o), y_ext.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * n * n * n * b * c8o * 128 * 2 * max(n_gates, 1),
            bytes_accessed=y_ext.size * y_ext.dtype.itemsize * 2,
            transcendentals=n * n * n * b * 128,
        ),
        interpret=_use_interpret(),
    )(*args)


# ----------- batch-minor phased conv (ungathered output) ------------
#
# The phased s2d conv's 2^3 block kernel is the model's main FLOP
# carrier (dc5 alone: 576 GFLOP/tile); XLA runs it at ~58% MXU at the
# dc5 shape. This kernel emits the (n+1)^3 phase-stacked output
# UNGATHERED — each y_ext row is computed exactly once, avoiding the
# (t+1)/t halo-recompute inflation that sank the round-2 in-kernel-
# gather conv — with the same cross-step double-buffered input DMA as
# the dil-2 kernel. The XLA gather+stats fusion and the streamed
# finalize (see _phased_gated_forward_bm) consume y_ext unchanged, so
# the kernel needs no vjp of its own: it sits inside
# phased_gated_block_bm's custom_vjp forward.
#
# Plain-concat inputs stay separate (conv is linear in channels);
# each input's x tile is double-buffered independently. Shapes whose
# tiles cannot fit the scoped-VMEM budget (dc3's 1024 input lanes)
# return None and keep the XLA conv.


def _pconv_bm_pick(m, nx2, b, c8s, c8o, itemsize):
    """(tz, ty, ncb) for the bm phased-conv kernel, or None. m = n+1
    (65/33: divisors are few), nx2 = n+2. Maximizes compute per step
    within the scoped-VMEM budget."""
    budget = int(10.8 * 1024 * 1024)
    divs = [d for d in range(1, m + 1) if m % d == 0 and d <= 16]
    best = None
    for ncb in (1, 2, 4):
        if c8o % (ncb * 128):
            continue
        cblk = c8o // ncb
        for tz in divs:
            for ty in divs:
                xs = sum(2 * (tz + 1) * (ty + 1) * nx2 * b * c * itemsize
                         for c in c8s)
                acc = tz * ty * m * b * cblk * 4
                wd = 8 * sum(c8s) * cblk * itemsize
                out = 2 * tz * ty * m * b * cblk * itemsize
                if xs + acc + wd + out > budget:
                    continue
                work = tz * ty  # per-step rows ~ tz*ty*m*b
                steps = ncb * (m // tz) * (m // ty)
                if best is None or work > best[0] or (
                        work == best[0] and steps < best[1]):
                    best = (work, steps, tz, ty, ncb)
    return None if best is None else best[2:]


def _pconv_est_us(steps, m_rows, k, n_lanes):
    """Crude per-config cost model: MXU at 80% of peak + 2 us/step of
    grid/DMA bookkeeping (calibration target for the TPU probes)."""
    fl = 8 * 2 * m_rows * k * n_lanes
    return steps * (fl / 157e6 + 2.0)


def _pconv_bm_pick_kgrid(m, nx2, b, c8s, c8o, itemsize):
    """(tz, ty, ncb) for the k-grid variant (inputs as an inner grid
    dim, accumulator persists across k), or None. Requires equal
    input widths (weights are stacked along a leading dim)."""
    if len(set(c8s)) != 1:
        return None
    budget = int(10.8 * 1024 * 1024)
    c8 = c8s[0]
    divs = [d for d in range(1, m + 1) if m % d == 0 and d <= 16]
    best = None
    for ncb in (1, 2, 4):
        if c8o % (ncb * 128):
            continue
        cblk = c8o // ncb
        for tz in divs:
            for ty in divs:
                xs = 2 * (tz + 1) * (ty + 1) * nx2 * b * c8 * itemsize
                acc = tz * ty * m * b * cblk * 4
                wd = 2 * 8 * c8 * cblk * itemsize  # double-buffered block
                out = 2 * tz * ty * m * b * cblk * itemsize
                if xs + acc + wd + out > budget:
                    continue
                steps = ncb * (m // tz) * (m // ty) * len(c8s)
                est = _pconv_est_us(steps, tz * ty * m * b, c8, cblk)
                if best is None or est < best[0]:
                    best = (est, tz, ty, ncb)
    return None if best is None else (best[0], best[1:])


def _pconv_kgrid_kernel_bm(tz, ty, m, nx2, ncb, nin, out_dtype, *refs):
    """k-grid phased conv: grid (ncb, z, y, k); the f32 accumulator
    persists across the inner k steps (one input per step), the output
    block is written once at k == nin-1."""
    x_hbms = refs[:nin]
    w_ref = refs[nin]
    b_ref = refs[nin + 1]
    y_ref = refs[nin + 2]
    xs = refs[nin + 3]
    acc = refs[nin + 4]
    sem = refs[nin + 5]

    nc = pl.program_id(0)
    zi = pl.program_id(1)
    yi = pl.program_id(2)
    k = pl.program_id(3)
    nz = pl.num_programs(1)
    ny = pl.num_programs(2)
    step = (((nc * nz) + zi) * ny + yi) * nin + k
    total = ncb * nz * ny * nin
    slot = lax.rem(step, 2)

    def dma(kk, s_idx, z, y_):
        return pltpu.make_async_copy(
            x_hbms[kk].at[pl.ds(z * tz, tz + 1), pl.ds(y_ * ty, ty + 1)],
            xs.at[s_idx],
            sem.at[s_idx],
        )

    @pl.when(step == 0)
    def _():
        dma(0, 0, zi, yi).start()

    nxt = step + 1
    k2 = lax.rem(nxt, nin)
    r2 = lax.rem(nxt // nin, nz * ny)
    z2 = r2 // ny
    y2 = lax.rem(r2, ny)
    for kk in range(nin):
        @pl.when(jnp.logical_and(nxt < total, k2 == kk))
        def _():
            dma(kk, lax.rem(nxt, 2), z2, y2).start()

    # the wait only needs the semaphore+shape; source index irrelevant
    dma(0, slot, zi, yi).wait()

    for s in range(8):
        sz, sy, sx = (s >> 2) & 1, (s >> 1) & 1, s & 1
        sl = xs[slot, sz : sz + tz, sy : sy + ty, sx : sx + m]
        part = lax.dot_general(
            sl, w_ref[0, s], (((4,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if s == 0:
            @pl.when(k == 0)
            def _():
                acc[...] = part + b_ref[0].astype(jnp.float32)

            @pl.when(k > 0)
            def _():
                acc[...] += part
        else:
            acc[...] += part

    @pl.when(k == nin - 1)
    def _():
        y_ref[...] = acc[...].astype(out_dtype)


def _pconv_kernel_bm(tz, ty, m, nx2, ncb, nin, out_dtype, *refs):
    x_hbms = refs[:nin]
    w_refs = refs[nin : 2 * nin]
    b_ref = refs[2 * nin]
    y_ref = refs[2 * nin + 1]
    xs_slots = refs[2 * nin + 2 : 2 * nin + 2 + nin]
    acc = refs[2 * nin + 2 + nin]
    sem = refs[2 * nin + 3 + nin]

    nc = pl.program_id(0)
    zi = pl.program_id(1)
    yi = pl.program_id(2)
    nz = pl.num_programs(1)
    ny = pl.num_programs(2)
    step = (nc * nz + zi) * ny + yi
    total = ncb * nz * ny
    slot = lax.rem(step, 2)

    def dma(k, s_idx, z, y_):
        return pltpu.make_async_copy(
            x_hbms[k].at[pl.ds(z * tz, tz + 1), pl.ds(y_ * ty, ty + 1)],
            xs_slots[k].at[s_idx],
            sem.at[s_idx * nin + k],
        )

    @pl.when(step == 0)
    def _():
        for k in range(nin):
            dma(k, 0, zi, yi).start()

    nxt = step + 1
    lin = lax.rem(nxt, nz * ny)
    z2 = lin // ny
    y2 = lax.rem(lin, ny)

    @pl.when(nxt < total)
    def _():
        for k in range(nin):
            dma(k, lax.rem(nxt, 2), z2, y2).start()

    for k in range(nin):
        dma(k, slot, zi, yi).wait()

    first_tap = True
    for k in range(nin):
        for s in range(8):
            sz, sy, sx = (s >> 2) & 1, (s >> 1) & 1, s & 1
            sl = xs_slots[k][slot, sz : sz + tz, sy : sy + ty, sx : sx + m]
            part = lax.dot_general(
                sl, w_refs[k][s], (((4,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            if first_tap:
                acc[...] = part + b_ref[0].astype(jnp.float32)
                first_tap = False
            else:
                acc[...] += part
    y_ref[...] = acc[...].astype(out_dtype)


def _pconv_kgrid_forward(xs, w_all, b_all, pick):
    """k-grid launch of the bm phased conv (equal-width inputs as an
    inner grid dim; accumulator persists across k)."""
    n = xs[0].shape[0]
    b = xs[0].shape[3]
    m, nx2 = n + 1, n + 2
    c8 = xs[0].shape[-1]
    c8o = w_all.shape[-1]
    tz, ty, ncb = pick
    cblk = c8o // ncb
    nin = len(xs)
    xpads = [jnp.pad(t, ((1, 1), (1, 1), (1, 1), (0, 0), (0, 0)))
             for t in xs]
    w8 = w_all.reshape(8, nin, c8, c8o).transpose(1, 0, 2, 3)
    bg = (b_all if b_all is not None
          else jnp.zeros((c8o,), xs[0].dtype)).astype(jnp.float32)
    kernel = partial(_pconv_kgrid_kernel_bm, tz, ty, m, nx2, ncb, nin,
                     xs[0].dtype)
    in_specs = [pl.BlockSpec(memory_space=pl.ANY)] * nin + [
        pl.BlockSpec((1, 8, c8, cblk), lambda nc, i, j, k: (k, 0, 0, nc),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, cblk), lambda nc, i, j, k: (0, nc),
                     memory_space=pltpu.VMEM),
    ]
    return pl.pallas_call(
        kernel,
        grid=(ncb, m // tz, m // ty, nin),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tz, ty, m, b, cblk),
                               lambda nc, i, j, k: (i, j, 0, 0, nc),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, m, m, b, c8o), xs[0].dtype),
        scratch_shapes=[
            pltpu.VMEM((2, tz + 1, ty + 1, nx2, b, c8), xs[0].dtype),
            pltpu.VMEM((tz, ty, m, b, cblk), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * 8 * m * m * m * b * nin * c8 * c8o,
            bytes_accessed=(1 + ncb) * sum(
                t.size * t.dtype.itemsize for t in xs)
            + m * m * m * b * c8o * xs[0].dtype.itemsize,
            transcendentals=0,
        ),
        interpret=_use_interpret(),
    )(*xpads, w8, bg[None])


def phased_conv_ext_bm(xs, w_all, b_all):
    """Batch-minor phased conv to the UNGATHERED (n+1, n+1, n+1, B,
    C8out) phase-stacked output. xs: list of (n,n,n,B,C8k) bm s2d
    tensors forming a plain concat (w_all rows in matching order);
    w_all (2,2,2,C8in,C8out); b_all (C8out,) or None. Returns y_ext or
    None when no tile fits (caller keeps the XLA conv). Equal-width
    multi-input shapes may route to the k-grid variant when its cost
    estimate wins (dc3's 1024 combined input lanes)."""
    n = xs[0].shape[0]
    b = xs[0].shape[3]
    m, nx2 = n + 1, n + 2
    c8s = [t.shape[-1] for t in xs]
    c8o = w_all.shape[-1]
    if c8o % 128 or any(c % 128 for c in c8s):
        return None
    nin = len(xs)
    pick = _pconv_bm_pick(m, nx2, b, c8s, c8o, xs[0].dtype.itemsize)
    est_a = None
    if pick is not None:
        tz_a, ty_a, ncb_a = pick
        steps_a = ncb_a * (m // tz_a) * (m // ty_a)
        est_a = _pconv_est_us(steps_a, tz_a * ty_a * m * b, sum(c8s),
                              c8o // ncb_a)
    kg = _pconv_bm_pick_kgrid(m, nx2, b, c8s, c8o, xs[0].dtype.itemsize)
    if kg is not None and nin > 1 and (est_a is None or kg[0] < est_a):
        return _pconv_kgrid_forward(xs, w_all, b_all, kg[1])
    if pick is None:
        return None
    tz, ty, ncb = pick
    cblk = c8o // ncb
    xpads = [jnp.pad(t, ((1, 1), (1, 1), (1, 1), (0, 0), (0, 0)))
             for t in xs]
    # per-input phase-stacked taps (8, C8k, C8o)
    w8 = w_all.reshape(8, sum(c8s), c8o)
    offs = np.concatenate([[0], np.cumsum(c8s)])
    w_ins = [w8[:, offs[k] : offs[k + 1]] for k in range(nin)]
    bg = (b_all if b_all is not None
          else jnp.zeros((c8o,), xs[0].dtype)).astype(jnp.float32)
    kernel = partial(_pconv_kernel_bm, tz, ty, m, nx2, ncb, nin, xs[0].dtype)
    in_specs = [pl.BlockSpec(memory_space=pl.ANY)] * nin + [
        pl.BlockSpec((8, c, cblk), lambda nc, i, j: (0, 0, nc),
                     memory_space=pltpu.VMEM)
        for c in c8s
    ] + [
        pl.BlockSpec((1, cblk), lambda nc, i, j: (0, nc),
                     memory_space=pltpu.VMEM),
    ]
    y = pl.pallas_call(
        kernel,
        grid=(ncb, m // tz, m // ty),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tz, ty, m, b, cblk),
                               lambda nc, i, j: (i, j, 0, 0, nc),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, m, m, b, c8o), xs[0].dtype),
        scratch_shapes=[
            pltpu.VMEM((2, tz + 1, ty + 1, nx2, b, c), xs[0].dtype)
            for c in c8s
        ] + [
            pltpu.VMEM((tz, ty, m, b, cblk), jnp.float32),
            pltpu.SemaphoreType.DMA((2 * nin,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * 8 * m * m * m * b * sum(c8s) * c8o,
            bytes_accessed=(1 + ncb) * sum(
                t.size * t.dtype.itemsize for t in xs)
            + m * m * m * b * c8o * xs[0].dtype.itemsize,
            transcendentals=0,
        ),
        interpret=_use_interpret(),
    )(*xpads, *w_ins, bg[None])
    return y


def _xla_dil2_gated_composition_bm(x, wd, bg, wgs, oh):
    """Pure-XLA math of the fused bm dil-2 gated block (backward path
    and CPU/shape-fallback reference): block-diag dense conv +
    InstanceNorm + LeakyReLU + SE gates."""
    from .conv import conv3d

    y = conv3d(x, wd, bg, padding=1, batch_minor=True)
    return _xla_gated_norm_composition_bm(y, wgs, oh)


def _dil2_gated_forward_bm(x, wd, bg, wgs, oh, eps=1e-5):
    r = dil2_conv_stats_bm(x, wd, bg)
    if r is None:
        return _xla_dil2_gated_composition_bm(x, wd, bg, wgs, oh)
    y, s1, s2 = r
    b = y.shape[3]
    co = y.shape[-1] // 8
    nvox = y.shape[0] * y.shape[1] * y.shape[2] * 8
    mean = jnp.sum(s1.reshape(b, 8, co), axis=1) / nvox
    ex2 = jnp.sum(s2.reshape(b, 8, co), axis=1) / nvox
    var = jnp.maximum(ex2 - jnp.square(mean), 0.0)
    scale = lax.rsqrt(var + eps)
    scale8 = jnp.tile(scale, (1, 8))
    shift8 = jnp.tile(mean * scale, (1, 8))
    out = gated_norm_finalize_bm(y, scale8, shift8, wgs, oh)
    if out is None:
        return _xla_dil2_gated_composition_bm(x, wd, bg, wgs, oh)
    return out


@jax.custom_vjp
def dil2_gated_block_bm(x, wd, bg, wgs, oh):
    """Fused batch-minor dil-2 block: block-diagonal dense conv +
    statistics as one double-buffered Pallas kernel, then the streamed
    finalize (IN + LeakyReLU + SE gates). Backward = exact XLA
    composition."""
    return _dil2_gated_forward_bm(x, wd, bg, wgs, oh)


def _d2gbm_fwd(x, wd, bg, wgs, oh):
    return _dil2_gated_forward_bm(x, wd, bg, wgs, oh), (x, wd, bg, wgs, oh)


def _d2gbm_bwd(res, ct):
    x, wd, bg, wgs, oh = res
    _, vjp = jax.vjp(_xla_dil2_gated_composition_bm, x, wd, bg, wgs, oh)
    return vjp(ct)


dil2_gated_block_bm.defvjp(_d2gbm_fwd, _d2gbm_bwd)


def dil2_gated_block_tbm(x, wd, bg, wgs, oh):
    """s2d-interface fused dil-2 block routed through the batch-minor
    kernel behind transpose pairs — bitcasts under the conv emitter's
    preferred {4,0,3,2,1} s2d layout (see the tbm block comment above),
    so the DEFAULT model config inherits the kernel without the
    batch-minor layout flip. Returns None when the bm kernel can't run
    at this shape (caller keeps the s2d composition)."""
    b, d, h, nx, c8 = x.shape
    c8o = wd.shape[-1]
    if c8 % 128 or c8o % 128 or b % 8:
        return None
    if _dil2_bm_pick(d, h, nx, b, c8, c8o, x.dtype.itemsize) is None:
        return None
    e = dil2_gated_block_bm(
        jnp.transpose(x, (1, 2, 3, 0, 4)), wd, bg, wgs, oh
    )
    return jnp.transpose(e, (3, 0, 1, 2, 4))


# ---------------- hand-written epilogue backwards ----------------
#
# The custom_vjp backwards above reuse jax.vjp of the XLA composition:
# exact gradients, but the autodiff graph (a) re-reduces the forward
# statistics off the PADDED per-phase conv slices, and (b) splits the
# InstanceNorm backward into two separate full-tensor stats passes
# whose kLoop fusions read thin Co-lane slices at offset 1 of the
# (n+1)^3 tensor (~24% of HBM bandwidth each; the round-4 step profile
# shows ~300 ms of such fusions at B=8 128^3 — fusion.105/.156 pairs
# at 11.4 ms apiece). The manual backwards below produce the same
# gradients with every full-tensor pass in the ALIGNED gathered
# (…, 8Co) layout, both IN-backward sums emitted from one read, and
# the conv's dgrad/wgrad (already MXU-speed-of-light under XLA) on
# jax.vjp of the conv alone. EPI_MANBWD=0 restores the composition
# backward (kept as the parity reference).
#
# Gradient notes:
#  * `oh` is a constant one-hot built by se_gate_weights (s2d.py:164)
#    — its cotangent never reaches a parameter — but it is returned
#    exactly so the custom_vjp stays a drop-in for the composition.
#  * The phased composition applies LeakyReLU to the f32 normalized
#    value before the bf16 cast; the manual backward masks on the
#    bf16-rounded value. bf16 rounding is sign-preserving, so the two
#    masks can only disagree where the f32 value underflows to -0.0
#    (rounded to a signless zero read as non-negative) — the factor
#    1-vs-0.01 then scales the cotangent of a subnormal-magnitude
#    activation, below bf16 training noise.


def manbwd_enabled() -> bool:
    """EPI_MANBWD selects the manual epilogue backward. Read at TRACE
    time like every EPI_* flag: set it before the first jit/grad trace
    — flipping it after a train step is compiled has no effect (and
    unlike the scheduling flags this one changes which backward
    computes the gradients)."""
    return os.environ.get("EPI_MANBWD", "1") == "1"


def _gate_chain_bwd(e0, wgs, oh, ct, exact_doh=False):
    """Exact backward of the SE gate chain e_{g+1} = e_g *
    (sigmoid(e_g @ W_g) @ onehot) given the pre-gate tensor e0
    (channel-minor, any leading layout). Returns (d_e0, d_wgs, d_oh).

    `oh` is a constant one-hot in every production caller
    (se_gate_weights, s2d.py:164) whose cotangent reaches no
    parameter, so d_oh is zeros by default — computing it exactly
    (exact_doh=True, the parity-test mode) forces the d*e_g product
    to materialize, which tipped the B=8 128^3 train step 44 MB over
    HBM."""
    from .s2d import HP

    dt = e0.dtype
    n_gates = int(wgs.shape[0]) if wgs is not None else 0
    if not n_gates:  # gate-free callers (cat blocks) pass wgs=oh=None
        return ct.astype(dt), None, None if oh is None else jnp.zeros_like(oh)
    oh8 = oh[:8].astype(dt)
    es, gates = [e0], []
    for g in range(n_gates):
        gate = jax.nn.sigmoid(
            jnp.einsum("...i,ip->...p", es[-1], wgs[g, :, :8].astype(dt),
                       precision=HP))
        gates.append(gate)
        if g < n_gates - 1:
            es.append(es[-1] * jnp.einsum("...p,pj->...j", gate, oh8,
                                          precision=HP))
    d = ct.astype(dt)
    dws = [None] * n_gates
    doh8 = jnp.zeros(oh8.shape, jnp.float32)
    for g in reversed(range(n_gates)):
        e_g, gate = es[g], gates[g]
        prod = d * e_g
        dgate = jnp.einsum("...j,pj->...p", prod, oh8, precision=HP)
        if exact_doh:
            doh8 = doh8 + jnp.einsum("...p,...j->pj", gate, prod,
                                     precision=HP).astype(jnp.float32)
        dlog = dgate * gate * (1 - gate)
        dw = jnp.einsum("...i,...p->ip", e_g, dlog, precision=HP)
        dws[g] = jnp.pad(dw, ((0, 0), (0, wgs.shape[2] - 8)))
        d = d * jnp.einsum("...p,pj->...j", gate, oh8, precision=HP) \
            + jnp.einsum("...p,ip->...i", dlog, wgs[g, :, :8].astype(dt),
                         precision=HP)
    doh = jnp.pad(doh8, ((0, oh.shape[0] - 8), (0, 0))).astype(oh.dtype)
    return d, jnp.stack(dws).astype(wgs.dtype), doh


def _core_bwd_from_a(a, sc8, wgs, oh, ct, *, bm, nvox, exact_doh):
    """Post-normalize part of the gated-epilogue backward, given the
    normalized pre-gate value a == yhat: gate chain backward, then the
    IN+LeakyReLU backward with BOTH stats sums (Q = sum(da), R =
    sum(da*yhat) per original channel) emitted from one fused read."""
    f32 = jnp.float32
    dt = a.dtype
    sp = (0, 1, 2) if bm else (1, 2, 3)
    b = a.shape[3 if bm else 0]
    c = a.shape[-1] // 8

    def bcast(t):  # (B, 8c) -> operand rank
        return (t[None, None, None, :, :] if bm
                else t[:, None, None, None, :])

    from .norms import leaky_relu

    d_e0, dwgs, doh = _gate_chain_bwd(leaky_relu(a), wgs, oh, ct,
                                      exact_doh=exact_doh)
    daf = d_e0.astype(f32) * jnp.where(a >= 0, f32(1.0), f32(0.01))
    q_s = jnp.sum(daf, axis=sp)
    r_s = jnp.sum(daf * a.astype(f32), axis=sp)
    q = bcast(jnp.tile(jnp.sum(q_s.reshape(b, 8, c), 1), (1, 8)))
    r = bcast(jnp.tile(jnp.sum(r_s.reshape(b, 8, c), 1), (1, 8)))
    return (sc8 * (daf - (q + a.astype(f32) * r) / nvox)).astype(dt), \
        dwgs, doh


def _gated_core_bwd(y, wgs, oh, ct, *, bm, eps=1e-5, exact_doh=False):
    """Backward of e = gates(leaky_relu(instance_norm_s2d(y))) on the
    gathered fat tensor: one recompute pass for the pre-gate value,
    one fused stats read for both IN-backward sums, one output pass."""
    f32 = jnp.float32
    dt = y.dtype
    sp = (0, 1, 2) if bm else (1, 2, 3)
    bax = 3 if bm else 0
    c8 = y.shape[-1]
    c = c8 // 8
    b = y.shape[bax]
    nvox = 8 * y.shape[sp[0]] * y.shape[sp[1]] * y.shape[sp[2]]

    def bcast(t):  # (B, 8c) -> operand rank
        return (t[None, None, None, :, :] if bm
                else t[:, None, None, None, :])

    s1 = jnp.sum(y, axis=sp, dtype=f32)
    s2 = jnp.sum(jnp.square(y.astype(f32)), axis=sp)
    mean = jnp.sum(s1.reshape(b, 8, c), 1) / nvox
    ex2 = jnp.sum(s2.reshape(b, 8, c), 1) / nvox
    var = jnp.maximum(ex2 - jnp.square(mean), 0.0)
    scale = lax.rsqrt(var + eps)
    sc8 = bcast(jnp.tile(scale, (1, 8)))
    sh8 = bcast(jnp.tile(mean * scale, (1, 8)))
    a = (y.astype(f32) * sc8 - sh8).astype(dt)  # == normalized yhat
    return _core_bwd_from_a(a, sc8, wgs, oh, ct, bm=bm, nvox=nvox,
                            exact_doh=exact_doh)


def _manual_phased_gated_bwd(res, ct, exact_doh=False):
    """Manual backward of phased_gated_block / _tbm: gather once into
    the aligned fat layout, core IN+LReLU+gate backward there, then
    scatter-pad the cotangent and jax.vjp of the conv alone.

    EPI_MANBWD_GATHER=pallas routes the gather-normalize producing `a`
    through ONE Pallas haloed pass (phased_normalize) with the conv
    replay x-padded to 8. MEASURED LOSS on the v5e (round 5): step
    1018 vs 964 ms — the 8 per-phase slice+convert fusions it replaces
    feed fused consumers the kernel route must rematerialize, and the
    x-padded replay adds ~10% conv work. Default stays `xla`; the
    kernel is kept as the record (trace-time flag, like every
    EPI_*)."""
    from itertools import product as _product

    from .conv import conv3d

    xs, w_all, b_all, wgs, oh = res
    cout = w_all.shape[-1]
    co = cout // 8
    n = xs[0].shape[1]
    use_pal = (os.environ.get("EPI_MANBWD_GATHER", "xla") == "pallas"
               and n % 8 == 0 and _epi_pick_tile(n, cout) is not None)
    # with the Pallas gather, replay the conv with the x-axis right-
    # padded to 8 (exactly the forward's trick at _pallas_gated_forward)
    # so the kernel's HBM DMA reads an aligned minor spatial dim
    pad = ((1, 1), (1, 1), (1, 8)) if use_pal else 1

    def conv_part(xs_, w_, bias):
        y = None
        off = 0
        for t in xs_:
            k = t.shape[-1]
            yt = conv3d(t, w_[:, :, :, off:off + k, :],
                        bias if y is None else None, padding=pad)
            y = yt if y is None else y + yt
            off += k
        return y

    f32 = jnp.float32
    dt = xs[0].dtype
    eps = 1e-5
    y, conv_vjp = jax.vjp(conv_part, tuple(xs), w_all, b_all)
    qs = list(_product(range(2), repeat=3))
    # statistics off the padded conv output via inclusion-exclusion
    # (one fused full reduce + boundary terms), and the normalized
    # pre-gate value emitted per-slice INSIDE the gather concat — the
    # gathered raw tensor never materializes, so y dies right here
    # (a separately materialized yg put the B=8 128^3 step ~1 GB over
    # HBM).
    nvox = 8 * n * n * n
    yb = y[:, :, :, : n + 1] if use_pal else y
    s1, s2 = phase_slice_stats_ie(yb, co)
    mean = s1 / nvox
    var = jnp.maximum(s2 / nvox - jnp.square(mean), 0.0)
    scale = lax.rsqrt(var + eps)
    a = None
    if use_pal:
        a = phased_normalize(y, jnp.tile(scale, (1, 8)),
                             jnp.tile(mean * scale, (1, 8)))
    if a is None:
        sc1 = scale[:, None, None, None, :]
        sh1 = (mean * scale)[:, None, None, None, :]
        a = jnp.concatenate(
            [(y[:, az:az + n, bb:bb + n, cc:cc + n, q * co:(q + 1) * co]
              .astype(f32) * sc1 - sh1).astype(dt)
             for q, (az, bb, cc) in enumerate(qs)], axis=-1)
    sc8 = jnp.tile(scale, (1, 8))[:, None, None, None, :]
    dyg, dwgs, doh = _core_bwd_from_a(a, sc8, wgs, oh, ct, bm=False,
                                      nvox=nvox, exact_doh=exact_doh)
    # scatter = inverse of the phase gather (concat of per-phase pads;
    # disjoint channel groups, shifted spatial offsets; x high-pad
    # covers the alignment columns when the replay was x-padded)
    xw = y.shape[3]
    dy_pad = jnp.concatenate(
        [jnp.pad(dyg[..., q * co:(q + 1) * co],
                 ((0, 0), (az, 1 - az), (bb, 1 - bb), (cc, xw - n - cc),
                  (0, 0)))
         for q, (az, bb, cc) in enumerate(qs)], axis=-1)
    dxs, dw_all, db_all = conv_vjp(dy_pad)
    return dxs, dw_all, db_all, dwgs, doh
