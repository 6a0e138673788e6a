"""Decompose the dil-2 block cost at the model's three shapes: device-
time each ISOLATED piece (conv formulations, stats, finalize, and a
pure matmul with the same MXU work as speed-of-light reference) via
the loop-slope timer, so the next kernel targets the real bottleneck
instead of the composition.

Usage: python tools/probe_dil2_parts.py [ec3|ec5|ec6|all] [variant...]
Variants: dense grouped pp pallas fin matmul (default: all)
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# name: (B, n, ci, co)
SHAPES = {
    "ec3": (8, 64, 16, 32),
    "ec5": (8, 32, 32, 32),
    "ec6": (8, 32, 32, 64),
}


def _loop_fn(op, k: int):
    """Like tools.looptime._loop_fn but weights ride as jit ARGUMENTS
    (closure-captured device arrays become HLO constants, which the
    relay's compile endpoint rejects past a few MB — HTTP 413)."""
    import jax
    import jax.numpy as jnp

    def f(x, *consts):
        def body(i, carry):
            y = op(x + carry.astype(x.dtype), *consts)
            first = jax.tree.leaves(y)[0]
            # consume the WHOLE result: reading only element [0] lets
            # XLA rewrite dot+slice into slice+dot and time ~nothing
            return (jnp.sum(first, dtype=jnp.float32) * 1e-30)

        return jax.lax.fori_loop(0, k, body, jnp.float32(0.0))

    return jax.jit(f)


def op_time_ms(op, x, *consts, k1=2, k2=12, reps=3):
    import time

    f1 = _loop_fn(op, k1)
    f2 = _loop_fn(op, k2)

    def timed(f):
        float(f(x, *consts))
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            float(f(x, *consts))
            best = min(best, time.perf_counter() - t0)
        return best

    t1, t2 = timed(f1), timed(f2)
    return max((t2 - t1) / (k2 - k1) * 1e3, 0.0)


def timeit(tag, op, x, *consts):
    try:
        t = op_time_ms(op, x, *consts)
    except Exception as e:
        print(f"  {tag:12s}: FAILED {type(e).__name__}: {str(e)[:100]}",
              flush=True)
        return
    print(f"  {tag:12s}: {t:7.2f} ms/op (device, loop slope)", flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from se_unet_airseg_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()

    from se_unet_airseg_tpu.ops.conv import conv3d
    from se_unet_airseg_tpu.ops.pallas_s2d import (
        dil2_conv_stats_bm,
        gated_norm_finalize_bm,
    )
    from se_unet_airseg_tpu.ops.s2d import dil2_dense_weight

    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    names = list(SHAPES) if which == "all" else [which]
    variants = sys.argv[2:] or ["dense", "grouped", "pp", "pallas", "fin",
                                "matmul"]

    for name in names:
        B, n, ci, co = SHAPES[name]
        c8, c8o = 8 * ci, 8 * co
        r = np.random.default_rng(0)
        w = jnp.asarray(r.standard_normal((3, 3, 3, ci, co), np.float32) * 0.1,
                        jnp.bfloat16)
        b = jnp.asarray(r.standard_normal(co, np.float32) * 0.1, jnp.bfloat16)
        x = jnp.asarray(r.standard_normal((n, n, n, B, c8), np.float32),
                        jnp.bfloat16)
        wd = dil2_dense_weight(w, jnp.bfloat16)
        wg = jnp.tile(w, (1, 1, 1, 1, 8))
        bg = jnp.tile(b, 8)
        print(f"{name}: x {x.shape} ci={ci} co={co} "
              f"useful={2*27*n**3*B*ci*co*8/1e9:.0f} GF "
              f"dense={2*27*n**3*B*c8*c8o/1e9:.0f} GF", flush=True)

        if "dense" in variants:
            timeit("conv_dense",
                   lambda t, wd, bg: conv3d(t, wd, bg, padding=1,
                                            batch_minor=True), x, wd, bg)
        if "grouped" in variants:
            timeit("conv_grouped",
                   lambda t, wg, bg: conv3d(t, wg, bg, padding=1, groups=8,
                                            batch_minor=True), x, wg, bg)
        for ng in (2, 4):
            if f"g{ng}" not in variants:
                continue
            # partial-dense: ng groups of 8/ng phases, block-diagonal
            # dense WITHIN each group — lift (8/ng)x instead of the
            # full dense 8x, groups stay 128-lane-aligned when
            # (8/ng)*ci >= 128
            per = 8 // ng
            import numpy as _np
            wnp = _np.asarray(wd, _np.float32)  # (3,3,3,8ci,8co)
            wg_n = _np.zeros((3, 3, 3, per * ci, c8o), _np.float32)
            for g in range(ng):
                wg_n[:, :, :, :, g * per * co:(g + 1) * per * co] = (
                    wnp[:, :, :, g * per * ci:(g + 1) * per * ci,
                        g * per * co:(g + 1) * per * co])
            wgn = jnp.asarray(wg_n, jnp.bfloat16)
            timeit(f"conv_g{ng}",
                   lambda t, wgn, bg, _ng=ng: conv3d(
                       t, wgn, bg, padding=1, groups=_ng,
                       batch_minor=True), x, wgn, bg)
        if "pp" in variants:
            # polyphase-batch core: phases ride batch, conv is dense
            # (B*8, n, n, n, ci) -> co; includes the relayouts the pp
            # route pays in bm form
            def pp(t, w, b):
                t = jnp.transpose(t, (3, 0, 1, 2, 4))  # (B,n,n,n,c8)
                t = t.reshape(B, n, n, n, 8, ci)
                t = jnp.moveaxis(t, 4, 1).reshape(B * 8, n, n, n, ci)
                y = conv3d(t, w, b, padding=1)
                y = y.reshape(B, 8, n, n, n, co)
                y = jnp.moveaxis(y, 1, 4).reshape(B, n, n, n, c8o)
                return jnp.transpose(y, (1, 2, 3, 0, 4))
            timeit("conv_pp", pp, x, w, b)
        for ng in (1, 2, 4):
            if f"grad{ng}" not in variants:
                continue
            # fwd+bwd of the conv alone (dense ng=1 vs partial-dense):
            # measures the grouped dgrad/wgrad emitters the train step
            # would inherit
            if ng == 1:
                wv = wd
            else:
                from se_unet_airseg_tpu.ops.s2d import dil2_group_weight
                wv = dil2_group_weight(w, ng, jnp.bfloat16)

            def gradfn(t, wv, bg, _ng=ng):
                def loss(t_, w_):
                    y = conv3d(t_, w_, bg, padding=1,
                               groups=(_ng if _ng > 1 else 1),
                               batch_minor=True)
                    return jnp.sum(y.astype(jnp.float32) * 1e-6)
                l, (gt, gw) = jax.value_and_grad(
                    loss, argnums=(0, 1))(t, wv)
                return (l + jnp.sum(gt, dtype=jnp.float32) * 1e-20
                        + jnp.sum(gw, dtype=jnp.float32) * 1e-20)
            import jax
            timeit(f"grad_g{ng}", gradfn, x, wv, bg)
        if "pallas" in variants:
            timeit("pallas_cs",
                   lambda t, wd, bg: dil2_conv_stats_bm(t, wd, bg),
                   x, wd, bg)
        if "fin" in variants:
            y = jnp.asarray(
                r.standard_normal((n, n, n, B, c8o), np.float32),
                jnp.bfloat16)
            sc = jnp.ones((B, c8o), jnp.float32)
            sh = jnp.zeros((B, c8o), jnp.float32)
            wgs = jnp.zeros((1, c8o, 128), jnp.bfloat16)
            ohp = jnp.zeros((128, c8o), jnp.bfloat16)
            timeit("finalize",
                   lambda t, sc, sh, wgs, ohp:
                   gated_norm_finalize_bm(t, sc, sh, wgs, ohp),
                   y, sc, sh, wgs, ohp)
        if "matmul" in variants:
            # speed-of-light: one matmul with the dense formulation's
            # MXU work (M = spatial*batch, K = 27*c8 im2col, N = c8o);
            # rows capped to keep the operand in HBM, result scaled
            M = n * n * n * B
            K = 27 * c8
            Ms = min(M, 131072)
            a = jnp.asarray(r.standard_normal((Ms, K), np.float32),
                            jnp.bfloat16)
            wm = jnp.asarray(r.standard_normal((K, c8o), np.float32),
                             jnp.bfloat16)
            t = None
            try:
                t = op_time_ms(lambda t, wm: t @ wm, a, wm)
            except Exception as e:
                print(f"  matmul_SOL  : FAILED {type(e).__name__}: "
                      f"{str(e)[:100]}", flush=True)
            if t is not None and t > 1e-3:
                print(f"  matmul_SOL  : {t * M / Ms:7.2f} ms/op implied "
                      f"(measured {t:.2f} at M={Ms}, "
                      f"{2 * Ms * K * c8o / t / 1e9:.0f} GF/s)", flush=True)
            elif t is not None:
                print(f"  matmul_SOL  : unmeasurable ({t:.4f} ms at M={Ms} "
                      f"— likely optimized away)", flush=True)


if __name__ == "__main__":
    main()
