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

from tools.looptime import op_time_ms  # noqa: E402

# name: (B, n, ci, co)
SHAPES = {
    "ec3": (8, 64, 16, 32),
    "ec5": (8, 32, 32, 32),
    "ec6": (8, 32, 32, 64),
}


def timeit(tag, op, x):
    try:
        t = op_time_ms(op, x)
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
                   lambda t: conv3d(t, wd, bg, padding=1, batch_minor=True),
                   x)
        if "grouped" in variants:
            timeit("conv_grouped",
                   lambda t: conv3d(t, wg, bg, padding=1, groups=8,
                                    batch_minor=True), x)
        if "pp" in variants:
            # polyphase-batch core: phases ride batch, conv is dense
            # (B*8, n, n, n, ci) -> co; includes the relayouts the pp
            # route pays in bm form
            def pp(t):
                t = jnp.transpose(t, (3, 0, 1, 2, 4))  # (B,n,n,n,c8)
                t = t.reshape(B, n, n, n, 8, ci)
                t = jnp.moveaxis(t, 4, 1).reshape(B * 8, n, n, n, ci)
                y = conv3d(t, w, b, padding=1)
                y = y.reshape(B, 8, n, n, n, co)
                y = jnp.moveaxis(y, 1, 4).reshape(B, n, n, n, c8o)
                return jnp.transpose(y, (1, 2, 3, 0, 4))
            timeit("conv_pp", pp, x)
        if "pallas" in variants:
            timeit("pallas_cs",
                   lambda t: dil2_conv_stats_bm(t, wd, bg), x)
        if "fin" in variants:
            y = jnp.asarray(
                r.standard_normal((n, n, n, B, c8o), np.float32),
                jnp.bfloat16)
            sc = jnp.ones((B, c8o), jnp.float32)
            sh = jnp.zeros((B, c8o), jnp.float32)
            wgs = jnp.zeros((1, c8o, 128), jnp.bfloat16)
            ohp = jnp.zeros((128, c8o), jnp.bfloat16)
            timeit("finalize",
                   lambda t: gated_norm_finalize_bm(t, sc, sh, wgs, ohp), y)
        if "matmul" in variants:
            # speed-of-light: one matmul with the dense formulation's
            # MXU work (M = spatial*batch, K = 27*c8 im2col, N = c8o)
            M = n * n * n * B
            K = 27 * c8
            a = jnp.asarray(r.standard_normal((M, K), np.float32),
                            jnp.bfloat16)
            wm = jnp.asarray(r.standard_normal((K, c8o), np.float32),
                             jnp.bfloat16)
            timeit("matmul_SOL", lambda t: t @ wm, a)


if __name__ == "__main__":
    main()
