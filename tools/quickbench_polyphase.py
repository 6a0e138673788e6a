"""A/B the dil-2 s2d blocks against a POLYPHASE-BATCH formulation.

The three dil-2 blocks (ec3/ec5/ec6) currently cost ~119 ms of each
264 ms inference batch because every XLA formulation in s2d layout
(grouped conv, block-diagonal dense) pays 8x structural-zero FLOPs or
8x lane padding for the phase structure. A dil-2 conv on the full
grid is exactly 8 independent dil-1 dense convs on the sub-grids —
with phases on the BATCH axis the conv is a plain dense 3^3 conv
whose only waste is the N=Co lane padding (2-4x), a 2-4x FLOP
reduction over today.

Variants per shape:
  xla  — production s2d path: block-diag dense (ci<=16) or grouped
         conv + the fused gated_norm_block epilogue.
  pp   — polyphase corridor: dense conv + IN(+LReLU) + SE gates, all
         in (8B, n, n, n, C) layout (steady-state cost if producers/
         consumers are converted).
  ppT  — to_polyphase + pp + from_polyphase (worst-case adapter cost).

Usage: python tools/quickbench_polyphase.py [ec3|ec5|ec6|all]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# name: (B, n, ci, co, gates) — apply_fast shapes at cube=128
SHAPES = {
    "ec3": (8, 64, 16, 32, 1),
    "ec5": (8, 32, 32, 32, 2),
    "ec6": (8, 32, 32, 64, 2),
}


def main():
    import jax
    import jax.numpy as jnp

    from se_unet_airseg_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()

    from se_unet_airseg_tpu.ops.conv import conv3d
    from se_unet_airseg_tpu.ops.norms import leaky_relu
    from se_unet_airseg_tpu.ops.pallas_s2d import gated_norm_block
    from se_unet_airseg_tpu.ops.s2d import (
        dil2_dense_weight,
        from_polyphase,
        se_gate_weights,
        to_polyphase,
    )

    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    names = list(SHAPES) if which == "all" else [which]

    for name in names:
        B, n, ci, co, gates = SHAPES[name]
        r = np.random.default_rng(0)
        w = jnp.asarray(r.standard_normal((3, 3, 3, ci, co), np.float32) * 0.1,
                        jnp.bfloat16)
        b = jnp.asarray(r.standard_normal(co, np.float32) * 0.1, jnp.bfloat16)
        x = jnp.asarray(r.standard_normal((B, n, n, n, 8 * ci), np.float32),
                        jnp.bfloat16)
        wd = dil2_dense_weight(w, jnp.bfloat16)
        wg_t = jnp.tile(w, (1, 1, 1, 1, 8))
        bg = jnp.tile(b, 8)
        wses, wgs = [], []
        oh = None
        for _ in range(gates):
            wse = jnp.asarray(r.standard_normal((co, 1), np.float32) * 0.1)
            wses.append(jnp.asarray(wse, jnp.bfloat16))
            g_, oh_ = se_gate_weights(wse, jnp.bfloat16)
            wgs.append(jnp.pad(g_, ((0, 0), (0, 128 - g_.shape[1]))))
            oh = jnp.pad(oh_, ((0, 128 - oh_.shape[0]), (0, 0)))
        wgs = jnp.stack(wgs)
        wses = jnp.stack(wses)

        def xla_cur(x, wd, wg_t, b, bg, wgs, wses, oh):
            if ci <= 16:
                y = conv3d(x, wd, bg, padding=1)
            else:
                y = conv3d(x, wg_t, bg, padding=1, groups=8)
            return gated_norm_block(y, wgs, oh)

        def pp_block(xp, w, b, wses):
            # dense dil-1 conv per phase (phases ride the batch axis)
            y = conv3d(xp, w, b, padding=1)
            # InstanceNorm per (orig batch, channel) over phase+space
            s1 = jnp.sum(y, axis=(1, 2, 3), dtype=jnp.float32)
            s2 = jnp.sum(jnp.square(y.astype(jnp.float32)), axis=(1, 2, 3))
            s1 = s1.reshape(B, 8, co).sum(axis=1)
            s2 = s2.reshape(B, 8, co).sum(axis=1)
            nvox = 8 * n * n * n
            mean = s1 / nvox
            var = jnp.maximum(s2 / nvox - jnp.square(mean), 0.0)
            scale = jax.lax.rsqrt(var + 1e-5)
            scale = jnp.repeat(scale, 8, axis=0)[:, None, None, None, :]
            shift = jnp.repeat(mean, 8, axis=0)[:, None, None, None, :] * scale
            e = leaky_relu(y.astype(jnp.float32) * scale - shift).astype(y.dtype)
            for g in range(gates):
                gate = jax.nn.sigmoid(
                    jnp.einsum("...i,io->...o", e, wses[g],
                               precision=jax.lax.Precision.HIGHEST))
                e = e * gate
            return e

        def pp(xp, w, b, wses):
            return pp_block(xp, w, b, wses)

        def ppT(x, w, b, wses):
            return from_polyphase(pp_block(to_polyphase(x), w, b, wses))

        xp = to_polyphase(x)
        runs = {
            "xla": (xla_cur, (x, wd, wg_t, b, bg, wgs, wses, oh)),
            "pp": (pp, (xp, w, b, wses)),
            "ppT": (ppT, (x, w, b, wses)),
        }
        outs = {}
        for tag, (fn, a) in runs.items():
            jf = jax.jit(fn)
            t0 = time.perf_counter()
            o = jf(*a)
            float(o.ravel()[0])
            comp = time.perf_counter() - t0
            ts = []
            for _ in range(7):
                t0 = time.perf_counter()
                o = jf(*a)
                float(o.ravel()[0])
                ts.append(time.perf_counter() - t0)
            ts.sort()
            outs[tag] = np.asarray(o, np.float32)
            print(f"{name} {tag:4s}: p50 {ts[3]*1e3:6.2f} min {ts[0]*1e3:6.2f}"
                  f" ms (compile {comp:.1f}s)", flush=True)
        # parity: ppT output is in s2d layout like xla's
        d = np.abs(outs["xla"] - outs["ppT"]).max()
        print(f"{name} max|xla-ppT| = {d:.3e}", flush=True)


if __name__ == "__main__":
    main()
