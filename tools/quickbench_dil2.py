"""A/B the dil-2 s2d conv formulations on TPU: grouped
(feature_group_count=8, the default) vs block-diagonal dense (8x the
FLOPs, but no grouped-conv layout shuffles), both followed by the
fused gathered epilogue.

Usage: python tools/quickbench_dil2.py [ec3|ec5|all]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SHAPES = {
    # name: (B, n, ci_orig (=co), n_gates)
    "ec3": (8, 64, 16, 1),
    "ec5": (8, 32, 64, 2),
}


def main():
    import jax
    import jax.numpy as jnp

    from se_unet_airseg_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()

    from se_unet_airseg_tpu.ops.conv import conv3d
    from se_unet_airseg_tpu.ops.pallas_s2d import gated_norm_block
    from se_unet_airseg_tpu.ops.s2d import se_gate_weights

    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    names = list(SHAPES) if which == "all" else [which]

    for name in names:
        B, n, c, gates = SHAPES[name]
        r = np.random.default_rng(0)
        w = jnp.asarray(r.standard_normal((3, 3, 3, c, c), np.float32) * 0.1,
                        jnp.bfloat16)
        b = jnp.asarray(r.standard_normal(c, np.float32) * 0.1, jnp.bfloat16)
        x = jnp.asarray(r.standard_normal((B, n, n, n, 8 * c), np.float32),
                        jnp.bfloat16)
        wg_t = jnp.tile(w, (1, 1, 1, 1, 8))
        bg = jnp.tile(b, 8)
        # the canonical block-diagonal lift — what the model runs
        from se_unet_airseg_tpu.ops.s2d import dil2_dense_weight

        wd = dil2_dense_weight(w, jnp.bfloat16)
        wgs, oh = [], None
        for _ in range(gates):
            wse = jnp.asarray(r.standard_normal((c, 1), np.float32) * 0.1)
            g_, oh_ = se_gate_weights(wse, jnp.bfloat16)
            wgs.append(jnp.pad(g_, ((0, 0), (0, 128 - g_.shape[1]))))
            oh = jnp.pad(oh_, ((0, 128 - oh_.shape[0]), (0, 0)))
        wgs = jnp.stack(wgs)

        def grouped(x, wg_t, bg, wgs, oh):
            return gated_norm_block(
                conv3d(x, wg_t, bg, padding=1, groups=8), wgs, oh
            )

        def dense(x, wd, bg, wgs, oh):
            return gated_norm_block(conv3d(x, wd, bg, padding=1), wgs, oh)

        for tag, fn, wa in (("grouped", grouped, wg_t), ("dense", dense, wd)):
            jf = jax.jit(fn)
            t0 = time.perf_counter()
            o = jf(x, wa, bg, wgs, oh)
            float(o.ravel()[0])
            comp = time.perf_counter() - t0
            ts = []
            for _ in range(7):
                t0 = time.perf_counter()
                o = jf(x, wa, bg, wgs, oh)
                float(o.ravel()[0])
                ts.append(time.perf_counter() - t0)
            ts.sort()
            print(f"{name} {tag:8s}: p50 {ts[3]*1e3:6.2f} min {ts[0]*1e3:6.2f}"
                  f" ms (compile {comp:.1f}s)", flush=True)
        # parity
        a = np.asarray(jax.jit(grouped)(x, wg_t, bg, wgs, oh), np.float32)
        d = np.asarray(jax.jit(dense)(x, wd, bg, wgs, oh), np.float32)
        print(f"{name} max|grouped-dense| = {np.abs(a - d).max():.3e}",
              flush=True)


if __name__ == "__main__":
    main()
