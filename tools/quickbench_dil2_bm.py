"""A/B the batch-minor dil-2 block at the model's three real shapes:
the current XLA bm path (block-diag dense / grouped conv + the
gathered Pallas finalize) vs the new fused kernel
(dil2_gated_block_bm: double-buffered conv+stats + finalize).

Usage: python tools/quickbench_dil2_bm.py [ec3|ec5|ec6|all]
One Mosaic compile per variant — run ONE shape at a time if the relay
queue is congested.
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
    from se_unet_airseg_tpu.ops.pallas_s2d import (
        dil2_gated_block_bm,
        gated_norm_block_bm,
    )
    from se_unet_airseg_tpu.ops.s2d import dil2_dense_weight, se_gate_weights

    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    names = list(SHAPES) if which == "all" else [which]

    for name in names:
        B, n, ci, co, gates = SHAPES[name]
        r = np.random.default_rng(0)
        w = jnp.asarray(r.standard_normal((3, 3, 3, ci, co), np.float32) * 0.1,
                        jnp.bfloat16)
        b = jnp.asarray(r.standard_normal(co, np.float32) * 0.1, jnp.bfloat16)
        x = jnp.asarray(r.standard_normal((n, n, n, B, 8 * ci), np.float32),
                        jnp.bfloat16)
        wd = dil2_dense_weight(w, jnp.bfloat16)
        wg_t = jnp.tile(w, (1, 1, 1, 1, 8))
        bg = jnp.tile(b, 8)
        wgs, oh = [], None
        for _ in range(gates):
            wse = jnp.asarray(r.standard_normal((co, 1), np.float32) * 0.1)
            g_, oh_ = se_gate_weights(wse, jnp.bfloat16)
            wgs.append(jnp.pad(g_, ((0, 0), (0, 128 - g_.shape[1]))))
            oh = jnp.pad(oh_, ((0, 128 - oh_.shape[0]), (0, 0)))
        wgs = jnp.stack(wgs)

        def xla_cur(x, wd, wg_t, bg, wgs, oh):
            # the pre-kernel bm path: dense for narrow, grouped for wide
            if ci <= 16:
                y = conv3d(x, wd, bg, padding=1, batch_minor=True)
            else:
                y = conv3d(x, wg_t, bg, padding=1, groups=8,
                           batch_minor=True)
            return gated_norm_block_bm(y, wgs, oh)

        def fused(x, wd, wg_t, bg, wgs, oh):
            return dil2_gated_block_bm(x, wd, bg, wgs, oh)

        outs = {}
        for tag, fn in (("xla", xla_cur), ("kernel", fused)):
            jf = jax.jit(fn)
            t0 = time.perf_counter()
            o = jf(x, wd, wg_t, bg, wgs, oh)
            float(o.ravel()[0])
            comp = time.perf_counter() - t0
            ts = []
            for _ in range(7):
                t0 = time.perf_counter()
                o = jf(x, wd, wg_t, bg, wgs, oh)
                float(o.ravel()[0])
                ts.append(time.perf_counter() - t0)
            ts.sort()
            outs[tag] = np.asarray(o, np.float32)
            print(f"{name} {tag:7s}: p50 {ts[3]*1e3:6.2f} min {ts[0]*1e3:6.2f}"
                  f" ms (compile {comp:.1f}s)", flush=True)
        print(f"{name} max|xla-kernel| = "
              f"{np.abs(outs['xla'] - outs['kernel']).max():.3e}", flush=True)


if __name__ == "__main__":
    main()
