"""A/B the batch-minor phased conv at the model's block shapes: XLA
2^3 block conv (conv3d batch_minor) vs the double-buffered Pallas
kernel emitting the ungathered (n+1)^3 output (phased_conv_ext_bm).

Usage: python tools/quickbench_pconv_bm.py [ec4|dc4|dc5|dc6|dc3|all]
One Mosaic compile per shape — run one at a time if the relay queue
is congested.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# name: (B, n, cis (orig channels per concat input), co)
SHAPES = {
    "ec4": (8, 32, (32,), 32),
    "dc4": (8, 32, (64,), 64),
    "dc5": (8, 64, (32, 32), 32),
    "dc6": (8, 64, (32,), 16),
    "dc3": (8, 32, (64, 64), 64),  # expected fallback (1024 in lanes)
}


def main():
    import jax
    import jax.numpy as jnp

    from se_unet_airseg_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()

    from se_unet_airseg_tpu.ops.conv import conv3d
    from se_unet_airseg_tpu.ops.pallas_s2d import phased_conv_ext_bm
    from se_unet_airseg_tpu.ops.s2d import phased_conv_weights

    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    names = list(SHAPES) if which == "all" else [which]

    for name in names:
        B, n, cis, co = SHAPES[name]
        r = np.random.default_rng(0)
        w = jnp.asarray(
            r.standard_normal((3, 3, 3, sum(cis), co), np.float32) * 0.1,
            jnp.bfloat16)
        bias = jnp.asarray(r.standard_normal(co, np.float32) * 0.1,
                           jnp.bfloat16)
        w_all, b_all = phased_conv_weights(
            w, bias, tuple(cis) if len(cis) > 1 else None)
        xs = [jnp.asarray(r.standard_normal((n, n, n, B, 8 * c), np.float32),
                          jnp.bfloat16) for c in cis]

        def xla(*ts):
            y, off = None, 0
            for t in ts:
                k = t.shape[-1]
                y2 = conv3d(t, w_all[:, :, :, off : off + k, :],
                            b_all if y is None else None, padding=1,
                            batch_minor=True)
                y = y2 if y is None else y + y2
                off += k
            return y

        def kern(*ts):
            return phased_conv_ext_bm(list(ts), w_all, b_all)

        outs = {}
        for tag, fn in (("xla", xla), ("kernel", kern)):
            try:
                jf = jax.jit(fn)
                t0 = time.perf_counter()
                o = jf(*xs)
                if o is None:
                    print(f"{name} {tag:7s}: fallback (no tile fits)",
                          flush=True)
                    continue
                float(o.ravel()[0])
                comp = time.perf_counter() - t0
            except Exception as e:
                print(f"{name} {tag:7s}: FAILED {type(e).__name__}: "
                      f"{str(e)[:120]}", flush=True)
                continue
            ts_ = []
            for _ in range(7):
                t0 = time.perf_counter()
                o = jf(*xs)
                float(o.ravel()[0])
                ts_.append(time.perf_counter() - t0)
            ts_.sort()
            outs[tag] = np.asarray(o, np.float32)
            print(f"{name} {tag:7s}: p50 {ts_[3]*1e3:6.2f} min "
                  f"{ts_[0]*1e3:6.2f} ms (compile {comp:.1f}s)", flush=True)
        if len(outs) == 2:
            print(f"{name} max|xla-kernel| = "
                  f"{np.abs(outs['xla'] - outs['kernel']).max():.3e}",
                  flush=True)


if __name__ == "__main__":
    main()
