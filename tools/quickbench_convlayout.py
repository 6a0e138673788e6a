"""Probe whether the TPU conv emitter's preferred input layout
(batch-in-sublanes, seen as {4,0,3,2,1} relayout fusions in profiles)
can be fed directly: NDHWC conv vs DHWNC-dimension-numbered conv on
the dc5 shape, including the pad+relayout the model pays before each
phased conv.

Usage: python tools/quickbench_convlayout.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from se_unet_airseg_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()

    B, n, ci, co = 8, 64, 512, 256
    r = np.random.default_rng(0)
    x = jnp.asarray(r.standard_normal((B, n, n, n, ci), np.float32),
                    jnp.bfloat16)
    xt = jnp.asarray(
        np.moveaxis(np.asarray(x, np.float32), 0, 3), jnp.bfloat16
    )  # (n, n, n, B, ci)
    w = jnp.asarray(r.standard_normal((2, 2, 2, ci, co), np.float32) * 0.05,
                    jnp.bfloat16)

    pad = ((1, 1), (1, 1), (1, 8))

    def conv_ndhwc(x, w):
        return lax.conv_general_dilated(
            x, w, (1, 1, 1), pad,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            precision=lax.Precision.HIGHEST,
        )

    def conv_dhwnc(x, w):
        return lax.conv_general_dilated(
            x, w, (1, 1, 1), pad,
            dimension_numbers=("DHWNC", "DHWIO", "DHWNC"),
            precision=lax.Precision.HIGHEST,
        )

    def sync(o):
        return float(o.ravel()[0])

    for tag, fn, arg in (("ndhwc", conv_ndhwc, x), ("dhwnc", conv_dhwnc, xt)):
        jf = jax.jit(fn)
        t0 = time.perf_counter()
        o = jf(arg, w)
        sync(o)
        comp = time.perf_counter() - t0
        ts = []
        for _ in range(7):
            t0 = time.perf_counter()
            o = jf(arg, w)
            sync(o)
            ts.append(time.perf_counter() - t0)
        ts.sort()
        print(f"dc5-conv {tag}: p50 {ts[3]*1e3:6.2f} min {ts[0]*1e3:6.2f} ms "
              f"(compile {comp:.1f}s, out {o.shape})", flush=True)


if __name__ == "__main__":
    main()
