"""Lean single-shape bench of the fused Pallas kernel vs XLA chain.

Usage: python tools/quickbench_pallas.py [case] [variant]
  case: ec2 | ec4 | dc3 | dc5   variant: pallas | xla | both
Times K chained iterations inside one jit (one number, few compiles,
verbose progress for the slow relay)."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CASES = {
    "ec1": ((8, 64, 64, 64, 16), (3, 3, 3, 2, 8)),
    "ec2": ((8, 64, 64, 64, 64), (3, 3, 3, 8, 16)),
    "ec4": ((8, 32, 32, 32, 256), (3, 3, 3, 32, 32)),
    "dc3": ((8, 32, 32, 32, 1024), (3, 3, 3, 128, 64)),
    "dc5": ((8, 64, 64, 64, 512), (3, 3, 3, 64, 32)),
    # dilation-2 blocks (dil2_conv_stats kernel)
    "ec3d": ((8, 64, 64, 64, 128), (3, 3, 3, 16, 32)),
    "ec5d": ((8, 32, 32, 32, 256), (3, 3, 3, 32, 32)),
    "ec6d": ((8, 32, 32, 32, 256), (3, 3, 3, 32, 64)),
}


def main():
    import jax
    import jax.numpy as jnp

    from se_unet_airseg_tpu.ops.s2d import (
        conv3_s2d_phased,
        instance_norm_from_stats,
        instance_norm_s2d,
        phased_conv_weights,
    )
    from se_unet_airseg_tpu.ops.pallas_s2d import phased_conv_stats

    case = sys.argv[1] if len(sys.argv) > 1 else "dc5"
    variant = sys.argv[2] if len(sys.argv) > 2 else "both"
    K = int(os.environ.get("QB_K", "8"))
    xshape, wshape = CASES[case]

    rng = np.random.default_rng(0)
    dt = jnp.bfloat16
    x = (jnp.asarray(rng.random(xshape, np.float32))).astype(dt)
    w = (jnp.asarray(rng.random(wshape, np.float32)) * 0.2).astype(dt)
    b = (jnp.asarray(rng.random((wshape[-1],), np.float32)) * 0.1).astype(dt)
    ci, co = wshape[3], wshape[4]
    w_all, b_all = phased_conv_weights(w, b)
    w8 = w_all.reshape(8, 8 * ci, 8 * co)
    bf = b_all.astype(jnp.float32)

    if case.endswith("d"):
        from se_unet_airseg_tpu.ops import conv3d
        from se_unet_airseg_tpu.ops.pallas_s2d import dil2_conv_stats
        from se_unet_airseg_tpu.ops.s2d import from_polyphase, to_polyphase

        def xla_chain(x):
            y = from_polyphase(conv3d(to_polyphase(x), w, b, padding=1))
            return instance_norm_s2d(y)

        def pallas_chain(x):
            y, s1, s2 = dil2_conv_stats(x, w, b)
            return instance_norm_from_stats(y, s1, s2)
    else:
        def xla_chain(x):
            return instance_norm_s2d(conv3_s2d_phased(x, w, b))

        def pallas_chain(x):
            y, s1, s2 = phased_conv_stats(x, w8, bf)
            return instance_norm_from_stats(y, s1, s2)

    def bench(name, f):
        def loop(x):
            def body(i, c):
                y = f(x + c.astype(x.dtype))
                return (y.ravel()[0] * jnp.asarray(1e-30, y.dtype)).astype(
                    jnp.float32
                )

            return jax.lax.fori_loop(0, K, body, jnp.float32(0.0))

        print(f"[{name}] compiling...", flush=True)
        t0 = time.time()
        g = jax.jit(loop)
        float(g(x))
        print(f"[{name}] compiled+warm in {time.time()-t0:.1f}s", flush=True)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(g(x))
            best = min(best, time.perf_counter() - t0)
        print(f"[{name}] {best / K * 1e3:8.3f} ms/op  ({K} chained)", flush=True)
        # fingerprint for cross-variant comparison
        y = jax.jit(f)(x)
        corner = np.asarray(y[0, :2, :2, :2, :8].astype(jnp.float32))
        print(f"[{name}] corner={corner.ravel()[:4]}", flush=True)

    if variant in ("xla", "both"):
        bench("xla", xla_chain)
    if variant in ("pallas", "both"):
        bench("pallas", pallas_chain)


if __name__ == "__main__":
    main()
