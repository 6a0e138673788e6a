"""Pallas fused phased-conv kernel vs the XLA composition, at the
model's hot shapes. Run on the real TPU."""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.looptime import op_time_ms  # noqa: E402


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

    rng = np.random.default_rng(0)
    dt = jnp.bfloat16

    def mk(shape, scale=1.0):
        return (jnp.asarray(rng.random(shape, np.float32)) * scale).astype(dt)

    cases = [
        ("ec2  64^3 128->128", (8, 64, 64, 64, 128), (3, 3, 3, 16, 16)),
        ("ec4  32^3 256->256", (8, 32, 32, 32, 256), (3, 3, 3, 32, 32)),
        ("dc3  32^3 1024->512", (8, 32, 32, 32, 1024), (3, 3, 3, 128, 64)),
        ("dc5  64^3 512->256", (8, 64, 64, 64, 512), (3, 3, 3, 64, 32)),
    ]
    only = os.environ.get("MB_ONLY")
    for label, xshape, wshape in cases:
        if only and only not in label:
            continue
        x = mk(xshape)
        w = mk(wshape, 0.2)
        b = mk((wshape[-1],), 0.1)
        ci, co = wshape[3], wshape[4]
        w_all, b_all = phased_conv_weights(w, b)
        w8 = w_all.reshape(8, 8 * ci, 8 * co)
        bf = b_all.astype(jnp.float32)

        def xla_chain(x):
            y = conv3_s2d_phased(x, w, b)
            return instance_norm_s2d(y)

        def pallas_chain(x):
            y, s1, s2 = phased_conv_stats(x, w8, bf)
            return instance_norm_from_stats(y, s1, s2)

        print(f"\n== {label} ==", flush=True)
        ref = None
        for name, fn in (("xla", xla_chain), ("pallas", pallas_chain)):
            try:
                y = jax.jit(fn)(x)
                corner = np.asarray(y[0, :4, :4, :4, :8].astype(jnp.float32))
                del y
                ms = op_time_ms(fn, x)
            except Exception as e:
                print(f"  {name:8s} FAILED: {str(e)[:200]}", flush=True)
                continue
            err = 0.0 if ref is None else float(np.max(np.abs(corner - ref)))
            if ref is None:
                ref = corner
            print(f"  {name:8s} {ms:8.3f} ms  corner_diff={err:.4f}", flush=True)


if __name__ == "__main__":
    main()
