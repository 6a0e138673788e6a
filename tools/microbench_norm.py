"""Microbenchmark of the SSE epilogue chain (IN -> LeakyReLU -> SE
gate) formulations on s2d tensors."""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.looptime import op_time_ms  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from se_unet_airseg_tpu.ops import leaky_relu
    from se_unet_airseg_tpu.ops.s2d import instance_norm_s2d, se_gate_s2d

    rng = np.random.default_rng(0)
    dt = jnp.bfloat16

    def in_lazy(x, eps=1e-5):
        b, d, h, w, c8 = x.shape
        c = c8 // 8
        xr = x.reshape(b, d, h, w, 8, c)
        mean = jnp.mean(xr, axis=(1, 2, 3, 4), keepdims=True,
                        dtype=jnp.float32)
        var = jnp.mean(
            jnp.square(xr.astype(jnp.float32) - mean),
            axis=(1, 2, 3, 4), keepdims=True,
        )
        y = (xr.astype(jnp.float32) - mean) * lax.rsqrt(var + eps)
        return y.astype(x.dtype).reshape(b, d, h, w, c8)

    def in_lazy_5d(x, eps=1e-5):
        """Stats via a (…, 8, c) view but normalize in 5-D (…, 8c) with
        a tiled scale/shift — avoids any 6-D intermediate."""
        b, d, h, w, c8 = x.shape
        c = c8 // 8
        xr = x.reshape(b, d, h, w, 8, c)
        mean = jnp.mean(xr, axis=(1, 2, 3, 4), dtype=jnp.float32)  # (b,c)
        var = jnp.mean(
            jnp.square(xr.astype(jnp.float32) - mean[:, None, None, None, None, :]),
            axis=(1, 2, 3, 4),
        )
        scale = lax.rsqrt(var + eps)  # (b, c)
        scale8 = jnp.tile(scale, (1, 8)).reshape(b, 1, 1, 1, c8)
        shift8 = jnp.tile(mean * scale, (1, 8)).reshape(b, 1, 1, 1, c8)
        return (x.astype(jnp.float32) * scale8 - shift8).astype(x.dtype)

    def chain_cur(x, wse):
        return se_gate_s2d(leaky_relu(instance_norm_s2d(x)), wse)

    def chain_lazy(x, wse):
        return se_gate_s2d(leaky_relu(in_lazy(x)), wse)

    def chain_lazy5(x, wse):
        return se_gate_s2d(leaky_relu(in_lazy_5d(x)), wse)

    for label, shape in (
        ("L1 (8,64^3,256)", (8, 64, 64, 64, 256)),
        ("L2 (8,32^3,512)", (8, 32, 32, 32, 512)),
    ):
        c = shape[-1] // 8
        x = jnp.asarray(rng.random(shape, np.float32)).astype(dt)
        wse = jnp.asarray(rng.random((c, 1), np.float32)).astype(dt)
        print(f"\n== {label} ==", flush=True)

        def bench(name, f, ref):
            y = jax.jit(f)(x)
            corner = np.asarray(y[0, :4, :4, :4, :].astype(jnp.float32))
            del y
            ms = op_time_ms(f, x)
            err = 0.0 if ref is None else float(np.max(np.abs(corner - ref)))
            print(f"  {name:12s} {ms:8.3f} ms  corner_diff={err:.5f}",
                  flush=True)
            return corner if ref is None else ref

        ref = None
        for name, fn in (
            ("IN_cur", lambda x: instance_norm_s2d(x)),
            ("IN_lazy", in_lazy),
            ("IN_lazy5d", in_lazy_5d),
        ):
            ref = bench(name, fn, ref)
        ref = None
        for name, fn in (
            ("chain_cur", chain_cur),
            ("chain_lazy", chain_lazy),
            ("chain_lazy5", chain_lazy5),
        ):
            ref = bench(name, lambda x, fn=fn: fn(x, wse), ref)


if __name__ == "__main__":
    main()
