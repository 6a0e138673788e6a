"""One-shot Mosaic legality + timing probe of the batch-minor gathered
epilogue kernel at a production-like shape (64-grid, 128 lanes, B=8).
Run on the real TPU; ONE Mosaic compile."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from se_unet_airseg_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()

    from se_unet_airseg_tpu.ops.pallas_s2d import gated_norm_block_bm
    from se_unet_airseg_tpu.ops.s2d import se_gate_weights

    n, co, b = 64, 16, 8
    r = np.random.default_rng(0)
    y = jnp.asarray(r.standard_normal((n, n, n, b, 8 * co)).astype(np.float32),
                    jnp.bfloat16)
    wse = jnp.asarray(r.standard_normal((co, 1)).astype(np.float32) * 0.1)
    wg, oh = se_gate_weights(wse, jnp.bfloat16)
    wgs = jnp.pad(wg, ((0, 0), (0, 128 - wg.shape[1])))[None]
    oh = jnp.pad(oh, ((0, 128 - oh.shape[0]), (0, 0)))

    fn = jax.jit(lambda t: gated_norm_block_bm(t, wgs, oh))
    t0 = time.time()
    out = fn(y)
    s = float(jnp.sum(out.astype(jnp.float32)))
    print(f"compile+first {time.time()-t0:.1f} s, sum={s:.3f}", flush=True)
    for _ in range(3):
        t0 = time.time()
        s = float(jnp.sum(fn(y).astype(jnp.float32)))
        print(f"iter {1e3*(time.time()-t0):.1f} ms", flush=True)


if __name__ == "__main__":
    main()
