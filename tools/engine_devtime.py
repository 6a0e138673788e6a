"""Device-time (xplane) measurement + per-op breakdown of the
whole-volume sliding-window program — wall time over the relay is
dominated by transfer noise, XLA op durations are not.

Usage: python tools/engine_devtime.py [dil2_mode] [--top N]
"""

import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            os.path.join(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))), ".jax_cache"),
        )
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:
        pass

    from se_unet_airseg_tpu.data import pad_positions_to_batch, tile_positions
    from se_unet_airseg_tpu.infer import SlidingWindowRunner
    from se_unet_airseg_tpu.models import SEUNetConfig, init_params
    from profile_forward import parse_xplane

    dil2 = sys.argv[1] if len(sys.argv) > 1 else "grouped"
    top = int(sys.argv[sys.argv.index("--top") + 1]) if "--top" in sys.argv else 25

    cfg = SEUNetConfig(compute_dtype=jnp.bfloat16, dil2_mode=dil2)
    params = init_params(jax.random.key(0), cfg)
    runner = SlidingWindowRunner(params, cfg, batch=int(os.environ.get("BENCH_BATCH", "8")))

    shape = (320, 256, 320)
    rng = np.random.default_rng(0)
    vol = (rng.random(shape) * 1400.0 + 24.0).astype(np.int16)
    pos = pad_positions_to_batch(tile_positions(shape), runner.batch)
    n_batches = len(pos) // runner.batch
    n_tiles = len(pos)

    run_all = runner._volume_fn(shape, n_batches)
    vol_dev = jnp.asarray(vol)
    pos_dev = jnp.asarray(pos)
    key = jax.random.key(0)
    shift = jnp.float32(-1024.0)

    def fn():
        return run_all(runner.params, runner.fast_params, vol_dev, pos_dev,
                       key, shift)

    def sync(o):
        return np.asarray(jax.tree.leaves(o)[0].ravel()[0])

    import time

    t0 = time.time()
    sync(fn())  # compile + warm
    print(f"[{dil2}] compiled+warm in {time.time()-t0:.1f}s", flush=True)

    logdir = tempfile.mkdtemp(prefix="engdev_")
    iters = 2
    with jax.profiler.trace(logdir):
        for _ in range(iters):
            out = fn()
        sync(out)
    _, _, total_ps = parse_xplane(logdir, iters=iters, top=top)
    ms = total_ps / 1e9 / iters
    print(f"\n[{dil2}] volume device time: {ms:.1f} ms "
          f"({n_tiles} tiles -> {n_tiles / (ms/1e3):.1f} tiles/s device-only)")


if __name__ == "__main__":
    main()
