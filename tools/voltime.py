"""Wall-time the cached whole-volume program (no downloads): the
device-side tiles/s ceiling for the sliding-window engine. Env knobs:
BATCH (default 8). Used to A/B model-graph variants quickly."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from se_unet_airseg_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()

    from se_unet_airseg_tpu.data.tiling import (
        pad_positions_to_batch,
        tile_positions,
    )
    from se_unet_airseg_tpu.infer import SlidingWindowRunner
    from se_unet_airseg_tpu.models import SEUNetConfig, init_params

    batch = int(os.environ.get("BATCH", "8"))
    cfg = SEUNetConfig(compute_dtype=jnp.bfloat16)
    params = init_params(jax.random.key(0), cfg)
    r = SlidingWindowRunner(params, cfg, batch=batch)
    shape = (320, 256, 320)
    vol_np = (np.random.default_rng(0).random(shape) * 1400 + 24).astype(
        np.int16
    )
    vol = jnp.asarray(vol_np)
    pos_np = pad_positions_to_batch(tile_positions(shape), batch)
    pos = jnp.asarray(pos_np)
    n_b = len(pos_np) // batch
    s2d_io = r._s2d_io_ok(shape, pos_np)
    print(f"route: s2d_io={s2d_io}")
    fn = r._volume_fn(shape, n_b, s2d_io=s2d_io)
    rng = jax.random.key(0)
    shift = jnp.float32(-1024.0)

    def sync(x):
        return float(x.ravel()[0])

    t0 = time.perf_counter()
    pred = fn(r.params, r.fast_params, vol, pos, rng, shift)
    sync(pred)
    print(f"compile+first: {time.perf_counter() - t0:.1f} s")
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        pred = fn(r.params, r.fast_params, vol, pos, rng, shift)
        sync(pred)
        times.append(time.perf_counter() - t0)
    t = min(times)
    n = len(pos_np)
    print(f"volume: {t:.3f} s, {n} tiles, {n / t:.2f} tiles/s (batch={batch})")

    # warm the block-constant codec finalize too, so a bench.py run on
    # this config is 100% cache hits (same volume program + finalize)
    summary, chunks, payload, _, _ = r.predict_trits_summary_device(
        vol_np, h_thresh=0.5, l_thresh=0.35, hu_shift=-1024.0
    )
    s = np.asarray(summary)
    mixed = int(np.count_nonzero((s >> 2) != (s & 3)))
    print(f"codec: {s.size} blocks, {mixed} mixed, {len(chunks)} chunks")
    # cross-config parity evidence: the trit field checksum must match
    # between model-graph variants (same params, same volume) up to
    # bf16 accumulation-order noise at the two thresholds
    from hashlib import sha256

    from se_unet_airseg_tpu.infer.sliding_window import (
        decode_trit_summary,
        make_chunk_fetcher,
    )

    trits = decode_trit_summary(
        s, make_chunk_fetcher(s, chunks, payload), int(np.prod(shape)), shape
    )
    counts = np.bincount(trits.ravel(), minlength=3)
    print(f"trits: counts={counts.tolist()} "
          f"sha={sha256(trits.tobytes()).hexdigest()[:16]}")


if __name__ == "__main__":
    main()
