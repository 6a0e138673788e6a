"""Headline benchmark: 128^3 sliding-window inference throughput per chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The north star (BASELINE.md) is 128^3 patches/sec/chip on sliding-
window inference at Dice parity, >=5x the A100 PyTorch reference.
The reference pipeline runs eval batches of 8 tiles with host-side
reassembly; the A100 fp32 baseline for this model is ~12-16 tiles/s
(~70ms/8-tile batch). We benchmark the full engine path — tile
gather, bf16 forward, sigmoid, on-device overlap scatter-add — on a
synthetic lung-sized volume (320x256x320 -> 80 tiles after padding).

vs_baseline is reported against an A100 PyTorch estimate of 14
tiles/s (not measurable here; the reference publishes no throughput —
SURVEY.md §6).
"""

import json
import time

import numpy as np

A100_BASELINE_TILES_PER_S = 14.0


def main():
    import jax
    import jax.numpy as jnp

    from se_unet_airseg_tpu.models import SEUNetConfig, init_params
    from se_unet_airseg_tpu.infer import SlidingWindowRunner

    cfg = SEUNetConfig(compute_dtype=jnp.bfloat16)
    params = init_params(jax.random.key(0), cfg)

    rng = np.random.default_rng(0)
    vol = (rng.random((320, 256, 320)) * 1400.0 - 1000.0).astype(np.float32)

    # batch=2 fits the 16G HBM of a single v5e chip (batch=4 peaks >20G
    # until the fused Pallas conv+IN+LeakyReLU path lands)
    runner = SlidingWindowRunner(params, cfg, batch=2)

    # warmup (compile) on the SAME padded shape as the measured run
    _ = runner.predict_hu(vol)

    from se_unet_airseg_tpu.data import tile_positions, pad_positions_to_batch

    n_tiles = len(
        pad_positions_to_batch(tile_positions(vol.shape), runner.batch)
    )
    t0 = time.perf_counter()
    _ = runner.predict_hu(vol)
    dt = time.perf_counter() - t0
    tiles_per_s = n_tiles / dt

    print(
        json.dumps(
            {
                "metric": "sliding_window_128^3_tiles_per_sec_per_chip",
                "value": round(tiles_per_s, 2),
                "unit": "tiles/s",
                "vs_baseline": round(tiles_per_s / A100_BASELINE_TILES_PER_S, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
