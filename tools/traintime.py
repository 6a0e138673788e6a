"""A/B the stage-1 train step (128^3, bf16 + remat, fast path) with
the fused Pallas epilogue on vs off. Env: B (default 2), STAGE (1).

Usage: python tools/traintime.py [epi|xla|both]
"""

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

    from se_unet_airseg_tpu.models import SEUNetConfig, init_params
    from se_unet_airseg_tpu.train.step import (
        create_train_state,
        make_optimizer,
        make_train_step,
    )

    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    bsz = int(os.environ.get("B", "2"))
    stage = int(os.environ.get("STAGE", "1"))
    rng = np.random.default_rng(0)
    batch = {
        "image": jnp.asarray(rng.random((bsz, 128, 128, 128, 2), np.float32)),
        "label": jnp.asarray(
            (rng.random((bsz, 128, 128, 128)) > 0.7).astype(np.float32)
        ),
    }
    if stage >= 2:
        batch["weight"] = jnp.ones((bsz, 128, 128, 128), jnp.float32)
    if stage >= 3:
        batch["skel"] = batch["label"]
    key = jax.random.key(1)
    modes = {"epi": True, "xla": False}
    names = list(modes) if which == "both" else [which]
    for name in names:
        cfg = SEUNetConfig(compute_dtype=jnp.bfloat16, remat=True,
                           use_pallas_epi=modes[name])
        params = init_params(jax.random.key(0), cfg)
        opt, _ = make_optimizer()
        state = create_train_state(params, opt)
        step = make_train_step(opt, cfg, stage=stage)
        t0 = time.perf_counter()
        state, aux = step(state, batch, key)
        float(aux["loss"])
        print(f"{name}: compile+first {time.perf_counter() - t0:.1f} s",
              flush=True)
        times = []
        for i in range(5):
            t0 = time.perf_counter()
            state, aux = step(state, batch, jax.random.fold_in(key, i))
            float(aux["loss"])
            times.append(time.perf_counter() - t0)
        times.sort()
        print(f"{name}: step p50 {times[2]*1e3:.0f} ms min "
              f"{times[0]*1e3:.0f} ms  ({bsz/times[2]:.2f} patches/s)",
              flush=True)


if __name__ == "__main__":
    main()
