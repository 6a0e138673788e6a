"""Decompose the train step (VERDICT r3 item 4 / ROADMAP item 10):
device-time forward-only, forward+backward, and the full optimizer
step at 128^3 bf16, across remat settings and batch sizes, via the
loop-slope timer (weights as jit args — closure constants trip the
relay's compile-payload limit).

Usage: python tools/probe_train_parts.py [B ...] (default: 8)
Env: STAGE (default 1), REMAT (default 1), SKIPWB (default unset),
     PARTS (comma list of fwd,grad,step; default all)
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

    from se_unet_airseg_tpu.losses import dice_loss
    from se_unet_airseg_tpu.models import SEUNetConfig, init_params
    from se_unet_airseg_tpu.models.se_unet import apply_fast
    from se_unet_airseg_tpu.train.step import (
        create_train_state,
        make_optimizer,
        make_train_step,
    )

    sizes = [int(a) for a in sys.argv[1:]] or [8]
    stage = int(os.environ.get("STAGE", "1"))
    remat = os.environ.get("REMAT", "1") == "1"
    if os.environ.get("SKIPWB"):
        os.environ["REMAT_SKIP_WHOLEBLOCK"] = os.environ["SKIPWB"]
    parts = (os.environ.get("PARTS", "fwd,grad,step")).split(",")

    cfg = SEUNetConfig(compute_dtype=jnp.bfloat16, remat=remat)
    params = init_params(jax.random.key(0), cfg)

    def loss_of(params, image, label, rng):
        en, de = apply_fast(params, image, cfg=cfg, train=True, rng=rng)
        p_en = jax.nn.sigmoid(en[..., 0].astype(jnp.float32))
        p_de = jax.nn.sigmoid(de[..., 0].astype(jnp.float32))
        return dice_loss(p_de, label) + dice_loss(p_en, label)

    def loop(f, k):
        # carry feeds a ~0 perturbation into the image so iterations
        # chain without CSE/hoisting
        def body(i, carry):
            out = f(carry)
            return (out * 1e-30).astype(jnp.float32)

        return jax.lax.fori_loop(0, k, body, jnp.float32(0.0))

    def slope(jf, *args, k1=1, k2=4, reps=3):
        fs = {k: jax.jit(lambda *a, _k=k: loop(
            lambda c: jf(c, *a), _k)) for k in (k1, k2)}

        def timed(f):
            float(f(*args))
            best = float("inf")
            for _ in range(reps):
                t0 = time.perf_counter()
                float(f(*args))
                best = min(best, time.perf_counter() - t0)
            return best

        t1, t2 = timed(fs[k1]), timed(fs[k2])
        return (t2 - t1) / (k2 - k1)

    for bsz in sizes:
        rng = np.random.default_rng(0)
        image = jnp.asarray(
            rng.random((bsz, 128, 128, 128, 2), np.float32), jnp.float32)
        label = jnp.asarray(
            (rng.random((bsz, 128, 128, 128)) > 0.7).astype(np.float32))
        key = jax.random.key(1)
        print(f"B={bsz} stage={stage} remat={remat} "
              f"skipwb={os.environ.get('REMAT_SKIP_WHOLEBLOCK')}",
              flush=True)

        if "fwd" in parts:
            def fwd(c, params, image, label):
                return loss_of(params, image + c.astype(image.dtype),
                               label, key)
            try:
                t = slope(fwd, params, image, label)
                print(f"  fwd      : {t*1e3:7.0f} ms ({bsz/t:.2f} "
                      f"patches/s)", flush=True)
            except Exception as e:
                print(f"  fwd      : FAILED {type(e).__name__}: "
                      f"{str(e)[:90]}", flush=True)

        if "grad" in parts:
            def gradf(c, params, image, label):
                l, g = jax.value_and_grad(loss_of)(
                    params, image + c.astype(image.dtype), label, key)
                # consume EVERY grad leaf — XLA prunes unread outputs,
                # which would silently drop most of the backward
                acc = sum(jnp.sum(leaf, dtype=jnp.float32)
                          for leaf in jax.tree.leaves(g))
                return l + acc * 1e-20
            try:
                t = slope(gradf, params, image, label)
                print(f"  fwd+bwd  : {t*1e3:7.0f} ms ({bsz/t:.2f} "
                      f"patches/s)", flush=True)
            except Exception as e:
                print(f"  fwd+bwd  : FAILED {type(e).__name__}: "
                      f"{str(e)[:90]}", flush=True)

        if "step" in parts:
            # full production step (optimizer included), plain repeats
            # (dispatch ~10 ms vs ~1 s step)
            opt, _ = make_optimizer()
            state = create_train_state(
                jax.tree.map(jnp.array, params), opt)
            step = make_train_step(opt, cfg, stage=stage)
            batch = {"image": image, "label": label}
            if stage >= 2:
                batch["weight"] = jnp.ones_like(label)
            if stage >= 3:
                batch["skel"] = label
            try:
                state, aux = step(state, batch, key)
                float(aux["loss"])
                ts = []
                for i in range(4):
                    t0 = time.perf_counter()
                    state, aux = step(state, batch,
                                      jax.random.fold_in(key, i))
                    float(aux["loss"])
                    ts.append(time.perf_counter() - t0)
                ts.sort()
                print(f"  full step: {ts[1]*1e3:7.0f} ms ({bsz/ts[1]:.2f} "
                      f"patches/s)", flush=True)
            except Exception as e:
                print(f"  full step: FAILED {type(e).__name__}: "
                      f"{str(e)[:90]}", flush=True)


if __name__ == "__main__":
    main()
