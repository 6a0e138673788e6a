"""Compile the engine's tile-batch step and quantify LAYOUT-CHANGE
copies in the optimized HLO — the round-3 profile shows relayout
copies (sync %copy + async %copy-start/done pairs) are ~60% of device
time, so comparing configs by total copy BYTES is a fast proxy that
costs one remote compile instead of a timed A/B.

Env knobs (same ones apply_fast reads): PALLAS_EPI, FASTPATH_BM,
DIL2_MODE[_EC3/5/6], FASTPATH_EC12_PHASED.

Usage: python tools/hlo_copies.py [tag]
"""
import os
import re
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SHAPE_RE = re.compile(r"(bf16|f32|s32|u32|s16|u8|pred|s8)\[([0-9,]*)\]")
DTSIZE = {"bf16": 2, "f32": 4, "s32": 4, "u32": 4, "s16": 2, "u8": 1,
          "pred": 1, "s8": 1}


def shape_bytes(text):
    m = SHAPE_RE.search(text)
    if not m:
        return 0
    n = 1
    for d in m.group(2).split(","):
        if d:
            n *= int(d)
    return n * DTSIZE[m.group(1)]


def main():
    tag = sys.argv[1] if len(sys.argv) > 1 else "cur"
    import jax
    import jax.numpy as jnp

    from se_unet_airseg_tpu.models import SEUNetConfig, init_params
    from se_unet_airseg_tpu.infer import SlidingWindowRunner
    from se_unet_airseg_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()

    cfg = SEUNetConfig(compute_dtype=jnp.bfloat16)
    params = init_params(jax.random.key(0), cfg)
    runner = SlidingWindowRunner(params, cfg, batch=8)
    vol = jnp.zeros((320, 256, 320), jnp.int16)
    pred0 = jnp.zeros((320, 256, 320), jnp.float32)
    pos = jnp.zeros((8, 3), jnp.int32)
    step = jax.jit(runner._step_fn_logic())
    lowered = step.lower(runner.params, runner.fast_params, vol, pred0,
                         pos, jax.random.key(0), jnp.float32(-1024.0))
    compiled = lowered.compile()
    txt = compiled.as_text()
    out = f"/tmp/hlo_{tag}.txt"
    with open(out, "w") as f:
        f.write(txt)

    copy_b = copy_n = async_b = async_n = 0
    by_shape = {}
    for line in txt.splitlines():
        s = line.strip()
        if re.match(r"%?copy(\.\d+)?\s*=", s) or " = " in s and re.match(
                r"%?[\w.-]+ = .*\bcopy\(", s) and "copy-" not in s:
            b = shape_bytes(s)
            copy_b += b
            copy_n += 1
            key = SHAPE_RE.search(s).group(0) if SHAPE_RE.search(s) else "?"
            by_shape[key] = by_shape.get(key, 0) + b
        elif "copy-start" in s and "=" in s:
            b = shape_bytes(s)
            async_b += b
            async_n += 1
            key = SHAPE_RE.search(s).group(0) if SHAPE_RE.search(s) else "?"
            by_shape[key] = by_shape.get(key, 0) + b
    print(f"[{tag}] sync copies: {copy_n} ops {copy_b/1e9:.2f} GB; "
          f"async copy-starts: {async_n} ops {async_b/1e9:.2f} GB; "
          f"hlo -> {out}")
    top = sorted(by_shape.items(), key=lambda kv: -kv[1])[:12]
    for k, v in top:
        print(f"    {v/1e6:9.1f} MB  {k}")


if __name__ == "__main__":
    main()
