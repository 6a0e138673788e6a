"""Whole-volume sliding-window inference, entirely on device.

The reference streams 128^3 tiles through the net one DataLoader batch
at a time, copying every tile host->GPU and every probability map
GPU->host, then reassembles with numpy scatter-adds (reference
train.py:682-691, test.py:151-161, prediction.py:80-107). That is
bandwidth-suicide on TPU. Here the ENTIRE volume is resident in HBM
once; tile gather (dynamic_slice), the batched forward, and the
overlap scatter-add accumulation all run inside a single jit per tile
batch, so the only host<->device traffic is one volume upload and one
mask download.

Recompilation control: volumes are padded (with air, -1024 HU) so
D/H/W are multiples of `step`; the jitted step is cached per padded
volume shape, and the tile batch is a fixed static size.

Two output conventions, both in the reference:
  * probabilities (sigmoid) averaged over overlaps — validation/test;
  * raw-logit threshold 0.5, NO sigmoid — the pred_1/pred_2 prior
    generators (reference save_gradients.py:130-137,
    weight_br.py:94-102). Pass `use_sigmoid=False` for those.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..data.tiling import pad_positions_to_batch, tile_positions
from ..models.se_unet import SEUNetConfig, apply as se_unet_apply
from ..ops import hu_dual_window


def _pad_to_multiple(vol: np.ndarray, multiple: int, cube: int, fill: float):
    shape = np.asarray(vol.shape)
    target = np.maximum(np.ceil(shape / multiple).astype(int) * multiple, cube)
    pads = [(0, int(t - s)) for s, t in zip(shape, target)]
    if all(p == (0, 0) for p in pads):
        return vol, shape
    return np.pad(vol, pads, constant_values=fill), shape


class SlidingWindowRunner:
    """Jitted tile-batch engine; one instance per (params, config)."""

    def __init__(
        self,
        params,
        cfg: SEUNetConfig = SEUNetConfig(),
        *,
        cube: int = 128,
        step: int = 64,
        batch: int = 4,
        head: str = "decoder",
        use_sigmoid: bool = True,
        train_mode: bool = False,
        donate_accumulators: bool = True,
    ):
        self.params = params
        self.cfg = cfg
        self.cube = cube
        self.step = step
        self.batch = batch
        self.head_idx = {"encoder": 0, "decoder": 1}[head]
        self.use_sigmoid = use_sigmoid
        self.train_mode = train_mode
        self._step_fn = self._build_step(donate_accumulators)

    def _build_step(self, donate: bool):
        cube, batch = self.cube, self.batch
        cfg, head_idx, use_sigmoid = self.cfg, self.head_idx, self.use_sigmoid
        train_mode = self.train_mode

        def step(params, vol, pred, cnt, positions, rng):
            # gather a fixed-size batch of tiles from the resident volume
            def gather(pos):
                return jax.lax.dynamic_slice(
                    vol, (pos[0], pos[1], pos[2], 0), (cube, cube, cube, 2)
                )

            tiles = jax.vmap(gather)(positions)  # (B, c, c, c, 2)
            outs = se_unet_apply(
                params, tiles, cfg=cfg, train=train_mode,
                rng=rng if train_mode else None,
            )
            p = outs[head_idx][..., 0].astype(jnp.float32)
            if use_sigmoid:
                p = jax.nn.sigmoid(p)

            # overlap accumulation: sequential read-modify-write per tile
            # (tiles in one batch may overlap, so this cannot be a vmap)
            def body(i, carry):
                pred, cnt = carry
                pos = positions[i]
                idx = (pos[0], pos[1], pos[2])
                cur = jax.lax.dynamic_slice(pred, idx, (cube, cube, cube))
                pred = jax.lax.dynamic_update_slice(pred, cur + p[i], idx)
                curc = jax.lax.dynamic_slice(cnt, idx, (cube, cube, cube))
                cnt = jax.lax.dynamic_update_slice(
                    cnt, curc + jnp.float32(1), idx
                )
                return pred, cnt

            pred, cnt = jax.lax.fori_loop(0, batch, body, (pred, cnt))
            return pred, cnt

        donate_argnums = (2, 3) if donate else ()
        return jax.jit(step, donate_argnums=donate_argnums)

    def predict_hu(self, hu_volume: np.ndarray, rng=None) -> np.ndarray:
        """HU volume (D,H,W) -> float32 probability/score volume.

        Windows on device, tiles, runs the net, averages overlaps and
        crops padding back off.
        """
        vol_np, orig_shape = _pad_to_multiple(
            hu_volume.astype(np.float32), self.step, self.cube, fill=-1024.0
        )
        pos = tile_positions(vol_np.shape, self.cube, self.step)
        pos = pad_positions_to_batch(pos, self.batch)

        vol = hu_dual_window(jnp.asarray(vol_np))  # (D,H,W,2) on device
        pred = jnp.zeros(vol_np.shape, jnp.float32)
        cnt = jnp.zeros(vol_np.shape, jnp.float32)
        if rng is None:
            rng = jax.random.key(0)
        n_batches = len(pos) // self.batch
        rngs = jax.random.split(rng, n_batches)
        for b in range(n_batches):
            pb = jnp.asarray(pos[b * self.batch : (b + 1) * self.batch])
            pred, cnt = self._step_fn(self.params, vol, pred, cnt, pb, rngs[b])
        out = pred / jnp.maximum(cnt, 1.0)
        out = np.asarray(out)
        d, h, w = orig_shape
        return out[:d, :h, :w]
