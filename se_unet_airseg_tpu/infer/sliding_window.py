"""Whole-volume sliding-window inference, entirely on device.

The reference streams 128^3 tiles through the net one DataLoader batch
at a time, copying every tile host->GPU and every probability map
GPU->host, then reassembles with numpy scatter-adds (reference
train.py:682-691, test.py:151-161, prediction.py:80-107). That is
bandwidth-suicide on TPU. Here the ENTIRE volume is resident in HBM
once; tile gather (dynamic_slice), the batched forward (the s2d fast
path by default), and the overlap scatter-add accumulation all run
inside a single jit per tile batch, so the only host<->device traffic
is one volume upload and one result download.

Downloads are the bottleneck on tunneled TPU hosts, so the engine can
emit, instead of the float32 probability volume, a "trit" field
(0 = below low threshold, 1 = hysteresis band, 2 = seed) packed base-3
at 5 voxels/byte — a 20x smaller download that losslessly preserves
everything the double-threshold-iteration + largest-CC postprocessing
needs.

Two score conventions, both in the reference:
  * probabilities (sigmoid) averaged over overlaps — validation/test;
  * raw-logit threshold 0.5, NO sigmoid — the pred_1/pred_2 prior
    generators (reference save_gradients.py:130-137,
    weight_br.py:94-102). Pass `use_sigmoid=False` for those.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from ..data.tiling import pad_positions_to_batch, tile_positions
from ..models.se_unet import SEUNetConfig, apply as se_unet_apply, apply_fast
from ..ops import hu_dual_window


def _pad_to_cube(vol: np.ndarray, cube: int, fill: float):
    """Pad only volumes smaller than one cube (dynamic_slice legality).

    Tile positions are computed on the (possibly padded) extents with
    boundary windows clamped INWARD into real data — the reference's
    tiling semantics (reference data.py:731-773, prediction.py:83-101).
    Border tiles therefore see real anatomy, never synthetic-air fill
    (round-1 padded to a step multiple, which deviated at volume
    edges)."""
    shape = np.asarray(vol.shape)
    target = np.maximum(shape, cube)
    pads = [(0, int(t - s)) for s, t in zip(shape, target)]
    if all(p == (0, 0) for p in pads):
        return vol, shape
    return np.pad(vol, pads, constant_values=fill), shape


def unpack_trits(packed: np.ndarray, n_voxels: int, shape) -> np.ndarray:
    """Inverse of the device-side base-3 5-voxel/byte packing."""
    b = packed.reshape(-1).astype(np.uint8)
    out = np.empty(b.size * 5, np.uint8)
    for k in range(5):
        out[k::5] = b % 3
        if k < 4:
            b = b // 3
    return out[:n_voxels].reshape(shape)


# --- block-constant trit codec ---------------------------------------
# The trit field is overwhelmingly block-constant: background far from
# the airway is all-0, saturated interior all-2; only hysteresis-band
# boundary blocks are mixed. The engine therefore emits a per-block
# min/max summary (2 bits each, one byte per VOX_PER_BLOCK voxels)
# next to the base-3 payload, with the payload split into fixed-size
# chunks that are SEPARATE jit outputs: the host fetches the tiny
# summary, then only the payload chunks containing a mixed block.
# Every fetch is a plain D2H copy of an already-computed buffer — no
# device program runs at fetch time, so the multi-volume pipeline
# never stalls behind in-flight compute. (The reference downloads full
# fp32 probability maps per tile — test.py:151-161.)
VOX_PER_BLOCK = 10240  # divisible by 5 -> 2048 payload bytes per block
BLOCKS_PER_CHUNK = 16  # 32 KiB per fetchable payload chunk


def decode_trit_summary(summary: np.ndarray, fetch_chunk, n_voxels: int,
                        shape) -> np.ndarray:
    """Rebuild the trit volume from a block summary.

    `fetch_chunk(i)` returns payload chunk i as a uint8 array (for
    device outputs: `lambda i: np.asarray(chunks[i])`); it is called
    only for chunks that contain at least one mixed block."""
    s = np.asarray(summary, np.uint8)
    mn, mx = s >> 2, s & 3
    out = np.empty((s.size, VOX_PER_BLOCK), np.uint8)
    const = mn == mx
    out[const] = mn[const, None]
    mixed = np.flatnonzero(~const)
    bpb = VOX_PER_BLOCK // 5
    for c in np.unique(mixed // BLOCKS_PER_CHUNK):
        data = np.asarray(fetch_chunk(int(c)), np.uint8).reshape(-1, bpb)
        sel = mixed[(mixed // BLOCKS_PER_CHUNK) == c]
        local = sel - int(c) * BLOCKS_PER_CHUNK
        out[sel] = unpack_trits(
            data[local], len(sel) * VOX_PER_BLOCK, (len(sel), VOX_PER_BLOCK)
        )
    return out.reshape(-1)[:n_voxels].reshape(shape)


# cost model for the fetch-route choice: each D2H copy pays a tunnel
# roundtrip (~10-30 ms) regardless of size; large copies stream at
# ~33 MB/s. Overridable for other links via env.
FETCH_RTT_S = float(os.environ.get("AIRSEG_FETCH_RTT_S", "0.014"))
FETCH_BW = float(os.environ.get("AIRSEG_FETCH_BW", "33e6"))  # bytes/s


def make_chunk_fetcher(summary_np: np.ndarray, chunks, payload=None,
                       frac: float | None = None):
    """Build the `fetch_chunk` callback for `decode_trit_summary`.

    Route on estimated cost, not mixed-block FRACTION: n_need chunk
    copies cost n_need roundtrips; the whole payload costs one
    roundtrip plus bytes/bandwidth. (The round-4 fraction rule left a
    0.6%-mixed 320^3 volume on the per-chunk route — 160 roundtrips,
    2.2 s measured — where one 5.2 MB streamed copy takes ~0.17 s.)
    Real airway fields stay on the chunk route: tens of mixed chunks,
    KBs total. Both routes are plain D2H copies of already-computed
    buffers (no device program at fetch time)."""
    if payload is not None:
        s = np.asarray(summary_np, np.uint8)
        mixed = np.flatnonzero((s >> 2) != (s & 3))
        n_need = len(np.unique(mixed // BLOCKS_PER_CHUNK))
        if frac is not None:  # legacy fraction override (tests)
            take_whole = len(chunks) and n_need > frac * len(chunks)
        else:
            payload_bytes = int(np.prod(payload.shape))
            take_whole = (n_need * FETCH_RTT_S
                          > FETCH_RTT_S + payload_bytes / FETCH_BW)
        if take_whole:
            p = np.asarray(payload).reshape(len(chunks), -1)
            return lambda i: p[i]
    return lambda i: np.asarray(chunks[i])


def trits_to_scores(trits: np.ndarray, h_thresh: float, l_thresh: float) -> np.ndarray:
    """Synthesize a score volume with the same DTI behavior as the
    original: seeds -> h, band -> l, rest -> 0."""
    lut = np.array([0.0, l_thresh, h_thresh], np.float32)
    return lut[trits]


class SlidingWindowRunner:
    """Jitted tile-batch engine; one instance per (params, config)."""

    def __init__(
        self,
        params,
        cfg: SEUNetConfig = SEUNetConfig(),
        *,
        cube: int = 128,
        step: int = 64,
        batch: int = 1,
        head: str = "decoder",
        use_sigmoid: bool = True,
        train_mode: bool = False,
        fast: bool = True,
        mesh=None,
    ):
        """`mesh`: optional device mesh — the tile batch is sharded over
        its `data` axis (tiles are independent, SURVEY.md §5.7 plan a),
        so a batch of N tiles runs N-way data-parallel per step; the
        overlap accumulation stays replicated (XLA all-gathers the
        per-tile probabilities, which are small next to the forward).
        `batch` must be a multiple of the data-axis size."""
        if mesh is not None:
            # single-device Pallas kernels (conv and epilogue) don't
            # partition over a mesh — force the XLA compositions
            import dataclasses as _dc

            cfg = _dc.replace(
                cfg,
                use_pallas=(False if cfg.use_pallas is None
                            else cfg.use_pallas),
                use_pallas_epi=(False if cfg.use_pallas_epi is None
                                else cfg.use_pallas_epi),
            )
        self.params = params
        self.cfg = cfg
        self.cube = cube
        self.step = step
        self.batch = batch
        self.head_idx = {"encoder": 0, "decoder": 1}[head]
        self.use_sigmoid = use_sigmoid
        self.train_mode = train_mode
        self.mesh = mesh
        self.fast = fast
        self.apply_fn = apply_fast if fast else se_unet_apply
        self._prepare = None
        self.fast_params = None
        if fast:
            from ..models.se_unet import prepare_fast_params

            # ONE device-side program building every transformed weight;
            # the result is passed as explicit jit arguments so the
            # volume program contains no host-streamed constants
            self._prepare = jax.jit(
                lambda p: prepare_fast_params(p, self.cfg, n=cube // 2)
            )
            self.fast_params = self._prepare(params)
        self._finalize_prob = jax.jit(lambda p, inv: p * inv)
        self._finalize_trits = jax.jit(self._trit_pack, static_argnums=(2, 3))
        self._finalize_summary = jax.jit(
            self._trit_summary, static_argnums=(2, 3)
        )
        # whole-volume programs, cached per (padded_shape, n_batches):
        # one device dispatch per volume instead of one per tile batch
        # (each dispatch costs ~50 ms over tunneled hosts)
        self._volume_fns: dict = {}
        # reciprocal overlap counts, cached per padded shape — LRU-
        # capped: each entry is a device-resident f32 volume (~100-400
        # MB), and a many-case loop (73 ATM22 volumes, one cut shape
        # each) must not accumulate them in HBM. Recomputing on a miss
        # is a cheap host pass; the compiled programs above stay
        # uncapped (re-compiles are the expensive resource).
        from collections import OrderedDict

        self._inv_cnt_cache: OrderedDict = OrderedDict()
        self._inv_cnt_cap = 2

    def set_params(self, params) -> "SlidingWindowRunner":
        """Swap the parameter pytree WITHOUT invalidating the compiled
        whole-volume programs (params enter them as a runtime argument).
        Lets the per-epoch validation of stages 2/3 reuse one runner
        instead of re-tracing the volume program every epoch."""
        self.params = params
        if self._prepare is not None:
            self.fast_params = self._prepare(params)
        return self

    def _s2d_io_ok(self, padded_shape, pos: np.ndarray) -> bool:
        """The s2d-resident volume route (fold the volume to
        (D/2, H/2, W/2*8) once, gather/window/forward/accumulate in
        s2d layout, unfold once per volume) needs even extents and
        even tile positions. Reference tiling clamps the last window
        to dim-cube (reference data.py:731-773), so odd volumes fall
        back to the per-tile-relayout route — values are identical
        either way (tests assert it)."""
        import os

        if os.environ.get("SW_S2D", "1") != "1":
            return False
        if not self.fast or self.mesh is not None:
            return False
        if os.environ.get("FASTPATH_BM", "0") == "1":
            return False
        if self.cfg.n_classes != 1 or self.cube % 2:
            return False
        if any(int(d) % 2 for d in padded_shape):
            return False
        return not (np.asarray(pos) % 2).any()

    def _step_fn_logic(self):
        cube, batch = self.cube, self.batch
        cfg, head_idx, use_sigmoid = self.cfg, self.head_idx, self.use_sigmoid
        train_mode, apply_fn = self.train_mode, self.apply_fn
        fast = self.fast

        def step(params, fp, vol, pred, positions, rng, shift):
            def gather(pos):
                return jax.lax.dynamic_slice(
                    vol, (pos[0], pos[1], pos[2]), (cube, cube, cube)
                )

            # gather the RAW (int16) tiles and window per tile — the
            # full-volume f32 windowed copy (210 MB at 320^3) never
            # materializes
            raw = jax.vmap(gather)(positions)  # (B, c, c, c)
            tiles = hu_dual_window(raw.astype(jnp.float32) + shift)
            if self.mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec as P

                tiles = jax.lax.with_sharding_constraint(
                    tiles, NamedSharding(self.mesh, P(self.mesh.axis_names[0]))
                )
            kw = {"fast_params": fp} if fast else {}
            outs = apply_fn(
                params, tiles, cfg=cfg, train=train_mode,
                rng=rng if train_mode else None, **kw,
            )
            p = outs[head_idx][..., 0].astype(jnp.float32)
            if use_sigmoid:
                p = jax.nn.sigmoid(p)

            # overlap accumulation: sequential read-modify-write per tile
            # (tiles within a batch may overlap, so no vmap here). The
            # overlap COUNT volume is a per-shape constant computed on
            # host (see _inv_count) — only probabilities accumulate.
            def body(i, pred):
                pos = positions[i]
                idx = (pos[0], pos[1], pos[2])
                cur = jax.lax.dynamic_slice(pred, idx, (cube, cube, cube))
                return jax.lax.dynamic_update_slice(pred, cur + p[i], idx)

            return jax.lax.fori_loop(0, batch, body, pred)

        return step

    def _step_fn_logic_s2d(self):
        """Tile-batch step against the s2d-FOLDED volume
        (D/2, H/2, (W/2)*8): gather+window feed the model's s2d entry
        directly and the s2d heads accumulate without the per-batch
        full-res depth_to_space (round-4 profile: the exit d2s copies
        and the entry relayout cost ~9 ms of a 239 ms batch)."""
        cube, batch = self.cube, self.batch
        cfg, head_idx, use_sigmoid = self.cfg, self.head_idx, self.use_sigmoid
        train_mode, apply_fn = self.train_mode, self.apply_fn
        n = cube // 2

        def step(params, fp, vol_s2d, pred, positions, rng, shift):
            def gather(pos):
                return jax.lax.dynamic_slice(
                    vol_s2d,
                    (pos[0] // 2, pos[1] // 2, (pos[2] // 2) * 8),
                    (n, n, n * 8),
                )

            raw = jax.vmap(gather)(positions)  # (B, n, n, n*8) int16/f32
            raw = raw.reshape(batch, n, n, n, 8)
            # (B,n,n,n,8,2) -> (…,16): phase-major lanes q*2+ch, the
            # space_to_depth entry order — a contiguous minor merge
            tiles = hu_dual_window(raw.astype(jnp.float32) + shift)
            tiles = tiles.reshape(batch, n, n, n, 16)
            outs = apply_fn(
                params, tiles, cfg=cfg, train=train_mode,
                rng=rng if train_mode else None, fast_params=fp,
                x_is_s2d=True, heads_s2d=True,
            )
            # s2d head: (B,n,n,n,8*n_classes); n_classes==1 is gated
            # by _s2d_io_ok, so the 8 lanes ARE the d2s cells
            p = outs[head_idx].astype(jnp.float32)
            if use_sigmoid:
                p = jax.nn.sigmoid(p)
            p = p.reshape(batch, n, n, n * 8)

            def body(i, pred):
                pos = positions[i]
                idx = (pos[0] // 2, pos[1] // 2, (pos[2] // 2) * 8)
                cur = jax.lax.dynamic_slice(pred, idx, (n, n, n * 8))
                return jax.lax.dynamic_update_slice(pred, cur + p[i], idx)

            return jax.lax.fori_loop(0, batch, body, pred)

        return step

    @staticmethod
    def _trit_summary(pred, inv_cnt, h_thresh: float, l_thresh: float):
        """Block-constant codec: per-block (min<<2 | max) summary byte
        plus the base-3 payload split into BLOCKS_PER_CHUNK-block
        chunks, each its own output buffer (see decode_trit_summary)."""
        avg = pred * inv_cnt
        trit = (
            (avg >= l_thresh).astype(jnp.uint8)
            + (avg >= h_thresh).astype(jnp.uint8)
        ).reshape(-1)
        pad = (-trit.shape[0]) % VOX_PER_BLOCK
        if pad:
            trit = jnp.concatenate([trit, jnp.zeros(pad, jnp.uint8)])
        tb = trit.reshape(-1, VOX_PER_BLOCK)
        summary = (tb.min(axis=1) * 4 + tb.max(axis=1)).astype(jnp.uint8)
        t5 = tb.reshape(tb.shape[0], VOX_PER_BLOCK // 5, 5)
        payload = (t5[..., 0] + 3 * t5[..., 1] + 9 * t5[..., 2]
                   + 27 * t5[..., 3] + 81 * t5[..., 4])
        cpad = (-tb.shape[0]) % BLOCKS_PER_CHUNK
        if cpad:
            # padded blocks summarize as constant-0: never fetched on
            # their own, decode to background if a neighbor drags the
            # chunk in, and fall off the n_voxels slice either way
            payload = jnp.concatenate(
                [payload, jnp.zeros((cpad, VOX_PER_BLOCK // 5), jnp.uint8)])
            summary = jnp.concatenate([summary, jnp.zeros(cpad, jnp.uint8)])
        chunks = tuple(
            payload[i:i + BLOCKS_PER_CHUNK].reshape(-1)
            for i in range(0, payload.shape[0], BLOCKS_PER_CHUNK)
        )
        # the full payload as ONE extra output buffer: when most
        # chunks are mixed, one big D2H copy beats hundreds of
        # per-chunk roundtrips (the tunnel charges ~10-30 ms latency
        # per copy but streams large transfers at full rate)
        return summary, chunks, payload.reshape(-1)

    @staticmethod
    def _trit_pack(pred, inv_cnt, h_thresh: float, l_thresh: float):
        avg = pred * inv_cnt
        trit = (
            (avg >= l_thresh).astype(jnp.uint8)
            + (avg >= h_thresh).astype(jnp.uint8)
        ).reshape(-1)
        n = trit.shape[0]
        # base-3, 5 voxels/byte (3^5 = 243): 20% less download than the
        # 2-bit pack — the tunneled device->host fetch is the engine's
        # one serial channel, so its rate bounds volume throughput
        pad = (-n) % 5
        if pad:
            trit = jnp.concatenate([trit, jnp.zeros(pad, jnp.uint8)])
        t = trit.reshape(-1, 5)
        return (t[:, 0] + 3 * t[:, 1] + 9 * t[:, 2] + 27 * t[:, 3]
                + 81 * t[:, 4])

    def _volume_fn(self, padded_shape: tuple, n_batches: int,
                   s2d_io: bool = False):
        """One jitted program for the WHOLE volume: fori_loop over tile
        batches (raw-tile gather -> per-tile windowing -> forward ->
        overlap scatter-add). Returns the probability SUM volume; the
        overlap average divides by the per-shape count constant.

        `s2d_io`: fold the volume to s2d layout once, run the whole
        loop in s2d (see _step_fn_logic_s2d), unfold the SUM volume
        once at the end — the returned contract is unchanged."""
        key = (padded_shape, n_batches, s2d_io)
        fn = self._volume_fns.get(key)
        if fn is not None:
            return fn
        batch = self.batch

        if s2d_io:
            step = self._step_fn_logic_s2d()
            d, h, w = padded_shape
            d2, h2, w2 = d // 2, h // 2, w // 2

            def run_all(params, fp, vol_hu, positions, rng, shift):
                v = vol_hu.reshape(d2, 2, h2, 2, w2, 2)
                v = v.transpose(0, 2, 4, 1, 3, 5).reshape(d2, h2, w2 * 8)
                pred = jnp.zeros((d2, h2, w2 * 8), jnp.float32)

                def body(i, pred):
                    pb = jax.lax.dynamic_slice_in_dim(
                        positions, i * batch, batch)
                    return step(params, fp, v, pred, pb,
                                jax.random.fold_in(rng, i), shift)

                pred = jax.lax.fori_loop(0, n_batches, body, pred)
                # one per-volume unfold back to voxel order
                pred = pred.reshape(d2, h2, w2, 2, 2, 2)
                return pred.transpose(0, 3, 1, 4, 2, 5).reshape(d, h, w)
        else:
            step = self._step_fn_logic()

            def run_all(params, fp, vol_hu, positions, rng, shift):
                pred = jnp.zeros(padded_shape, jnp.float32)

                def body(i, pred):
                    pb = jax.lax.dynamic_slice_in_dim(
                        positions, i * batch, batch)
                    return step(params, fp, vol_hu, pred, pb,
                                jax.random.fold_in(rng, i), shift)

                return jax.lax.fori_loop(0, n_batches, body, pred)

        fn = jax.jit(run_all)
        self._volume_fns[key] = fn
        return fn

    def _inv_count(self, padded_shape: tuple, pos: np.ndarray):
        """Reciprocal overlap-count volume — a pure function of the
        tile grid, computed once per shape on host and cached on
        device (the in-loop count accumulation cost a full
        read-modify-write pass per tile)."""
        key = (padded_shape, len(pos))
        inv = self._inv_cnt_cache.get(key)
        if inv is None:
            cnt = np.zeros(padded_shape, np.float32)
            c = self.cube
            for x, y, z in np.asarray(pos):
                cnt[x : x + c, y : y + c, z : z + c] += 1.0
            inv = jnp.asarray(1.0 / np.maximum(cnt, 1.0))
            self._inv_cnt_cache[key] = inv
            while len(self._inv_cnt_cache) > self._inv_cnt_cap:
                self._inv_cnt_cache.popitem(last=False)
        else:
            self._inv_cnt_cache.move_to_end(key)
        return inv

    def _run(self, hu_volume: np.ndarray, rng, hu_shift: float = 0.0):
        # integer CT volumes (the stored data_cut contract is int16
        # HU+1024) upload at half the bytes; the shift to true HU and
        # the f32 conversion happen on device
        keep_dtype = hu_volume.dtype if hu_volume.dtype == np.int16 else np.float32
        fill = -1024.0 - hu_shift
        vol_np, orig_shape = _pad_to_cube(
            hu_volume.astype(keep_dtype), self.cube, fill=fill
        )
        pos = tile_positions(vol_np.shape, self.cube, self.step)
        pos = pad_positions_to_batch(pos, self.batch)

        if rng is None:
            rng = jax.random.key(0)
        n_batches = len(pos) // self.batch
        run_all = self._volume_fn(
            tuple(vol_np.shape), n_batches,
            s2d_io=self._s2d_io_ok(vol_np.shape, pos),
        )
        inv_cnt = self._inv_count(tuple(vol_np.shape), pos)
        pred = run_all(
            self.params, self.fast_params, jnp.asarray(vol_np),
            jnp.asarray(pos), rng, jnp.float32(hu_shift),
        )
        return pred, inv_cnt, vol_np.shape, orig_shape

    def predict_hu(self, hu_volume: np.ndarray, rng=None,
                   hu_shift: float = 0.0) -> np.ndarray:
        """HU volume (D,H,W) -> float32 averaged score volume.

        `hu_shift` is added on device (pass -1024 with the stored
        int16 HU+1024 volumes to halve the upload)."""
        pred, inv_cnt, _, orig = self._run(hu_volume, rng, hu_shift)
        out = np.asarray(self._finalize_prob(pred, inv_cnt))
        d, h, w = orig
        return out[:d, :h, :w]

    def predict_trits_device(
        self, hu_volume: np.ndarray, *, h_thresh: float = 0.5,
        l_thresh: float = 0.4, rng=None, hu_shift: float = 0.0,
    ):
        """Dispatch the whole-volume program WITHOUT fetching: returns
        (packed_device_array, padded_shape, orig_shape). Dispatch is
        asynchronous, so several volumes can be enqueued back-to-back
        and fetched in order — the device computes volume k+1 while
        volume k's (slow, tunneled) download drains."""
        pred, inv_cnt, padded_shape, orig = self._run(hu_volume, rng, hu_shift)
        packed = self._finalize_trits(
            pred, inv_cnt, float(h_thresh), float(l_thresh)
        )
        return packed, padded_shape, orig

    def predict_trits_summary_device(
        self, hu_volume: np.ndarray, *, h_thresh: float = 0.5,
        l_thresh: float = 0.4, rng=None, hu_shift: float = 0.0,
    ):
        """Dispatch the whole-volume program emitting the block-
        constant codec: returns (summary, payload_chunks, payload,
        padded_shape, orig_shape), all device-resident. Fetch the
        summary, then either the mixed chunks or the one whole-payload
        buffer — `make_chunk_fetcher` picks (on airway fields the
        chunk route is a few hundred KB instead of the full payload;
        on dense fields one payload copy beats per-chunk roundtrips)."""
        pred, inv_cnt, padded_shape, orig = self._run(hu_volume, rng, hu_shift)
        summary, chunks, payload = self._finalize_summary(
            pred, inv_cnt, float(h_thresh), float(l_thresh)
        )
        return summary, chunks, payload, padded_shape, orig

    def predict_trits(
        self, hu_volume: np.ndarray, *, h_thresh: float = 0.5,
        l_thresh: float = 0.4, rng=None, hu_shift: float = 0.0,
    ) -> np.ndarray:
        """HU volume -> uint8 trit volume (0 below / 1 band / 2 seed),
        thresholded and packed on device via the block-constant codec
        (bytes-per-boundary-block download instead of bytes-per-voxel)."""
        summary, chunks, payload, padded_shape, orig = (
            self.predict_trits_summary_device(
                hu_volume, h_thresh=h_thresh, l_thresh=l_thresh, rng=rng,
                hu_shift=hu_shift,
            )
        )
        n = int(np.prod(padded_shape))
        s = np.asarray(summary)
        trits = decode_trit_summary(
            s, make_chunk_fetcher(s, chunks, payload), n, padded_shape,
        )
        d, h, w = orig
        return trits[:d, :h, :w]
