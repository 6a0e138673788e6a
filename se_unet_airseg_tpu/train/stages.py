"""The three curriculum stage drivers (reference train.py:140-629).

Each driver reproduces the reference loop structure on the TPU train
step:

  stage 1 (reference train.py:516-629): 100 epochs, AdamW 1e-4,
    MultiStepLR [60,90] x0.1, dice_en+dice_de, validation only at the
    final epoch, checkpoint every epoch.
  stage 2 (train.py:328-514): 50 epochs, resume from stage 1, GUL
    losses, online hard-mining cache written per step + a second pass
    over the cached crops each epoch, MultiStepLR [40,60] stepped
    TWICE per epoch (deliberate reference behavior, train.py:466+493),
    validation + curriculum-scheduler feedback every epoch.
  stage 3 (train.py:140-326): same shape as stage 2 plus skeleton
    crops, atr loss, BR weights and the break-ratio scheduler.

Drivers are written against small injectable configs so integration
tests can run 2-epoch versions on synthetic volumes (SURVEY.md §4
item 3).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Any

import numpy as np

from ..data.datasets import OnlineCrops, Prefetcher, Stage1Crops, Stage2Crops, Stage3Crops
from ..data.splits import load_json_file
from ..models.se_unet import SEUNetConfig, init_params
from .checkpoint import load_params, load_state, save_params, save_state
from .online_cache import OnlineCache
from .schedule import CurriculumScheduler, Stage3Scheduler
from .step import (
    create_train_state,
    make_optimizer,
    make_resilient_step,
    make_train_step,
    set_learning_rate,
)


@dataclasses.dataclass
class StageConfig:
    data_root: str
    file_root: str
    file_path: str
    model_savepath: str
    log_savepath: str
    epochs: int
    batch_size: int = 8
    cube: int = 128
    lr: float = 1e-4
    milestones: tuple = (60, 90)
    aug: bool = True
    seed: int = 777
    online_savepath: str | None = None
    pred_path: str | None = None  # pred_1 (stage 2) / pred_2 (stage 3)
    br_skel_path: str | None = None
    br_weight_path: str | None = None
    start_params: Any = None  # params pytree or checkpoint path
    validate_every: int = 1
    mesh: Any = None
    model_cfg: SEUNetConfig = dataclasses.field(default_factory=SEUNetConfig)
    # Online-HM replay batching under a mesh. False (default) keeps the
    # reference's sequential B=1 gradient updates
    # (train.py:469-491, DataLoader(batch_size=1)) — replicated
    # single-crop steps on every chip. True stacks n_data consecutive
    # cached crops per sharded step: a DELIBERATE deviation (one update
    # on the flattened bucket instead of n sequential updates) that
    # turns the replay tail from serial into data-parallel at mesh
    # scale. No effect when mesh is None.
    replay_bucket: bool = False


def _auto_resume(cfg: StageConfig, state):
    """Resume from the newest full-state checkpoint in model_savepath
    (the recovery story the reference lacks — SURVEY.md §5.3: its
    resume is commented-out torch.load lines). Returns
    (state, start_epoch, meta) where meta carries scheduler state."""
    import glob
    import json as _json

    paths = glob.glob(os.path.join(cfg.model_savepath, "state_*.msgpack"))
    if not paths:
        return state, 0, {}
    latest = max(paths, key=lambda p: int(p.split("_")[-1].split(".")[0]))
    ep = int(latest.split("_")[-1].split(".")[0])
    state = load_state(latest, state)
    meta_path = os.path.join(cfg.model_savepath, "resume_meta.json")
    meta = {}
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = _json.load(f)
    print(f"[resume] continuing from epoch {ep + 1} ({latest})")
    return state, ep + 1, meta


def _save_resume_point(cfg: StageConfig, state, ep: int, meta: dict):
    import json as _json

    save_state(state, cfg.model_savepath, ep)
    with open(os.path.join(cfg.model_savepath, "resume_meta.json"), "w") as f:
        _json.dump(meta, f)
    # keep only the two newest full states (params snapshots are kept
    # per-epoch separately, matching the reference cadence)
    import glob

    paths = sorted(
        glob.glob(os.path.join(cfg.model_savepath, "state_*.msgpack")),
        key=lambda p: int(p.split("_")[-1].split(".")[0]),
    )
    for old in paths[:-2]:
        os.remove(old)


def _init_state(cfg: StageConfig, stage: int):
    import jax

    opt, lr_fn = make_optimizer(base_lr=cfg.lr, milestones=cfg.milestones)
    import jax.numpy as jnp

    if cfg.start_params is None:
        params = init_params(jax.random.key(cfg.seed), cfg.model_cfg)
    elif isinstance(cfg.start_params, str):
        params = load_params(cfg.start_params)
    else:
        # COPY the caller's pytree: the train step donates its state,
        # so adopting these arrays would delete the caller's buffers
        # on the first step (stage hand-offs reuse stage-N params for
        # pred generation and the next stage)
        params = jax.tree.map(jnp.array, cfg.start_params)
    state = create_train_state(params, opt)
    if stage >= 2 and "REMAT_SKIP_WHOLEBLOCK" not in os.environ:
        # Measured (round 5, tools/train_epoch_production.py): the
        # stage-2 step at B=8 128^3 exceeds HBM by ~44 MB with the
        # whole-block remat skip (the extra weight/skel inputs +
        # per-crop GUL on top of stage 1's live set). Start stages 2/3
        # at full remat rather than paying a failed serial remote
        # compile + fallback in every fresh process; an explicit env
        # setting wins, and the resilient step still backstops.
        os.environ["REMAT_SKIP_WHOLEBLOCK"] = "0"
    step_fn = make_resilient_step(
        opt, cfg.model_cfg, stage=stage, mesh=cfg.mesh
    )
    # the online-HM replay feeds batch-size-1 items (reference
    # DataLoader(batch_size=1), train.py:470-478) — under a sharded
    # mesh a B=1 batch cannot split over the data axis, so replay runs
    # a replicated single-device step (or, with cfg.replay_bucket,
    # bucketed sharded steps — see _replay_pass)
    replay_fn = (
        step_fn if cfg.mesh is None
        else make_resilient_step(opt, cfg.model_cfg, stage=stage, mesh=None)
    )
    return state, step_fn, replay_fn, lr_fn


def _epoch_pass(state, step_fn, batches, rng, log_every=10, cache=None,
                cache_limit=0, epoch=0, n_volumes=0, writer=None):
    import jax

    losses = []
    for it, batch in enumerate(batches):
        name = batch.pop("name", None)
        rng, sub = jax.random.split(rng)
        arrays = {k: v for k, v in batch.items()}
        state, aux = step_fn(state, arrays, sub)
        loss = float(aux["loss"])
        losses.append(loss)
        if cache is not None:
            cache.add_batch(
                arrays, np.asarray(aux["per_crop_gul"]), it, cache_limit
            )
        if writer is not None:
            scalars = {"loss": loss}
            for k in ("dice_en", "dice_de", "gul_en", "gul_de", "atr_en", "atr_de"):
                if k in aux:
                    scalars[k] = float(aux[k])
            writer.add_scalars("Train", scalars, it + epoch * n_volumes)
        if it % log_every == 0:
            parts = [f"epoch: {epoch}", f"iter {it + epoch * n_volumes}",
                     f"loss: {loss:.4f}"]
            for k in ("dice_en", "dice_de", "gul_en", "gul_de", "atr_en", "atr_de"):
                if k in aux:
                    parts.append(f"{k}: {float(aux[k]):.4f}")
            print(" ".join(parts))
        del name
    return state, rng, losses


def _replay_pass(cfg: StageConfig, state, replay, step_fn, replay_fn, rng):
    """Online hard-mining second pass over the epoch's cached crops
    (reference train.py:469-491).

    Default: one B=1 step per crop, exactly the reference's
    DataLoader(batch_size=1) semantics. With cfg.replay_bucket on a
    mesh: consecutive crops stack into B=n_data batches for the
    SHARDED step, so the replay rides the data axis instead of
    serializing hundreds of replicated single-crop steps per epoch
    (VERDICT r4 weak-5); the bucket tail still runs B=1."""
    import jax

    bucket_n = 0
    if cfg.replay_bucket and cfg.mesh is not None:
        bucket_n = int(cfg.mesh.shape[cfg.mesh.axis_names[0]])

    buf = []
    for item in replay:
        item.pop("name", None)
        if bucket_n > 1:
            buf.append(item)
            if len(buf) < bucket_n:
                continue
            batch = {
                k: np.stack([np.asarray(it[k], np.float32) for it in buf])
                for k in buf[0]
            }
            buf = []
            rng, sub = jax.random.split(rng)
            state, _ = step_fn(state, batch, sub)
        else:
            batch = {k: np.asarray(v, np.float32)[None]
                     for k, v in item.items()}
            rng, sub = jax.random.split(rng)
            state, _ = replay_fn(state, batch, sub)
    for item in buf:  # bucket tail: reference-style B=1
        batch = {k: np.asarray(v, np.float32)[None] for k, v in item.items()}
        rng, sub = jax.random.split(rng)
        state, _ = replay_fn(state, batch, sub)
    return state, rng


def _validate(cfg: StageConfig, params, epoch: int, stage: int, dti=False,
              runner=None):
    from ..infer.engine import validate

    names = load_json_file(cfg.file_path, "0", ("val",))
    return validate(
        params, cfg.model_cfg, names, cfg.data_root, cfg.file_root,
        epoch, cfg.log_savepath, dti=dti, stage=stage,
        cube=cfg.cube, step=cfg.cube // 2, runner=runner,
    )


def _make_val_runner(cfg: StageConfig, params):
    """One validation runner per stage: per-epoch validation swaps
    params into it (SlidingWindowRunner.set_params) instead of
    re-building — and re-tracing — the whole-volume program."""
    from ..infer.sliding_window import SlidingWindowRunner

    return SlidingWindowRunner(
        params, cfg.model_cfg, train_mode=True,
        cube=cfg.cube, step=cfg.cube // 2,
    )


def train_stage1(cfg: StageConfig):
    import jax

    from .tensorboard import SummaryWriter

    writer = SummaryWriter(os.path.join(os.path.dirname(cfg.log_savepath) or ".", "tb"))

    dataset = Stage1Crops(
        cfg.file_path, cfg.data_root, cfg.file_root,
        batch_size=cfg.batch_size, cube=cfg.cube, aug=cfg.aug, seed=cfg.seed,
    )
    state, step_fn, _, lr_fn = _init_state(cfg, 1)
    state, start_ep, _ = _auto_resume(cfg, state)
    rng = jax.random.key(cfg.seed)
    for ep in range(start_ep, cfg.epochs):
        # MultiStepLR stepped once per epoch after training (reference
        # train.py:615): the count at the START of epoch `ep` is `ep`
        state = set_learning_rate(state, lr_fn(ep))
        state, rng, _ = _epoch_pass(
            state, step_fn, Prefetcher(dataset), rng,
            epoch=ep, n_volumes=len(dataset), writer=writer,
        )
        if ep == cfg.epochs - 1:
            # reference __main__ runs stage 1 with DTI=1 (train.py:872)
            # so the final-epoch validation binarizes via hysteresis
            _validate(cfg, state.params, ep, stage=1, dti=True)
        save_params(state.params, cfg.model_savepath, ep)
        _save_resume_point(cfg, state, ep, {})
    return state


def train_stage2(cfg: StageConfig):
    import jax

    from .tensorboard import SummaryWriter

    writer = SummaryWriter(os.path.join(os.path.dirname(cfg.log_savepath) or ".", "tb"))

    dataset = Stage2Crops(
        cfg.file_path, cfg.data_root, cfg.file_root, cfg.pred_path,
        batch_size=cfg.batch_size, cube=cfg.cube, aug=cfg.aug, seed=cfg.seed,
    )
    state, step_fn, replay_fn, lr_fn = _init_state(cfg, 2)
    scheduler = CurriculumScheduler()
    cache = OnlineCache(cfg.online_savepath)
    rng = jax.random.key(cfg.seed)
    hist: dict[str, list] = {"tr": [], "th": [], "td": [], "bd": []}
    cache_limit = int(len(dataset) * cfg.batch_size * 0.3)
    state, start_ep, meta = _auto_resume(cfg, state)
    if meta:
        scheduler.hard_ratio = meta.get("hard_ratio", scheduler.hard_ratio)
        hist = meta.get("hist", hist)
    val_runner = _make_val_runner(cfg, state.params)
    for ep in range(start_ep, cfg.epochs):
        cache.reset()
        dataset.hard_ratio = scheduler.hard_ratio
        # lr_scheduler.step() fires TWICE per epoch in stages 2/3
        # (reference train.py:466+493): the main pass of epoch `ep`
        # runs at scheduler count 2*ep, the replay pass at 2*ep+1
        state = set_learning_rate(state, lr_fn(2 * ep))
        state, rng, _ = _epoch_pass(
            state, step_fn, Prefetcher(dataset), rng,
            cache=cache, cache_limit=cache_limit, epoch=ep,
            n_volumes=len(dataset), writer=writer,
        )
        # online hard-mining second pass: single-crop steps, exactly
        # like the reference's DataLoader(batch_size=1) over per-crop
        # cache items (reference train.py:469-491, data.py:586-607)
        state = set_learning_rate(state, lr_fn(2 * ep + 1))
        rng, shuf = jax.random.split(rng)
        replay = OnlineCrops(
            cfg.online_savepath, rate=1.0,
            shuffle_rng=np.random.default_rng(
                int(jax.random.randint(shuf, (), 0, 2**31 - 1))
            ),
        )
        state, rng = _replay_pass(cfg, state, replay, step_fn, replay_fn, rng)
        td, bd, vr, vh = _validate(cfg, state.params, ep, stage=2,
                                   runner=val_runner)
        hist["td"].append(td)
        hist["bd"].append(bd)
        hist["tr"].append(vr)
        hist["th"].append(vh)
        scheduler.update(ep, hist["tr"], hist["th"], hist["td"], hist["bd"])
        save_params(state.params, cfg.model_savepath, ep)
        _save_resume_point(
            cfg, state, ep, {"hard_ratio": scheduler.hard_ratio, "hist": hist}
        )
    return state


def train_stage3(cfg: StageConfig):
    import jax

    from .tensorboard import SummaryWriter

    writer = SummaryWriter(os.path.join(os.path.dirname(cfg.log_savepath) or ".", "tb"))

    dataset = Stage3Crops(
        cfg.file_path, cfg.data_root, cfg.file_root, cfg.pred_path,
        cfg.br_skel_path, cfg.br_weight_path,
        batch_size=cfg.batch_size, cube=cfg.cube, aug=cfg.aug, seed=cfg.seed,
    )
    state, step_fn, replay_fn, lr_fn = _init_state(cfg, 3)
    scheduler = Stage3Scheduler()
    cache = OnlineCache(cfg.online_savepath, with_skel=True)
    rng = jax.random.key(cfg.seed)
    hist: dict[str, list] = {"tr": [], "th": [], "td": [], "bd": []}
    cache_limit = int(len(dataset) * cfg.batch_size * 0.3)
    state, start_ep, meta = _auto_resume(cfg, state)
    if meta:
        scheduler.hard_ratio = meta.get("hard_ratio", scheduler.hard_ratio)
        scheduler.break_ratio = meta.get("break_ratio", scheduler.break_ratio)
        hist = meta.get("hist", hist)
    val_runner = _make_val_runner(cfg, state.params)
    for ep in range(start_ep, cfg.epochs):
        cache.reset()
        dataset.hard_ratio = scheduler.hard_ratio
        dataset.break_ratio = scheduler.break_ratio
        # double scheduler.step() per epoch (reference train.py:273+305)
        state = set_learning_rate(state, lr_fn(2 * ep))
        state, rng, _ = _epoch_pass(
            state, step_fn, Prefetcher(dataset), rng,
            cache=cache, cache_limit=cache_limit, epoch=ep,
            n_volumes=len(dataset), writer=writer,
        )
        state = set_learning_rate(state, lr_fn(2 * ep + 1))
        rng, shuf = jax.random.split(rng)
        replay = OnlineCrops(
            cfg.online_savepath, rate=1.0, with_skel=True,
            shuffle_rng=np.random.default_rng(
                int(jax.random.randint(shuf, (), 0, 2**31 - 1))
            ),
        )
        state, rng = _replay_pass(cfg, state, replay, step_fn, replay_fn, rng)
        td, bd, vr, vh = _validate(cfg, state.params, ep, stage=3,
                                   runner=val_runner)
        hist["td"].append(td)
        hist["bd"].append(bd)
        hist["tr"].append(vr)
        hist["th"].append(vh)
        scheduler.update(ep, hist["tr"], hist["th"], hist["td"], hist["bd"])
        save_params(state.params, cfg.model_savepath, ep)
        _save_resume_point(
            cfg, state, ep,
            {"hard_ratio": scheduler.hard_ratio,
             "break_ratio": scheduler.break_ratio, "hist": hist},
        )
    return state
