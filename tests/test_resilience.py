"""OOM-fallback step wrapper + bucketed online-HM replay
(VERDICT r4 items 5/9)."""

import numpy as np
import pytest

import jax

from se_unet_airseg_tpu.train.step import (
    make_optimizer,
    make_resilient_step,
)


class _FakeOOM(Exception):
    pass


def _fake_make_step_factory(calls, fail_first=True, error_text="RESOURCE_EXHAUSTED: TPU backend error"):
    """Returns a make_train_step stand-in: build #1 produces a step that
    raises an OOM-looking error; later builds produce a working step."""

    def make(optimizer, cfg, stage=1, mesh=None, shard_space=False, fast=True):
        build = len(calls)
        calls.append({"cfg": cfg, "stage": stage})

        def step(state, batch, rng):
            if build == 0 and fail_first:
                raise _FakeOOM(error_text)
            return ({"params": state["params"] + 1}, {"loss": 0.5})

        return step

    return make


def test_resilient_step_retries_on_oom(monkeypatch):
    import os

    monkeypatch.delenv("REMAT_SKIP_WHOLEBLOCK", raising=False)
    calls = []
    opt, _ = make_optimizer()
    from se_unet_airseg_tpu.models import SEUNetConfig

    step = make_resilient_step(
        opt, SEUNetConfig(remat=False), stage=2,
        _make_step=_fake_make_step_factory(calls),
    )
    state = {"params": np.float32(0.0)}
    assert not step.fallback_active()
    new_state, aux = step(state, {"image": 0}, jax.random.key(0))
    # fell back: env forced to full remat, rebuilt cfg has remat=True,
    # and the SAME batch was retried successfully
    assert step.fallback_active()
    assert os.environ.get("REMAT_SKIP_WHOLEBLOCK") == "0"
    assert len(calls) == 2 and calls[1]["cfg"].remat is True
    assert float(new_state["params"]) == 1.0 and aux["loss"] == 0.5
    # subsequent steps use the fallback fn directly
    new_state, _ = step(new_state, {"image": 0}, jax.random.key(1))
    assert len(calls) == 2


def test_resilient_step_compile_500_retry_then_fallback():
    """The relay reports compile-time HBM overflow as an opaque
    INTERNAL/HTTP 500: the wrapper must retry once same-config (a
    transient helper crash heals), then rebuild with full remat."""
    builds = []

    def make(optimizer, cfg, stage=1, mesh=None, shard_space=False, fast=True):
        build = len(builds)
        builds.append(cfg)
        attempts = {"n": 0}

        def step(state, batch, rng):
            attempts["n"] += 1
            if build == 0:  # primary: 500s on every attempt (overflow)
                raise _FakeOOM(
                    "INTERNAL: http://127.0.0.1:8103/remote_compile: "
                    "HTTP 500: tpu_compile_helper subprocess exit code 1"
                )
            return ({"params": state["params"] + 1}, {"loss": 0.1})

        step.attempts = attempts
        return step

    opt, _ = make_optimizer()
    from se_unet_airseg_tpu.models import SEUNetConfig

    step = make_resilient_step(opt, SEUNetConfig(), _make_step=make)
    new_state, aux = step({"params": np.float32(0.0)}, {}, jax.random.key(0))
    assert step.fallback_active()
    assert len(builds) == 2 and builds[1].remat is True
    assert float(new_state["params"]) == 1.0


def test_resilient_step_transient_500_heals_without_fallback():
    calls = {"n": 0}

    def make(optimizer, cfg, stage=1, mesh=None, shard_space=False, fast=True):
        def step(state, batch, rng):
            calls["n"] += 1
            if calls["n"] == 1:  # first attempt only: transient crash
                raise _FakeOOM(
                    "INTERNAL: remote_compile: HTTP 500: helper died"
                )
            return ({"params": state["params"] + 1}, {"loss": 0.1})

        return step

    opt, _ = make_optimizer()
    from se_unet_airseg_tpu.models import SEUNetConfig

    step = make_resilient_step(opt, SEUNetConfig(), _make_step=make)
    new_state, _ = step({"params": np.float32(0.0)}, {}, jax.random.key(0))
    assert not step.fallback_active() and calls["n"] == 2
    assert float(new_state["params"]) == 1.0


def test_resilient_step_propagates_non_oom():
    calls = []
    opt, _ = make_optimizer()
    from se_unet_airseg_tpu.models import SEUNetConfig

    step = make_resilient_step(
        opt, SEUNetConfig(), stage=1,
        _make_step=_fake_make_step_factory(
            calls, error_text="INVALID_ARGUMENT: shapes differ"
        ),
    )
    with pytest.raises(_FakeOOM):
        step({"params": np.float32(0.0)}, {}, jax.random.key(0))
    assert not step.fallback_active() and len(calls) == 1


def test_resilient_step_second_oom_propagates():
    calls = []

    def make(optimizer, cfg, stage=1, mesh=None, shard_space=False, fast=True):
        calls.append(1)

        def step(state, batch, rng):
            raise _FakeOOM("RESOURCE_EXHAUSTED: still out of memory")

        return step

    opt, _ = make_optimizer()
    from se_unet_airseg_tpu.models import SEUNetConfig

    step = make_resilient_step(opt, SEUNetConfig(), _make_step=make)
    with pytest.raises(_FakeOOM):
        step({"params": np.float32(0.0)}, {}, jax.random.key(0))
    assert step.fallback_active() and len(calls) == 2


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_replay_bucket_consumes_all_and_matches_shapes():
    """Bucketed replay: 4-way data mesh, 10 cached crops -> two B=4
    sharded steps + two B=1 tail steps; unbucketed -> ten B=1 steps.
    Both paths must consume every crop and keep params finite."""
    import time

    import jax.numpy as jnp

    from se_unet_airseg_tpu.models import SEUNetConfig, init_params
    from se_unet_airseg_tpu.parallel import make_mesh
    from se_unet_airseg_tpu.train import create_train_state
    from se_unet_airseg_tpu.train.stages import StageConfig, _replay_pass
    from se_unet_airseg_tpu.train.step import make_train_step

    cfg_m = SEUNetConfig()
    params = init_params(jax.random.key(0), cfg_m)
    opt, _ = make_optimizer()
    mesh = make_mesh(n_data=4, n_space=2)
    rng_np = np.random.default_rng(0)
    s = 16

    def items(n=10):
        return [
            {
                "name": f"c{i}",
                "image": rng_np.random((s, s, s, 2), np.float32),
                "label": (rng_np.random((s, s, s)) > 0.7).astype(np.float32),
                "weight": rng_np.random((s, s, s)).astype(np.float32),
            }
            for i in range(n)
        ]

    counts = {"sharded": 0, "single": 0}

    def wrap(fn, key):
        def f(state, batch, rng):
            counts[key] += 1
            assert batch["image"].ndim == 5
            return fn(state, batch, rng)

        return f

    copy = lambda t: jax.tree.map(lambda a: jnp.array(a), t)

    step_m = wrap(make_train_step(opt, cfg_m, stage=2, mesh=mesh), "sharded")
    step_1 = wrap(make_train_step(opt, cfg_m, stage=2, mesh=None), "single")

    cfg = StageConfig(
        data_root="", file_root="", file_path="", model_savepath="",
        log_savepath="", epochs=1, mesh=mesh, replay_bucket=True,
    )
    t0 = time.perf_counter()
    state = create_train_state(copy(params), opt)
    state, _ = _replay_pass(cfg, state, items(), step_m, step_1,
                            jax.random.key(1))
    t_bucketed = time.perf_counter() - t0
    assert counts == {"sharded": 2, "single": 2}
    assert all(np.isfinite(np.asarray(l)).all()
               for l in jax.tree.leaves(state.params))

    counts.update(sharded=0, single=0)
    cfg_seq = StageConfig(
        data_root="", file_root="", file_path="", model_savepath="",
        log_savepath="", epochs=1, mesh=mesh, replay_bucket=False,
    )
    t0 = time.perf_counter()
    state = create_train_state(copy(params), opt)
    state, _ = _replay_pass(cfg_seq, state, items(), step_m, step_1,
                            jax.random.key(1))
    t_seq = time.perf_counter() - t0
    assert counts == {"sharded": 0, "single": 10}
    print(f"replay 10 crops mesh=8: bucketed {t_bucketed:.2f}s "
          f"vs B=1 {t_seq:.2f}s")
