"""Epoch-indexed MultiStepLR semantics (reference train.py:189-191,
466+493, 615): the LR is a function of how many scheduler.step() calls
have fired — never of the optimizer step count, so the online
hard-mining replay's extra single-crop steps (reference train.py:
469-491) cannot advance it."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from se_unet_airseg_tpu.train.step import (
    create_train_state,
    current_learning_rate,
    make_optimizer,
    multistep_lr,
    set_learning_rate,
)


def test_stage23_double_step_trajectory():
    """50-epoch stages 2/3: scheduler stepped twice per epoch with
    milestones [40, 60] -> decays land at real epochs 20 and 30
    (reference train.py:387-390, 466, 493)."""
    lrs = [multistep_lr(1e-4, (40, 60), 0.1, 2 * ep) for ep in range(50)]
    expected = [1e-4] * 20 + [1e-5] * 10 + [1e-6] * 20
    assert lrs == pytest.approx(expected)
    # the mid-epoch step (between main and replay pass) lands on an odd
    # count; milestones are even, so the replay pass runs at the same LR
    for ep in range(50):
        assert multistep_lr(1e-4, (40, 60), 0.1, 2 * ep + 1) == pytest.approx(
            lrs[ep]
        )


def test_stage1_single_step_trajectory():
    """100-epoch stage 1: one step per epoch, milestones [60, 90]
    (reference train.py:570-572, 615)."""
    lrs = [multistep_lr(1e-4, (60, 90), 0.1, ep) for ep in range(100)]
    expected = [1e-4] * 60 + [1e-5] * 30 + [1e-6] * 10
    assert lrs == pytest.approx(expected)


def test_replay_steps_do_not_advance_schedule():
    """Run many more optimizer steps than any milestone; the LR only
    moves when the driver sets it — torch-MultiStepLR immunity to
    iteration count."""
    opt, lr_fn = make_optimizer(base_lr=1e-2, milestones=(2, 3))
    params = {"w": jnp.ones((4,), jnp.float32)}
    state = create_train_state(params, opt)
    state = set_learning_rate(state, lr_fn(0))

    grads = {"w": jnp.ones((4,), jnp.float32)}
    for _ in range(10):  # 10 steps >> milestone 2
        updates, opt_state = opt.update(grads, state.opt_state, state.params)
        import optax

        state = state._replace(
            params=optax.apply_updates(state.params, updates),
            opt_state=opt_state,
            step=state.step + 1,
        )
    assert current_learning_rate(state) == pytest.approx(1e-2)

    # driver crosses both milestones: LR decays 100x
    state = set_learning_rate(state, lr_fn(3))
    assert current_learning_rate(state) == pytest.approx(1e-4)


def test_injected_lr_controls_update_magnitude():
    """The injected hyperparameter must actually reach AdamW: update
    norm scales with the set LR."""
    import optax

    opt, _ = make_optimizer(base_lr=1e-3, milestones=())
    params = {"w": jnp.ones((8,), jnp.float32)}
    grads = {"w": jnp.full((8,), 0.5, jnp.float32)}

    def one_update(lr):
        state = create_train_state(params, opt)
        state = set_learning_rate(state, lr)
        updates, _ = opt.update(grads, state.opt_state, state.params)
        return float(jnp.abs(updates["w"]).max())

    big, small = one_update(1e-3), one_update(1e-5)
    assert big / small == pytest.approx(100.0, rel=1e-3)


def test_stage_driver_lr_wiring():
    """The scripted-trajectory check from the stage drivers' side:
    simulate the exact set_learning_rate calls train_stage2 makes over
    50 epochs (main pass at 2*ep, replay at 2*ep+1) and assert the
    realized per-epoch LR sequence equals the reference's."""
    opt, lr_fn = make_optimizer(base_lr=1e-4, milestones=(40, 60))
    params = {"w": jnp.zeros((2,), jnp.float32)}
    state = create_train_state(params, opt)

    main_lrs, replay_lrs = [], []
    for ep in range(50):
        state = set_learning_rate(state, lr_fn(2 * ep))
        main_lrs.append(current_learning_rate(state))
        state = set_learning_rate(state, lr_fn(2 * ep + 1))
        replay_lrs.append(current_learning_rate(state))

    expected = [1e-4] * 20 + [1e-5] * 10 + [1e-6] * 20
    assert main_lrs == pytest.approx(expected)
    assert replay_lrs == pytest.approx(expected)
