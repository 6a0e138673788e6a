"""Curriculum scheduler state machines vs scripted metric sequences
(SURVEY.md §7 hard part 5) and MultiStepLR semantics."""

from se_unet_airseg_tpu.train.schedule import (
    CurriculumScheduler,
    Stage3Scheduler,
    multistep_lr,
)


def test_multistep_lr():
    lr = lambda ep: multistep_lr(1e-4, (60, 90), 0.1, ep)
    assert lr(0) == 1e-4
    assert lr(59) == 1e-4
    assert abs(lr(60) - 1e-5) < 1e-12
    assert abs(lr(90) - 1e-6) < 1e-13
    assert abs(lr(99) - 1e-6) < 1e-13


def test_stage2_scheduler_update_cadence():
    s = CurriculumScheduler()
    assert s.hard_ratio == 0.4
    # not a multiple of 5 -> no change
    s.update(3, [0.5], [0.2], [90.0], [85.0])
    assert s.hard_ratio == 0.4
    # epoch 0 -> no change even though it's a multiple
    s.update(0, [0.5], [0.2], [90.0], [85.0])
    assert s.hard_ratio == 0.4


def test_stage2_scheduler_increases_on_hard_gap():
    s = CurriculumScheduler()
    # diff = 0.5-0.2 = 0.3 > 0.04 -> +0.05
    s.update(5, [0.5], [0.2], [90.0], [85.0])
    assert abs(s.hard_ratio - 0.45) < 1e-9
    # negative TD trend alone also increases
    s2 = CurriculumScheduler()
    s2.update(5, [0.2], [0.19], [90.0, 89.0], [85.0, 85.0])
    assert abs(s2.hard_ratio - 0.45) < 1e-9


def test_stage2_scheduler_decreases_when_converged():
    s = CurriculumScheduler()
    s.update(5, [0.21], [0.20], [89.0, 90.0], [84.0, 85.0])
    assert abs(s.hard_ratio - 0.35) < 1e-9
    # clamped at min 0.2
    for e in range(10, 100, 5):
        s.update(e, [0.21], [0.20], [89.0, 90.0], [84.0, 85.0])
    assert abs(s.hard_ratio - 0.2) < 1e-9


def test_stage2_scheduler_clamps_max():
    s = CurriculumScheduler()
    for e in range(5, 100, 5):
        s.update(e, [0.9], [0.2], [90.0], [85.0])
    assert abs(s.hard_ratio - 0.8) < 1e-9


def test_stage3_scheduler_both_ratios():
    s = Stage3Scheduler()
    assert (s.hard_ratio, s.break_ratio) == (0.8, 0.625)
    # TD drop -> both ratios up (hard capped at 0.9)
    s.update(1, [0.5], [0.2], [90.0, 88.0], [85.0, 84.0])
    assert abs(s.hard_ratio - 0.85) < 1e-9
    assert abs(s.break_ratio - 0.675) < 1e-9
    # improving trends + small gap -> both down
    s.update(2, [0.21], [0.205], [88.0, 90.0], [84.0, 85.0])
    assert abs(s.hard_ratio - 0.8) < 1e-9
    assert abs(s.break_ratio - 0.625) < 1e-9
    # every epoch (decay_step=1), unlike stage 2
    s.update(3, [0.5], [0.2], [90.0, 89.0], [85.0, 85.0])
    assert abs(s.hard_ratio - 0.85) < 1e-9
