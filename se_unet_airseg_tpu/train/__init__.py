from .step import TrainState, create_train_state, make_train_step
from .schedule import multistep_lr, CurriculumScheduler, Stage3Scheduler

__all__ = [
    "TrainState",
    "create_train_state",
    "make_train_step",
    "multistep_lr",
    "CurriculumScheduler",
    "Stage3Scheduler",
]
