"""Importing this package registers all pipelines."""
from visualdet3d_tpu.pipelines import evaluators as _evaluators  # noqa: F401
from visualdet3d_tpu.pipelines import testers as _testers  # noqa: F401
from visualdet3d_tpu.pipelines import trainers as _trainers  # noqa: F401
from visualdet3d_tpu.pipelines.train_state import (  # noqa: F401
    TrainState,
    create_train_state,
    make_detection_train_step,
    make_simple_train_step,
    make_stereo_train_step,
)
