"""Registered training pipelines.

The reference registers per-iteration step *functions*
(visualDet3D/networks/pipelines/trainers.py:16-161: zero_grad -> compound
annotation pack -> forward -> backward -> clip -> step). The TPU-native
equivalents are step *factories*: each builds one jitted pure function
``(state, batch, rng) -> (state, metrics)`` with the clip/optimizer chain
inside, and the annotation packing already done by the fixed-shape collate.
Names match the config keys (cfg.trainer.training_func).
"""
from __future__ import annotations

from visualdet3d_tpu.pipelines.train_state import (
    make_detection_train_step,
    make_simple_train_step,
    make_stereo_train_step,
)
from visualdet3d_tpu.registry import PIPELINE_DICT


@PIPELINE_DICT.register_module
def train_mono_detection(system, tx, **kwargs):
    """reference trainers.py:16 (train_mono_detection)."""
    return make_detection_train_step(system, tx, **kwargs)


@PIPELINE_DICT.register_module
def train_stereo_detection(system, tx, **kwargs):
    """reference trainers.py:84 (train_stereo_detection)."""
    return make_stereo_train_step(system, tx, **kwargs)


@PIPELINE_DICT.register_module
def train_mono_depth(system, tx, **kwargs):
    """reference trainers.py:56 (train_mono_depth)."""
    return make_simple_train_step(system, tx, batch_keys=('images', 'P2', 'gts'),
                                  **kwargs)


@PIPELINE_DICT.register_module
def train_rtm3d(system, tx, **kwargs):
    """reference trainers.py:130 (train_rtm3d)."""
    return make_simple_train_step(system, tx, batch_keys=('images', 'gts', 'P2'),
                                  **kwargs)


@PIPELINE_DICT.register_module
def train_2d_detection(system, tx, **kwargs):
    """2D RetinaNet training (reference uses train_mono_detection for it)."""
    return make_detection_train_step(system, tx, **kwargs)
