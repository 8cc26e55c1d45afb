"""Overfit-convergence test: train GAC on one fixed mini-KITTI batch and
assert the loss actually DECREASES (reference behavioural anchor: the
train.py:144-196 loop drives losses down on real data).

A 2-step finiteness check (test_end_to_end.py) cannot catch wrong-sign /
wrong-target bugs; this can: with a frozen batch, a correct loss + optimizer
must overfit quickly.
"""
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', 'scripts'))

import jax

from visualdet3d_tpu.config import EasyDict as edict
from visualdet3d_tpu.registry import DATASET_DICT, DETECTOR_DICT, PIPELINE_DICT
import visualdet3d_tpu.models  # noqa: F401
import visualdet3d_tpu.pipelines  # noqa: F401
import visualdet3d_tpu.data  # noqa: F401
from visualdet3d_tpu.pipelines.train_state import create_train_state
from visualdet3d_tpu.solver import build_optimizer

from test_end_to_end import full_cfg  # noqa: F401  (pytest fixture)


def test_gac_overfits_fixed_batch(full_cfg):  # noqa: F811
    cfg = full_cfg
    dataset_train = DATASET_DICT[cfg.data.train_dataset](cfg, 'training')
    system = DETECTOR_DICT[cfg.detector.name](cfg.detector)
    n_steps = 120
    opt_cfg = edict(type_name='adam', keywords=edict(lr=3e-4),
                    clipped_gradient_norm=1.0)
    tx = build_optimizer(opt_cfg, cfg.scheduler, steps_per_unit=n_steps)
    image_hw = tuple(cfg.data.rgb_shape[:2])
    state = create_train_state(system, jax.random.PRNGKey(0), image_hw, tx)
    train_step = PIPELINE_DICT[cfg.trainer.training_func](system, tx,
                                                          donate=False)

    from visualdet3d_tpu.data.loader import build_dataloader
    loader = build_dataloader(
        dataset_train, num_workers=0, batch_size=2,
        collate_fn=lambda items: dataset_train.collate_fn(
            items, obj_types=cfg.obj_types, max_objects=8),
        training=True)
    batch = next(iter(loader))
    arrays = {k: v for k, v in batch.items() if isinstance(v, np.ndarray)}

    totals, regs, clss = [], [], []
    rng = jax.random.PRNGKey(42)
    for step_i in range(n_steps):
        state, metrics = train_step(state, arrays, jax.random.fold_in(rng, step_i))
        totals.append(float(metrics['total']))
        regs.append(float(np.asarray(metrics.get('reg_loss', metrics['total'])).mean()))
        clss.append(float(np.asarray(metrics.get('cls_loss', metrics['total'])).mean()))
    totals = np.asarray(totals)
    assert np.all(np.isfinite(totals)), totals

    start = totals[:10].mean()
    end = totals[-10:].mean()
    # overfitting one fixed batch must at least halve the total loss
    assert end < 0.5 * start, (start, end, totals[::10])
    # and the classification part must actually be learning, not just the
    # regression head collapsing
    assert np.mean(clss[-10:]) < 0.8 * np.mean(clss[:10]) + 1e-6, (
        np.mean(clss[:10]), np.mean(clss[-10:]))
