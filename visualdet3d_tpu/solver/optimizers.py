"""Optimizer + LR schedule builders on optax.

Mirrors the reference's builders
(visualDet3D/networks/optimizers/optimizers.py:7-17 — sgd/adam/adamw — and
schedulers.py:84-102 — StepLR/MultiStepLR/ExponentialLR/CosineAnnealingLR/
PolyLR/GradualWarmupScheduler). Torch schedulers step once per epoch (or per
iteration when ``is_iter_based``, scripts/train.py:118,153-170); here they
are pure functions of the update count with a ``steps_per_unit`` conversion,
so the whole update is one jitted optax transformation. Gradient clipping
(``cfg.optimizer.clipped_gradient_norm``, trainers.py:50) is folded into the
same chain.
"""
from __future__ import annotations

from typing import Callable

import jax.numpy as jnp
import optax


def make_lr_schedule(scheduler_cfg, base_lr: float,
                     steps_per_unit: int = 1) -> Callable:
    """Build an optax-compatible schedule fn(step) -> lr.

    ``steps_per_unit`` converts optimizer updates to scheduler units: 1 when
    the config sets ``is_iter_based``, else iterations-per-epoch.
    """
    if scheduler_cfg is None:
        return lambda step: jnp.asarray(base_lr, jnp.float32)

    name = scheduler_cfg.type_name.lower()
    kw = dict(scheduler_cfg.get('keywords', {}))

    def units(step):
        return jnp.floor_divide(step, steps_per_unit).astype(jnp.float32)

    if name == 'cosineannealinglr':
        t_max = float(kw['T_max'])
        eta_min = float(kw.get('eta_min', 0.0))

        def schedule(step):
            t = jnp.clip(units(step), 0, t_max)
            return eta_min + 0.5 * (base_lr - eta_min) * (1 + jnp.cos(jnp.pi * t / t_max))
        return schedule

    if name == 'steplr':
        step_size = float(kw['step_size'])
        gamma = float(kw.get('gamma', 0.1))
        return lambda step: base_lr * gamma ** jnp.floor(units(step) / step_size)

    if name == 'multisteplr':
        milestones = jnp.asarray(sorted(kw['milestones']), jnp.float32)
        gamma = float(kw.get('gamma', 0.1))
        return lambda step: base_lr * gamma ** jnp.sum(units(step) >= milestones)

    if name == 'exponentiallr':
        gamma = float(kw.get('gamma', 1.0))
        return lambda step: base_lr * gamma ** units(step)

    if name == 'polylr':
        gamma = float(kw.get('gamma', 0.9))
        n_iteration = float(kw.get('n_iteration', -1))

        def schedule(step):
            decay = jnp.clip(1.0 - units(step) / n_iteration, 0.0, None) ** gamma
            return base_lr * decay
        return schedule

    if name == 'gradualwarmupscheduler':
        multiplier = float(kw.get('multiplier', 1.0))
        total_epoch = float(kw['total_epoch'])
        after = make_lr_schedule(kw.get('after_scheduler_cfg'),
                                 base_lr * multiplier, steps_per_unit)

        def schedule(step):
            t = units(step)
            if multiplier == 1.0:
                warm = base_lr * jnp.clip(t / total_epoch, 0.0, 1.0)
            else:
                warm = base_lr * ((multiplier - 1.0) * jnp.clip(t / total_epoch, 0, 1) + 1.0)
            return jnp.where(t <= total_epoch, warm,
                             after(step - total_epoch * steps_per_unit))
        return schedule

    raise NotImplementedError(f'unknown scheduler {scheduler_cfg.type_name}')


def build_optimizer(optim_cfg, scheduler_cfg=None,
                    steps_per_unit: int = 1) -> optax.GradientTransformation:
    """Build the full gradient transformation: clip -> optimizer(schedule)."""
    kw = dict(optim_cfg.get('keywords', {}))
    base_lr = float(kw.pop('lr', 1e-4))
    schedule = make_lr_schedule(scheduler_cfg, base_lr, steps_per_unit)
    name = optim_cfg.type_name.lower()

    weight_decay = float(kw.pop('weight_decay', 0.0))
    if name == 'sgd':
        tx = optax.sgd(schedule, momentum=kw.get('momentum', 0.0),
                       nesterov=kw.get('nesterov', False))
        if weight_decay:
            tx = optax.chain(optax.add_decayed_weights(weight_decay), tx)
    elif name == 'adam':
        tx = optax.adam(schedule, b1=kw.get('betas', (0.9, 0.999))[0],
                        b2=kw.get('betas', (0.9, 0.999))[1],
                        eps=kw.get('eps', 1e-8))
        if weight_decay:  # torch Adam couples decay into the gradient
            tx = optax.chain(optax.add_decayed_weights(weight_decay), tx)
    elif name == 'adamw':
        tx = optax.adamw(schedule, weight_decay=weight_decay)
    else:
        raise NotImplementedError(f'unknown optimizer {optim_cfg.type_name}')

    clip_norm = optim_cfg.get('clipped_gradient_norm', None)
    if clip_norm:
        tx = optax.chain(optax.clip_by_global_norm(float(clip_norm)), tx)
    return tx
