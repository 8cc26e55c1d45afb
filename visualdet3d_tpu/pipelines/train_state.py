"""Functional training state + jitted step factories.

The TPU-native analogue of the reference's per-iteration trainer functions
(visualDet3D/networks/pipelines/trainers.py:16-161): zero_grad/backward/
clip/step dissolve into one pure jitted function
``state, metrics = train_step(state, batch, rng)`` where the gradient
transformation (clipping + optimizer + schedule) is an optax chain and the
reference's "skip the step when loss == 0" early-return (trainers.py:47-48)
becomes a where-mask over the parameter update (keeps the step jittable).
"""
from __future__ import annotations

from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct


@struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any


def create_train_state(system, rng, image_hw, tx: optax.GradientTransformation,
                       batch_size: int = 1, **init_kwargs) -> TrainState:
    variables = system.init(rng, image_hw, batch_size=batch_size, **init_kwargs)
    params = variables['params']
    batch_stats = variables.get('batch_stats', {})
    return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                      batch_stats=batch_stats, opt_state=tx.init(params))


def _apply_updates_if(pred, tx, grads, state: TrainState, new_batch_stats):
    """Apply the optax update only when pred (a traced bool) is True."""
    updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
    new_params = optax.apply_updates(state.params, updates)
    sel = lambda n, o: jax.tree.map(lambda a, b: jnp.where(pred, a, b), n, o)
    return TrainState(
        step=state.step + 1,
        params=sel(new_params, state.params),
        batch_stats=new_batch_stats,
        opt_state=sel(new_opt_state, state.opt_state),
    )


def make_detection_train_step(system, tx: optax.GradientTransformation,
                              donate: bool = True) -> Callable:
    """Train step for anchor-based detectors (mono: Yolo3D/GAC).

    batch = dict(images [B,H,W,3], P2 [B,3,4], annotations [B,M,12]).
    reference: train_mono_detection (trainers.py:16-54).
    """

    def step(state: TrainState, batch: Dict, rng) -> Tuple[TrainState, Dict]:
        def loss_fn(params):
            variables = {'params': params, 'batch_stats': state.batch_stats}
            (cls_loss, reg_loss, loss_dict), new_state = system.loss(
                variables, batch['images'], batch['P2'], batch['annotations'],
                rng=rng, train=True)
            total = cls_loss.mean() + reg_loss.mean()
            return total, (loss_dict, new_state.get('batch_stats', state.batch_stats))

        (total, (loss_dict, new_bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        new_state = _apply_updates_if(total > 0, tx, grads, state, new_bs)
        metrics = {k: v for k, v in loss_dict.items()}
        metrics['total'] = total
        return new_state, metrics

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_stereo_train_step(system, tx: optax.GradientTransformation,
                           donate: bool = True) -> Callable:
    """Train step for the stereo detector.

    batch = dict(left_images, right_images, P2, P3, annotations, disparity).
    reference: train_stereo_detection (trainers.py:84-128).
    """

    def step(state: TrainState, batch: Dict, rng) -> Tuple[TrainState, Dict]:
        def loss_fn(params):
            variables = {'params': params, 'batch_stats': state.batch_stats}
            (cls_loss, reg_loss, loss_dict), new_state = system.loss(
                variables, batch['left_images'], batch['right_images'],
                batch['P2'], batch['P3'], batch['annotations'],
                disparity=batch.get('disparity'), rng=rng, train=True)
            total = cls_loss.mean() + reg_loss.mean()
            return total, (loss_dict, new_state.get('batch_stats', state.batch_stats))

        (total, (loss_dict, new_bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        new_state = _apply_updates_if(total > 0, tx, grads, state, new_bs)
        metrics = {k: v for k, v in loss_dict.items()}
        metrics['total'] = total
        return new_state, metrics

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_simple_train_step(system, tx: optax.GradientTransformation,
                           batch_keys: Tuple[str, ...],
                           donate: bool = True) -> Callable:
    """Generic step for systems whose loss(variables, *batch_values, rng, train)
    returns ((loss, loss_dict), new_state) — used by depth / rtm3d trainers
    (reference trainers.py:56-82, 130-161)."""

    def step(state: TrainState, batch: Dict, rng) -> Tuple[TrainState, Dict]:
        def loss_fn(params):
            variables = {'params': params, 'batch_stats': state.batch_stats}
            kwargs = {}
            if 'epoch' in batch:  # rampup weighting (reference trainers.py:146)
                kwargs['epoch'] = batch['epoch']
            (loss, loss_dict), new_state = system.loss(
                variables, *[batch[k] for k in batch_keys], rng=rng, train=True,
                **kwargs)
            return jnp.mean(loss), (loss_dict, new_state.get('batch_stats', state.batch_stats))

        (total, (loss_dict, new_bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        new_state = _apply_updates_if(total > 0, tx, grads, state, new_bs)
        metrics = {k: v for k, v in loss_dict.items()}
        metrics['total'] = total
        return new_state, metrics

    return jax.jit(step, donate_argnums=(0,) if donate else ())
