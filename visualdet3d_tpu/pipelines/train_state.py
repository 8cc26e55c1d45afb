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

from contextlib import nullcontext
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import linen as nn
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


def _cast_floating(tree, dtype):
    return jax.tree.map(
        lambda x: x.astype(dtype)
        if hasattr(x, 'dtype') and jnp.issubdtype(x.dtype, jnp.floating)
        else x, tree)


def _mixed_precision_interceptor(dtype):
    """bf16-compute / f32-master training policy, with no model edits.

    Like the int8 path (models/quant.py), mixed precision is applied with
    an ``nn.intercept_methods`` hook rather than threading a ``dtype``
    attribute through every module: the MXU-bound modules (Conv /
    ConvTranspose / Dense) get their floating inputs cast to ``dtype``
    (their kernels already are — the step factory casts params inside
    ``loss_fn``, so the cast's VJP accumulates f32 master gradients), and
    the norms get their *outputs* cast back down — flax norms compute
    batch statistics in f32 and dtype-promote their result, which would
    otherwise silently re-upcast every post-BN activation and defeat the
    policy. Net effect: convs run on the bf16 MXU, activations are stored
    bf16 (HBM halved — the reason f32 batch-16 stereo did not fit), norm
    statistics and the running batch_stats collection stay f32, and the
    loss itself is f32 (each detector upcasts predictions at loss entry).

    The reference trains pure f32 (trainers.py:16-161 — torch AMP is never
    enabled); this mode is therefore optional (cfg.trainer.compute_dtype)
    and gated by the grad-direction parity test in test_stereo_system.py.
    """
    matmul_mods = (nn.Conv, nn.ConvTranspose, nn.Dense, nn.DenseGeneral)
    norm_mods = (nn.BatchNorm, nn.LayerNorm, nn.GroupNorm)

    def interceptor(next_fn, args, kwargs, context):
        if context.method_name != '__call__':
            return next_fn(*args, **kwargs)
        mod = context.module
        if isinstance(mod, matmul_mods):
            args = tuple(
                a.astype(dtype)
                if hasattr(a, 'dtype') and jnp.issubdtype(a.dtype, jnp.floating)
                else a for a in args)
            return next_fn(*args, **kwargs)
        if isinstance(mod, norm_mods):
            return _cast_floating(next_fn(*args, **kwargs), dtype)
        return next_fn(*args, **kwargs)

    return interceptor


def _mp_scope(compute_dtype: Optional[str]):
    """Context factory for loss_fn bodies: mixed-precision hook or no-op."""
    if compute_dtype is None or jnp.dtype(compute_dtype) == jnp.float32:
        return nullcontext, lambda params: params
    return (lambda: nn.intercept_methods(
        _mixed_precision_interceptor(jnp.dtype(compute_dtype))),
        lambda params: _cast_floating(params, jnp.dtype(compute_dtype)))


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
                              donate: bool = True,
                              compute_dtype: Optional[str] = None) -> Callable:
    """Train step for anchor-based detectors (mono: Yolo3D/GAC).

    batch = dict(images [B,H,W,3], P2 [B,3,4], annotations [B,M,12]).
    reference: train_mono_detection (trainers.py:16-54).
    ``compute_dtype='bfloat16'`` enables the mixed-precision policy
    (:func:`_mixed_precision_interceptor`); params/grads/loss stay f32.
    """
    mp_ctx, mp_cast = _mp_scope(compute_dtype)

    def step(state: TrainState, batch: Dict, rng) -> Tuple[TrainState, Dict]:
        def loss_fn(params):
            variables = {'params': mp_cast(params),
                         'batch_stats': state.batch_stats}
            with mp_ctx():
                (cls_loss, reg_loss, loss_dict), new_state = system.loss(
                    variables, batch['images'], batch['P2'],
                    batch['annotations'], rng=rng, train=True)
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
                           donate: bool = True,
                           compute_dtype: Optional[str] = None) -> Callable:
    """Train step for the stereo detector.

    batch = dict(left_images, right_images, P2, P3, annotations, disparity).
    reference: train_stereo_detection (trainers.py:84-128).
    ``compute_dtype='bfloat16'`` enables the mixed-precision policy
    (:func:`_mixed_precision_interceptor`); params/grads/loss stay f32.
    """
    mp_ctx, mp_cast = _mp_scope(compute_dtype)

    def step(state: TrainState, batch: Dict, rng) -> Tuple[TrainState, Dict]:
        def loss_fn(params):
            variables = {'params': mp_cast(params),
                         'batch_stats': state.batch_stats}
            with mp_ctx():
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
                           donate: bool = True,
                           compute_dtype: Optional[str] = None) -> Callable:
    """Generic step for systems whose loss(variables, *batch_values, rng, train)
    returns ((loss, loss_dict), new_state) — used by depth / rtm3d trainers
    (reference trainers.py:56-82, 130-161)."""
    mp_ctx, mp_cast = _mp_scope(compute_dtype)

    def step(state: TrainState, batch: Dict, rng) -> Tuple[TrainState, Dict]:
        def loss_fn(params):
            variables = {'params': mp_cast(params),
                         'batch_stats': state.batch_stats}
            kwargs = {}
            if 'epoch' in batch:  # rampup weighting (reference trainers.py:146)
                kwargs['epoch'] = batch['epoch']
            with mp_ctx():
                (loss, loss_dict), new_state = system.loss(
                    variables, *[batch[k] for k in batch_keys], rng=rng,
                    train=True, **kwargs)
            return jnp.mean(loss), (loss_dict, new_state.get('batch_stats', state.batch_stats))

        (total, (loss_dict, new_bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        new_state = _apply_updates_if(total > 0, tx, grads, state, new_bs)
        metrics = {k: v for k, v in loss_dict.items()}
        metrics['total'] = total
        return new_state, metrics

    return jax.jit(step, donate_argnums=(0,) if donate else ())
