"""Inference-time BatchNorm folding (host-side variables transform).

The reference deploys torch modules with BN executed op-by-op at inference;
here BN scales are folded INTO the preceding conv kernels once, host-side,
before jitting the predict step (the TPU-native analogue of fuse_conv_bn).

Pairing is detected from the actual dataflow, not name heuristics: the
net is traced once under `jax.eval_shape` with a flax method interceptor,
and a BatchNorm is folded into a Conv/ConvTranspose exactly when the BN's
input *is* that conv's output tracer. After folding:

  kernel' = kernel * s           with s = scale / sqrt(var + eps)
  conv-with-bias:   bias' = s * (bias - mean) + bn_bias, BN -> exact identity
  conv-without-bias: BN keeps a pure shift (scale'=1, mean'=s*mean,
                     var'=1-eps), which XLA fuses into the conv epilogue.

All BNs in this package use epsilon=1e-5 (models/blocks.py ConvBnReLU and
the flax default).
"""
from __future__ import annotations

from typing import Callable, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn
from flax.core import freeze, unfreeze

_EPS = 1e-5


def detect_conv_bn_pairs(trace_fn: Callable, *trace_args) -> List[Tuple[tuple, tuple]]:
    """Run jax.eval_shape(trace_fn, *trace_args) under a flax interceptor;
    return (conv_path, bn_path) pairs where the BN input is exactly the conv
    output. trace_args may be (and should be) ShapeDtypeStructs/arrays —
    passing them as eval_shape args keeps everything abstract (a zero-arg
    closure over concrete arrays would constant-fold, i.e. actually run)."""
    pairs: List[Tuple[tuple, tuple]] = []
    conv_out = {}

    def interceptor(next_fn, args, kwargs, context):
        out = next_fn(*args, **kwargs)
        if context.method_name != '__call__':
            return out
        mod = context.module
        if isinstance(mod, (nn.Conv, nn.ConvTranspose)):
            conv_out[id(out)] = tuple(mod.path)
        elif isinstance(mod, nn.BatchNorm) and args and id(args[0]) in conv_out:
            pairs.append((conv_out[id(args[0])], tuple(mod.path)))
        return out

    with nn.intercept_methods(interceptor):
        jax.eval_shape(trace_fn, *trace_args)
    return pairs


def _get(tree, path):
    node = tree
    for k in path:
        node = node[k]
    return node


def fold_batchnorm(variables, trace_fn: Callable, *trace_args):
    """Return new variables with conv-BN pairs folded (see module docstring).

    trace_fn(variables, *trace_args) must apply the net in EVAL mode; it is
    only shape-traced (jax.eval_shape), never executed.
    """
    pairs = detect_conv_bn_pairs(trace_fn, variables, *trace_args)
    if not pairs:
        return variables
    params = unfreeze(variables['params'])
    stats = unfreeze(variables['batch_stats'])
    for conv_path, bn_path in pairs:
        conv = _get(params, conv_path)
        bn = _get(params, bn_path)
        st = _get(stats, bn_path)
        mean, var = st['mean'], st['var']
        dt = np.asarray(conv['kernel']).dtype
        scale = bn.get('scale', jnp.ones_like(mean))
        s = (scale / jnp.sqrt(var.astype(jnp.float32) + _EPS)).astype(jnp.float32)
        conv['kernel'] = (conv['kernel'].astype(jnp.float32) * s).astype(dt)
        if 'bias' in conv:
            conv['bias'] = (s * (conv['bias'].astype(jnp.float32) - mean)
                            + bn.get('bias', 0.0)).astype(dt)
            st['mean'] = jnp.zeros_like(mean)
            if 'bias' in bn:
                bn['bias'] = jnp.zeros_like(bn['bias'])
        else:
            st['mean'] = (s * mean).astype(mean.dtype)
        st['var'] = jnp.full_like(var, 1.0 - _EPS)
        if 'scale' in bn:
            bn['scale'] = jnp.ones_like(bn['scale'])
    out = dict(variables)
    out['params'] = freeze(params) if hasattr(variables['params'], 'unfreeze') \
        else params
    out['batch_stats'] = freeze(stats) if hasattr(
        variables['batch_stats'], 'unfreeze') else stats
    return out
