"""Reusable model blocks (flax.linen, NHWC layout).

TPU-first equivalents of the reference library blocks:
  - Scale / ConvBnReLU / ConvReLU / LinearBnReLU / AnchorFlatten:
    visualDet3D/networks/lib/blocks.py
  - GhostModule / ResGhostModule: networks/lib/ghost_module.py
  - CoordinateConv family: networks/lib/coordconv.py
  - LookGround (ground-aware sampling): networks/lib/look_ground.py
  - ModulatedDeformConvPack: networks/lib/ops/dcn/deform_conv.py:416-489
    (the offset/mask-predicting conv + the DCNv2 op, here the Pallas/XLA
    gather op from visualdet3d_tpu.ops.deform_conv)
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from visualdet3d_tpu.ops.deform_conv import modulated_deform_conv
from visualdet3d_tpu.ops.sampling import grid_sample


class Scale(nn.Module):
    """Learnable scalar multiplier (reference blocks.py:7-23)."""
    init_scale: float = 1.0

    @nn.compact
    def __call__(self, x):
        scale = self.param('scale', lambda key: jnp.asarray(self.init_scale, jnp.float32))
        return x * scale


class ConvBnReLU(nn.Module):
    """Conv + BatchNorm + (optional) ReLU (reference blocks.py:25-46)."""
    features: int
    kernel_size: Tuple[int, int] = (3, 3)
    strides: Tuple[int, int] = (1, 1)
    dilation: int = 1
    groups: int = 1
    relu: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.features, self.kernel_size, strides=self.strides,
                    kernel_dilation=(self.dilation, self.dilation),
                    feature_group_count=self.groups, padding='SAME')(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5)(x)
        return nn.relu(x) if self.relu else x


class ConvReLU(nn.Module):
    """Conv + ReLU (reference blocks.py:49-63)."""
    features: int
    kernel_size: Tuple[int, int] = (3, 3)
    strides: Tuple[int, int] = (1, 1)

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.features, self.kernel_size, strides=self.strides, padding='SAME')(x)
        return nn.relu(x)


class LinearBnReLU(nn.Module):
    """Linear + GroupNorm(16) + LeakyReLU (reference blocks.py:66-79)."""
    num_hiddens: int

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.num_hiddens)(x)
        x = nn.GroupNorm(num_groups=16)(x)
        return nn.leaky_relu(x)


def anchor_flatten(x: jnp.ndarray, num_output_channel: int) -> jnp.ndarray:
    """[B, H, W, A*C] -> [B, H*W*A, C]; locations outer, anchors inner.

    NHWC makes this a plain reshape (the reference needs a permute first,
    blocks.py:117-136 AnchorFlatten).
    """
    b = x.shape[0]
    return x.reshape(b, -1, num_output_channel)


class LinearDropoutReLU(nn.Module):
    """Linear + Dropout + ReLU (reference blocks.py:82-95)."""
    num_hiddens: int
    drop: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Dense(self.num_hiddens)(x)
        x = nn.Dropout(self.drop, deterministic=not train)(x)
        return nn.relu(x)


def modified_smoothed_l1(deltas, targets, sigma: float = 3.0):
    """Faster-RCNN style smoothed L1 (reference blocks.py:98-115,
    ModifiedSmoothedL1)."""
    sigma2 = sigma * sigma
    diffs = deltas - targets
    option1 = diffs * diffs * 0.5 * sigma2
    option2 = jnp.abs(diffs) - 0.5 / sigma2
    cond = (diffs < (1.0 / sigma2)).astype(deltas.dtype)
    return option1 * cond + option2 * (1 - cond)


class GhostModule(nn.Module):
    """GhostNet cheap-conv block (reference ghost_module.py:16-44)."""
    features: int
    kernel_size: int = 1
    ratio: int = 2
    dw_size: int = 3
    stride: int = 1
    relu: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        init_ch = int(np.ceil(self.features / self.ratio))
        new_ch = init_ch * (self.ratio - 1)
        if self.stride > 1:
            x = nn.avg_pool(x, (self.stride, self.stride), (self.stride, self.stride))
        x1 = nn.Conv(init_ch, (self.kernel_size, self.kernel_size), padding='SAME',
                     use_bias=False)(x)
        x1 = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5)(x1)
        if self.relu:
            x1 = nn.relu(x1)
        x2 = nn.Conv(new_ch, (self.dw_size, self.dw_size), padding='SAME',
                     feature_group_count=init_ch, use_bias=False)(x1)
        x2 = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5)(x2)
        if self.relu:
            x2 = nn.relu(x2)
        out = jnp.concatenate([x1, x2], axis=-1)
        return out[..., :self.features]


class ResGhostModule(nn.Module):
    """Ghost block with residual input concat (reference ghost_module.py:46-65)."""
    features: int
    kernel_size: int = 1
    ratio: int = 3
    dw_size: int = 3
    relu: bool = True
    stride: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        assert self.ratio > 2
        inner = GhostModule(self.features - x.shape[-1], self.kernel_size,
                            self.ratio - 1, self.dw_size, self.stride, self.relu)
        out = inner(x, train=train)
        if self.stride > 1:
            x = nn.avg_pool(x, (self.stride, self.stride), (self.stride, self.stride))
        out = jnp.concatenate([x, out], axis=-1)
        return out[..., :self.features]


class CoordinateConv(nn.Module):
    """Conv with normalised (y, x) coordinate channels appended
    (reference coordconv.py:22-51)."""
    features: int
    kernel_size: Tuple[int, int] = (3, 3)

    @nn.compact
    def __call__(self, x):
        b, h, w, _ = x.shape
        ys = jnp.linspace(-1.0, 1.0, h, dtype=x.dtype)
        xs = jnp.linspace(-1.0, 1.0, w, dtype=x.dtype)
        yy = jnp.broadcast_to(ys[:, None], (h, w))
        xx = jnp.broadcast_to(xs[None, :], (h, w))
        coords = jnp.broadcast_to(jnp.stack([yy, xx], axis=-1)[None], (b, h, w, 2))
        x = jnp.concatenate([x, coords], axis=-1)
        return nn.Conv(self.features, self.kernel_size, padding='SAME')(x)


class ResCoordinateConv(nn.Module):
    """Residual CoordinateConv block (reference coordconv.py:53-68)."""
    features: int
    kernel_size: Tuple[int, int] = (3, 3)

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = CoordinateConv(self.features, self.kernel_size)(x)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9)(y)
        y = nn.relu(y)
        if x.shape[-1] == self.features:
            y = y + x
        return y


class DisparityConv(nn.Module):
    """Conv with the analytic ground-plane disparity as an extra channel
    (reference coordconv.py:70-125)."""
    features: int
    kernel_size: Tuple[int, int] = (3, 3)
    baseline: float = 0.54
    relative_elevation: float = 1.65
    stride_scale: float = 16.0

    @nn.compact
    def __call__(self, x, P2):
        disparity = ground_plane_disparity(
            x.shape, P2, self.baseline, self.relative_elevation, self.stride_scale,
            dtype=x.dtype)
        x = jnp.concatenate([x, disparity[..., None]], axis=-1)
        return nn.Conv(self.features, self.kernel_size, padding='SAME')(x)


def ground_plane_disparity(feat_shape, P2, baseline: float,
                           relative_elevation: float, stride_scale: float,
                           dtype=jnp.float32) -> jnp.ndarray:
    """Per-row disparity of the analytic ground plane at feature resolution.

    disparity(v) = fy * baseline * (v - cy) / |fy * elev + Ty| (relu'ed),
    with P2 intrinsics downscaled by the feature stride
    (reference look_ground.py:33-53).
    Returns [B, H, W].
    """
    b, h, w = feat_shape[0], feat_shape[1], feat_shape[2]
    fy = P2[:, 1, 1] / stride_scale
    cy = P2[:, 1, 2] / stride_scale
    ty = P2[:, 1, 3]
    rows = jnp.arange(h, dtype=dtype)
    yy = jnp.broadcast_to(rows[None, :, None], (b, h, w))
    disparity = fy[:, None, None] * baseline * (yy - cy[:, None, None]) / (
        jnp.abs(fy[:, None, None] * relative_elevation + ty[:, None, None]) + 1e-10)
    return nn.relu(disparity)


class LookGround(nn.Module):
    """Ground-aware feature sampling: shift the sampling grid toward the
    ground-contact row, sample (disparity ++ features), and merge through a
    learnable-alpha residual (reference look_ground.py:11-72).
    """
    features: int
    baseline: float = 0.54
    relative_elevation: float = 1.65
    stride_scale: float = 16.0

    @nn.compact
    def __call__(self, x, P2):
        b, h, w, c = x.shape
        disp_pred = nn.Conv(1, (3, 3), padding='SAME')(x)
        disp_pred = jnp.tanh(disp_pred)[..., 0]  # [B, H, W]
        # mostly-stop-gradient trick: 5% of the gradient flows
        disp_pred = 0.1 * (0.05 * disp_pred + 0.95 * jax.lax.stop_gradient(disp_pred))

        disparity = ground_plane_disparity(
            x.shape, P2, self.baseline, self.relative_elevation, self.stride_scale,
            dtype=x.dtype)

        xs = jnp.linspace(-1.0, 1.0, w, dtype=x.dtype)
        ys = jnp.linspace(-1.0, 1.0, h, dtype=x.dtype)
        x_base = jnp.broadcast_to(xs[None, None, :], (b, h, w))
        y_base = jnp.broadcast_to(ys[None, :, None], (b, h, w))

        # analytic downward shift toward the ground-contact row
        h_mean = 1.535
        rows = jnp.arange(h, dtype=x.dtype)
        yy = jnp.broadcast_to(rows[None, :, None], (b, h, w))
        cy = (P2[:, 1, 2] / self.stride_scale)[:, None, None]
        y_shift = nn.relu(h_mean * (yy - cy) /
                          (2 * (self.relative_elevation - 0.5 * h_mean))) / (h * 0.5)
        flow = jnp.stack([x_base, y_base + y_shift + disp_pred], axis=-1)

        features = jnp.concatenate([disparity[..., None], x], axis=-1)
        sampled = grid_sample(features, flow, padding_mode='border', align_corners=True)
        extracted = nn.Conv(self.features, (1, 1))(sampled)
        alpha = self.param('alpha', nn.initializers.zeros, (1,))
        return nn.relu(x + extracted * alpha)


class ModulatedDeformConv(nn.Module):
    """DCNv2 'pack': a regular conv predicts per-tap (dy, dx, mask), then the
    deformable gather-matmul op is applied.

    reference: ModulatedDeformConvPack (dcn/deform_conv.py:416-489); offsets
    zero-initialised so the op starts as a plain conv.
    """
    features: int
    kernel_size: int = 3
    stride: int = 1
    dilation: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        k = self.kernel_size * self.kernel_size
        pad = self.dilation * (self.kernel_size - 1) // 2
        offset_mask = nn.Conv(
            3 * k, (self.kernel_size, self.kernel_size),
            strides=(self.stride, self.stride),
            kernel_dilation=(self.dilation, self.dilation), padding='SAME',
            kernel_init=nn.initializers.zeros, bias_init=nn.initializers.zeros,
        )(x)
        offset = offset_mask[..., :2 * k]
        mask = jax.nn.sigmoid(offset_mask[..., 2 * k:])
        weight = self.param(
            'kernel', nn.initializers.he_normal(),
            (self.kernel_size, self.kernel_size, x.shape[-1], self.features))
        bias = self.param('bias', nn.initializers.zeros, (self.features,))
        return modulated_deform_conv(
            x, offset, mask, weight, bias,
            stride=self.stride, padding=pad, dilation=self.dilation,
            train=train)
