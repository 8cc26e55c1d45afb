"""MonoDepth: DORN-style log-depth regression U-Net with ground-aware blocks.

reference: visualDet3D/networks/detectors/unet_monodepth.py:36-131 and
unet/u_net.py:14-160 — ResNet encoder, U-Net decoder whose DoubleConv blocks
open with LookGround (calibration-aware) and close with a modulated
deformable conv, multi-scale outputs (scale_8/4/1), a precomputed log-depth
prior buffer, and SI-log + edge-aware smoothness training losses.
"""
from __future__ import annotations

import os
from typing import Tuple

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn
from flax.core import FrozenDict

from visualdet3d_tpu.models.backbones.resnet import resnet
from visualdet3d_tpu.models.blocks import LookGround, ModulatedDeformConv
from visualdet3d_tpu.models.heads.monodepth_loss import (
    reshape_depth,
    si_log_loss,
    smooth_loss,
)
from visualdet3d_tpu.registry import DETECTOR_DICT


class DoubleConv(nn.Module):
    """(optional LookGround) -> 5x5 conv BN ReLU -> DCN BN ReLU
    (reference u_net.py:30-76)."""
    features: int
    mid_features: int = 0
    look_ground: bool = False

    @nn.compact
    def __call__(self, x, P2=None, scale: float = 1.0, train: bool = False):
        mid = self.mid_features or self.features
        if self.look_ground and P2 is not None:
            # P2 scaled to the current feature stride (reference u_net.py:63-67)
            P = P2.at[:, 0:2].divide(scale) if hasattr(P2, 'at') else P2
            x = LookGround(x.shape[-1], stride_scale=1.0)(x, P)
        x = nn.Conv(mid, (5, 5), padding='SAME')(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9)(x)
        x = nn.relu(x)
        x = ModulatedDeformConv(self.features, 3)(x, train=train)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9)(x)
        return nn.relu(x)


class Up(nn.Module):
    """Bilinear upsample, concat skip, DoubleConv (reference u_net.py:95-121)."""
    features: int
    mid_features: int = 0
    look_ground: bool = False

    @nn.compact
    def __call__(self, x1, x2=None, P2=None, scale: float = 1.0,
                 train: bool = False):
        b, h, w, c = x1.shape
        x1 = jax.image.resize(x1, (b, h * 2, w * 2, c), 'bilinear')
        if x2 is not None:
            x = jnp.concatenate([x2, x1], axis=-1)
        else:
            x = x1
        return DoubleConv(self.features, self.mid_features, self.look_ground)(
            x, P2=P2, scale=scale, train=train)


class UNetCore(nn.Module):
    """Encoder-decoder with scale_8/4/1 outputs (reference u_net.py:123-160)."""
    backbone_cfg: FrozenDict
    n_classes: int = 1
    look_ground: bool = True

    @nn.compact
    def __call__(self, x, P2=None, train: bool = False):
        feats = resnet(**dict(self.backbone_cfg))(x, train=train)
        x3, x4, x5, x6 = feats  # strides 4, 8, 16, 32

        outs = {}
        y = Up(256, mid_features=512 + 256, look_ground=self.look_ground,
               name='up0')(x6, x5, P2=P2, scale=32.0, train=train)
        y = Up(64, mid_features=256 + 128, look_ground=self.look_ground,
               name='up1')(y, x4, P2=P2, scale=16.0, train=train)
        outs['scale_8'] = nn.Conv(self.n_classes, (3, 3), padding='SAME',
                                  name='out_scale_8')(y)
        y = Up(64, name='up2')(y, x3, train=train)
        outs['scale_4'] = nn.Conv(self.n_classes, (3, 3), padding='SAME',
                                  name='out_scale_4')(y)
        b, h, w, c = y.shape
        y = jax.image.resize(y, (b, h * 4, w * 4, c), 'bilinear')
        outs['scale_1'] = nn.Conv(self.n_classes, (3, 3), padding='SAME',
                                  name='outc')(y)
        return outs


@DETECTOR_DICT.register_module
class MonoDepth:
    """reference unet_monodepth.py:36 (MonoDepth)."""

    def __init__(self, network_cfg):
        self.cfg = network_cfg
        self.max_depth = network_cfg.get('max_depth', 50)
        self.output_channel = network_cfg.get('output_channel', 1)
        self.SI_loss_lambda = network_cfg.get('SI_loss_lambda', 0.3)
        self.smooth_weight = network_cfg.get('smooth_loss_weight', 0.003)
        self.minor_weight = network_cfg.get('minor_weight', 0.0)
        self.obj_types = list(network_cfg.get('obj_types', []))

        pre = network_cfg.get('preprocessed_path', '')
        sum_file = os.path.join(pre, 'training', 'log_depth_sum.npy')
        num_file = os.path.join(pre, 'training', 'log_depth_solid.npy')
        if os.path.isfile(sum_file) and os.path.isfile(num_file):
            s = np.load(sum_file)
            c = np.load(num_file)
            self.prior_mean = float(np.sum(s) / np.sum(c))
        else:  # neutral prior: log(15 m)
            self.prior_mean = float(np.log(15.0))

        self.net = UNetCore(
            backbone_cfg=FrozenDict(dict(network_cfg.backbone)),
            n_classes=self.output_channel)

    def init(self, rng, image_hw: Tuple[int, int], batch_size: int = 1):
        images = jnp.zeros((batch_size, image_hw[0], image_hw[1], 3), jnp.float32)
        P2 = jnp.eye(3, 4)[None].repeat(batch_size, axis=0)
        return self.net.init({'params': rng}, images, P2, train=True)

    def fold_inference_variables(self, variables, image_hw: Tuple[int, int],
                                 batch_size: int = 1):
        """Fold conv+BN for the jitted predict path (models/fold_bn.py)."""
        import jax as _jax
        from visualdet3d_tpu.models.fold_bn import fold_batchnorm
        img = _jax.ShapeDtypeStruct((batch_size, *image_hw, 3), jnp.float32)
        P2 = _jax.ShapeDtypeStruct((batch_size, 3, 4), jnp.float32)
        return fold_batchnorm(
            variables, lambda v, im, p: self.net.apply(v, im, p, train=False),
            img, P2)

    def loss(self, variables, images, P2, gts, rng=None, train: bool = True):
        """images [B,H,W,3]; P2 [B,3,4]; gts [B,H,W] sparse metric depth.
        reference training_forward (unet_monodepth.py:63-103)."""
        rngs = {'dropout': rng} if rng is not None else {}
        feat, new_state = self.net.apply(
            variables, images, P2, train=train, rngs=rngs,
            mutable=['batch_stats'] if train else [])
        # loss math is always f32 (mixed-precision mode emits bf16 heads —
        # pipelines/train_state.py _mixed_precision_interceptor)
        feat = jax.tree.map(lambda x: x.astype(jnp.float32), feat)
        loss = 0.0
        for key, out in feat.items():
            depth_prediction = jnp.exp(self.prior_mean + out[..., 0])  # [B,h,w]
            shape = depth_prediction.shape[1:3]
            reshaped_gt = reshape_depth(gts, shape)
            loss1 = si_log_loss(depth_prediction, reshaped_gt,
                                self.max_depth, self.SI_loss_lambda)
            b, h, w, c = images.shape
            small = jax.image.resize(images, (b, shape[0], shape[1], c), 'bilinear')
            sm = smooth_loss(out, small)
            term = loss1 + self.smooth_weight * sm
            loss = loss + (term if key == 'scale_1' else self.minor_weight * term)
        loss_dict = dict(total_loss=loss)
        return (loss, loss_dict), new_state

    def predict(self, variables, images, P2):
        """Returns dict(target=[B, H, W, 1] metric depth)
        (reference test_forward :105-125)."""
        feat = self.net.apply(variables, images, P2, train=False)
        return {'target': jnp.exp(self.prior_mean + feat['scale_1'])}
