"""YOLOStereo3D: stereo 3D detection — the benchmark flagship.

TPU-first re-design of the reference stereo stack
(visualDet3D/networks/detectors/yolostereo3d_core.py:14-126,
yolostereo3d_detector.py:17-104):

* Both eyes run through the backbone as one doubled batch (the reference
  does the same by concatenation, core:110-118) — on TPU this keeps the MXU
  busy with one large conv batch instead of two small ones.
* The multi-scale correlation volumes (stride 4/8/16) are the fused Pallas
  kernel (ops/cost_volume.py) instead of Python loops over disparity
  (reference PSM_cost_volume.py:58-64, 90-95).
* The concat volume at stride 16 is aggregated with XLA NDHWC 3D convs.
* CostVolumePyramid / StereoMerging keep the reference channel plan:
  24 -> 96 -> 384 -> 1152 (+256 left features = 1408).
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn
from flax.core import FrozenDict

from visualdet3d_tpu.models.backbones.resnet import resnet, BasicBlock
from visualdet3d_tpu.models.blocks import ResGhostModule
from visualdet3d_tpu.models.detectors.yolo3d import Yolo3DSystem
from visualdet3d_tpu.models.heads import detection_3d_head as head_lib
from visualdet3d_tpu.models.heads.losses import stereo_focal_loss
from visualdet3d_tpu.ops.cost_volume import (
    concat_volume, correlation_volume, correlation_volume_interleaved)
from visualdet3d_tpu.registry import DETECTOR_DICT


def _stack_eyes(left: jnp.ndarray, right: jnp.ndarray) -> jnp.ndarray:
    """[B, ...] x2 -> [2B, ...] INTERLEAVED (l0, r0, l1, r1, ...).

    The reference doubles the batch by plain concatenation
    (yolostereo3d_core.py:110-118). Under a batch-sharded data-parallel mesh
    that is a catastrophic layout: concatenating two batch-sharded arrays
    along the sharded axis maps every left row onto the first half of the
    mesh, so GSPMD must emit a cross-module all-to-all (observed to straggle
    and abort XLA:CPU's 40 s collective rendezvous). Interleaving keeps each
    device's left/right pair local: sharding [2B] over N devices gives device
    i rows (2B/N)*i .. — exactly its own pairs — so the doubled-batch conv
    needs no communication at all. Batch order inside the doubled conv is
    irrelevant to convs and to (order-invariant) BN batch stats.

    The optimization barrier pins the interleaved tensor to a plain row-major
    materialization: without it XLA fuses the stack into the stem's
    space-to-depth reshape with an eye-minor layout, turning a ~0.2 ms
    interleave copy into a ~19 ms scattered transpose (r3 TPU profile).
    """
    b = left.shape[0]
    both = jnp.stack([left, right], axis=1).reshape(2 * b, *left.shape[1:])
    return jax.lax.optimization_barrier(both)


def _split_eyes(both: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Inverse of _stack_eyes: [2B, ...] -> ([B, ...], [B, ...]).

    Same layout story as _stack_eyes: without the barrier XLA materialises
    the [B, 2, ...] view in an eye-minor layout for one consumer and
    re-copies it for the other (~1.7 ms of [16,2,72,320,64] copies in the
    r3 trace)."""
    b = both.shape[0] // 2
    x = jax.lax.optimization_barrier(both.reshape(b, 2, *both.shape[1:]))
    return x[:, 0], x[:, 1]


class CostVolume3D(nn.Module):
    """Concat cost volume + 3D conv aggregation at stride 16.

    reference: CostVolume (PSM_cost_volume.py:19-68): 1x1 down-projection to
    PSM_features, concat volume over D=max_disp/scale, two 3D convs, then the
    (D * F) channels are flattened back to 2D.
    """
    max_disp: int = 192
    downsample_scale: int = 16
    psm_features: int = 8

    @nn.compact
    def __call__(self, both, train: bool = False):
        """``both``: interleaved dual-eye features [2B, H, W, C] (the
        _stack_eyes layout, straight off the trunk — no split needed)."""
        d = self.max_disp // self.downsample_scale
        # shared 1x1 down-projection for both eyes: one doubled-batch conv,
        # interleaved so it stays shard-local under data parallelism
        both = nn.Conv(self.psm_features, (1, 1))(both)
        both = nn.BatchNorm(use_running_average=not train, momentum=0.9)(both)
        both = nn.relu(both)
        # the split is on the 8-channel projection (0.2 MB at batch 16) —
        # negligible next to splitting the 256-channel input
        l, r = _split_eyes(both)
        vol = concat_volume(l, r, d)  # [B, D, H, W, 2F] (NDHWC)
        for _ in range(2):
            vol = nn.Conv(self.psm_features, (3, 3, 3), padding='SAME')(vol)
            vol = nn.BatchNorm(use_running_average=not train, momentum=0.9)(vol)
            vol = nn.relu(vol)
        b, dd, h, w, f = vol.shape
        # [B, H, W, D*F] channels-last flatten
        return vol.transpose(0, 2, 3, 1, 4).reshape(b, h, w, dd * f)


class CostVolumePyramid(nn.Module):
    """Fuse stride-4/8/16 volumes into stride-16 features (+ training-time
    disparity head). reference: yolostereo3d_core.py:14-71."""
    depth_channel_4: int
    depth_channel_8: int
    depth_channel_16: int

    @nn.compact
    def __call__(self, psv4, psv8, psv16, train: bool = False):
        c4 = self.depth_channel_4
        x = ResGhostModule(3 * c4, 3, ratio=3)(psv4, train=train)
        x = nn.avg_pool(x, (2, 2), (2, 2))
        x = BasicBlock(3 * c4)(x, train=train)
        x = jnp.concatenate([x, psv8], axis=-1)

        c8 = 3 * c4 + self.depth_channel_8
        x = ResGhostModule(3 * c8, 3, ratio=3)(x, train=train)
        x = nn.avg_pool(x, (2, 2), (2, 2))
        x = BasicBlock(3 * c8)(x, train=train)
        x = jnp.concatenate([x, psv16], axis=-1)

        c16 = 3 * c8 + self.depth_channel_16
        x = ResGhostModule(3 * c16, kernel_size=3, ratio=3)(x, train=train)
        features = BasicBlock(3 * c16)(x, train=train)  # [B, H/16, W/16, 1152]

        if train:
            # upsample x4 and predict a 96-channel disparity distribution
            # (reference depth_output head, yolostereo3d_core.py:50-61)
            c = features.shape[-1]
            y = jax.image.resize(features, (features.shape[0], features.shape[1] * 2,
                                            features.shape[2] * 2, c), 'bilinear')
            y = nn.Conv(c // 2, (3, 3), padding='SAME')(y)
            y = nn.BatchNorm(use_running_average=not train, momentum=0.9)(y)
            y = nn.relu(y)
            y = jax.image.resize(y, (y.shape[0], y.shape[1] * 2, y.shape[2] * 2,
                                     c // 2), 'bilinear')
            y = nn.Conv(c // 4, (3, 3), padding='SAME')(y)
            y = nn.BatchNorm(use_running_average=not train, momentum=0.9)(y)
            y = nn.relu(y)
            depth_output = nn.Conv(96, (1, 1))(y)  # [B, H/4, W/4, 96]
        else:
            depth_output = None
        return features, depth_output

    @property
    def output_channel_num(self):
        return 3 * (3 * (3 * self.depth_channel_4 + self.depth_channel_8)
                    + self.depth_channel_16)


class StereoMerging(nn.Module):
    """Correlation volumes at stride 4/8 + concat volume at 16, fused by the
    pyramid; concat with left stride-16 features. reference: core:73-94."""
    base_features: int

    @nn.compact
    def __call__(self, feats, train: bool = False):
        """``feats``: list of interleaved dual-eye trunk features [2B, ...]
        per stride (4/8/16). The eye de-interleave happens inside the corr
        kernel's BlockSpec index maps (correlation_volume_interleaved) so
        the stride-4/8 [B,2,H,W,C] split copies never materialize (r4 int8
        profile: ~1.0 ms at batch 16)."""
        psv4 = correlation_volume_interleaved(feats[0], 96 // 4)
        psv8 = correlation_volume_interleaved(feats[1], 192 // 8)
        psv16 = CostVolume3D(max_disp=192, downsample_scale=16, psm_features=8)(
            feats[2], train=train)
        pyramid = CostVolumePyramid(psv4.shape[-1], psv8.shape[-1], psv16.shape[-1])
        psv_features, depth_output = pyramid(psv4, psv8, psv16, train=train)
        left16 = _split_eyes(feats[2])[0]
        features = jnp.concatenate([left16, psv_features], axis=-1)
        return features, depth_output


class YoloStereo3DNet(nn.Module):
    """Dual-eye backbone (doubled batch) + StereoMerging + StereoHead."""
    backbone_cfg: FrozenDict
    head_cfg: FrozenDict
    num_anchors: int

    @nn.compact
    def __call__(self, left_images, right_images, P2=None, train: bool = False):
        images = _stack_eyes(left_images, right_images)
        feats = resnet(**dict(self.backbone_cfg))(images, train=train)

        base = 256 if dict(self.backbone_cfg)['depth'] > 34 else 64
        features, depth_output = StereoMerging(base)(feats, train=train)
        layer_cfg = dict(self.head_cfg)
        head = head_lib.StereoHead(
            num_anchors=self.num_anchors,
            num_cls_output=layer_cfg['num_cls_output'],
            num_reg_output=layer_cfg['num_reg_output'],
            cls_feature_size=layer_cfg.get('cls_feature_size', 256),
            reg_feature_size=layer_cfg.get('reg_feature_size', 1408),
        )
        cls_preds, reg_preds = head(features, P2, train=train)
        return cls_preds, reg_preds, depth_output


@DETECTOR_DICT.register_module
class Stereo3D(Yolo3DSystem):
    """reference: yolostereo3d_detector.py:17 (Stereo3D)."""

    def __init__(self, network_cfg):
        super().__init__(network_cfg)
        self.max_disp = int(network_cfg.get('max_disparity', 96))
        self.net = YoloStereo3DNet(
            backbone_cfg=FrozenDict(dict(network_cfg.backbone)),
            head_cfg=FrozenDict(dict(self.layer_cfg)),
            num_anchors=self.anchors.num_anchors)

    def init(self, rng, image_hw: Tuple[int, int], batch_size: int = 1):
        left = jnp.zeros((batch_size, image_hw[0], image_hw[1], 3), jnp.float32)
        P2 = jnp.eye(3, 4)[None].repeat(batch_size, axis=0)
        # init in train mode so train-only submodules (the disparity head)
        # create their parameters; eval apply simply leaves them unused
        prng, drng = jax.random.split(rng)
        variables = self.net.init({'params': prng, 'dropout': drng},
                                  left, left, P2, train=True)
        return variables

    def fold_inference_variables(self, variables, image_hw, batch_size: int = 1):
        from visualdet3d_tpu.models.fold_bn import fold_batchnorm
        img = jax.ShapeDtypeStruct((batch_size, *image_hw, 3), jnp.float32)
        P2 = jax.ShapeDtypeStruct((batch_size, 3, 4), jnp.float32)
        return fold_batchnorm(
            variables,
            lambda v, l, r, p: self.net.apply(v, l, r, p, train=False),
            img, img, P2)

    def _int8_trace_args(self, image_hw, batch_size: int = 1):
        img = jax.ShapeDtypeStruct((batch_size, *image_hw, 3), jnp.float32)
        P2 = jax.ShapeDtypeStruct((batch_size, 3, 4), jnp.float32)
        return (img, img, P2)

    # final prediction convs stay bf16 (raw logits / regression outputs)
    int8_deny = (
        ('StereoHead_0', 'Conv_0'),
        ('StereoHead_0', '_ClsBranch_0', 'Conv_2'),
    )

    def int8_calib_inputs(self, batch):
        return (batch['left_images'], batch['right_images'], batch['P2'])

    def loss(self, variables, left_images, right_images, P2, P3, annotations,
             disparity=None, rng=None, train: bool = True):
        """reference: Stereo3D.train_forward (yolostereo3d_detector.py:42-75):
        detection loss + auxiliary stereo-focal disparity loss, the latter
        only applied when the detection reg loss is active."""
        image_hw = (left_images.shape[1], left_images.shape[2])
        pack = self.anchor_pack(image_hw)
        rngs = {'dropout': rng} if rng is not None else {}
        (cls_preds, reg_preds, depth_output), new_state = self.net.apply(
            variables, left_images, right_images, P2, train=train,
            rngs=rngs, mutable=['batch_stats'] if train else [])
        # loss math is always f32 (the mixed-precision train mode emits bf16
        # predictions — pipelines/train_state.py _mixed_precision_interceptor)
        cls_preds, reg_preds, depth_output = jax.tree.map(
            lambda x: x.astype(jnp.float32),
            (cls_preds, reg_preds, depth_output))
        useful = self.anchors.useful_mask(pack, P2) if \
            self.loss_cfg.get('filter_anchor', True) else \
            jnp.ones((P2.shape[0], pack['anchors'].shape[0]), bool)
        cls_loss, reg_loss, loss_dict = head_lib.detection_3d_loss(
            cls_preds, reg_preds,
            jnp.asarray(pack['anchors']),
            jnp.asarray(pack['anchor_mean_std']),
            useful, annotations,
            num_classes=self.num_classes,
            focal_loss_gamma=self.loss_cfg.get('focal_loss_gamma', 0.0),
            balance_weights=self.loss_cfg.get('balance_weight', [1.0] * self.num_classes),
            regression_weight=self.loss_cfg.get(
                'regression_weight', [1.0] * self.num_regression_loss_terms),
            L1_regression_alpha=self.loss_cfg.get('L1_regression_alpha', 25.0),
            fg_iou_threshold=self.loss_cfg.get('fg_iou_threshold', 0.5),
            bg_iou_threshold=self.loss_cfg.get('bg_iou_threshold', 0.4),
            match_low_quality=self.loss_cfg.get('match_low_quality', True),
        )
        if train and disparity is not None and depth_output is not None:
            disp_loss = stereo_focal_loss(depth_output, disparity,
                                          variance=0.5, sparse=True)
            disp_loss = jnp.where(reg_loss.mean() > 0, disp_loss, 0.0)
            loss_dict['disparity_loss'] = disp_loss[None]
            reg_loss = reg_loss + disp_loss
            loss_dict['total_loss'] = cls_loss + reg_loss
        return (cls_loss, reg_loss, loss_dict), new_state

    def predict(self, variables, left_images, right_images, P2, P3=None,
                max_detections: int = 32):
        image_hw = (left_images.shape[1], left_images.shape[2])
        pack = self.anchor_pack(image_hw)
        variables, (left_images, right_images), ctx = self._inference_cast(
            variables, [left_images, right_images])
        with ctx:
            cls_preds, reg_preds, _ = self.net.apply(
                variables, left_images, right_images, P2, train=False)
        # cls logits stay bf16 until the 1024-candidate gather inside
        # get_bboxes (casting [B, 69120, 3] to f32 here forced a 1 ms+
        # layout copy in the r3 trace); scores come back f32
        is_filtering = self.test_cfg.get(
            'filter_anchor', self.loss_cfg.get('filter_anchor', True))
        if is_filtering:
            useful = self.anchors.useful_mask(pack, P2)
        else:
            useful = jnp.ones((P2.shape[0], pack['anchors'].shape[0]), bool)

        scores, bboxes, labels, valid = head_lib.get_bboxes_batched(
            cls_preds, reg_preds, self.anchors.num_anchors,
            jnp.asarray(pack['anchors']),
            jnp.asarray(pack['anchor_mean_std']),
            useful,
            num_classes=self.num_classes,
            image_hw=image_hw,
            score_thr=self.test_cfg.get('score_thr', 0.75),
            nms_iou_thr=self.test_cfg.get('nms_iou_thr', 0.4),
            max_detections=max_detections,
            cls_agnostic=self.test_cfg.get('cls_agnositc', True),
        )
        return dict(scores=scores, bboxes=bboxes, labels=labels, valid=valid)
