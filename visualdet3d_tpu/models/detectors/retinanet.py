"""RetinaNet 2D detection baseline (ResNet + FPN + retina head).

reference: visualDet3D/networks/detectors/retinanet_2d.py:15-150 and
networks/heads/retinanet_head.py:13-362. TPU-first: multi-level predictions
are concatenated into one [B, N, C] tensor (anchors match the same layout),
the per-image loss loop becomes a vmap with masks, and decode runs as
top-1000 pre-select + fixed-K device NMS (reference pre-NMS topk at
retinanet_head.py:267-271).
"""
from __future__ import annotations

from typing import Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn
from flax.core import FrozenDict

from visualdet3d_tpu.geometry import calc_iou
from visualdet3d_tpu.models.backbones.resnet import resnet
from visualdet3d_tpu.models.blocks import anchor_flatten
from visualdet3d_tpu.models.heads.anchors import Anchors
from visualdet3d_tpu.models.heads.detection_3d_head import assign_anchors
from visualdet3d_tpu.models.heads.losses import iou_loss, sigmoid_focal_loss
from visualdet3d_tpu.ops.nms import nms
from visualdet3d_tpu.registry import DETECTOR_DICT


class FPN(nn.Module):
    """Feature pyramid with RetinaNet extra levels (reference retinanet_2d.py:15-67)."""
    out_channels: int = 256
    num_outs: int = 5

    @nn.compact
    def __call__(self, feats):
        n_in = len(feats)
        laterals = [nn.Conv(self.out_channels, (1, 1), name=f'lateral_{i}')(feats[i])
                    for i in range(n_in)]
        for i in range(n_in - 1, 0, -1):
            b, h, w, c = laterals[i].shape
            up = jax.image.resize(laterals[i],
                                  (b, laterals[i - 1].shape[1],
                                   laterals[i - 1].shape[2], c), 'nearest')
            laterals[i - 1] = laterals[i - 1] + up
        outs = [nn.Conv(self.out_channels, (3, 3), padding='SAME',
                        name=f'fpn_{i}')(laterals[i]) for i in range(n_in)]
        extra = self.num_outs - n_in
        if extra > 0:
            x = nn.Conv(self.out_channels, (3, 3), strides=(2, 2), padding='SAME',
                        name=f'fpn_{n_in}')(feats[-1])
            outs.append(x)
            for i in range(1, extra):
                x = nn.Conv(self.out_channels, (3, 3), strides=(2, 2),
                            padding='SAME', name=f'fpn_{n_in + i}')(outs[-1])
                outs.append(x)
        return outs


class RetinaNetNet(nn.Module):
    backbone_cfg: FrozenDict
    num_classes: int
    num_anchors_per_scale: int
    stacked_convs: int = 4
    feat_channels: int = 256
    num_outs: int = 5

    @nn.compact
    def __call__(self, images, train: bool = False):
        feats = resnet(**dict(self.backbone_cfg))(images, train=train)
        feats = FPN(self.feat_channels, self.num_outs)(feats)

        cls_tower = [nn.Conv(self.feat_channels, (3, 3), padding='SAME',
                             name=f'cls_conv_{i}') for i in range(self.stacked_convs)]
        reg_tower = [nn.Conv(self.feat_channels, (3, 3), padding='SAME',
                             name=f'reg_conv_{i}') for i in range(self.stacked_convs)]
        cls_prior = 0.01
        retina_cls = nn.Conv(
            self.num_anchors_per_scale * self.num_classes, (3, 3), padding='SAME',
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.constant(float(np.log(cls_prior / (1 - cls_prior)))),
            name='retina_cls')
        retina_reg = nn.Conv(
            self.num_anchors_per_scale * 4, (3, 3), padding='SAME',
            kernel_init=nn.initializers.zeros, bias_init=nn.initializers.zeros,
            name='retina_reg')

        cls_scores, reg_preds = [], []
        for feat in feats:
            cls_feat, reg_feat = feat, feat
            for conv_c, conv_r in zip(cls_tower, reg_tower):
                cls_feat = nn.relu(conv_c(cls_feat))
                reg_feat = nn.relu(conv_r(reg_feat))
            cls_scores.append(anchor_flatten(retina_cls(cls_feat), self.num_classes))
            reg_preds.append(anchor_flatten(retina_reg(reg_feat), 4))
        return jnp.concatenate(cls_scores, axis=1), jnp.concatenate(reg_preds, axis=1)


def _decode_2d(anchors, deltas, means, stds):
    """reference retinanet_head.py:230-256 (_decode)."""
    d = deltas * stds + means
    px = 0.5 * (anchors[:, 0] + anchors[:, 2])
    py = 0.5 * (anchors[:, 1] + anchors[:, 3])
    pw = anchors[:, 2] - anchors[:, 0]
    ph = anchors[:, 3] - anchors[:, 1]
    gx = px + pw * d[:, 0]
    gy = py + ph * d[:, 1]
    gw = pw * jnp.exp(d[:, 2])
    gh = ph * jnp.exp(d[:, 3])
    return jnp.stack([gx - gw / 2, gy - gh / 2, gx + gw / 2, gy + gh / 2], axis=-1)


def _encode_2d(anchors, gt, means, stds):
    """reference retinanet_head.py:202-228 (_encode)."""
    px = 0.5 * (anchors[:, 0] + anchors[:, 2])
    py = 0.5 * (anchors[:, 1] + anchors[:, 3])
    pw = anchors[:, 2] - anchors[:, 0]
    ph = anchors[:, 3] - anchors[:, 1]
    gx = 0.5 * (gt[:, 0] + gt[:, 2])
    gy = 0.5 * (gt[:, 1] + gt[:, 3])
    gw = jnp.clip(gt[:, 2] - gt[:, 0], 1e-6, None)
    gh = jnp.clip(gt[:, 3] - gt[:, 1], 1e-6, None)
    deltas = jnp.stack([(gx - px) / pw, (gy - py) / ph,
                        jnp.log(gw / pw), jnp.log(gh / ph)], axis=-1)
    return (deltas - means) / stds


@DETECTOR_DICT.register_module
class RetinaNet:
    """reference retinanet_2d.py:82 (RetinaNet)."""

    def __init__(self, network_cfg):
        self.cfg = network_cfg
        self.obj_types = list(network_cfg.obj_types)
        self.num_classes = len(self.obj_types)
        head_cfg = network_cfg.head
        anchors_cfg = dict(head_cfg.get('anchors_cfg', {}))
        anchors_cfg.pop('obj_types', None)
        self.anchors = Anchors(read_config_file=False, **anchors_cfg)
        self.loss_cfg = head_cfg.get('loss_cfg', {})
        self.test_cfg = head_cfg.get('test_cfg', {})
        self.target_means = jnp.asarray(head_cfg.get('target_means', [0.0] * 4))
        self.target_stds = jnp.asarray(head_cfg.get('target_stds', [1.0] * 4))
        neck = network_cfg.get('neck', {})
        self.net = RetinaNetNet(
            backbone_cfg=FrozenDict(dict(network_cfg.backbone)),
            num_classes=self.num_classes,
            num_anchors_per_scale=self.anchors.num_anchor_per_scale,
            stacked_convs=head_cfg.get('stacked_convs', 4),
            feat_channels=head_cfg.get('feat_channels', 256),
            num_outs=neck.get('num_outs', 5))
        self._anchor_cache = {}

    def anchor_pack(self, image_hw):
        key = tuple(image_hw)
        if key not in self._anchor_cache:
            self._anchor_cache[key] = self.anchors.anchors_for_shape(key)
        return self._anchor_cache[key]

    def init(self, rng, image_hw, batch_size: int = 1):
        images = jnp.zeros((batch_size, image_hw[0], image_hw[1], 3), jnp.float32)
        return self.net.init({'params': rng}, images, train=True)

    def fold_inference_variables(self, variables, image_hw, batch_size: int = 1):
        """Fold conv+BN for the jitted predict path (models/fold_bn.py)."""
        import jax as _jax
        from visualdet3d_tpu.models.fold_bn import fold_batchnorm
        img = _jax.ShapeDtypeStruct((batch_size, *image_hw, 3), jnp.float32)
        return fold_batchnorm(
            variables, lambda v, im: self.net.apply(v, im, train=False), img)

    def loss(self, variables, images, P2, annotations, rng=None,
             train: bool = True):
        """P2 accepted for trainer-protocol parity; unused in 2D."""
        anchors = jnp.asarray(self.anchor_pack((images.shape[1], images.shape[2])))
        rngs = {'dropout': rng} if rng is not None else {}
        (cls_scores, reg_preds), new_state = self.net.apply(
            variables, images, train=train, rngs=rngs,
            mutable=['batch_stats'] if train else [])
        # loss math is always f32 (mixed-precision mode emits bf16 heads —
        # pipelines/train_state.py _mixed_precision_interceptor)
        cls_scores = cls_scores.astype(jnp.float32)
        reg_preds = reg_preds.astype(jnp.float32)

        balance = jnp.asarray(self.loss_cfg.get('balance_weights',
                                                [1.0] * self.num_classes))
        gamma = self.loss_cfg.get('gamma', 2.0)
        fg = self.loss_cfg.get('fg_iou_threshold', 0.5)
        bg = self.loss_cfg.get('bg_iou_threshold', 0.4)
        mlq = self.loss_cfg.get('match_low_quality', True)
        n = anchors.shape[0]
        useful = jnp.ones((n,), bool)

        def per_image(cls_score, reg_pred, ann):
            res = assign_anchors(anchors, ann, useful, fg, bg, mlq)
            pos, neg, gt_idx = res['pos_mask'], res['neg_mask'], res['gt_index']
            gt_rows = jax.nn.one_hot(gt_idx, ann.shape[0], dtype=ann.dtype) @ ann
            labels = jnp.full((n, self.num_classes), -1.0)
            labels = jnp.where(neg[:, None], 0.0, labels)
            onehot = jax.nn.one_hot(gt_rows[:, 4].astype(jnp.int32),
                                    self.num_classes)
            labels = jnp.where(pos[:, None], onehot, labels)

            targets = _encode_2d(anchors, gt_rows[:, :4], self.target_means,
                                 self.target_stds)
            # decoded-before-loss IoU regression (reference head:309-339)
            pred_boxes = _decode_2d(anchors, reg_pred, self.target_means,
                                    self.target_stds)
            targ_boxes = _decode_2d(anchors, targets, self.target_means,
                                    self.target_stds)
            reg = jnp.where(pos, iou_loss(pred_boxes, targ_boxes), 0.0).sum()
            cls = sigmoid_focal_loss(cls_score, labels, gamma, balance).sum()
            return cls, reg, pos.sum()

        cls_l, reg_l, n_pos = jax.vmap(per_image)(cls_scores, reg_preds, annotations)
        denom = n_pos.sum() + 1e-4
        cls_loss = cls_l.sum()[None] / denom
        reg_loss = reg_l.sum()[None] / denom
        return (cls_loss, reg_loss,
                dict(cls_loss=cls_loss, reg_loss=reg_loss,
                     total_loss=cls_loss + reg_loss)), new_state

    def predict(self, variables, images, P2=None, max_detections: int = 64):
        anchors = jnp.asarray(self.anchor_pack((images.shape[1], images.shape[2])))
        cls_scores, reg_preds = self.net.apply(variables, images, train=False)
        nms_pre = self.test_cfg.get('nms_pre', 1000)
        score_thr = self.test_cfg.get('score_thr', 0.5)
        nms_iou_thr = self.test_cfg.get('nms_iou_thr', 0.5)
        cls_agnostic = self.test_cfg.get('cls_agnositc', True)

        def decode_one(cls_score, reg_pred):
            probs = jax.nn.sigmoid(cls_score)
            max_score = probs.max(axis=-1)
            label = probs.argmax(axis=-1)
            boxes = _decode_2d(anchors, reg_pred, self.target_means, self.target_stds)
            valid = max_score > score_thr
            nms_boxes = boxes
            if not cls_agnostic:
                nms_boxes = boxes + label.astype(boxes.dtype)[:, None] * jnp.max(boxes)
            keep, keep_valid = nms(nms_boxes, max_score, nms_iou_thr,
                                   max_outputs=max_detections,
                                   pre_top_k=min(nms_pre, anchors.shape[0]),
                                   valid_mask=valid)
            safe = jnp.clip(keep, 0, None)
            return (max_score[safe] * keep_valid, boxes[safe], label[safe],
                    keep_valid)

        scores, bboxes, labels, valid = jax.vmap(decode_one)(cls_scores, reg_preds)
        return dict(scores=scores, bboxes=bboxes, labels=labels, valid=valid)
