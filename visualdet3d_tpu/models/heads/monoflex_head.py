"""MonoFlex head: KM3D + FCOS-style 2D box, direct-depth exp(-x) decode,
keypoint-pair depths, and uncertainty-weighted depth fusion.

reference: visualDet3D/networks/heads/monoflex_head.py:15-236.
"""
from __future__ import annotations

from typing import Dict

import numpy as np

import jax
import jax.numpy as jnp

from visualdet3d_tpu.geometry import clip_boxes
from visualdet3d_tpu.models.heads import rtm3d_utils as rtm
from visualdet3d_tpu.models.heads.km3d_head import neg_loss, reg_weighted_l1_loss
from visualdet3d_tpu.models.heads.losses import iou_loss
from visualdet3d_tpu.ops.nms import nms

MONOFLEX_HEAD_DICT = {'hm': 3, 'bbox2d': 4, 'hps': 20, 'rot': 8, 'dim': 3,
                      'depth': 1, 'depth_uncertainty': 1,
                      'corner_uncertainty': 3, 'reg': 2}


def _gather_all(output: Dict, ind: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    g = lambda k: rtm.transpose_and_gather_feat(output[k], ind)
    hps = g('hps')
    b, k, _ = hps.shape
    return dict(
        bbox2d=g('bbox2d'), dim=g('dim'), rot=g('rot'),
        hps=hps.reshape(b, k, -1, 2), offset=g('reg'), depth=g('depth'),
        depth_uncer=g('depth_uncertainty'), corner_uncer=g('corner_uncertainty'))


def merge_depth(depth: jnp.ndarray, depth_uncer: jnp.ndarray) -> jnp.ndarray:
    """Inverse-uncertainty weighted fusion (reference merge_depth :86-91)."""
    w = 1.0 / depth_uncer
    w = w / w.sum(axis=-1, keepdims=True)
    return jnp.sum(depth * w, axis=-1)


def _decode_fcos_bbox(reg_preds, points):
    xs, ys = points[..., 0], points[..., 1]
    return jnp.stack([xs - reg_preds[..., 0], ys - reg_preds[..., 1],
                      xs + reg_preds[..., 2], ys + reg_preds[..., 3]], axis=-1)


def _laplacian_l1(output, target, uncertainty, uncertainty_weight, count):
    loss = jnp.abs(output - target) * jnp.exp(-uncertainty) + \
        uncertainty * uncertainty_weight
    return loss.sum() / (count + 1e-4)


def monoflex_loss(output: Dict[str, jnp.ndarray], ann: Dict[str, jnp.ndarray],
                  P2: jnp.ndarray, epoch, uncertainty_range=(-10.0, 10.0),
                  uncertainty_weight: float = 1.0):
    """Full MonoFlex loss, masked/batched (reference loss :181-236).

    All reductions divide by the positive count (reference divides by
    len(gathered) == number of positives after boolean indexing)."""
    ind = ann['ind'].astype(jnp.int32)
    mask = ann['reg_mask'].astype(jnp.float32)  # [B, M]
    n_pos = mask.sum()

    hm_loss = neg_loss(output['hm'], ann['hm'])
    hp_loss = reg_weighted_l1_loss(output['hps'], ann['hps_mask'], ind,
                                   ann['hps'], ann['dep'])
    rot_pred = rtm.transpose_and_gather_feat(output['rot'], ind)
    rot_loss = rtm.compute_rot_loss(rot_pred, ann['rotbin'], ann['rotres'],
                                    ann['reg_mask'][..., None])

    g = _gather_all(output, ind)
    depth_decoded = rtm.decode_depth_inv_sigmoid(g['depth'])  # [B, M, 1]
    kpd_depth = rtm.decode_depth_from_keypoints(
        g['hps'], g['dim'], P2[:, None])  # [B, M, 3]
    depth_uncer = jnp.clip(g['depth_uncer'], *uncertainty_range)
    corner_uncer = jnp.clip(g['corner_uncer'], *uncertainty_range)
    combined_uncer = jnp.exp(jnp.concatenate([depth_uncer, corner_uncer], -1))
    combined_depths = jnp.concatenate([depth_decoded, kpd_depth], -1)
    merged = merge_depth(combined_depths, combined_uncer)  # [B, M]

    m1 = mask[..., None]
    # FCOS IoU loss on (-l, -t, r, b) form (reference _bbox2d_loss :26-33)
    pred_box = jnp.concatenate([g['bbox2d'][..., :2] * -1, g['bbox2d'][..., 2:]], -1)
    targ_box = jnp.concatenate([ann['bboxes2d_target'][..., :2] * -1,
                                ann['bboxes2d_target'][..., 2:]], -1)
    box2d_loss = (iou_loss(pred_box, targ_box) * mask).sum() / (n_pos + 1e-4)

    dim_loss = (jnp.abs(g['dim'] - ann['dim']) * m1).sum() / (n_pos + 1e-4)
    off_loss = (jnp.abs(g['offset'] - ann['reg']) * m1).sum() / (n_pos + 1e-4)

    depth_loss = (jnp.abs(depth_decoded - ann['dep']) * jnp.exp(-depth_uncer) +
                  depth_uncer * uncertainty_weight)
    depth_loss = (depth_loss * m1).sum() / (n_pos + 1e-4)

    kp_target = jnp.repeat(ann['dep'], 3, axis=-1)
    kp_mask = ann['kp_detph_mask'].astype(jnp.float32)
    kp_loss_raw = (jnp.abs(kpd_depth - kp_target) * jnp.exp(-corner_uncer) +
                   corner_uncer * uncertainty_weight)
    kp_valid = kp_loss_raw * kp_mask + (1 - kp_mask) * jax.lax.stop_gradient(kp_loss_raw)
    keypoint_depth_loss = ((kp_valid.mean(axis=-1) * mask).sum()) / (n_pos + 1e-4)

    soft_depth_loss = (jnp.abs(merged[..., None] - ann['dep']) * m1).sum() / (n_pos + 1e-4)

    loss_stats = {'hm_loss': hm_loss, 'hp_loss': hp_loss,
                  'box2d_loss': box2d_loss, 'off_loss': off_loss,
                  'dim_loss': dim_loss, 'depth_loss': depth_loss,
                  'kpd_loss': keypoint_depth_loss, 'rot_loss': rot_loss,
                  'soft_depth_loss': soft_depth_loss}
    weight = {'hm_loss': 1, 'hp_loss': 1, 'box2d_loss': 1, 'off_loss': 0.5,
              'dim_loss': 1, 'depth_loss': 1, 'kpd_loss': 0.2, 'rot_loss': 1.0,
              'soft_depth_loss': 0.2}
    loss = sum(loss_stats[k] * w for k, w in weight.items())
    loss_stats['total_loss'] = loss
    return loss, loss_stats


def monoflex_decode(output: Dict[str, jnp.ndarray], P2: jnp.ndarray, image_hw,
                    score_thr: float = 0.1, nms_iou_thr: float = 0.5,
                    top_k: int = 100, max_detections: int = 32,
                    cls_agnostic: bool = True, down_ratio: int = 4,
                    uncertainty_range=(-10.0, 10.0)):
    """Single-image MonoFlex decode (reference get_bboxes :126-179)."""
    hm = jax.nn.sigmoid(output['hm'])
    heat = rtm.heatmap_nms(hm)
    scores, inds, clses, ys, xs = rtm.topk(heat, k=top_k)

    g = _gather_all(output, inds)
    bbox2d = _decode_fcos_bbox(g['bbox2d'][0], jnp.stack([xs[0], ys[0]], axis=1))

    depth_decoded = rtm.decode_depth_inv_sigmoid(g['depth'][0])
    kpd_depth = rtm.decode_depth_from_keypoints(g['hps'][0], g['dim'][0],
                                                jnp.broadcast_to(P2[0], (top_k, 3, 4)))
    depth_uncer = jnp.clip(g['depth_uncer'][0], *uncertainty_range)
    corner_uncer = jnp.clip(g['corner_uncer'][0], *uncertainty_range)
    combined_uncer = jnp.exp(jnp.concatenate([depth_uncer, corner_uncer], -1))
    combined_depths = jnp.concatenate([depth_decoded, kpd_depth], -1)
    merged_depth = merge_depth(combined_depths, combined_uncer)  # [K]

    alpha = rtm.decode_alpha_from_bins(g['rot'][0])[:, None]
    cx3d = (xs[0] + g['offset'][0][:, 0])[:, None] * down_ratio
    cy3d = (ys[0] + g['offset'][0][:, 1])[:, None] * down_ratio
    z3d = merged_depth[:, None]
    bbox2d = bbox2d * down_ratio
    bbox2d = clip_boxes(bbox2d, image_hw)

    boxes11 = jnp.concatenate([bbox2d, cx3d, cy3d, z3d, g['dim'][0], alpha], axis=1)
    labels = clses[0]
    valid = scores[0] > score_thr
    nms_boxes = boxes11[:, :4]
    if not cls_agnostic:
        nms_boxes = nms_boxes + labels.astype(nms_boxes.dtype)[:, None] * jnp.max(boxes11)
    keep_idx, keep_valid = nms(nms_boxes, scores[0], nms_iou_thr,
                               max_outputs=max_detections, pre_top_k=top_k,
                               valid_mask=valid)
    safe = jnp.clip(keep_idx, 0, None)
    return dict(scores=scores[0][safe] * keep_valid, bboxes=boxes11[safe],
                labels=labels[safe], valid=keep_valid)
