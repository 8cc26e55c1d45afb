"""KM3D (RTM3D-style) center-based head.

reference: visualDet3D/networks/heads/km3d_head.py:22-357 — multi-branch
CenterNet head dict (hm/wh/hps/rot/dim/prob/reg/hm_hp/hp_offset), CornerNet
focal loss, depth-weighted keypoint L1, rot-bin loss, least-squares 3D
position decode, and exp-rampup weighting of the geometric losses.

TPU-first: the head is a flax module over NHWC features; losses/decode are
pure functions with static shapes (fixed max_objects, fixed top-K); the NxN
CUDA IoU3D in Position_loss becomes the vectorised clipping op.
"""
from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

from visualdet3d_tpu.geometry import clip_boxes
from visualdet3d_tpu.models.heads import rtm3d_utils as rtm
from visualdet3d_tpu.ops.nms import nms

# branch name -> output channels (reference config KM3D_example:152-154)
DEFAULT_HEAD_DICT = {'hm': 3, 'wh': 2, 'hps': 18, 'rot': 8, 'dim': 3,
                     'prob': 1, 'reg': 2, 'hm_hp': 9, 'hp_offset': 2}


class KM3DHeadNet(nn.Module):
    """Per-branch conv towers (reference _init_layers, km3d_head.py:135-158)."""
    head_dict: Tuple[Tuple[str, int], ...]
    head_features: int = 64

    @nn.compact
    def __call__(self, x):
        out = {}
        for name, channels in self.head_dict:
            y = nn.Conv(self.head_features, (3, 3), padding='SAME',
                        name=f'{name}_conv1')(x)
            y = nn.relu(y)
            bias_init = nn.initializers.constant(-2.19) if 'hm' in name \
                else nn.initializers.zeros
            kernel_init = nn.initializers.lecun_normal() if 'hm' in name \
                else nn.initializers.normal(0.001)
            y = nn.Conv(channels, (1, 1), name=f'{name}_out',
                        kernel_init=kernel_init, bias_init=bias_init)(y)
            out[name] = y
        return out


# ---------------------------------------------------------------------------
# losses (reference km3d_head.py:62-133, 311-351)
# ---------------------------------------------------------------------------

def neg_loss(pred: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    """CornerNet focal on heatmaps with over-confidence clamps
    (reference :62-98). pred/gt: [B, H, W, C] (pred = raw logits)."""
    pos_inds = (gt == 1.0).astype(pred.dtype)
    neg_inds = (gt < 1.0).astype(pred.dtype)
    neg_weights = (1.0 - gt) ** 4
    pred_prob = jax.nn.sigmoid(pred)

    pos_loss = jax.nn.log_sigmoid(pred) * (1 - pred_prob) ** 2 * pos_inds
    pos_loss = jnp.where(pred_prob > 0.99, 0.0, pos_loss)
    neg_loss_ = jax.nn.log_sigmoid(-pred) * pred_prob ** 2 * neg_weights * neg_inds
    neg_loss_ = jnp.where(pred_prob < 0.01, 0.0, neg_loss_)

    num_pos = pos_inds.sum()
    pos_sum = pos_loss.sum()
    neg_sum = neg_loss_.sum()
    return jnp.where(num_pos == 0, -neg_sum, -(pos_sum + neg_sum) / jnp.clip(num_pos, 1, None))


def reg_weighted_l1_loss(output, mask, ind, target, dep):
    """Depth-weighted keypoint L1 (reference _RegWeightedL1Loss :101-117)."""
    dep = dep[..., 0]
    dep = jnp.where(dep < 5, dep * 0.01, jnp.log10(jnp.clip(dep - 4, 1e-6, None)) + 0.1)
    pred = rtm.transpose_and_gather_feat(output, ind)
    mask = mask.astype(pred.dtype)
    loss = jnp.abs(pred * mask - target * mask)
    loss = jnp.sum(loss, axis=2) * dep
    return loss.sum() / (mask.sum() + 1e-4)


def reg_l1_loss(output, mask, ind, target):
    """Masked L1 (reference _RegL1Loss :120-126)."""
    pred = rtm.transpose_and_gather_feat(output, ind)
    mask = jnp.broadcast_to(mask[..., None], pred.shape).astype(pred.dtype)
    return jnp.abs(pred * mask - target * mask).sum() / (mask.sum() + 1e-4)


def exp_rampup(epoch, rampup_length: int = 100):
    """reference :53-59."""
    epoch = jnp.clip(epoch, 0.0, rampup_length)
    phase = 1.0 - epoch / rampup_length
    return jnp.exp(-5.0 * phase * phase)


def km3d_loss(output: Dict[str, jnp.ndarray], annotations: Dict[str, jnp.ndarray],
              P2: jnp.ndarray, epoch: jnp.ndarray, output_w: int,
              rampup_length: int = 100):
    """Full KM3D loss (reference loss :311-351)."""
    ann = annotations
    hm_loss = neg_loss(output['hm'], ann['hm'])
    hp_loss = reg_weighted_l1_loss(output['hps'], ann['hps_mask'], ann['ind'],
                                   ann['hps'], ann['dep'])
    wh_loss = reg_l1_loss(output['wh'], ann['reg_mask'], ann['ind'], ann['wh'])
    dim_loss = reg_l1_loss(output['dim'], ann['reg_mask'], ann['ind'], ann['dim'])
    rot_pred = rtm.transpose_and_gather_feat(output['rot'], ann['ind'])
    rot_loss = rtm.compute_rot_loss(rot_pred, ann['rotbin'], ann['rotres'],
                                    ann['reg_mask'][..., None])
    off_loss = reg_l1_loss(output['reg'], ann['reg_mask'], ann['ind'], ann['reg'])
    hp_offset_loss = reg_l1_loss(output['hp_offset'], ann['hp_mask'],
                                 ann['hp_ind'], ann['hp_offset'])
    hm_hp_loss = neg_loss(output['hm_hp'], ann['hm_hp'])
    coor_loss, prob_loss, box_score = rtm.position_loss(output, ann, P2, output_w)

    ramp = exp_rampup(epoch, rampup_length)
    loss_stats = {'hm_loss': hm_loss, 'hp_loss': hp_loss,
                  'hm_hp_loss': hm_hp_loss, 'hp_offset_loss': hp_offset_loss,
                  'wh_loss': wh_loss, 'off_loss': off_loss, 'dim_loss': dim_loss,
                  'rot_loss': rot_loss, 'prob_loss': prob_loss,
                  'box_score': box_score, 'coor_loss': coor_loss}
    weight = {'hm_loss': 1, 'hp_loss': 1, 'hm_hp_loss': 1, 'hp_offset_loss': 1,
              'wh_loss': 0.1, 'off_loss': 1, 'dim_loss': 2, 'rot_loss': 0.2,
              'prob_loss': ramp, 'coor_loss': ramp}
    loss = sum(loss_stats[k] * w for k, w in weight.items())
    loss_stats['total_loss'] = loss
    return loss, loss_stats


# ---------------------------------------------------------------------------
# decode (reference _decode + get_bboxes :160-310)
# ---------------------------------------------------------------------------

def km3d_decode(output: Dict[str, jnp.ndarray], P2: jnp.ndarray,
                image_hw, score_thr: float = 0.1, nms_iou_thr: float = 0.5,
                top_k: int = 100, max_detections: int = 32,
                cls_agnostic: bool = True, down_ratio: int = 4):
    """Single-image heatmap decode -> 3D boxes. All fixed-shape, on device.

    Returns dict(scores [K], bboxes [K, 11], labels [K], valid [K]).
    """
    hm = jax.nn.sigmoid(output['hm'])
    hm_hp = jax.nn.sigmoid(output['hm_hp'])
    b, h, w, _ = hm.shape
    assert b == 1
    num_joints = output['hps'].shape[-1] // 2

    heat = rtm.heatmap_nms(hm)
    scores, inds, clses, ys, xs = rtm.topk(heat, k=top_k)  # [1, K]

    kps = rtm.transpose_and_gather_feat(output['hps'], inds)  # [1, K, 18]
    kps = kps.at[..., ::2].add(xs[..., None])
    kps = kps.at[..., 1::2].add(ys[..., None])

    reg = rtm.transpose_and_gather_feat(output['reg'], inds)
    xs_c = xs[..., None] + reg[:, :, 0:1]
    ys_c = ys[..., None] + reg[:, :, 1:2]
    wh = rtm.transpose_and_gather_feat(output['wh'], inds)
    bboxes = jnp.concatenate([xs_c - wh[..., 0:1] / 2, ys_c - wh[..., 1:2] / 2,
                              xs_c + wh[..., 0:1] / 2, ys_c + wh[..., 1:2] / 2],
                             axis=2)
    dim = rtm.transpose_and_gather_feat(output['dim'], inds)
    rot = rtm.transpose_and_gather_feat(output['rot'], inds)
    prob = rtm.transpose_and_gather_feat(output['prob'], inds)[:, :, 0:1]

    # keypoint refinement from the vertex heatmaps (reference :204-249)
    kps_grid = kps.reshape(1, top_k, num_joints, 2).transpose(0, 2, 1, 3)  # [1,J,K,2]
    hm_score, hm_inds, hm_ys, hm_xs = rtm.topk_channel(rtm.heatmap_nms(hm_hp),
                                                       k=top_k)  # [1, J, K]
    hp_offset = rtm.transpose_and_gather_feat(
        output['hp_offset'], hm_inds.reshape(1, -1)).reshape(1, num_joints, top_k, 2)
    hm_xs = hm_xs + hp_offset[..., 0]
    hm_ys = hm_ys + hp_offset[..., 1]
    thresh = 0.1
    m = (hm_score > thresh).astype(hm_xs.dtype)
    hm_score_m = (1 - m) * -1 + m * hm_score
    hm_ys_m = (1 - m) * (-10000) + m * hm_ys
    hm_xs_m = (1 - m) * (-10000) + m * hm_xs
    hm_kps = jnp.stack([hm_xs_m, hm_ys_m], axis=-1)  # [1, J, K, 2]
    dist = jnp.linalg.norm(kps_grid[:, :, :, None] - hm_kps[:, :, None], axis=-1)
    min_dist = jnp.min(dist, axis=3)
    min_ind = jnp.argmin(dist, axis=3)  # [1, J, K]
    picked_score = jnp.take_along_axis(hm_score_m, min_ind, axis=2)[..., None]
    picked_kps = jnp.take_along_axis(
        hm_kps, jnp.broadcast_to(min_ind[..., None], min_ind.shape + (2,)), axis=2)
    l_box = bboxes[:, None, :, 0:1]
    t_box = bboxes[:, None, :, 1:2]
    r_box = bboxes[:, None, :, 2:3]
    b_box = bboxes[:, None, :, 3:4]
    bad = ((picked_kps[..., 0:1] < l_box) | (picked_kps[..., 0:1] > r_box) |
           (picked_kps[..., 1:2] < t_box) | (picked_kps[..., 1:2] > b_box) |
           (picked_score < thresh) |
           (min_dist[..., None] > jnp.maximum(b_box - t_box, r_box - l_box) * 0.3))
    refined = jnp.where(bad, kps_grid, picked_kps)
    kps = refined.transpose(0, 2, 1, 3).reshape(1, top_k, num_joints * 2)

    kps = kps * down_ratio
    bboxes = bboxes * down_ratio

    position, rot_y, alpha, _ = rtm.gen_position(kps, dim, rot, P2)

    # camera-frame -> image-frame center (reference get_bboxes :268-283)
    p2 = P2[0]
    fx, fy = p2[0, 0], p2[1, 1]
    cx, cy = p2[0, 2], p2[1, 2]
    tx, ty = p2[0, 3], p2[1, 3]
    z3d = position[0, :, 2:3]
    cx3d = (position[0, :, 0:1] * fx + tx + cx * z3d) / z3d
    cy3d = (position[0, :, 1:2] * fy + ty + cy * z3d) / z3d

    bbox2d = clip_boxes(bboxes[0], image_hw)
    boxes11 = jnp.concatenate(
        [bbox2d, cx3d, cy3d, z3d, dim[0], alpha[0]], axis=1)  # [K, 11]

    valid = scores[0] > score_thr
    labels = clses[0]
    nms_boxes = boxes11[:, :4]
    if not cls_agnostic:
        nms_boxes = nms_boxes + labels.astype(nms_boxes.dtype)[:, None] * jnp.max(boxes11)
    keep_idx, keep_valid = nms(nms_boxes, scores[0], nms_iou_thr,
                               max_outputs=max_detections, pre_top_k=top_k,
                               valid_mask=valid)
    safe = jnp.clip(keep_idx, 0, None)
    return dict(scores=scores[0][safe] * keep_valid,
                bboxes=boxes11[safe],
                labels=labels[safe],
                valid=keep_valid)
