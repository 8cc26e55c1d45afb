"""Anchor-based 3D detection head: flax modules + batched assign/loss/decode.

TPU-first redesign of the reference AnchorBasedDetection3DHead
(visualDet3D/networks/heads/detection_3d_head.py:21-533):

* The reference loops over images in Python and boolean-indexes positive
  anchors (head:410-489) — a serialization point. Here assignment, encoding,
  and the losses are computed over *all* anchors of *all* images at once with
  masks; the per-image loop becomes a vmap, every shape is static, and the
  whole loss jits into one fused XLA program.
* ``get_bboxes`` (head:341-400) becomes a fixed-capacity decode: score
  threshold and prior-validity are masks, NMS is the on-device fixed-K kernel,
  and the output is (scores, boxes, labels, valid) arrays of static shape.

Head variants (reg-branch differences):
  - AnchorBasedDetection3DHead: ModulatedDeformConv first (head:70).
  - GroundAwareHead: LookGround ground-sampling first
    (yolomono3d_detector.py:12-47).
  - StereoHead: ConvBnReLU + BasicBlock (head:500-533).
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from visualdet3d_tpu.geometry import calc_iou, clip_boxes
from visualdet3d_tpu.models.blocks import (
    ConvBnReLU,
    LookGround,
    ModulatedDeformConv,
    anchor_flatten,
)
from visualdet3d_tpu.models.backbones.resnet import BasicBlock
from visualdet3d_tpu.models.heads import target_coding
from visualdet3d_tpu.models.heads.losses import (
    bce_with_logits,
    modified_smooth_l1,
    sigmoid_focal_loss,
)


# ---------------------------------------------------------------------------
# Assignment (max-IoU assigner, fully vectorised)
# ---------------------------------------------------------------------------

def assign_anchors(anchors: jnp.ndarray, ann: jnp.ndarray, useful: jnp.ndarray,
                   fg_iou_threshold: float, bg_iou_threshold: float,
                   match_low_quality: bool = True,
                   min_iou_threshold: float = 0.0) -> Dict[str, jnp.ndarray]:
    """Single-image max-IoU assignment over all anchors.

    Args:
      anchors: [N, 4]; ann: [M, 12] padded annotations (cls == -1 padding);
      useful: [N] bool geometric filter.
    Returns dict of:
      gt_index: [N] assigned GT row (valid only where pos_mask).
      pos_mask / neg_mask: [N] bool.
      max_iou: [N].

    reference: _assign (detection_3d_head.py:101-174), including the
    match_low_quality gt-argmax override with last-gt-wins tie-breaking.
    """
    gt_valid = ann[:, 4] > -0.5  # [M]
    iou = calc_iou(anchors, ann[:, :4])  # [N, M]
    iou = jnp.where(gt_valid[None, :], iou, -1.0)
    iou = jnp.where(useful[:, None], iou, -1.0)

    max_iou = jnp.max(iou, axis=1)
    argmax_iou = jnp.argmax(iou, axis=1)

    neg_mask = useful & (max_iou >= 0) & (max_iou < bg_iou_threshold)
    pos_mask = useful & (max_iou >= fg_iou_threshold)
    gt_index = argmax_iou

    if match_low_quality:
        gt_max = jnp.max(iou, axis=0)  # [M]
        cond = (iou == gt_max[None, :]) & gt_valid[None, :] & \
               (gt_max[None, :] >= min_iou_threshold) & (iou >= 0)
        any_low = jnp.any(cond, axis=1)
        m_idx = jnp.arange(ann.shape[0])
        # last gt wins, matching the reference's in-order overwrite loop
        low_choice = jnp.max(jnp.where(cond, m_idx[None, :], -1), axis=1)
        gt_index = jnp.where(any_low, low_choice, gt_index)
        pos_mask = pos_mask | (useful & any_low)

    return dict(gt_index=gt_index, pos_mask=pos_mask, neg_mask=neg_mask,
                max_iou=max_iou)


# ---------------------------------------------------------------------------
# Loss (whole batch, one fused program)
# ---------------------------------------------------------------------------

def detection_3d_loss(cls_preds: jnp.ndarray,
                      reg_preds: jnp.ndarray,
                      anchors: jnp.ndarray,
                      anchor_mean_std: jnp.ndarray,
                      useful_mask: jnp.ndarray,
                      annotations: jnp.ndarray,
                      num_classes: int,
                      focal_loss_gamma: float,
                      balance_weights,
                      regression_weight,
                      L1_regression_alpha: float,
                      fg_iou_threshold: float = 0.5,
                      bg_iou_threshold: float = 0.4,
                      match_low_quality: bool = True,
                      min_iou_threshold: float = 0.0) -> Tuple[jnp.ndarray, jnp.ndarray, Dict]:
    """Classification + regression loss for the whole batch.

    Args:
      cls_preds: [B, N, num_classes + 1] raw logits (last channel = alpha).
      reg_preds: [B, N, 12].
      anchors: [N, 4]; anchor_mean_std: [N, T, 6, 2]; useful_mask: [B, N].
      annotations: [B, M, 12] compound annotations (cls==-1 padding).
    Returns (cls_loss [1], reg_loss [1], loss_dict) — same contract as the
    reference ``loss`` (detection_3d_head.py:402-498).
    """
    balance_weights = jnp.asarray(balance_weights, cls_preds.dtype)
    regression_weight = jnp.asarray(regression_weight, cls_preds.dtype)

    def per_image(cls_pred, reg_pred, useful, ann):
        cls_score = cls_pred[:, :num_classes]
        alpha_logit = cls_pred[:, num_classes:num_classes + 1]

        assignment = assign_anchors(anchors, ann, useful,
                                    fg_iou_threshold, bg_iou_threshold,
                                    match_low_quality, min_iou_threshold)
        gt_index = assignment['gt_index']
        pos_mask = assignment['pos_mask']
        neg_mask = assignment['neg_mask']

        # gather each anchor's assigned GT row via a one-hot matmul (a 28k-row
        # take_along_axis gather runs on the scalar core; [N, M] x [M, 12] is
        # one tiny MXU contraction)
        gt_onehot = jax.nn.one_hot(gt_index, ann.shape[0], dtype=ann.dtype)
        gt_rows = gt_onehot @ ann  # [N, 12]
        gt_cls = gt_rows[:, 4].astype(jnp.int32)
        sel_mean_std = target_coding.select_mean_std_by_class(anchor_mean_std, gt_cls)
        prior_ok = sel_mean_std[:, 0, 0] > 0  # z-prior exists (head:311-313)
        pos_mask = pos_mask & prior_ok

        # classification targets: -1 ignored, 0 negative, one-hot positive
        labels = jnp.full((anchors.shape[0], num_classes), -1.0, cls_pred.dtype)
        labels = jnp.where(neg_mask[:, None], 0.0, labels)
        onehot = jax.nn.one_hot(gt_cls, num_classes, dtype=cls_pred.dtype)
        labels = jnp.where(pos_mask[:, None], onehot, labels)

        num_pos = jnp.sum(pos_mask)
        num_neg = jnp.sum(neg_mask)
        cls_loss = sigmoid_focal_loss(cls_score, labels, focal_loss_gamma,
                                      balance_weights).sum() / \
            jnp.clip(num_pos + num_neg, 1, None)

        # regression targets for every anchor (masked to positives)
        targets, alpha_cls = target_coding.encode(anchors, gt_rows, sel_mean_std)
        reg_elem = modified_smooth_l1(targets, reg_pred, L1_regression_alpha)
        alpha_elem = bce_with_logits(alpha_logit, alpha_cls)
        per_anchor = jnp.concatenate([reg_elem, alpha_elem], axis=-1) * regression_weight
        reg_loss = jnp.sum(
            jnp.where(pos_mask[:, None], per_anchor, 0.0), axis=0) / \
            jnp.clip(num_pos, 1, None)  # [13]
        reg_loss = jnp.where(num_pos > 0, reg_loss, jnp.zeros_like(reg_loss))

        num_gt = jnp.sum(ann[:, 4] > -0.5)
        has_gt = num_gt > 0
        cls_loss = jnp.where(has_gt, cls_loss, 0.0)
        # per-image weight = number of GT boxes (reference head:439,:469,:474)
        return cls_loss, reg_loss, num_gt.astype(cls_pred.dtype)

    cls_losses, reg_losses, weights = jax.vmap(per_image)(
        cls_preds, reg_preds, useful_mask, annotations)

    cls_loss = jnp.mean(cls_losses, keepdims=True)
    weighted = jnp.sum(weights[:, None] * reg_losses /
                       (jnp.sum(weights) + 1e-6), axis=0)  # [13]
    reg_loss = jnp.mean(weighted, keepdims=True)
    loss_dict = dict(cls_loss=cls_loss, reg_loss=reg_loss,
                     total_loss=cls_loss + reg_loss)
    return cls_loss, reg_loss, loss_dict


# ---------------------------------------------------------------------------
# Inference decode (fixed capacity)
# ---------------------------------------------------------------------------

def get_bboxes(cls_preds: jnp.ndarray,
               reg_preds: jnp.ndarray,
               anchors: jnp.ndarray,
               anchor_mean_std: jnp.ndarray,
               useful_mask: jnp.ndarray,
               num_classes: int,
               image_hw: Tuple[int, int],
               score_thr: float = 0.75,
               nms_iou_thr: float = 0.5,
               max_detections: int = 32,
               pre_top_k: int = 1024,
               cls_agnostic: bool = True):
    """Single-image decode + NMS, all on device, static output shapes.

    Args:
      cls_preds: [N, C+1] raw logits; reg_preds: [N, 12];
      useful_mask: [N] bool.
    Returns:
      scores [K], bboxes [K, 11], labels [K], valid [K] with K=max_detections.

    reference: get_bboxes (detection_3d_head.py:341-400). Note the reference
    reads the (typo'd) key 'cls_agnositc' with default True, so its NMS is
    effectively always class-agnostic; we default the same way.

    bf16 threshold band (documented behavior): when cls_preds arrive in
    bf16 (inference_dtype='bfloat16'), sigmoid scores are compared against
    score_thr at bf16 resolution (~2e-3 near 0.75), so detections whose f32
    score lies within a few bf16 ULPs of the threshold can flip in/out vs
    the f32 path, and near-tie candidate order can differ. The comparison
    itself is deterministic: a score is kept iff
    bf16(sigmoid(logit)) > score_thr — pinned by
    tests/test_detection_head.py::test_score_threshold_bf16_band.
    """
    probs = jax.nn.sigmoid(cls_preds)
    cls_score = probs[:, :num_classes]

    max_score = jnp.max(cls_score, axis=-1)
    label = jnp.argmax(cls_score, axis=-1)
    valid = useful_mask & (max_score > score_thr)

    # select the top pre_top_k candidates FIRST, decode only those: identical
    # semantics (decode is per-anchor pure; score order is decode-invariant)
    # but ~30x less decode work — the reference likewise decodes only
    # thresholded anchors (head:354-371)
    k = min(pre_top_k, cls_preds.shape[0])
    neg_inf = jnp.finfo(max_score.dtype).min
    masked_scores = jnp.where(valid, max_score, neg_inf)
    # approx_max_k at recall_target=1.0 is EXACT top-k; on this toolchain it
    # still lowers to a full-sort variant, just a cheaper one than lax.top_k
    # (0.95 vs 1.25 ms at batch 16 in the r3 profile), not a partial-reduce
    # TopK
    top_scores, order = jax.lax.approx_max_k(masked_scores, k,
                                             recall_target=1.0)
    cand_valid = top_scores > neg_inf

    # bf16 preds/probs cast to f32 only on the K gathered candidates (a
    # full-tensor f32 cast upstream costs a [B, N, C] layout copy)
    cand_anchors = anchors[order]
    cand_reg = reg_preds[order].astype(jnp.float32)
    cand_alpha = probs[order, num_classes:num_classes + 1].astype(jnp.float32)
    cand_label = label[order]
    cand_mean_std = anchor_mean_std[order]  # [K, T, 6, 2]
    top_scores = top_scores.astype(jnp.float32)
    return _decode_candidates(top_scores, cand_valid, cand_anchors, cand_reg,
                              cand_alpha, cand_label, cand_mean_std,
                              image_hw, nms_iou_thr, max_detections,
                              cls_agnostic)


def _decode_candidates(top_scores, cand_valid, cand_anchors, cand_reg,
                       cand_alpha, cand_label, cand_mean_std, image_hw,
                       nms_iou_thr, max_detections, cls_agnostic):
    """Per-image decode + NMS tail on K pre-selected candidates (the shared
    back half of get_bboxes / get_bboxes_batched)."""
    k = top_scores.shape[0]
    sel_mean_std = target_coding.select_mean_std_by_class(cand_mean_std, cand_label)
    boxes, prior_ok = target_coding.decode(cand_anchors, cand_reg, sel_mean_std,
                                           cand_alpha)
    cand_valid = cand_valid & prior_ok
    boxes = clip_boxes(boxes, image_hw)

    nms_boxes = boxes[:, :4]
    if not cls_agnostic:
        max_coord = jnp.max(nms_boxes)
        nms_boxes = nms_boxes + cand_label.astype(nms_boxes.dtype)[:, None] * max_coord

    # candidates are already score-sorted: run suppression directly
    from visualdet3d_tpu.ops.nms import _greedy_suppress
    iou = calc_iou(nms_boxes, nms_boxes)
    keep = _greedy_suppress(iou, cand_valid, nms_iou_thr)
    kept_rank = jnp.where(keep, jnp.arange(k), k)
    # smallest kept_rank first == survivors in score order; lax.top_k of the
    # negated rank replaces a full [K] argsort (identical result: ranks are
    # distinct for survivors and top_k tie-breaks padding by lowest index,
    # exactly argsort's stable order)
    m = min(max_detections, k)  # top_k requires k_out <= k; pad back below
    _, sel = jax.lax.top_k(-kept_rank, m)
    keep_valid = keep[sel]
    if m < max_detections:  # tiny-anchor configs (pre_top_k < max_detections)
        sel = jnp.pad(sel, (0, max_detections - m))
        keep_valid = jnp.pad(keep_valid, (0, max_detections - m))
    return (top_scores[sel] * keep_valid,
            boxes[sel],
            cand_label[sel],
            keep_valid)


def get_bboxes_batched(cls_preds: jnp.ndarray,
                       reg_preds: jnp.ndarray,
                       num_anchors: int,
                       anchors: jnp.ndarray,
                       anchor_mean_std: jnp.ndarray,
                       useful_mask: jnp.ndarray,
                       num_classes: int,
                       image_hw: Tuple[int, int],
                       score_thr: float = 0.75,
                       nms_iou_thr: float = 0.5,
                       max_detections: int = 32,
                       pre_top_k: int = 1024,
                       cls_agnostic: bool = True):
    """Batched decode with layout-friendly candidate selection.

    Semantically identical to ``jax.vmap(get_bboxes)`` (pinned by
    tests/test_detection_head.py::test_get_bboxes_batched_matches_vmap) but
    avoids materializing the [B, N, C] flattened prediction tensors in
    gather layouts: the r3/r4 profiles show ~2 ms of pure layout copies on
    the [16, 69120, {3, 12}] flattens at batch 16 (copy.288 1.06 ms,
    reshape.231+copy.284 0.94 ms). Here the head's ``anchor_flatten``
    reshape folds away against an un-flatten back to [B, HW, A*C] (both are
    bitcast reshapes of the same row-major buffer), scores/labels/alpha are
    computed with C lane-strided slices of the native 4-D conv output
    (anchor-outer/class-inner channel order, exactly anchor_flatten's
    element order), and only K=pre_top_k candidate rows are ever gathered.
    The per-anchor reg row is then picked with a one-hot matmul (A is
    small; CLAUDE.md: one-hot beats take_along_axis on the scalar core).

    Args: cls_preds [B, N, C+1] raw logits, reg_preds [B, N, R],
    useful_mask [B, N] bool, num_anchors = anchors per location (N must be
    HW * num_anchors, locations outer / anchors inner).
    Returns dict-ordered tuple (scores [B,K], bboxes [B,K,11], labels
    [B,K], valid [B,K]), K = max_detections.
    """
    B, N, C = cls_preds.shape
    A = num_anchors
    HW = N // A
    assert HW * A == N, (N, A)
    R = reg_preds.shape[-1]

    # [B, N, C] -> [B, HW, A*C]: folds with the head's flatten to identity
    cls_hw = cls_preds.reshape(B, HW, A * C)
    # class c of anchor a lives at channel a*C + c -> lane-strided slices
    best = jax.nn.sigmoid(cls_hw[:, :, 0::C])
    label = jnp.zeros(best.shape, jnp.int32)
    for c in range(1, num_classes):
        s = jax.nn.sigmoid(cls_hw[:, :, c::C])
        better = s > best  # strict: ties keep the FIRST max, like argmax
        label = jnp.where(better, c, label)
        best = jnp.maximum(best, s)
    alpha = jax.nn.sigmoid(cls_hw[:, :, num_classes::C])

    max_score = best.reshape(B, N)
    label = label.reshape(B, N)
    alpha = alpha.reshape(B, N)
    valid = useful_mask & (max_score > score_thr)

    k = min(pre_top_k, N)
    neg_inf = jnp.finfo(max_score.dtype).min
    masked = jnp.where(valid, max_score, neg_inf)
    top_scores, order = jax.lax.approx_max_k(masked, k, recall_target=1.0)
    cand_valid = top_scores > neg_inf

    loc = order // A
    a_idx = order % A
    reg_hw = reg_preds.reshape(B, HW, A * R)
    rows = jnp.take_along_axis(reg_hw, loc[:, :, None], axis=1)  # [B,K,A*R]
    onehot = jax.nn.one_hot(a_idx, A, dtype=rows.dtype)  # exact: 0/1 weights
    cand_reg = jnp.einsum('bka,bkar->bkr',
                          onehot, rows.reshape(B, k, A, R)).astype(jnp.float32)
    cand_alpha = jnp.take_along_axis(
        alpha, order, axis=1)[..., None].astype(jnp.float32)
    cand_label = jnp.take_along_axis(label, order, axis=1)
    anchors = jnp.asarray(anchors)
    anchor_mean_std = jnp.asarray(anchor_mean_std)
    cand_anchors = anchors[order]            # [B, K, ...]
    cand_mean_std = anchor_mean_std[order]   # [B, K, T, 6, 2]
    top_scores = top_scores.astype(jnp.float32)

    scores, boxes, labels, valid = jax.vmap(
        lambda ts, cv, ca, cr, cal, cl, cms: _decode_candidates(
            ts, cv, ca, cr, cal, cl, cms, image_hw, nms_iou_thr,
            max_detections, cls_agnostic))(
        top_scores, cand_valid, cand_anchors, cand_reg, cand_alpha,
        cand_label, cand_mean_std)
    return scores, boxes, labels, valid


# ---------------------------------------------------------------------------
# flax head modules
# ---------------------------------------------------------------------------

class _ClsBranch(nn.Module):
    """Shared classification tower: convs + Dropout2d(0.3), zero-init output
    (reference head:56-68)."""
    num_anchors: int
    num_cls_output: int
    cls_feature_size: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        for _ in range(2):
            x = nn.Conv(self.cls_feature_size, (3, 3), padding='SAME')(x)
            x = nn.Dropout(0.3, broadcast_dims=(1, 2), deterministic=not train)(x)
            x = nn.relu(x)
        x = nn.Conv(self.num_anchors * self.num_cls_output, (3, 3), padding='SAME',
                    kernel_init=nn.initializers.zeros,
                    bias_init=nn.initializers.zeros)(x)
        return anchor_flatten(x, self.num_cls_output)


class AnchorBasedDetection3DHead(nn.Module):
    """Base head: reg branch opens with a modulated deformable conv
    (reference head:70-87)."""
    num_anchors: int
    num_cls_output: int
    num_reg_output: int = 12
    cls_feature_size: int = 1024
    reg_feature_size: int = 1024

    @nn.compact
    def __call__(self, features, P2=None, train: bool = False):
        cls = _ClsBranch(self.num_anchors, self.num_cls_output,
                         self.cls_feature_size)(features, train=train)
        x = ModulatedDeformConv(self.reg_feature_size, 3)(features, train=train)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9)(x)
        x = nn.relu(x)
        x = nn.Conv(self.reg_feature_size, (3, 3), padding='SAME')(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9)(x)
        x = nn.relu(x)
        x = nn.Conv(self.num_anchors * self.num_reg_output, (3, 3), padding='SAME',
                    kernel_init=nn.initializers.zeros,
                    bias_init=nn.initializers.zeros)(x)
        reg = anchor_flatten(x, self.num_reg_output)
        return cls, reg


class GroundAwareHead(nn.Module):
    """GAC head: LookGround ground-feature sampling feeds the reg tower
    (reference yolomono3d_detector.py:12-47)."""
    num_anchors: int
    num_cls_output: int
    num_reg_output: int = 12
    cls_feature_size: int = 512
    reg_feature_size: int = 1024

    @nn.compact
    def __call__(self, features, P2, train: bool = False):
        cls = _ClsBranch(self.num_anchors, self.num_cls_output,
                         self.cls_feature_size)(features, train=train)
        x = LookGround(features.shape[-1])(features, P2)
        x = nn.Conv(self.reg_feature_size, (3, 3), padding='SAME')(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9)(x)
        x = nn.relu(x)
        x = nn.Conv(self.reg_feature_size, (3, 3), padding='SAME')(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9)(x)
        x = nn.relu(x)
        x = nn.Conv(self.num_anchors * self.num_reg_output, (3, 3), padding='SAME',
                    kernel_init=nn.initializers.zeros,
                    bias_init=nn.initializers.zeros)(x)
        reg = anchor_flatten(x, self.num_reg_output)
        return cls, reg


class StereoHead(nn.Module):
    """YOLOStereo3D head (reference head:500-533)."""
    num_anchors: int
    num_cls_output: int
    num_reg_output: int = 12
    cls_feature_size: int = 256
    reg_feature_size: int = 1408

    @nn.compact
    def __call__(self, features, P2=None, train: bool = False):
        cls = _ClsBranch(self.num_anchors, self.num_cls_output,
                         self.cls_feature_size)(features, train=train)
        x = ConvBnReLU(self.reg_feature_size, (3, 3))(features, train=train)
        x = BasicBlock(self.reg_feature_size)(x, train=train)
        x = nn.relu(x)
        x = nn.Conv(self.num_anchors * self.num_reg_output, (3, 3), padding='SAME',
                    kernel_init=nn.initializers.zeros,
                    bias_init=nn.initializers.zeros)(x)
        reg = anchor_flatten(x, self.num_reg_output)
        return cls, reg
