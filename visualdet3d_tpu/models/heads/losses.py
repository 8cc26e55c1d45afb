"""Loss functions as pure jnp functions (no module state), fully batched and
mask-driven so they jit with static shapes.

Semantics mirror the reference losses:
  - sigmoid focal w/ ignore(-1) + tiny-loss clamp: networks/heads/losses.py:11-46
  - softmax focal: networks/heads/losses.py:48-69
  - modified smooth-L1 with dead zone: networks/heads/losses.py:71-91
  - IoU loss (-log iou): networks/heads/losses.py:93-120
  - stereo focal loss over Laplace GT probability volumes:
    networks/lib/disparity_loss/stereo_focal_loss.py + disp2prob.py
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def sigmoid_focal_loss(logits: jnp.ndarray, targets: jnp.ndarray,
                       gamma: float = 0.0,
                       balance_weights: jnp.ndarray | float = 1.0) -> jnp.ndarray:
    """Per-element sigmoid focal loss.

    Args:
      logits: [..., num_classes] raw scores.
      targets: [..., num_classes] in {-1 (ignored), 0, 1}.
      gamma: focal exponent.
      balance_weights: per-class positive weights (broadcastable).
    Returns:
      loss of the same shape; ignored and near-zero entries are exactly 0
      (the <1e-5 clamp prevents overfitting on confident correct predictions,
      reference losses.py:44-45).
    """
    probs = jax.nn.sigmoid(logits)
    focal_weight = jnp.where(targets == 1.0, 1.0 - probs, probs) ** gamma
    bce = -(targets * jax.nn.log_sigmoid(logits)) * balance_weights \
          - (1.0 - targets) * jax.nn.log_sigmoid(-logits)
    loss = focal_weight * bce
    loss = jnp.where(targets == -1.0, 0.0, loss)
    loss = jnp.where(loss < 1e-5, 0.0, loss)
    return loss


def softmax_focal_loss(logits: jnp.ndarray, targets: jnp.ndarray, gamma: float,
                       balance_weights: jnp.ndarray | float = 1.0) -> jnp.ndarray:
    """Softmax variant (reference losses.py:48-69)."""
    probs = jax.nn.softmax(logits, axis=-1)
    focal_weight = jnp.where(targets == 1.0, 1.0 - probs, probs) ** gamma
    ce = -(targets * jax.nn.log_softmax(logits, axis=-1))
    loss = focal_weight * ce
    loss = jnp.where(targets == -1.0, 0.0, loss)
    loss = jnp.where(loss < 1e-5, 0.0, loss)
    return loss * balance_weights


def modified_smooth_l1(targets: jnp.ndarray, preds: jnp.ndarray,
                       alpha: float = 25.0) -> jnp.ndarray:
    """Smooth-L1 with 1/alpha knee and |diff|<=0.01 dead zone.

    reference: losses.py:71-91 (ModifiedSmoothL1Loss).
    """
    diff = jnp.abs(targets - preds)
    loss = jnp.where(diff <= 1.0 / alpha,
                     0.5 * alpha * diff ** 2,
                     diff - 0.5 / alpha)
    return jnp.where(diff <= 0.01, 0.0, loss)


def iou_loss(preds: jnp.ndarray, targets: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """-log(IoU) between aligned boxes [..., 4] (reference losses.py:93-120)."""
    lt = jnp.maximum(preds[..., :2], targets[..., :2])
    rb = jnp.minimum(preds[..., 2:], targets[..., 2:])
    wh = jnp.clip(rb - lt, 0, None)
    overlap = wh[..., 0] * wh[..., 1]
    ap = (preds[..., 2] - preds[..., 0]) * (preds[..., 3] - preds[..., 1])
    ag = (targets[..., 2] - targets[..., 0]) * (targets[..., 3] - targets[..., 1])
    union = ap + ag - overlap + eps
    ious = jnp.clip(overlap / union, eps, None)
    return -jnp.log(ious)


def bce_with_logits(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """Elementwise binary cross entropy on logits (torch BCEWithLogitsLoss, reduction='none')."""
    return -(targets * jax.nn.log_sigmoid(logits) +
             (1.0 - targets) * jax.nn.log_sigmoid(-logits))


# ---------------------------------------------------------------------------
# Stereo focal loss (disparity supervision of the cost volume)
# ---------------------------------------------------------------------------

def laplace_disp_probability(gt_disp: jnp.ndarray, num_disp: int,
                             variance: float = 1.0) -> jnp.ndarray:
    """GT disparity map -> Laplace probability volume.

    Args:
      gt_disp: [..., H, W] ground-truth disparity (0 marks invalid, KITTI).
      num_disp: number of disparity hypotheses D.
      variance: Laplace diversity.
    Returns:
      (prob [..., H, W, D], mask [..., H, W]) — prob rows of invalid pixels
      are ~0 (masked, + eps), matching LaplaceDisp2Prob (disp2prob.py:102-115).
    """
    index = jnp.arange(num_disp, dtype=gt_disp.dtype)
    mask = (gt_disp > 0) & (gt_disp < num_disp - 1)
    gt = jnp.where(mask, gt_disp, 0.0)
    scaled_distance = -jnp.abs(index - gt[..., None]) / variance
    prob = jax.nn.softmax(scaled_distance, axis=-1)
    prob = prob * mask[..., None] + 1e-40
    return prob, mask


def gaussian_disp_probability(gt_disp: jnp.ndarray, num_disp: int,
                              variance: float = 1.0):
    """Gaussian variant of the GT probability volume
    (reference disp2prob.py:116-128, GaussianDisp2Prob)."""
    index = jnp.arange(num_disp, dtype=gt_disp.dtype)
    mask = (gt_disp > 0) & (gt_disp < num_disp - 1)
    gt = jnp.where(mask, gt_disp, 0.0)
    scaled = -((index - gt[..., None]) ** 2) / variance
    prob = jax.nn.softmax(scaled, axis=-1)
    return prob * mask[..., None] + 1e-40, mask


def onehot_disp_probability(gt_disp: jnp.ndarray, num_disp: int,
                            variance: float = 1.0):
    """One-hot (within |d - gt| < variance) variant
    (reference disp2prob.py:130-142, OneHotDisp2Prob)."""
    index = jnp.arange(num_disp, dtype=gt_disp.dtype)
    mask = (gt_disp > 0) & (gt_disp < num_disp - 1)
    prob = (jnp.abs(index - gt_disp[..., None]) < variance).astype(gt_disp.dtype)
    return prob, mask


def _downscale_disparity(gt_disp: jnp.ndarray, out_hw, sparse: bool) -> jnp.ndarray:
    """Downscale a [B, H, W] disparity map to out_hw, dividing values by the
    width ratio; sparse GT uses max-pooling (stereo_focal_loss.py:37-42)."""
    b, h, w = gt_disp.shape
    oh, ow = out_hw
    if (h, w) == (oh, ow):
        return gt_disp
    ky, kx = h // oh, w // ow
    scale = w / ow
    scaled = gt_disp / scale
    if sparse:
        pooled = jax.lax.reduce_window(scaled, -jnp.inf, jax.lax.max,
                                       (1, ky, kx), (1, ky, kx), 'VALID')
    else:
        pooled = jax.lax.reduce_window(scaled, 0.0, jax.lax.add,
                                       (1, ky, kx), (1, ky, kx), 'VALID') / (ky * kx)
    return pooled


def stereo_focal_loss(est_cost: jnp.ndarray, gt_disp: jnp.ndarray,
                      variance: float = 0.5, focal_coefficient: float = 0.0,
                      sparse: bool = False) -> jnp.ndarray:
    """Focal cross-entropy between the estimated cost volume and the Laplace
    GT probability volume.

    Args:
      est_cost: [B, H, W, D] unnormalised cost volume (softmax applied here).
      gt_disp: [B, Hg, Wg] ground-truth disparity at (possibly) higher res.
    Returns: scalar loss.

    reference: StereoFocalLoss.loss_per_level (stereo_focal_loss.py:44-79);
    the DisparityLoss wrapper uses variance=0.5 (networks/heads/losses.py:122-135).
    """
    b, h, w, d = est_cost.shape
    gt = _downscale_disparity(gt_disp, (h, w), sparse)
    gt_prob, mask = laplace_disp_probability(gt, d, variance)
    est_logprob = jax.nn.log_softmax(est_cost, axis=-1)
    weight = (1.0 - gt_prob) ** (-focal_coefficient)
    loss = -(gt_prob * est_logprob * weight * mask[..., None].astype(est_cost.dtype))
    return loss.sum(axis=-1).mean()
