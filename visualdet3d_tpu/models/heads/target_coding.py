"""12-term 3D box target encode/decode vs. per-anchor statistical priors.

Pure, fully vectorised jnp functions — the TPU-native replacement for the
reference's _encode/_decode (visualDet3D/networks/heads/detection_3d_head.py:
176-263) which operate on dynamically gathered positive subsets. Here both
run over *all* anchors with masks, so they jit with static shapes and
vectorise over the batch with vmap.

Term layout (12 regression channels + 1 alpha-hemisphere logit):
  [dx, dy, dw, dh, cdx, cdy, dz, d_sin2a, d_cos2a, dw3d, dh3d, dl3d] (+alpha)
Annotation row layout (compound_annotation, utils/utils.py:97-118):
  [x1, y1, x2, y2, cls, cx, cy, z, w, h, l, alpha]
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

# fixed normalisation stds (reference detection_3d_head.py:229, :266)
TARGET_STDS = jnp.asarray([0.1, 0.1, 0.2, 0.2, 0.1, 0.1, 1, 1, 1, 1, 1, 1],
                          dtype=jnp.float32)


def _anchor_geometry(anchors: jnp.ndarray):
    w = anchors[..., 2] - anchors[..., 0]
    h = anchors[..., 3] - anchors[..., 1]
    cx = anchors[..., 0] + 0.5 * w
    cy = anchors[..., 1] + 0.5 * h
    return cx, cy, w, h


def encode(anchors: jnp.ndarray, gt: jnp.ndarray,
           mean_std: jnp.ndarray):
    """Encode GT (gathered per anchor) against anchors + 3D priors.

    Args:
      anchors: [N, 4].
      gt: [N, 12] annotation rows gathered for each anchor's assigned GT.
      mean_std: [N, 6, 2] per-anchor prior (z, sin2a, cos2a, w, h, l) x (mean, std).
    Returns:
      targets: [N, 12] normalised regression targets.
      alpha_cls: [N, 1] in {0, 1}, the cos(alpha) > 0 hemisphere label.
    """
    px, py, pw, ph = _anchor_geometry(anchors)
    gx = 0.5 * (gt[..., 0] + gt[..., 2])
    gy = 0.5 * (gt[..., 1] + gt[..., 3])
    gw = gt[..., 2] - gt[..., 0]
    gh = gt[..., 3] - gt[..., 1]

    eps = 1e-6
    targets_dx = (gx - px) / pw
    targets_dy = (gy - py) / ph
    targets_dw = jnp.log(jnp.clip(gw / pw, eps, None))
    targets_dh = jnp.log(jnp.clip(gh / ph, eps, None))
    targets_cdx = (gt[..., 5] - px) / pw
    targets_cdy = (gt[..., 6] - py) / ph

    m, s = mean_std[..., 0], jnp.clip(mean_std[..., 1], eps, None)
    targets_cdz = (gt[..., 7] - m[..., 0]) / s[..., 0]
    targets_sin = (jnp.sin(gt[..., 11] * 2) - m[..., 1]) / s[..., 1]
    targets_cos = (jnp.cos(gt[..., 11] * 2) - m[..., 2]) / s[..., 2]
    targets_w3d = (gt[..., 8] - m[..., 3]) / s[..., 3]
    targets_h3d = (gt[..., 9] - m[..., 4]) / s[..., 4]
    targets_l3d = (gt[..., 10] - m[..., 5]) / s[..., 5]

    targets = jnp.stack([
        targets_dx, targets_dy, targets_dw, targets_dh,
        targets_cdx, targets_cdy, targets_cdz,
        targets_sin, targets_cos,
        targets_w3d, targets_h3d, targets_l3d], axis=-1)
    targets = targets / TARGET_STDS

    alpha_cls = (jnp.cos(gt[..., 11:12]) > 0).astype(targets.dtype)
    return targets, alpha_cls


def decode(anchors: jnp.ndarray, deltas: jnp.ndarray, mean_std: jnp.ndarray,
           alpha_score: jnp.ndarray):
    """Decode regression deltas to image-frame 3D boxes.

    Args:
      anchors: [N, 4]; deltas: [N, 12]; mean_std: [N, 6, 2] (per-anchor prior
      already selected by predicted class); alpha_score: [N, 1] sigmoid scores.
    Returns:
      boxes: [N, 11] = [x1, y1, x2, y2, cx, cy, z, w, h, l, alpha].
      prior_ok: [N] bool, True where the prior's mean z > 0 (anchors whose
        statistics bin had enough samples; reference head:246 mask).
    """
    std = TARGET_STDS
    px, py, pw, ph = _anchor_geometry(anchors)

    dx = deltas[..., 0] * std[0]
    dy = deltas[..., 1] * std[1]
    dw = deltas[..., 2] * std[2]
    dh = deltas[..., 3] * std[3]
    pred_cx = px + dx * pw
    pred_cy = py + dy * ph
    pred_w = jnp.exp(dw) * pw
    pred_h = jnp.exp(dh) * ph

    x1 = pred_cx - 0.5 * pred_w
    y1 = pred_cy - 0.5 * pred_h
    x2 = pred_cx + 0.5 * pred_w
    y2 = pred_cy + 0.5 * pred_h

    m, s = mean_std[..., 0], mean_std[..., 1]
    prior_ok = m[..., 0] > 0

    cdx = deltas[..., 4] * std[4]
    cdy = deltas[..., 5] * std[5]
    cx3d = px + cdx * pw
    cy3d = py + cdy * ph
    z = deltas[..., 6] * s[..., 0] + m[..., 0]
    sin2a = deltas[..., 7] * s[..., 1] + m[..., 1]
    cos2a = deltas[..., 8] * s[..., 2] + m[..., 2]
    alpha = jnp.arctan2(sin2a, cos2a) / 2.0
    w3d = deltas[..., 9] * s[..., 3] + m[..., 3]
    h3d = deltas[..., 10] * s[..., 4] + m[..., 4]
    l3d = deltas[..., 11] * s[..., 5] + m[..., 5]

    # hemisphere disambiguation (reference head:258: alpha += pi when
    # alpha_score < 0.5)
    alpha = jnp.where(alpha_score[..., 0] < 0.5, alpha + jnp.pi, alpha)

    boxes = jnp.stack([x1, y1, x2, y2, cx3d, cy3d, z, w3d, h3d, l3d, alpha], axis=-1)
    return boxes, prior_ok


def select_mean_std_by_class(anchor_mean_std: jnp.ndarray,
                             labels: jnp.ndarray) -> jnp.ndarray:
    """Select each anchor's prior for a class index.

    anchor_mean_std: [N, T, 6, 2]; labels: [N] int -> [N, 6, 2].
    (reference one-hot select, detection_3d_head.py:242-245.)

    Implemented as a one-hot weighted sum rather than take_along_axis: a
    28k-row gather runs on the TPU's scalar core (profiled ~ms), while the
    [N, T] x [N, T, 12] contraction is trivial vector work (T <= #classes).
    """
    t = anchor_mean_std.shape[1]
    onehot = jax.nn.one_hot(jnp.clip(labels, 0, t - 1), t,
                            dtype=anchor_mean_std.dtype)  # [N, T]
    return jnp.einsum('nt,ntkc->nkc', onehot, anchor_mean_std)
