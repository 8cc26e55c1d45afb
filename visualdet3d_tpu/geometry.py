"""Camera / box geometry library, shared by the host data layer (numpy) and
the device compute path (jax.numpy).

All functions are pure, shape-polymorphic, and dispatch on input type: numpy
arrays stay numpy (fast host-side preprocessing), jax arrays stay jax
(traceable and jittable on device).

Semantics mirror the reference framework (file:line cites throughout):
  - alpha <-> theta conversions: visualDet3D/utils/utils.py:30-79
  - 3D box corner projection: visualDet3D/networks/utils/utils.py:198-253
  - back-projection: visualDet3D/networks/utils/utils.py:255-279
  - pairwise 2D IoU: visualDet3D/networks/utils/utils.py:83-100
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


def get_array_module(*arrays):
    """Return jnp if any argument is a jax array/tracer, else np."""
    for a in arrays:
        if isinstance(a, (jax.Array,)) or type(a).__module__.startswith('jax'):
            return jnp
    return np


# ---------------------------------------------------------------------------
# alpha / theta (observation angle / global yaw) conversions
# ---------------------------------------------------------------------------

def convert_alpha_to_rot(alpha, cx, P2):
    """alpha + image-column ray angle -> global yaw, wrapped to (-pi, pi].

    reference: visualDet3D/utils/utils.py:30-37 (convertAlpha2Rot).
    """
    xp = get_array_module(alpha, cx, P2)
    cx_p2 = P2[..., 0, 2]
    fx_p2 = P2[..., 0, 0]
    ry3d = alpha + xp.arctan2(cx - cx_p2, fx_p2)
    ry3d = xp.where(ry3d > np.pi, ry3d - 2 * np.pi, ry3d)
    ry3d = xp.where(ry3d <= -np.pi, ry3d + 2 * np.pi, ry3d)
    return ry3d


def convert_rot_to_alpha(ry3d, cx, P2):
    """Inverse of :func:`convert_alpha_to_rot`.

    reference: visualDet3D/utils/utils.py:40-45 (convertRot2Alpha).
    """
    xp = get_array_module(ry3d, cx, P2)
    cx_p2 = P2[..., 0, 2]
    fx_p2 = P2[..., 0, 0]
    alpha = ry3d - xp.arctan2(cx - cx_p2, fx_p2)
    alpha = xp.where(alpha > np.pi, alpha - 2 * np.pi, alpha)
    alpha = xp.where(alpha <= -np.pi, alpha + 2 * np.pi, alpha)
    return alpha


def alpha2theta_3d(alpha, x, z, P2):
    """Convert alpha to theta using the 3D position (x, z).

    reference: visualDet3D/utils/utils.py:47-62 (alpha2theta_3d).
    """
    xp = get_array_module(alpha, x, z, P2)
    offset = P2[..., 0, 3] / P2[..., 0, 0]
    return alpha + xp.arctan2(x + offset, z)


def theta2alpha_3d(theta, x, z, P2):
    """Convert theta to alpha using the 3D position (x, z).

    reference: visualDet3D/utils/utils.py:64-79 (theta2alpha_3d).
    """
    xp = get_array_module(theta, x, z, P2)
    offset = P2[..., 0, 3] / P2[..., 0, 0]
    return theta - xp.arctan2(x + offset, z)


# ---------------------------------------------------------------------------
# 2D box utilities
# ---------------------------------------------------------------------------

def xyxy2xywh(box2d):
    """[..., 4] [x1,y1,x2,y2] -> [cx,cy,w,h]. reference: networks/utils/utils.py:21-37."""
    xp = get_array_module(box2d)
    cx = 0.5 * (box2d[..., 0] + box2d[..., 2])
    cy = 0.5 * (box2d[..., 1] + box2d[..., 3])
    w = box2d[..., 2] - box2d[..., 0]
    h = box2d[..., 3] - box2d[..., 1]
    return xp.stack([cx, cy, w, h], axis=-1)


def xywh2xyxy(box2d):
    """[..., 4] [cx,cy,w,h] -> [x1,y1,x2,y2]. reference: networks/utils/utils.py:39-59."""
    xp = get_array_module(box2d)
    hw = 0.5 * box2d[..., 2]
    hh = 0.5 * box2d[..., 3]
    return xp.stack([
        box2d[..., 0] - hw,
        box2d[..., 1] - hh,
        box2d[..., 0] + hw,
        box2d[..., 1] + hh,
    ], axis=-1)


def corner_bbox_to_xyxy(corner_box):
    """[..., K, >=2] projected corners -> enclosing [x1,y1,x2,y2].

    reference: networks/utils/utils.py:61-81 (cornerbbox2xyxy, torch branch order).
    """
    xp = get_array_module(corner_box)
    max_xy = xp.max(corner_box[..., 0:2], axis=-2)
    min_xy = xp.min(corner_box[..., 0:2], axis=-2)
    return xp.concatenate([min_xy, max_xy], axis=-1)


def calc_iou(a, b):
    """Pairwise IoU between boxes a [N, 4] and b [M, 4] -> [N, M].

    reference: networks/utils/utils.py:83-100 (calc_iou).
    """
    xp = get_array_module(a, b)
    area_b = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    iw = xp.minimum(a[:, None, 2], b[None, :, 2]) - xp.maximum(a[:, None, 0], b[None, :, 0])
    ih = xp.minimum(a[:, None, 3], b[None, :, 3]) - xp.maximum(a[:, None, 1], b[None, :, 1])
    iw = xp.clip(iw, 0, None)
    ih = xp.clip(ih, 0, None)
    area_a = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    ua = area_a[:, None] + area_b[None, :] - iw * ih
    ua = xp.clip(ua, 1e-8, None)
    return iw * ih / ua


def clip_boxes(boxes, image_hw):
    """Clamp [..., >=4] boxes (first 4 entries x1,y1,x2,y2) to the image.

    reference: networks/utils/utils.py:181-196 (ClipBoxes).
    """
    xp = get_array_module(boxes)
    height, width = image_hw
    x1 = xp.clip(boxes[..., 0], 0, None)
    y1 = xp.clip(boxes[..., 1], 0, None)
    x2 = xp.clip(boxes[..., 2], None, width)
    y2 = xp.clip(boxes[..., 3], None, height)
    return xp.concatenate(
        [xp.stack([x1, y1, x2, y2], axis=-1), boxes[..., 4:]], axis=-1)


# ---------------------------------------------------------------------------
# 3D box projection
# ---------------------------------------------------------------------------

# Order matters: downstream drawing and corner-based 2D boxes assume this order.
# reference: networks/utils/utils.py:208-217 (BBox3dProjector.corner_matrix).
CORNER_MATRIX = np.array(
    [[-1, -1, -1],
     [ 1, -1, -1],
     [ 1,  1, -1],
     [ 1,  1,  1],
     [ 1, -1,  1],
     [-1, -1,  1],
     [-1,  1,  1],
     [-1,  1, -1]], dtype=np.float32)  # [8, 3]


def project_bbox3d(bbox_3d, P2):
    """Project 3D boxes to camera and image frames.

    Args:
      bbox_3d: [N, 7] (x, y, z, w, h, l, alpha) — y at box *center*.
      P2: [3, 4] camera projection.
    Returns:
      abs_corners: [N, 8, 3] corners in the camera frame.
      homo_coord:  [N, 8, 3] corners in image frame (x, y, depth-normalised).
      thetas:      [N] global yaw.

    reference: networks/utils/utils.py:198-253 (BBox3dProjector.forward).
    """
    xp = get_array_module(bbox_3d, P2)
    corner_matrix = xp.asarray(CORNER_MATRIX, dtype=bbox_3d.dtype)
    rel = 0.5 * corner_matrix[None, :, :] * bbox_3d[:, None, 3:6]  # [N, 8, 3]
    thetas = alpha2theta_3d(bbox_3d[..., 6], bbox_3d[..., 0], bbox_3d[..., 2], P2)
    _cos = xp.cos(thetas)[:, None]
    _sin = xp.sin(thetas)[:, None]
    rot_x = rel[:, :, 2] * _cos + rel[:, :, 0] * _sin
    rot_z = -rel[:, :, 2] * _sin + rel[:, :, 0] * _cos
    rotated = xp.stack([rot_x, rel[:, :, 1], rot_z], axis=-1)  # [N, 8, 3]
    abs_corners = rotated + bbox_3d[:, None, 0:3]
    ones = xp.ones(abs_corners.shape[:-1] + (1,), dtype=abs_corners.dtype)
    homog = xp.concatenate([abs_corners, ones], axis=-1)  # [N, 8, 4]
    camera_coord = xp.einsum('ij,nkj->nki', P2, homog)  # [N, 8, 3]
    homo_coord = camera_coord / (camera_coord[:, :, 2:] + 1e-6)
    return abs_corners, homo_coord, thetas


def back_projection(bbox3d, P2):
    """Image-frame 3D box state -> camera-frame state.

    Args:
      bbox3d: [N, 7] (image_x, image_y, z, w, h, l, alpha).
      P2: [3, 4].
    Returns:
      [N, 7] (x3d, y3d, z, w, h, l, alpha).

    reference: networks/utils/utils.py:255-279 (BackProjection.forward).
    """
    xp = get_array_module(bbox3d, P2)
    fx = P2[0, 0]
    fy = P2[1, 1]
    cx = P2[0, 2]
    cy = P2[1, 2]
    tx = P2[0, 3]
    ty = P2[1, 3]
    z3d = bbox3d[:, 2:3]
    x3d = (bbox3d[:, 0:1] * z3d - cx * z3d - tx) / fx
    y3d = (bbox3d[:, 1:2] * z3d - cy * z3d - ty) / fy
    return xp.concatenate([x3d, y3d, bbox3d[:, 2:]], axis=1)


def compound_annotation(labels, max_length, bbox2d, bbox_3d, obj_types):
    """Pack per-image variable-length GT into a fixed [B, max_length, 12] array.

    Layout per row: [x1, y1, x2, y2, cls_index, cx, cy, z, w, h, l, alpha],
    empty rows filled with -1 (cls_index == -1 marks padding).

    reference: visualDet3D/utils/utils.py:97-118 (compound_annotation).
    """
    num_3d = bbox_3d[0].shape[-1] if len(bbox_3d) > 0 and len(bbox_3d[0]) > 0 else 7
    annotations = np.full([len(labels), max_length, num_3d + 5], -1.0, dtype=np.float32)
    for i, label in enumerate(labels):
        for j, obj_type in enumerate(label):
            if j >= max_length:
                break
            annotations[i, j] = np.concatenate([
                bbox2d[i][j], [obj_types.index(obj_type)], bbox_3d[i][j]])
    return annotations
