"""Rotated-box IoU / 3D IoU, branch-free on device.

TPU-native replacement for the reference's CUDA Sutherland–Hodgman polygon
clipping (visualDet3D/networks/lib/ops/iou3d/src/iou3d_kernel.cu:98-248) and
its Python wrappers ``boxes_iou_bev_gpu`` / ``boxes_iou3d_gpu``
(iou3d/iou3d.py:5-103). The scalar-branchy clipping loop becomes masked
arithmetic over fixed 8-vertex buffers + cumsum compaction, fully
vectorisable with vmap and usable inside jit (e.g. by Position_loss,
reference rtm3d_utils.py:303).

Box conventions:
  rotated rect: [cx, cy, w, h, angle] — w along local x, h along local y,
  angle counter-clockwise (radians).
  camera-frame 3D box: [x, y, z, w, h, l, theta] with y the *bottom* center
  (KITTI), h vertical; BEV rect = (x, z, l, w, theta) in the x–z plane.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_MAX_V = 8  # convex quad clipped by 4 half-planes has <= 8 vertices


def rect_corners(boxes: jnp.ndarray) -> jnp.ndarray:
    """[..., 5] (cx, cy, w, h, angle) -> [..., 4, 2] CCW corners."""
    cx, cy, w, h, ang = (boxes[..., i] for i in range(5))
    cos, sin = jnp.cos(ang), jnp.sin(ang)
    # local CCW corners
    lx = jnp.stack([-w, w, w, -w], axis=-1) * 0.5
    ly = jnp.stack([-h, -h, h, h], axis=-1) * 0.5
    gx = cx[..., None] + lx * cos[..., None] - ly * sin[..., None]
    gy = cy[..., None] + lx * sin[..., None] + ly * cos[..., None]
    return jnp.stack([gx, gy], axis=-1)


def _cross(o, a, b):
    return (a[..., 0] - o[..., 0]) * (b[..., 1] - o[..., 1]) - \
           (a[..., 1] - o[..., 1]) * (b[..., 0] - o[..., 0])


def _shoelace(poly: jnp.ndarray, n: jnp.ndarray) -> jnp.ndarray:
    """Signed area of the first n vertices of poly [MAX_V, 2]."""
    idx = jnp.arange(_MAX_V)
    valid = idx < n
    nxt = jnp.where(idx + 1 >= n, 0, idx + 1)
    x, y = poly[:, 0], poly[:, 1]
    terms = x * y[nxt] - x[nxt] * y
    return 0.5 * jnp.sum(jnp.where(valid, terms, 0.0))


def _clip_halfplane(poly: jnp.ndarray, n: jnp.ndarray, p1: jnp.ndarray,
                    p2: jnp.ndarray, orient: jnp.ndarray):
    """Clip polygon (poly[:n]) against the half-plane on side `orient` of p1->p2.

    Returns (new_poly [MAX_V, 2], new_n). Branch-free: emits up to 2 candidate
    vertices per input vertex, then compacts by cumsum positions.
    """
    idx = jnp.arange(_MAX_V)
    valid = idx < n
    nxt_idx = jnp.where(idx + 1 >= n, 0, idx + 1)
    cur = poly
    nxt = poly[nxt_idx]

    d = p2 - p1
    f_cur = d[0] * (cur[:, 1] - p1[1]) - d[1] * (cur[:, 0] - p1[0])
    f_nxt = d[0] * (nxt[:, 1] - p1[1]) - d[1] * (nxt[:, 0] - p1[0])
    f_cur = f_cur * orient
    f_nxt = f_nxt * orient
    in_cur = f_cur >= 0
    in_nxt = f_nxt >= 0

    denom = f_cur - f_nxt
    t = jnp.where(jnp.abs(denom) > 1e-12, f_cur / jnp.where(denom == 0, 1.0, denom), 0.0)
    inter = cur + t[:, None] * (nxt - cur)

    # candidate stream preserving order: [v0, i0, v1, i1, ...]
    cand = jnp.zeros((2 * _MAX_V, 2), poly.dtype)
    cand = cand.at[0::2].set(cur)
    cand = cand.at[1::2].set(inter)
    keep = jnp.zeros((2 * _MAX_V,), bool)
    keep = keep.at[0::2].set(valid & in_cur)
    keep = keep.at[1::2].set(valid & (in_cur != in_nxt))

    pos = jnp.cumsum(keep) - 1
    pos = jnp.where(keep, pos, 2 * _MAX_V)  # out-of-range -> dropped
    new_poly = jnp.zeros((_MAX_V, 2), poly.dtype)
    new_poly = new_poly.at[pos].set(cand, mode='drop')
    new_n = jnp.sum(keep).astype(n.dtype)
    return new_poly, new_n


def _pair_intersection_area(corners_a: jnp.ndarray, corners_b: jnp.ndarray) -> jnp.ndarray:
    """Intersection area of two convex quads given as [4, 2] corners."""
    poly = jnp.zeros((_MAX_V, 2), corners_a.dtype).at[:4].set(corners_a)
    n = jnp.asarray(4, jnp.int32)
    # orientation of b (CCW in math coords; sign handles either chirality)
    area_b2 = (_cross(corners_b[0], corners_b[1], corners_b[2]) +
               _cross(corners_b[0], corners_b[2], corners_b[3]))
    orient = jnp.where(area_b2 >= 0, 1.0, -1.0).astype(corners_a.dtype)
    for i in range(4):
        p1 = corners_b[i]
        p2 = corners_b[(i + 1) % 4]
        poly, n = _clip_halfplane(poly, n, p1, p2, orient)
    return jnp.abs(_shoelace(poly, n))


def rotated_iou(boxes_a: jnp.ndarray, boxes_b: jnp.ndarray) -> jnp.ndarray:
    """Pairwise IoU of rotated rects. boxes_a [N, 5], boxes_b [M, 5] -> [N, M].

    reference: boxes_iou_bev_gpu (iou3d/iou3d.py:24-41).
    """
    ca = rect_corners(boxes_a)  # [N, 4, 2]
    cb = rect_corners(boxes_b)  # [M, 4, 2]
    inter = jax.vmap(lambda a: jax.vmap(lambda b: _pair_intersection_area(a, b))(cb))(ca)
    area_a = jnp.abs(boxes_a[:, 2] * boxes_a[:, 3])
    area_b = jnp.abs(boxes_b[:, 2] * boxes_b[:, 3])
    union = area_a[:, None] + area_b[None, :] - inter
    return inter / jnp.clip(union, 1e-8, None)


def camera_box_to_bev(boxes7: jnp.ndarray) -> jnp.ndarray:
    """[N, 7] (x, y, z, w, h, l, theta) camera boxes -> [N, 5] BEV rects."""
    return jnp.stack([boxes7[:, 0], boxes7[:, 2], boxes7[:, 5], boxes7[:, 3],
                      boxes7[:, 6]], axis=-1)


def boxes_iou3d(boxes_a: jnp.ndarray, boxes_b: jnp.ndarray) -> jnp.ndarray:
    """Pairwise 3D IoU of camera-frame boxes [N, 7] x [M, 7] -> [N, M].

    y is the bottom-center (KITTI), so the vertical span is [y - h, y].
    reference: boxes_iou3d_gpu (iou3d/iou3d.py:44-77).
    """
    bev_a = camera_box_to_bev(boxes_a)
    bev_b = camera_box_to_bev(boxes_b)
    ca = rect_corners(bev_a)
    cb = rect_corners(bev_b)
    inter_bev = jax.vmap(lambda a: jax.vmap(lambda b: _pair_intersection_area(a, b))(cb))(ca)

    ya_top = boxes_a[:, 1] - boxes_a[:, 4]
    yb_top = boxes_b[:, 1] - boxes_b[:, 4]
    inter_h = jnp.clip(
        jnp.minimum(boxes_a[:, 1][:, None], boxes_b[:, 1][None, :]) -
        jnp.maximum(ya_top[:, None], yb_top[None, :]), 0, None)
    inter_vol = inter_bev * inter_h
    vol_a = boxes_a[:, 3] * boxes_a[:, 4] * boxes_a[:, 5]
    vol_b = boxes_b[:, 3] * boxes_b[:, 4] * boxes_b[:, 5]
    union = vol_a[:, None] + vol_b[None, :] - inter_vol
    return inter_vol / jnp.clip(union, 1e-8, None)


def rotated_nms(boxes_bev: jnp.ndarray, scores: jnp.ndarray, iou_threshold: float,
                max_outputs: int = 100):
    """Greedy NMS over rotated BEV rects, fixed output size.

    reference: nms_gpu (iou3d/iou3d.py:80-92, iou3d_kernel.cu:250-310).
    Returns (keep_indices [K] with -1 padding, keep_valid [K]).
    """
    from visualdet3d_tpu.ops.nms import _greedy_suppress
    n = boxes_bev.shape[0]
    neg_inf = jnp.finfo(scores.dtype).min
    top_scores, order = jax.lax.top_k(scores, n)
    valid = top_scores > neg_inf
    iou = rotated_iou(boxes_bev[order], boxes_bev[order])
    keep = _greedy_suppress(iou, valid, iou_threshold)
    kept_rank = jnp.where(keep, jnp.arange(n), n)
    sel = jnp.argsort(kept_rank)[:max_outputs]
    sel_valid = keep[sel]
    return jnp.where(sel_valid, order[sel], -1).astype(jnp.int32), sel_valid
