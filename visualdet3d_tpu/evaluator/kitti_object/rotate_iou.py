"""Rotated-rectangle overlap for the offline KITTI evaluator.

Replaces the reference's numba.cuda kernels
(visualDet3D/evaluator/kitti/rotate_iou.py:12-328) with the framework's
branch-free polygon-clipping op (ops/rotated_iou.py) jit-compiled on the CPU
backend, with padding buckets so ragged per-part shapes reuse compiled code.
The optional C++ backend (csrc/kitti_eval.cpp) takes over when built.

Box format here matches the devkit: [cx, cy, w, h, angle] where angle is
rotation_y; criterion -1 = IoU, 0 = overlap/area_a, 1 = overlap/area_b,
2 = raw intersection area.
"""
from __future__ import annotations

import functools

import numpy as np


@functools.lru_cache(maxsize=None)
def _jitted_inter_area(n: int, k: int):
    import jax
    import jax.numpy as jnp
    from visualdet3d_tpu.ops.rotated_iou import (_pair_intersection_area,
                                                 rect_corners)

    @functools.partial(jax.jit, backend='cpu')
    def inter(boxes_a, boxes_b):
        ca = rect_corners(boxes_a)
        cb = rect_corners(boxes_b)
        return jax.vmap(lambda a: jax.vmap(
            lambda b: _pair_intersection_area(a, b))(cb))(ca)
    return inter


def _round_up(x: int, m: int = 32) -> int:
    return max(m, ((x + m - 1) // m) * m)


def rotated_box_intersection(boxes_a: np.ndarray, boxes_b: np.ndarray) -> np.ndarray:
    """[N, 5] x [K, 5] -> [N, K] intersection areas (numpy in/out)."""
    n, k = boxes_a.shape[0], boxes_b.shape[0]
    if n == 0 or k == 0:
        return np.zeros((n, k), np.float64)
    np_, kp = _round_up(n), _round_up(k)
    a = np.zeros((np_, 5), np.float32)
    b = np.zeros((kp, 5), np.float32)
    # pad with tiny far-away boxes (zero intersection with everything)
    a[:, 0] = 1e6
    b[:, 0] = -1e6
    a[:n] = boxes_a
    b[:k] = boxes_b
    inter = _jitted_inter_area(np_, kp)(a, b)
    return np.asarray(inter)[:n, :k].astype(np.float64)


def rotate_iou_eval(boxes: np.ndarray, query_boxes: np.ndarray,
                    criterion: int = -1) -> np.ndarray:
    """Devkit-compatible rotated overlap (reference rotate_iou.py:292-328)."""
    inter = rotated_box_intersection(boxes, query_boxes)
    area_a = np.abs(boxes[:, 2] * boxes[:, 3])[:, None]
    area_b = np.abs(query_boxes[:, 2] * query_boxes[:, 3])[None, :]
    if criterion == -1:
        denom = area_a + area_b - inter
    elif criterion == 0:
        denom = np.broadcast_to(area_a, inter.shape).copy()
    elif criterion == 1:
        denom = np.broadcast_to(area_b, inter.shape).copy()
    else:
        return inter
    return np.where(denom > 0, inter / np.maximum(denom, 1e-12), 0.0)


# keep the reference entry-point name for drop-in use
rotate_iou_gpu_eval = rotate_iou_eval
