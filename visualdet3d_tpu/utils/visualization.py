"""Visualization helpers (reference visualDet3D/utils/utils.py:81-95)."""
from __future__ import annotations

import numpy as np


def draw_3d_box(img: np.ndarray, corners: np.ndarray,
                color=(255, 255, 0)) -> np.ndarray:
    """Draw a projected 3D box wireframe with OpenCV.

    corners: [>=2, 8] image coordinates in the CORNER_MATRIX order
    (geometry.CORNER_MATRIX / reference BBox3dProjector).
    """
    import cv2
    points = np.array(corners[0:2], dtype=np.int32)
    points = [tuple(points[:, i]) for i in range(8)]
    for i in range(1, 5):
        cv2.line(img, points[i], points[i % 4 + 1], color, 2)
        cv2.line(img, points[(i + 4) % 8], points[(i % 4 + 5) % 8], color, 2)
    cv2.line(img, points[2], points[7], color)
    cv2.line(img, points[3], points[6], color)
    cv2.line(img, points[4], points[5], color)
    cv2.line(img, points[0], points[1], color)
    return img
