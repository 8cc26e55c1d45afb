import numpy as np
import jax.numpy as jnp
import pytest

from visualdet3d_tpu import geometry as geom


def sample_P2():
    return np.array([
        [721.5377, 0.0, 609.5593, 44.85728],
        [0.0, 721.5377, 172.854, 0.2163791],
        [0.0, 0.0, 1.0, 0.002745884],
    ], dtype=np.float32)


def test_alpha_theta_roundtrip():
    P2 = sample_P2()
    rng = np.random.default_rng(0)
    alpha = rng.uniform(-np.pi, np.pi, size=(32,)).astype(np.float32)
    x = rng.uniform(-30, 30, size=(32,)).astype(np.float32)
    z = rng.uniform(3, 80, size=(32,)).astype(np.float32)
    theta = geom.alpha2theta_3d(alpha, x, z, P2)
    alpha_back = geom.theta2alpha_3d(theta, x, z, P2)
    np.testing.assert_allclose(alpha, alpha_back, atol=1e-5)


def test_convert_alpha_rot_wraps():
    P2 = sample_P2()
    alpha = np.array([3.0, -3.0, 0.5], dtype=np.float32)
    cx = np.array([100.0, 1100.0, 609.0], dtype=np.float32)
    ry = geom.convert_alpha_to_rot(alpha, cx, P2)
    assert np.all(ry <= np.pi) and np.all(ry > -np.pi)
    alpha_back = geom.convert_rot_to_alpha(ry, cx, P2)
    # round trip up to 2pi wrapping
    diff = (alpha - alpha_back + np.pi) % (2 * np.pi) - np.pi
    np.testing.assert_allclose(diff, 0, atol=1e-5)


def test_calc_iou_matches_naive():
    rng = np.random.default_rng(1)
    a = rng.uniform(0, 100, size=(13, 2))
    a = np.concatenate([a, a + rng.uniform(1, 50, size=(13, 2))], axis=1).astype(np.float32)
    b = rng.uniform(0, 100, size=(7, 2))
    b = np.concatenate([b, b + rng.uniform(1, 50, size=(7, 2))], axis=1).astype(np.float32)

    iou = geom.calc_iou(a, b)
    assert iou.shape == (13, 7)
    for i in range(13):
        for j in range(7):
            ix1 = max(a[i, 0], b[j, 0]); iy1 = max(a[i, 1], b[j, 1])
            ix2 = min(a[i, 2], b[j, 2]); iy2 = min(a[i, 3], b[j, 3])
            inter = max(ix2 - ix1, 0) * max(iy2 - iy1, 0)
            ua = ((a[i, 2] - a[i, 0]) * (a[i, 3] - a[i, 1]) +
                  (b[j, 2] - b[j, 0]) * (b[j, 3] - b[j, 1]) - inter)
            np.testing.assert_allclose(iou[i, j], inter / max(ua, 1e-8), rtol=1e-5)


def test_calc_iou_jax_matches_numpy():
    rng = np.random.default_rng(2)
    a = rng.uniform(0, 50, size=(5, 2))
    a = np.concatenate([a, a + 10], axis=1).astype(np.float32)
    b = a.copy()
    np.testing.assert_allclose(
        np.asarray(geom.calc_iou(jnp.asarray(a), jnp.asarray(b))),
        geom.calc_iou(a, b), rtol=1e-5)


def test_project_bbox3d_center_projection():
    """The projected corner centroid must agree with projecting the 3D center."""
    P2 = sample_P2()
    box = np.array([[1.5, 0.8, 20.0, 1.6, 1.5, 3.9, 0.3]], dtype=np.float32)
    abs_corners, homo, thetas = geom.project_bbox3d(box, P2)
    assert abs_corners.shape == (1, 8, 3)
    assert homo.shape == (1, 8, 3)
    # camera-frame corner centroid == box center
    np.testing.assert_allclose(abs_corners[0].mean(axis=0), box[0, :3], atol=1e-4)
    # theta = alpha + atan2(x + tx/fx, z)
    expect_theta = box[0, 6] + np.arctan2(box[0, 0] + P2[0, 3] / P2[0, 0], box[0, 2])
    np.testing.assert_allclose(thetas[0], expect_theta, rtol=1e-5)
    # projecting the center directly lands inside the projected corner bbox
    center_h = P2 @ np.array([box[0, 0], box[0, 1], box[0, 2], 1.0])
    cx_img, cy_img = center_h[0] / center_h[2], center_h[1] / center_h[2]
    box2d = geom.corner_bbox_to_xyxy(homo)
    assert box2d[0, 0] <= cx_img <= box2d[0, 2]
    assert box2d[0, 1] <= cy_img <= box2d[0, 3]


def test_back_projection_inverts_projection():
    P2 = sample_P2()
    box_cam = np.array([[2.0, 1.1, 25.0, 1.6, 1.5, 3.9, -0.4]], dtype=np.float32)
    # project center to image
    c = P2 @ np.array([box_cam[0, 0], box_cam[0, 1], box_cam[0, 2], 1.0])
    img_box = box_cam.copy()
    img_box[0, 0] = c[0] / c[2]
    img_box[0, 1] = c[1] / c[2]
    restored = geom.back_projection(img_box, P2)
    # the reference inverse ignores the small tz term (P2[2,3]) -> ~2e-3 error
    np.testing.assert_allclose(restored[0, :3], box_cam[0, :3], atol=1e-2)


def test_clip_boxes():
    boxes = np.array([[-5.0, -2.0, 120.0, 300.0, 9.0]], dtype=np.float32)
    out = geom.clip_boxes(boxes, (288, 100))
    np.testing.assert_allclose(out[0, :4], [0, 0, 100, 288])
    assert out[0, 4] == 9.0


def test_compound_annotation_padding():
    labels = [['Car', 'Pedestrian'], []]
    bbox2d = [np.array([[0, 0, 10, 10], [5, 5, 20, 20]], dtype=np.float32), np.zeros((0, 4))]
    bbox3d = [np.array([[1, 2, 3, 4, 5, 6, 0.5], [0, 0, 9, 1, 1, 1, 0.1]], dtype=np.float32),
              np.zeros((0, 7))]
    ann = geom.compound_annotation(labels, 4, bbox2d, bbox3d, ['Car', 'Pedestrian'])
    assert ann.shape == (2, 4, 12)
    assert ann[0, 0, 4] == 0 and ann[0, 1, 4] == 1
    assert np.all(ann[0, 2:] == -1) and np.all(ann[1] == -1)


def test_xyxy_xywh_roundtrip():
    rng = np.random.default_rng(3)
    boxes = rng.uniform(0, 100, size=(8, 4)).astype(np.float32)
    boxes[:, 2:] += boxes[:, :2]
    np.testing.assert_allclose(
        geom.xywh2xyxy(geom.xyxy2xywh(boxes)), boxes, rtol=1e-5)
