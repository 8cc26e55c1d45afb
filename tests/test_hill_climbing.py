import numpy as np

from visualdet3d_tpu.models.fast_utils.bbox3d import project_3d_corners
from visualdet3d_tpu.models.fast_utils.hill_climbing import (
    hill_climb_batch,
    post_optimization,
)

P2 = np.array([
    [721.5377, 0.0, 609.5593, 44.85728],
    [0.0, 721.5377, 172.854, 0.2163791],
    [0.0, 0.0, 1.0, 0.002745884],
    [0.0, 0.0, 0.0, 1.0],
], np.float64)


def _projected_box2d(x, y, z, w, h, l, theta):
    verts, _ = project_3d_corners(P2, [x], [y], [z], [w], [h], [l], [theta])
    x1 = max(verts[0, :, 0].min(), 0)
    y1 = max(verts[0, :, 1].min(), 0)
    x2 = min(verts[0, :, 0].max(), 1280)
    y2 = min(verts[0, :, 1].max(), 288)
    return np.array([x1, y1, x2, y2])


def test_hill_climb_recovers_perturbed_theta():
    """Start from a wrong yaw; the climb must move it toward the yaw whose
    re-projection matches the GT 2D box."""
    x, y, z, w, h, l = 2.0, 1.0, 12.0, 1.6, 1.5, 3.9
    theta_true = 0.9
    box2d = _projected_box2d(x, y, z, w, h, l, theta_true)[None]

    theta0 = np.array([theta_true - 0.35])
    theta_ref, iou_ref = hill_climb_batch(
        P2, box2d, np.array([x]), np.array([y]), np.array([z]),
        np.array([w]), np.array([h]), np.array([l]), theta0,
        step_r_init=0.4, r_lim=0.01)
    err_before = abs(theta0[0] - theta_true)
    err_after = abs(theta_ref[0] - theta_true)
    assert err_after < err_before
    assert iou_ref[0] > 0.95


def test_post_optimization_batch_only_refines_cars():
    x, y, z = 2.0, 1.0, 12.0
    w, h, l = 1.6, 1.5, 3.9
    theta_true = 0.9
    box2d = _projected_box2d(x, y, z, w, h, l, theta_true)
    # state rows: [x, y, z, w, h, l, alpha]; feed a perturbed alpha
    cx_img = (P2[:3] @ np.array([x, y, z, 1.0]))
    cx_img = cx_img[0] / cx_img[2]
    alpha_true = theta_true - np.arctan2(cx_img - P2[0, 2], P2[0, 0])
    state = np.array([
        [x, y, z, w, h, l, alpha_true - 0.3],
        [x, y, z, w, h, l, alpha_true - 0.3],
    ])
    bbox2d = np.stack([box2d, box2d])
    out = post_optimization(bbox2d, state.copy(), P2[:3],
                            ['Car', 'Pedestrian'])
    # the Car row moved toward the true alpha; the Pedestrian row untouched
    assert abs(out[0, 6] - alpha_true) < abs(state[0, 6] - alpha_true)
    np.testing.assert_allclose(out[1], state[1])
