import numpy as np
import jax
import jax.numpy as jnp
import pytest

from visualdet3d_tpu.config import EasyDict as edict
from visualdet3d_tpu.registry import DETECTOR_DICT
import visualdet3d_tpu.models.detectors.retinanet  # noqa: F401
import visualdet3d_tpu.models.detectors.monodepth  # noqa: F401

IMAGE_HW = (64, 128)


def _retina_cfg():
    return edict(
        obj_types=['Car', 'Pedestrian', 'Cyclist'],
        name='RetinaNet',
        backbone=edict(depth=18, pretrained=False, frozen_stages=-1,
                       num_stages=4, out_indices=(1, 2, 3), norm_eval=False,
                       dilations=(1, 1, 1, 1)),
        neck=edict(in_channels=[128, 256, 512], out_channels=64, num_outs=5),
        head=edict(
            stacked_convs=1, in_channels=64, feat_channels=64, num_classes=3,
            anchors_cfg=edict(pyramid_levels=[3, 4, 5, 6, 7],
                              strides=[8, 16, 32, 64, 128],
                              sizes=[32, 64, 128, 256, 512],
                              ratios=[0.5, 1, 2],
                              scales=[1, 2 ** (1 / 3), 2 ** (2 / 3)]),
            loss_cfg=edict(fg_iou_threshold=0.5, bg_iou_threshold=0.4,
                           match_low_quality=True, gamma=2.0,
                           balance_weights=[20.0, 20.0, 20.0]),
            test_cfg=edict(score_thr=0.5, nms_pre=1000, nms_iou_thr=0.5),
        ),
    )


def test_retinanet_loss_and_predict():
    cfg = _retina_cfg()
    system = DETECTOR_DICT['RetinaNet'](cfg)
    variables = system.init(jax.random.PRNGKey(0), IMAGE_HW, batch_size=2)

    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.standard_normal((2, *IMAGE_HW, 3)).astype(np.float32))
    ann = np.full((2, 4, 12), -1.0, np.float32)
    ann[0, 0, :5] = [10, 10, 44, 42, 0]   # anchor-scale boxes
    ann[0, 1, :5] = [60, 20, 120, 52, 1]
    ann[1, 0, :5] = [30, 30, 62, 62, 2]
    P2 = jnp.zeros((2, 3, 4))

    (cls_loss, reg_loss, ld), _ = system.loss(variables, images, P2,
                                              jnp.asarray(ann))
    assert np.isfinite(float(cls_loss[0])) and float(cls_loss[0]) > 0
    assert np.isfinite(float(reg_loss[0])) and float(reg_loss[0]) > 0

    out = system.predict(variables, images, P2, max_detections=16)
    assert out['scores'].shape == (2, 16)
    assert out['bboxes'].shape == (2, 16, 4)


def test_retinanet_anchor_count_matches_predictions():
    cfg = _retina_cfg()
    system = DETECTOR_DICT['RetinaNet'](cfg)
    anchors = system.anchor_pack(IMAGE_HW)
    variables = system.init(jax.random.PRNGKey(0), IMAGE_HW)
    images = jnp.zeros((1, *IMAGE_HW, 3))
    cls_scores, reg_preds = system.net.apply(variables, images, train=False)
    assert cls_scores.shape[1] == anchors.shape[0]
    assert reg_preds.shape == (1, anchors.shape[0], 4)


def _depth_cfg():
    return edict(
        name='MonoDepth',
        max_depth=50,
        output_channel=1,
        SI_loss_lambda=0.3,
        smooth_loss_weight=0.003,
        minor_weight=0.0,
        preprocessed_path='/nonexistent',  # falls back to the neutral prior
        backbone=edict(depth=18, pretrained=False, frozen_stages=-1,
                       num_stages=4, out_indices=(0, 1, 2, 3), norm_eval=False,
                       dilations=(1, 1, 1, 1)),
    )


def test_monodepth_loss_and_predict():
    system = DETECTOR_DICT['MonoDepth'](_depth_cfg())
    variables = system.init(jax.random.PRNGKey(0), IMAGE_HW)

    rng = np.random.default_rng(1)
    images = jnp.asarray(rng.standard_normal((1, *IMAGE_HW, 3)).astype(np.float32))
    P2 = jnp.asarray(np.array([[[200., 0, 64, 0], [0, 200., 32, 0],
                                [0, 0, 1, 0]]], np.float32))
    gts = np.zeros((1, *IMAGE_HW), np.float32)
    gts[0, 20:, :] = rng.uniform(4, 40, (IMAGE_HW[0] - 20, IMAGE_HW[1]))

    (loss, ld), _ = system.loss(variables, images, P2, jnp.asarray(gts),
                                rng=jax.random.PRNGKey(2))
    assert np.isfinite(float(loss)) and float(loss) > 0

    pred = system.predict(variables, images, P2)
    assert pred['target'].shape == (1, *IMAGE_HW, 1)
    assert float(pred['target'].min()) > 0  # depth positivity contract


def test_depth_metrics_zero_for_perfect_and_positive_for_noise():
    from visualdet3d_tpu.evaluator.kitti_depth.evaluate_depth import compute_errors
    rng = np.random.default_rng(0)
    gt = rng.uniform(2, 50, (32, 64))
    perfect = compute_errors(gt, gt.copy())
    np.testing.assert_allclose(perfect, 0.0, atol=1e-9)
    noisy = compute_errors(gt, gt * rng.uniform(0.8, 1.2, gt.shape))
    assert (noisy > 0).all()
    # masked pixels don't contribute
    gt_masked = gt.copy()
    gt_masked[:16] = 0.0
    e = compute_errors(gt_masked, gt * 100)
    e2 = compute_errors(gt_masked, np.where(gt_masked > 0, gt * 100, 7.0))
    np.testing.assert_allclose(e, e2)
