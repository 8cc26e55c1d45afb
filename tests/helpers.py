"""Shared test fixtures: tiny configs + synthetic anchor priors."""
import os

import numpy as np

from visualdet3d_tpu.config import EasyDict as edict


def write_fake_priors(preprocessed_path, obj_types, num_scales=4, num_ratios=2,
                      pyramid_levels=1):
    """Write synthetic anchor_mean/std npy files in the precompute layout
    ([num_scales*levels, num_ratios, 6])."""
    d = os.path.join(preprocessed_path, 'training')
    os.makedirs(d, exist_ok=True)
    shape = (num_scales * pyramid_levels, num_ratios, 6)
    for t in obj_types:
        mean = np.zeros(shape, np.float32)
        mean[..., :] = np.array([20.0, 0.0, 0.3, 1.6, 1.5, 3.9], np.float32)
        std = np.zeros(shape, np.float32)
        std[..., :] = np.array([10.0, 0.5, 0.5, 0.2, 0.2, 0.5], np.float32)
        np.save(os.path.join(d, f'anchor_mean_{t}.npy'), mean)
        np.save(os.path.join(d, f'anchor_std_{t}.npy'), std)
    return preprocessed_path


def tiny_mono_cfg(preprocessed_path, obj_types=('Car',), ground_aware=True,
                  depth=18):
    """A miniature GAC/Yolo3D detector config (mirrors config/Yolo3D_example)."""
    obj_types = list(obj_types)
    anchors = edict(
        pyramid_levels=[4], strides=[16], sizes=[24],
        ratios=np.array([0.5, 1.0]),
        scales=np.array([2 ** (i / 4.0) for i in range(4)]),
    )
    head = edict(
        num_regression_loss_terms=13,
        preprocessed_path=preprocessed_path,
        num_classes=len(obj_types),
        anchors_cfg=anchors,
        layer_cfg=edict(
            num_features_in=256,
            num_cls_output=len(obj_types) + 1,
            num_reg_output=12,
            cls_feature_size=32,
            reg_feature_size=32,
        ),
        loss_cfg=edict(
            fg_iou_threshold=0.5,
            bg_iou_threshold=0.4,
            L1_regression_alpha=25,
            focal_loss_gamma=2.0,
            match_low_quality=False,
            balance_weight=[20.0] * len(obj_types),
            regression_weight=[1, 1, 1, 1, 1, 1, 3, 1, 1, 0.5, 0.5, 0.5, 1],
        ),
        test_cfg=edict(
            score_thr=0.5,
            cls_agnostic=False,
            nms_iou_thr=0.5,
            post_optimization=False,
        ),
    )
    detector = edict(
        obj_types=obj_types,
        name='GroundAwareYolo3D' if ground_aware else 'Yolo3D',
        backbone=edict(depth=depth, pretrained=False, frozen_stages=-1,
                       num_stages=3, out_indices=(2,), norm_eval=False,
                       dilations=(1, 1, 1)),
        head=head,
        anchors=anchors,
        loss=head.loss_cfg,
    )
    return detector


def random_annotations(rng, batch, max_obj=4, num_classes=1, image_hw=(64, 160)):
    ann = np.full((batch, max_obj, 12), -1.0, np.float32)
    h, w = image_hw
    for b in range(batch):
        n = rng.integers(1, max_obj + 1)
        for j in range(n):
            # anchor-shaped boxes (base size 24, ratios 0.5/1) so the
            # max-IoU assigner produces positives
            x1 = rng.uniform(0, w - 48)
            y1 = rng.uniform(0, h - 40)
            bw = rng.uniform(24, 40)
            bh = bw * rng.uniform(0.5, 1.0)
            ann[b, j] = [x1, y1, x1 + bw, y1 + bh, rng.integers(0, num_classes),
                         x1 + bw / 2, y1 + bh / 2,
                         rng.uniform(5, 40), 1.6, 1.5, 3.9,
                         rng.uniform(-np.pi, np.pi)]
    return ann
