"""Registered inference pipelines (single-image test functions).

reference: visualDet3D/networks/pipelines/testers.py:15-91. Each factory
takes a detector system and returns ``fn(variables, batch) -> (scores,
bboxes, obj_types)`` with numpy outputs trimmed to the valid detections.
The depth-shift score augmentation of Digging_M3D (testers.py:44-90) is
reproduced host-side on the decoded boxes.
"""
from __future__ import annotations

import numpy as np

from visualdet3d_tpu.registry import PIPELINE_DICT


def _trim(prediction, obj_types):
    scores = np.asarray(prediction['scores'][0])
    bboxes = np.asarray(prediction['bboxes'][0])
    labels = np.asarray(prediction['labels'][0])
    valid = np.asarray(prediction['valid'][0])
    scores, bboxes, labels = scores[valid], bboxes[valid], labels[valid]
    names = [obj_types[int(i)] for i in labels]
    return scores, bboxes, names


@PIPELINE_DICT.register_module
def test_mono_detection(system, max_detections: int = 64):
    """reference testers.py:15."""
    def fn(variables, batch):
        pred = system.predict(variables, batch['images'], batch['P2'],
                              max_detections=max_detections)
        return _trim(pred, system.obj_types)
    return fn


@PIPELINE_DICT.register_module
def test_stereo_detection(system, max_detections: int = 64):
    """reference testers.py:30."""
    def fn(variables, batch):
        pred = system.predict(variables, batch['left_images'],
                              batch['right_images'], batch['P2'],
                              batch.get('P3'), max_detections=max_detections)
        return _trim(pred, system.obj_types)
    return fn


@PIPELINE_DICT.register_module
def test_mono_detection_diggingmono3d(system, max_detections: int = 64,
                                      lamda: float = 80.0):
    """Digging-into-M3D test-time depth-shift score augmentation
    (reference testers.py:44-90): each detection deeper than 10 m spawns
    shifted copies at z + {-2,-1,-0.5,0.5,1,2} with Gaussian-discounted
    scores."""
    base = test_mono_detection(system, max_detections)

    def fn(variables, batch):
        scores, bboxes, names = base(variables, batch)
        if len(scores) == 0:
            return scores, bboxes, names
        out_s, out_b, out_n = [], [], []
        for i in range(len(scores)):
            out_s.append(scores[i])
            out_b.append(bboxes[i])
            out_n.append(names[i])
            depth = bboxes[i, 6]
            if depth < 10:
                continue
            sigma = np.exp(depth / lamda)
            for shift in (-2, -1, -0.5, 0.5, 1, 2):
                nb = bboxes[i].copy()
                nb[6] = depth + shift
                out_s.append(scores[i] * np.exp(-shift ** 2 / sigma ** 2))
                out_b.append(nb)
                out_n.append(names[i])
        return np.asarray(out_s), np.stack(out_b), out_n
    return fn


@PIPELINE_DICT.register_module
def test_mono_depth(system):
    """Dense depth prediction (used by evaluate_kitti_depth)."""
    def fn(variables, batch):
        return system.predict(variables, batch['images'], batch['P2'])
    return fn
