"""Registered evaluation pipelines: run the val split, write KITTI-format
results, call the offline evaluators.

reference: visualDet3D/networks/pipelines/evaluators.py:19-146
(evaluate_kitti_obj / evaluate_kitti_depth / test_one). The reference loops
batch=1 with a host round-trip per stage; here decode+NMS already happened on
device inside predict, and only the final fixed-K boxes come back to host for
back-projection, rescaling to the original camera, and file IO.
"""
from __future__ import annotations

import os
import shutil
from typing import Sized

import numpy as np

from visualdet3d_tpu import geometry
from visualdet3d_tpu.data.kitti.utils import write_result_to_file
from visualdet3d_tpu.registry import PIPELINE_DICT


def _fresh_dir(path: str):
    if os.path.isdir(path):
        shutil.rmtree(path)
    os.makedirs(path)


def rescale_boxes_to_original(bbox_2d: np.ndarray, P2: np.ndarray,
                              original_P: np.ndarray) -> np.ndarray:
    """Undo the augmentation scaling/cropping using the calibration pair
    (reference evaluators.py:119-129)."""
    scale_x = original_P[0, 0] / P2[0, 0]
    scale_y = original_P[1, 1] / P2[1, 1]
    shift_left = original_P[0, 2] / scale_x - P2[0, 2]
    shift_top = original_P[1, 2] / scale_y - P2[1, 2]
    out = bbox_2d.copy()
    out[:, 0:4:2] += shift_left
    out[:, 1:4:2] += shift_top
    out[:, 0:4:2] *= scale_x
    out[:, 1:4:2] *= scale_y
    return out


def test_one(cfg, index, dataset, variables, test_fn, result_path,
             post_opt_fn=None):
    """Single-frame inference + KITTI txt writing
    (reference evaluators.py:101-146)."""
    data = dataset[index]
    P2 = data['calib'][0] if isinstance(data['calib'], list) else data['calib']
    collated = dataset.collate_fn([data])
    scores, bbox, obj_names = test_fn(variables, collated)
    scores = np.asarray(scores)
    bbox = np.asarray(bbox)
    if bbox.ndim == 1:  # zero-detection frames keep an explicit [0, C] shape
        bbox = bbox.reshape(len(scores), 11 if bbox.size == 0 else -1)
    bbox_2d = bbox[:, 0:4]
    if bbox.shape[1] > 4:
        bbox_3d_state = bbox[:, 4:]  # [cx, cy, z, w, h, l, alpha]
        bbox_3d_state_3d = geometry.back_projection(bbox_3d_state, P2)
        if post_opt_fn is not None and len(scores) > 0:
            bbox_3d_state_3d = post_opt_fn(bbox_2d, bbox_3d_state_3d, P2, obj_names)
        if len(scores) > 0:
            _, _, thetas = geometry.project_bbox3d(
                bbox_3d_state_3d[:, :7].astype(np.float32), P2.astype(np.float32))
            thetas = np.asarray(thetas)
        else:
            thetas = np.zeros((0,))
        bbox_2d = rescale_boxes_to_original(bbox_2d, P2, data['original_P'])
        write_result_to_file(result_path, index, scores, bbox_2d,
                             np.asarray(bbox_3d_state_3d), thetas, obj_names)
    else:
        original_height = data['original_shape'][0]
        height = collated['images'].shape[1]
        aug_cfg = cfg.data.augmentation
        if aug_cfg.get('crop_top') is not None:
            crop_top = aug_cfg.crop_top
        else:
            crop_top = max(original_height - aug_cfg.crop_top_height, 0)
        scale_2d = (original_height - crop_top) / height
        bbox_2d = bbox_2d * scale_2d
        bbox_2d[:, 1:4:2] += crop_top
        write_result_to_file(result_path, index, scores, bbox_2d,
                             obj_types=obj_names)


@PIPELINE_DICT.register_module
def evaluate_kitti_obj(cfg, system, variables, dataset_val: Sized, writer,
                       epoch_num: int, result_path_split='validation'):
    """reference evaluators.py:65-99."""
    result_path = os.path.join(cfg.path.preprocessed_path, result_path_split, 'data')
    _fresh_dir(result_path)
    test_fn = PIPELINE_DICT[cfg.trainer.test_func](system)

    post_opt_fn = None
    if cfg.detector.head.test_cfg.get('post_optimization', False):
        from visualdet3d_tpu.models.fast_utils.hill_climbing import post_optimization
        post_opt_fn = post_optimization

    for index in range(len(dataset_val)):
        test_one(cfg, index, dataset_val, variables, test_fn, result_path,
                 post_opt_fn=post_opt_fn)
        if (index + 1) % 100 == 0:
            print(f'eval {index + 1}/{len(dataset_val)}', end='\r')

    if cfg.get('is_running_test_set', False):
        print('Finish evaluation.')
        return None
    from visualdet3d_tpu.evaluator.kitti_object.evaluate import evaluate
    result_texts = evaluate(
        label_path=os.path.join(cfg.path.data_path, 'label_2'),
        result_path=result_path,
        label_split_file=cfg.data.val_split_file,
        current_classes=[i for i in range(len(cfg.obj_types))])
    for class_index, result_text in enumerate(result_texts):
        if writer is not None:
            writer.add_text(f'validation result {class_index}',
                            result_text.replace(' ', '&nbsp;').replace('\n', '  \n'),
                            epoch_num + 1)
        print(result_text)
    return result_texts


@PIPELINE_DICT.register_module
def evaluate_kitti_depth(cfg, system, variables, dataset_val: Sized, writer,
                         epoch_num: int, result_path_split='validation'):
    """reference evaluators.py:19-63."""
    import cv2
    result_path = os.path.join(cfg.path.preprocessed_path, result_path_split, 'data')
    _fresh_dir(result_path)
    test_fn = PIPELINE_DICT[cfg.trainer.test_func](system)
    for index in range(len(dataset_val)):
        data = dataset_val[index]
        collated = dataset_val.collate_fn([data])
        return_dict = test_fn(variables, collated)
        depth = np.asarray(return_dict['target'][0, ..., 0])
        depth_uint16 = (depth * 256).astype(np.uint16)
        h, w = data['original_shape'][0], data['original_shape'][1]
        height_to_pad = h - depth_uint16.shape[0]
        if height_to_pad > 0:
            depth_uint16 = np.pad(depth_uint16, [(height_to_pad, 0), (0, 0)],
                                  mode='edge')
        depth_uint16 = cv2.resize(depth_uint16, (w, h))
        depth_uint16[depth_uint16 == 0] = 1
        cv2.imwrite(os.path.join(result_path, '%010d.png' % index), depth_uint16)
    if cfg.get('is_running_test_set', False):
        print('Finish evaluation.')
        return None
    from visualdet3d_tpu.evaluator.kitti_depth.evaluate_depth import evaluate_depth
    result_texts = evaluate_depth(
        label_path=os.path.join(cfg.path.validation_path, 'groundtruth_depth'),
        result_path=result_path)
    for index, result_text in enumerate(result_texts):
        if writer is not None:
            writer.add_text(f'validation result {index}',
                            result_text.replace(' ', '&nbsp;').replace('\n', '  \n'),
                            epoch_num + 1)
        print(result_text, end='')
    return result_texts
