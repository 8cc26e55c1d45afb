"""Precompute sparse disparity ground truth for stereo training.

reference: scripts/disparity_compute.py:53-149 — per training frame, project
the velodyne scan through P2 and P3 (or run cv2.StereoBM), block-max-reduce
4x, and store uint16 x16 PNGs (P2%06d.png / P3%06d.png) consumed by
KittiStereoDataset.

Usage: python scripts/disparity_compute.py --config=configs/stereo3d.py \
           [--use_point_cloud]
"""
import argparse
import os
from copy import deepcopy

import cv2
import numpy as np

from visualdet3d_tpu.config import cfg_from_file
from visualdet3d_tpu.data.augmentations import build_augmentator
from visualdet3d_tpu.data.kitti.kittidata import KittiData
from visualdet3d_tpu.data.kitti.utils import generate_disparity_from_velo


def block_reduce_max(x: np.ndarray, k: int = 4) -> np.ndarray:
    h, w = x.shape
    h2, w2 = h - h % k, w - w % k
    return x[:h2, :w2].reshape(h2 // k, k, w2 // k, k).max(axis=(1, 3))


def denorm(image, rgb_mean, rgb_std):
    out = (image * rgb_std + rgb_mean) * 255
    return np.clip(out, 0, 255).astype(np.uint8)


def compute_disparity_for_split(cfg, index_names, data_root_dir, output_dict,
                                data_split='training', use_point_cloud=True):
    save_dir = os.path.join(cfg.path.preprocessed_path, data_split)
    disp_dir = os.path.join(save_dir, 'disp')
    os.makedirs(disp_dir, exist_ok=True)

    matcher = None if use_point_cloud else cv2.StereoBM_create(192, 25)
    preprocess = build_augmentator(cfg.data.test_augmentation)

    for i, index_name in enumerate(index_names):
        data_frame = KittiData(data_root_dir, index_name, output_dict)
        read = data_frame.read_data()
        calib, image, right_image = read[0], read[1], read[2]
        velo = read[-1]

        baseline = (calib.P2[0, 3] - calib.P3[0, 3]) / calib.P2[0, 0]
        image_t, image_3, P2, P3 = preprocess(
            image.copy(), right_image.copy(), deepcopy(calib.P2), deepcopy(calib.P3))
        if use_point_cloud:
            disparity_left = generate_disparity_from_velo(
                velo[:, :3], image_t.shape[0], image_t.shape[1],
                calib.Tr_velo_to_cam, calib.R0_rect, P2, baseline=baseline)
            disparity_right = generate_disparity_from_velo(
                velo[:, :3], image_t.shape[0], image_t.shape[1],
                calib.Tr_velo_to_cam, calib.R0_rect, P3, baseline=baseline)
        else:
            aug = cfg.data.augmentation
            gray1 = cv2.cvtColor(denorm(image_t, aug.rgb_mean, aug.rgb_std),
                                 cv2.COLOR_RGB2GRAY)
            gray2 = cv2.cvtColor(denorm(image_3, aug.rgb_mean, aug.rgb_std),
                                 cv2.COLOR_RGB2GRAY)
            disparity_left = np.clip(matcher.compute(gray1, gray2), 0, None
                                     ).astype(np.uint16)
            disparity_right = np.clip(
                matcher.compute(gray2[:, ::-1], gray1[:, ::-1]), 0, None
            ).astype(np.uint16)

        cv2.imwrite(os.path.join(disp_dir, 'P2%06d.png' % i),
                    block_reduce_max(disparity_left, 4))
        cv2.imwrite(os.path.join(disp_dir, 'P3%06d.png' % i),
                    block_reduce_max(disparity_right, 4))
        if (i + 1) % 100 == 0:
            print(f'{data_split} disparity {i + 1}/{len(index_names)}', end='\r')
    print(f'\n{data_split} split finished precomputing disparity')


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--config', default='configs/stereo3d.py')
    parser.add_argument('--use_point_cloud', action='store_true', default=True)
    parser.add_argument('--use_stereo_bm', action='store_true')
    args = parser.parse_args()
    use_point_cloud = not args.use_stereo_bm

    cfg = cfg_from_file(args.config)
    output_dict = {'calib': True, 'image': True, 'image_3': True,
                   'label': False, 'velodyne': use_point_cloud}
    with open(cfg.data.train_split_file) as f:
        train_names = [line.strip() for line in f if line.strip()]
    compute_disparity_for_split(cfg, train_names, cfg.path.data_path,
                                output_dict, 'training', use_point_cloud)
    print('Preprocessing finished')


if __name__ == '__main__':
    main()
