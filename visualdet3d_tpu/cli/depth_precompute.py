"""Precompute the per-pixel log-depth prior for MonoDepth.

reference: scripts/depth_precompute.py:19-80 — accumulate per-pixel log-depth
sums/counts over the training depth GT, blended with an analytic ground-plane
prior (weight 1000 below the horizon, 10 above), stored as
log_depth_sum.npy / log_depth_solid.npy and consumed by the MonoDepth prior
buffer (unet_monodepth.py:51-56).

Usage: vd3d-depth-precompute --config=configs/monodepth.py
"""
import argparse
import os

import numpy as np

from visualdet3d_tpu.config import cfg_from_file
from visualdet3d_tpu.registry import DATASET_DICT
import visualdet3d_tpu.data  # noqa: F401


def compute_prior_map(w, h, K, relative_elevation: float = 1.65):
    """Analytic ground-plane log-depth prior (reference :19-42)."""
    yy = np.broadcast_to(np.arange(h, dtype=np.float32)[:, None], (h, w))
    fy = K[1, 1]
    cy = K[1, 2]
    depth = (fy * relative_elevation) / (yy - cy + 1e-9)
    prior = np.where(yy > cy, np.log(np.clip(depth, 1e-9, None)), np.log(75.0))
    prior = np.clip(prior, 0, np.log(75.0))
    num = np.where(yy > cy, 1000, 10).astype(np.int64)
    return prior * num, num


def precompute_depth_statistic(config: str):
    cfg = cfg_from_file(config)
    dataset = DATASET_DICT[cfg.data.train_dataset](cfg, 'val')  # eval transform
    save_dir = os.path.join(cfg.path.preprocessed_path, 'training')
    os.makedirs(save_dir, exist_ok=True)

    h, w = cfg.data.rgb_shape[0], cfg.data.rgb_shape[1]
    sum_data = np.zeros((h, w), np.float64)
    number_solid = np.zeros((h, w), np.int64)
    K = None
    for i in range(len(dataset)):
        item = dataset[i]
        sparse_depth = item['gt']
        mask = sparse_depth > 0
        number_solid[mask] += 1
        sum_data[mask] += np.log(sparse_depth[mask] + 1e-9)
        K = item['K']
        if (i + 1) % 100 == 0:
            print(f'depth prior {i + 1}/{len(dataset)}', end='\r')

    prior_map, weight_map = compute_prior_map(w, h, K)
    np.save(os.path.join(save_dir, 'log_depth_sum.npy'), sum_data + prior_map)
    np.save(os.path.join(save_dir, 'log_depth_solid.npy'),
            number_solid + weight_map)
    print('\ndepth prior precompute finished')


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--config', default='configs/monodepth.py')
    args = parser.parse_args()
    precompute_depth_statistic(args.config)


if __name__ == '__main__':
    main()
