"""Precompute the imdb for the label-free KITTI test split.

reference: scripts/imdb_precompute_test.py — same record structure as
imdb_precompute_3d 'test' mode: calib only, no labels, no anchor statistics.

Usage: python scripts/imdb_precompute_test.py --config=configs/stereo3d.py
"""
import argparse
import os
import pickle

from visualdet3d_tpu.config import cfg_from_file
from visualdet3d_tpu.data.kitti.kittidata import KittiData


def run(config: str):
    cfg = cfg_from_file(config)
    test_root = cfg.path.test_path
    calib_dir = os.path.join(test_root, 'calib')
    names = sorted(f[:-4] for f in os.listdir(calib_dir) if f.endswith('.txt'))

    save_dir = os.path.join(cfg.path.preprocessed_path, 'test')
    os.makedirs(save_dir, exist_ok=True)

    frames = []
    for i, name in enumerate(names):
        data_frame = KittiData(test_root, name,
                               {'calib': True, 'image': False, 'label': False,
                                'velodyne': False})
        calib, _, _, _ = data_frame.read_data()
        frames.append(dict(
            index=name,
            image_2_path=data_frame.image2_path,
            image_3_path=data_frame.image3_path,
            velodyne_path=data_frame.velodyne_path,
            calib=dict(P2=calib.P2, P3=calib.P3, R0_rect=calib.R0_rect,
                       Tr_velo_to_cam=calib.Tr_velo_to_cam),
            label=[],
        ))
        if (i + 1) % 500 == 0:
            print(f'test imdb {i + 1}/{len(names)}', end='\r')

    with open(os.path.join(save_dir, 'imdb.pkl'), 'wb') as f:
        pickle.dump(frames, f)
    print(f'\ntest split finished precomputing ({len(frames)} frames)')


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--config', default='configs/stereo3d.py')
    args = parser.parse_args()
    run(args.config)


if __name__ == '__main__':
    main()
