"""Stereo dataset IO: imdb + disparity PNGs, incl. the mirror-swap parity
rule (P2/P3 disparity selection after RandomMirror, reference
stereo_dataset.py:116-121)."""
import os
import pickle
import sys

import cv2
import numpy as np
import pytest



from visualdet3d_tpu.config import EasyDict as edict
from visualdet3d_tpu.registry import DATASET_DICT
import visualdet3d_tpu.data  # noqa: F401

from kitti_fixture import build_mini_kitti, write_split_files
from test_data_layer import _make_cfg


@pytest.fixture(scope='module')
def stereo_setup(tmp_path_factory):
    root = build_mini_kitti(str(tmp_path_factory.mktemp('kitti')))
    out = str(tmp_path_factory.mktemp('pre'))
    split_dir = str(tmp_path_factory.mktemp('split'))
    train, val = write_split_files(root, split_dir, [0, 1, 2], [3])
    cfg = _make_cfg(root, out, train, val)
    cfg.data.train_dataset = 'KittiStereoDataset'

    from visualdet3d_tpu.cli import imdb_precompute_3d
    train_names, _ = imdb_precompute_3d.process_train_val_file(cfg)
    imdb_precompute_3d.read_one_split(
        cfg, train_names, root,
        {'calib': True, 'image': True, 'label': True, 'velodyne': False},
        'training')

    # synthetic disparity PNGs with DIFFERENT values for P2 vs P3 so the
    # mirror-parity branch is distinguishable
    disp_dir = os.path.join(out, 'training', 'disp')
    os.makedirs(disp_dir, exist_ok=True)
    h, w = 370 // 4, 1224 // 4
    for i in range(3):
        p2_map = np.full((h, w), 160, np.uint16)   # /16 = 10.0
        p3_map = np.full((h, w), 320, np.uint16)   # /16 = 20.0
        p3_map[:, :10] = 0  # asymmetry to check the horizontal flip
        cv2.imwrite(os.path.join(disp_dir, 'P2%06d.png' % i), p2_map)
        cv2.imwrite(os.path.join(disp_dir, 'P3%06d.png' % i), p3_map)
    return cfg


def test_stereo_getitem_unmirrored_uses_p2_disparity(stereo_setup):
    cfg = edict(stereo_setup)
    cfg.data.train_augmentation = [
        edict(type_name='ConvertToFloat'),
        edict(type_name='RandomMirror', keywords=edict(mirror_prob=0.0)),
    ]
    ds = DATASET_DICT['KittiStereoDataset'](cfg, 'training')
    item = ds[0]
    assert item['disparity'].max() == pytest.approx(10.0)
    assert isinstance(item['image'], list) and len(item['image']) == 2
    assert abs(item['calib'][0][0, 3]) < abs(item['calib'][1][0, 3])


def test_stereo_getitem_mirrored_uses_flipped_p3_disparity(stereo_setup):
    cfg = edict(stereo_setup)
    cfg.data.train_augmentation = [
        edict(type_name='ConvertToFloat'),
        edict(type_name='RandomMirror', keywords=edict(mirror_prob=1.0)),
    ]
    ds = DATASET_DICT['KittiStereoDataset'](cfg, 'training')
    item = ds[0]
    # mirrored: P2/P3 swapped -> |tx| of the new P2 is the larger one
    assert abs(item['calib'][0][0, 3]) > abs(item['calib'][1][0, 3])
    # P3 disparity (20.0) selected and horizontally flipped: the zeroed
    # left columns are now on the right
    disp = item['disparity']
    assert disp.max() == pytest.approx(20.0)
    assert (disp[:, -10:] == 0).all()
    assert (disp[:, :10] > 0).all()


def test_stereo_collate_with_annotations(stereo_setup):
    cfg = edict(stereo_setup)
    cfg.data.train_augmentation = [
        edict(type_name='ConvertToFloat'),
        edict(type_name='CropTop', keywords=edict(crop_top_index=100)),
        edict(type_name='Resize', keywords=edict(size=(96, 320))),
    ]
    ds = DATASET_DICT['KittiStereoDataset'](cfg, 'training')
    batch = ds.collate_fn([ds[0], ds[1]], obj_types=cfg.obj_types, max_objects=8)
    assert batch['left_images'].shape == (2, 96, 320, 3)
    assert batch['right_images'].shape == (2, 96, 320, 3)
    assert batch['annotations'].shape == (2, 8, 12)
    assert batch['disparity'].shape[0] == 2
