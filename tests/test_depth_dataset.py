"""KITTI-raw depth dataset walker + depth prior precompute on a synthetic tree."""
import os
import sys

import numpy as np
import pytest



from visualdet3d_tpu.config import EasyDict as edict
from visualdet3d_tpu.registry import DATASET_DICT
import visualdet3d_tpu.data  # noqa: F401

P2_LINE = ('P_rect_02: 7.215377e+02 0.000000e+00 6.095593e+02 4.485728e+01 '
           '0.000000e+00 7.215377e+02 1.728540e+02 2.163791e-01 '
           '0.000000e+00 0.000000e+00 1.000000e+00 2.745884e-03')
P3_LINE = ('P_rect_03: 7.215377e+02 0.000000e+00 6.095593e+02 -3.395242e+02 '
           '0.000000e+00 7.215377e+02 1.728540e+02 2.199936e+00 '
           '0.000000e+00 0.000000e+00 1.000000e+00 2.729905e-03')
R_LINE = 'R: 1 0 0 0 1 0 0 0 1'
T_LINE = 'T: 0.0 0.0 0.0'


def _build_raw_tree(root, n_frames=3):
    import cv2
    date = '2011_09_26'
    seq = '2011_09_26_drive_0001_sync'
    raw = os.path.join(root, 'raw')
    depth = os.path.join(root, 'depth')
    os.makedirs(os.path.join(raw, date, seq, 'image_02', 'data'), exist_ok=True)
    os.makedirs(os.path.join(raw, date, seq, 'image_03', 'data'), exist_ok=True)
    with open(os.path.join(raw, date, 'calib_cam_to_cam.txt'), 'w') as f:
        f.write('some_key: 1 2 3\n' + P2_LINE + '\n' + P3_LINE + '\n')
    with open(os.path.join(raw, date, 'calib_velo_to_cam.txt'), 'w') as f:
        f.write(R_LINE + '\n' + T_LINE + '\n')
    for eye in ('image_02', 'image_03'):
        os.makedirs(os.path.join(depth, seq, 'proj_depth', 'groundtruth', eye),
                    exist_ok=True)
    rng = np.random.default_rng(0)
    for i in range(n_frames):
        name = '%010d.png' % i
        img = rng.integers(0, 255, (64, 128, 3), np.uint8)
        for eye in ('image_02', 'image_03'):
            cv2.imwrite(os.path.join(raw, date, seq, eye, 'data', name), img)
            d = np.zeros((64, 128), np.uint16)
            d[32:, :] = rng.integers(256, 50 * 256, (32, 128))
            cv2.imwrite(os.path.join(
                depth, seq, 'proj_depth', 'groundtruth', eye, name), d)
    return raw, depth


def _depth_cfg(raw, depth, out):
    cfg = edict()
    cfg.obj_types = []
    cfg.path = edict(raw_path=raw, depth_path=depth, preprocessed_path=out)
    cfg.data = edict(
        rgb_shape=(48, 112, 3),
        train_dataset='KittiDepthMonoDataset',
        num_workers=0, batch_size=2,
    )
    mean = np.array([0.485, 0.456, 0.406])
    std = np.array([0.229, 0.224, 0.225])
    cfg.data.test_augmentation = [
        edict(type_name='ConvertToFloat'),
        edict(type_name='CropTop', keywords=edict(output_height=48)),
        edict(type_name='CropRight', keywords=edict(output_width=112)),
        edict(type_name='Normalize', keywords=edict(mean=mean, stds=std)),
    ]
    cfg.data.train_augmentation = [
        edict(type_name='ConvertToFloat'),
        edict(type_name='CropTop', keywords=edict(output_height=48)),
        edict(type_name='RandomCropToWidth', keywords=edict(width=112)),
        edict(type_name='RandomMirror', keywords=edict(mirror_prob=0.5)),
        edict(type_name='Normalize', keywords=edict(mean=mean, stds=std)),
    ]
    return cfg


def test_depth_dataset_walks_and_loads(tmp_path):
    raw, depth = _build_raw_tree(str(tmp_path))
    cfg = _depth_cfg(raw, depth, str(tmp_path / 'out'))
    ds = DATASET_DICT['KittiDepthMonoDataset'](cfg, 'training')
    assert len(ds) == 3
    item = ds[0]
    assert item['image'].shape == (48, 112, 3)
    assert item['gt'].shape == (48, 112)
    assert item['gt'].max() > 1.0  # metric depth present
    assert item['K'].shape == (3, 3)
    batch = ds.collate_fn([ds[0], ds[1]])
    assert batch['images'].shape == (2, 48, 112, 3)
    assert batch['gts'].shape == (2, 48, 112)
    assert batch['P2'].shape == (2, 3, 4)


def test_depth_prior_precompute(tmp_path):
    raw, depth = _build_raw_tree(str(tmp_path))
    out = str(tmp_path / 'out')
    cfg_file = tmp_path / 'cfg.py'
    cfg_file.write_text(f'''
import sys
sys.path.insert(0, {str(os.path.join(os.path.dirname(__file__))) !r})
from test_depth_dataset import _depth_cfg
cfg = _depth_cfg({raw!r}, {depth!r}, {out!r})
''')
    from visualdet3d_tpu.cli import depth_precompute
    depth_precompute.precompute_depth_statistic(str(cfg_file))
    s = np.load(os.path.join(out, 'training', 'log_depth_sum.npy'))
    n = np.load(os.path.join(out, 'training', 'log_depth_solid.npy'))
    assert s.shape == (48, 112) and n.shape == (48, 112)
    assert (n > 0).all()
    prior = float(np.sum(s) / np.sum(n))
    assert 0.0 < prior < np.log(80)
