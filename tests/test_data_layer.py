import os
import pickle
import sys

import numpy as np
import pytest



from visualdet3d_tpu.config import EasyDict as edict
from visualdet3d_tpu.data.augmentations import build_augmentator
from visualdet3d_tpu.data.kitti.kittidata import KittiCalib, KittiData, KittiObj
from visualdet3d_tpu.data.kitti import utils as kitti_utils
from visualdet3d_tpu.data.loader import build_dataloader
from visualdet3d_tpu.geometry import project_bbox3d
from visualdet3d_tpu.registry import DATASET_DICT
import visualdet3d_tpu.data.kitti.dataset.mono_dataset  # noqa: F401
import visualdet3d_tpu.data.kitti.dataset.stereo_dataset  # noqa: F401

from kitti_fixture import IMAGE_HW, P2, P3, build_mini_kitti, write_split_files


@pytest.fixture(scope='module')
def kitti_root(tmp_path_factory):
    return build_mini_kitti(str(tmp_path_factory.mktemp('kitti')))


@pytest.fixture(scope='module')
def precomputed(kitti_root, tmp_path_factory):
    """Run the imdb precompute end-to-end on the mini dataset."""
    out = str(tmp_path_factory.mktemp('pre'))
    split_dir = str(tmp_path_factory.mktemp('split'))
    train, val = write_split_files(kitti_root, split_dir, [0, 1, 2], [3])

    from visualdet3d_tpu.cli.imdb_precompute_3d import run as precompute_main
    cfg = _make_cfg(kitti_root, out, train, val)
    from visualdet3d_tpu.cli import imdb_precompute_3d
    train_names, val_names = imdb_precompute_3d.process_train_val_file(cfg)
    imdb_precompute_3d.read_one_split(
        cfg, train_names, kitti_root,
        {'calib': True, 'image': True, 'label': True, 'velodyne': False},
        'training')
    imdb_precompute_3d.read_one_split(
        cfg, val_names, kitti_root,
        {'calib': True, 'image': False, 'label': True, 'velodyne': False},
        'validation')
    return cfg


def _make_cfg(root, out, train_split, val_split):
    cfg = edict()
    cfg.obj_types = ['Car']
    cfg.path = edict(data_path=root, preprocessed_path=out)
    cfg.data = edict(
        batch_size=2, num_workers=0,
        rgb_shape=(96, 320, 3),
        train_dataset='KittiMonoDataset',
        val_dataset='KittiMonoDataset',
        train_split_file=train_split,
        val_split_file=val_split,
        max_occlusion=2, min_z=3,
    )
    cfg.data.augmentation = edict(
        rgb_mean=np.array([0.485, 0.456, 0.406]),
        rgb_std=np.array([0.229, 0.224, 0.225]),
        cropSize=(96, 320), crop_top=100)
    cfg.data.test_augmentation = [
        edict(type_name='ConvertToFloat'),
        edict(type_name='CropTop', keywords=edict(crop_top_index=100)),
        edict(type_name='Resize', keywords=edict(size=(96, 320))),
        edict(type_name='Normalize',
              keywords=edict(mean=cfg.data.augmentation.rgb_mean,
                             stds=cfg.data.augmentation.rgb_std)),
    ]
    cfg.data.train_augmentation = [
        edict(type_name='ConvertToFloat'),
        edict(type_name='PhotometricDistort',
              keywords=edict(distort_prob=1.0)),
        edict(type_name='CropTop', keywords=edict(crop_top_index=100)),
        edict(type_name='Resize', keywords=edict(size=(96, 320))),
        edict(type_name='RandomMirror', keywords=edict(mirror_prob=0.5)),
        edict(type_name='Normalize',
              keywords=edict(mean=cfg.data.augmentation.rgb_mean,
                             stds=cfg.data.augmentation.rgb_std)),
    ]
    anchors = edict(pyramid_levels=[4], strides=[16], sizes=[24],
                    ratios=np.array([0.5, 1.0]),
                    scales=np.array([2 ** (i / 4.0) for i in range(16)]))
    cfg.detector = edict(head=edict(
        anchors_cfg=anchors,
        loss_cfg=edict(fg_iou_threshold=0.3)))
    return cfg


def test_kitti_parsing(kitti_root):
    calib = KittiCalib(os.path.join(kitti_root, 'calib', '000000.txt')).read_calib_file()
    np.testing.assert_allclose(calib.P2, P2, rtol=1e-6)
    np.testing.assert_allclose(calib.P3, P3, rtol=1e-6)
    data = KittiData(kitti_root, '000000')
    c, image, label, pc = data.read_data()
    assert image.shape == (*IMAGE_HW, 3)
    assert len(label.data) == 2
    obj = label.data[0]
    assert obj.type == 'Car' and obj.z == 12.0
    assert pc.shape[1] == 4
    # round-trip str -> parse
    obj2 = KittiObj(str(obj))
    assert obj2.z == obj.z and obj2.type == 'Car'


def test_croptop_preserves_projection(kitti_root):
    """The P2-editing invariant: project(3D point) after CropTop must equal
    project-then-shift."""
    calib = KittiCalib(os.path.join(kitti_root, 'calib', '000000.txt')).read_calib_file()
    aug = build_augmentator([edict(type_name='ConvertToFloat'),
                             edict(type_name='CropTop',
                                   keywords=edict(crop_top_index=100))])
    img = np.zeros((*IMAGE_HW, 3), np.uint8)
    out_img, out_p2 = aug(img, p2=calib.P2.copy())
    assert out_img.shape[0] == IMAGE_HW[0] - 100
    pt = np.array([2.0, 1.0, 15.0, 1.0])
    before = calib.P2 @ pt
    after = out_p2 @ pt
    np.testing.assert_allclose(after[0] / after[2], before[0] / before[2], rtol=1e-6)
    np.testing.assert_allclose(after[1] / after[2], before[1] / before[2] - 100,
                               rtol=1e-6)


def test_resize_preserves_projection(kitti_root):
    calib = KittiCalib(os.path.join(kitti_root, 'calib', '000000.txt')).read_calib_file()
    aug = build_augmentator([edict(type_name='ConvertToFloat'),
                             edict(type_name='Resize',
                                   keywords=edict(size=(96, 320)))])
    img = np.zeros((*IMAGE_HW, 3), np.uint8)
    out_img, out_p2 = aug(img, p2=calib.P2.copy())
    sy = 96 / IMAGE_HW[0]
    pt = np.array([2.0, 1.0, 15.0, 1.0])
    before = calib.P2 @ pt
    after = out_p2 @ pt
    np.testing.assert_allclose(after[0] / after[2], before[0] / before[2] * sy, rtol=1e-5)
    np.testing.assert_allclose(after[1] / after[2], before[1] / before[2] * sy, rtol=1e-5)


def test_mirror_preserves_reprojection(kitti_root):
    """After RandomMirror, re-projecting the flipped 3D box must land inside
    the flipped image."""
    calib = KittiCalib(os.path.join(kitti_root, 'calib', '000000.txt')).read_calib_file()
    obj = KittiObj('Car 0.00 0 0.1 600 180 700 240 1.50 1.60 3.90 2.00 1.60 12.00 0.10')
    aug = build_augmentator([edict(type_name='ConvertToFloat'),
                             edict(type_name='RandomMirror',
                                   keywords=edict(mirror_prob=1.0))])
    img = np.zeros((*IMAGE_HW, 3), np.uint8)
    out = aug(img, None, calib.P2.copy(), calib.P3.copy(), [obj])
    _, p2m, p3m, labels_m = out
    obj_m = labels_m[0]
    assert obj_m.x == -2.0
    # mirrored P2/P3 swap: tx sign flipped, cx mirrored
    assert p2m[0, 3] == -P3[0, 3]
    # reproject: center lands inside the mirrored 2D box
    box7 = np.array([[obj_m.x, obj_m.y - obj_m.h / 2, obj_m.z,
                      obj_m.w, obj_m.h, obj_m.l, obj_m.alpha]], np.float32)
    _, homo, _ = project_bbox3d(box7, p2m.astype(np.float32))
    cx = homo[0, :, 0].mean()
    assert obj_m.bbox_l - 30 < cx < obj_m.bbox_r + 30


def test_velodyne_disparity_rasterization(kitti_root):
    calib = KittiCalib(os.path.join(kitti_root, 'calib', '000000.txt')).read_calib_file()
    data = KittiData(kitti_root, '000000')
    _, _, _, pc = data.read_data()
    disp = kitti_utils.generate_disparity_from_velo(
        pc[:, :3], IMAGE_HW[0], IMAGE_HW[1], calib.Tr_velo_to_cam,
        calib.R0_rect, calib.P2, baseline=0.54)
    assert disp.shape == IMAGE_HW and disp.dtype == np.uint16
    assert (disp > 0).sum() > 0
    # disparity values: fx * baseline / depth * 16; depth >= 2 => bounded
    assert disp.max() <= 721.5377 * 0.54 / 2.0 * 16


def test_precompute_and_mono_dataset(precomputed):
    cfg = precomputed
    save_dir = os.path.join(cfg.path.preprocessed_path, 'training')
    mean = np.load(os.path.join(save_dir, 'anchor_mean_Car.npy'))
    std = np.load(os.path.join(save_dir, 'anchor_std_Car.npy'))
    assert mean.shape == (16, 2, 6) and std.shape == (16, 2, 6)
    # the whl columns are global statistics (positive)
    assert (mean[..., 3:] > 0).all()
    with open(os.path.join(save_dir, 'imdb.pkl'), 'rb') as f:
        imdb = pickle.load(f)
    assert len(imdb) == 3
    assert all('calib' in r and 'label' in r for r in imdb)

    dataset = DATASET_DICT[cfg.data.train_dataset](cfg, 'training')
    assert len(dataset) == 6  # right-image doubling
    item = dataset[0]
    assert item['image'].shape == (96, 320, 3)
    assert item['bbox2d'].shape[1] == 4
    assert item['bbox3d'].shape[1] == 7

    loader = build_dataloader(dataset, num_workers=2, batch_size=2,
                              collate_fn=lambda items: dataset.collate_fn(
                                  items, obj_types=cfg.obj_types, max_objects=8),
                              training=True)
    batch = next(iter(loader))
    assert batch['images'].shape == (2, 96, 320, 3)
    assert batch['P2'].shape == (2, 3, 4)
    assert batch['annotations'].shape == (2, 8, 12)


def test_write_and_parse_results(tmp_path):
    from visualdet3d_tpu.evaluator.kitti_object.kitti_common import get_label_anno
    scores = np.array([0.9, 0.2])
    bbox2d = np.array([[100, 100, 200, 150], [300, 120, 350, 160]], np.float32)
    bbox3d = np.array([[2.0, 1.0, 12.0, 1.6, 1.5, 3.9, 0.1],
                       [1.0, 1.0, 30.0, 1.6, 1.5, 3.9, 0.2]], np.float32)
    thetas = np.array([0.3, 0.4])
    kitti_utils.write_result_to_file(str(tmp_path), 0, scores, bbox2d, bbox3d,
                                     thetas, obj_types=['Car', 'Car'],
                                     threshold=0.4)
    anno = get_label_anno(str(tmp_path / '000000.txt'))
    assert len(anno['name']) == 1  # score 0.2 filtered
    assert anno['name'][0] == 'Car'
    np.testing.assert_allclose(anno['score'][0], 0.9, atol=1e-6)
    # y written as bottom center: 1.0 + 1.5/2
    np.testing.assert_allclose(anno['location'][0, 1], 1.75, atol=1e-4)
    np.testing.assert_allclose(anno['dimensions'][0], [3.9, 1.5, 1.6], atol=1e-4)
