"""KM3D (RTM3D-style) center-based monocular 3D detection on KITTI.

Mirrors the reference template config/KM3D_example.
"""
import os

import numpy as np

from visualdet3d_tpu.config import EasyDict as edict

cfg = edict()
cfg.obj_types = ['Car']

cfg.trainer = edict(
    gpu=0,
    max_epochs=200,
    disp_iter=50,
    save_iter=10,
    test_iter=10,
    training_func='train_rtm3d',
    test_func='test_mono_detection',
    evaluate_func='evaluate_kitti_obj',
)

path = edict()
path.data_path = os.environ.get('KITTI_OBJ_PATH', '/data/kitti_obj/training')
path.test_path = os.environ.get('KITTI_OBJ_TEST_PATH', '/data/kitti_obj/testing')
path.project_path = os.path.join(os.environ.get('VD3D_WORKDIR', './workdirs'), 'KM3D')
path.log_path = os.path.join(path.project_path, 'log')
path.checkpoint_path = os.path.join(path.project_path, 'checkpoint')
path.preprocessed_path = os.path.join(path.project_path, 'output')
for d in (path.project_path, path.log_path, path.checkpoint_path,
          path.preprocessed_path):
    os.makedirs(d, exist_ok=True)
cfg.path = path

cfg.optimizer = edict(
    type_name='adam',
    keywords=edict(lr=1.25e-4, weight_decay=0),
    clipped_gradient_norm=None,
)
cfg.scheduler = edict(
    type_name='MultiStepLR',
    keywords=edict(milestones=[90, 120], gamma=0.1),
)

data = edict(
    batch_size=16,
    num_workers=8,
    rgb_shape=(384, 1280, 3),
    train_dataset='KittiRTM3DDataset',
    val_dataset='KittiMonoDataset',
    test_dataset='KittiMonoTestDataset',
    train_split_file=os.path.join(
        os.path.dirname(__file__), '..', 'splits', 'chen_split', 'train.txt'),
    val_split_file=os.path.join(
        os.path.dirname(__file__), '..', 'splits', 'chen_split', 'val.txt'),
    use_right_image=False,
)
data.augmentation = edict(
    rgb_mean=np.array([0.485, 0.456, 0.406]),
    rgb_std=np.array([0.229, 0.224, 0.225]),
    cropSize=(data.rgb_shape[0], data.rgb_shape[1]),
    crop_top=0,
)
data.train_augmentation = [
    edict(type_name='ConvertToFloat'),
    edict(type_name='PhotometricDistort',
          keywords=edict(distort_prob=1.0, contrast_lower=0.5, contrast_upper=1.5,
                         saturation_lower=0.5, saturation_upper=1.5,
                         hue_delta=18.0, brightness_delta=32)),
    edict(type_name='RandomWarpAffine',
          keywords=edict(output_w=data.rgb_shape[1], output_h=data.rgb_shape[0])),
    edict(type_name='RandomMirror', keywords=edict(mirror_prob=0.5)),
    edict(type_name='Normalize',
          keywords=edict(mean=data.augmentation.rgb_mean,
                         stds=data.augmentation.rgb_std)),
]
data.test_augmentation = [
    edict(type_name='ConvertToFloat'),
    edict(type_name='Resize',
          keywords=edict(size=data.augmentation.cropSize,
                         preserve_aspect_ratio=False)),
    edict(type_name='Normalize',
          keywords=edict(mean=data.augmentation.rgb_mean,
                         stds=data.augmentation.rgb_std)),
]
cfg.data = data

detector = edict()
detector.obj_types = cfg.obj_types
detector.name = 'KM3D'
detector.backbone = edict(name='dla', depth=34)
detector.head = edict(
    num_classes=len(cfg.obj_types),
    num_joints=9,
    max_objects=32,
    layer_cfg=edict(
        input_features=64,
        head_features=256,
        head_dict={'hm': len(cfg.obj_types), 'wh': 2, 'hps': 18, 'rot': 8,
                   'dim': 3, 'prob': 1, 'reg': 2, 'hm_hp': 9, 'hp_offset': 2},
    ),
    loss_cfg=edict(gamma=2.0, output_w=data.rgb_shape[1] // 4,
                   rampup_length=100),
    test_cfg=edict(score_thr=0.1, cls_agnostic=True, nms_iou_thr=0.5,
                   top_k=100, post_optimization=False),
)
cfg.detector = detector
