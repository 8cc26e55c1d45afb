"""RetinaNet 2D detection baseline on KITTI (ResNet-50 + FPN).

Mirrors the reference template config/RetinaNet_example.
"""
import os

import numpy as np

from visualdet3d_tpu.config import EasyDict as edict

cfg = edict()
cfg.obj_types = ['Car', 'Pedestrian', 'Cyclist']

cfg.trainer = edict(
    gpu=0,
    max_epochs=30,
    disp_iter=50,
    save_iter=5,
    test_iter=10,
    training_func='train_2d_detection',
    test_func='test_mono_detection',
    evaluate_func='evaluate_kitti_obj',
)

path = edict()
path.data_path = os.environ.get('KITTI_OBJ_PATH', '/data/kitti_obj/training')
path.test_path = os.environ.get('KITTI_OBJ_TEST_PATH', '/data/kitti_obj/testing')
path.project_path = os.path.join(os.environ.get('VD3D_WORKDIR', './workdirs'), 'RetinaNet')
path.log_path = os.path.join(path.project_path, 'log')
path.checkpoint_path = os.path.join(path.project_path, 'checkpoint')
path.preprocessed_path = os.path.join(path.project_path, 'output')
for d in (path.project_path, path.log_path, path.checkpoint_path,
          path.preprocessed_path):
    os.makedirs(d, exist_ok=True)
cfg.path = path

cfg.optimizer = edict(
    type_name='sgd',
    keywords=edict(lr=0.01, momentum=0.9, weight_decay=1e-4),
    clipped_gradient_norm=35.0,
)
cfg.scheduler = edict(
    type_name='MultiStepLR',
    keywords=edict(milestones=[20, 26], gamma=0.1),
)

data = edict(
    batch_size=8,
    num_workers=8,
    rgb_shape=(384, 1280, 3),
    train_dataset='KittiMonoDataset',
    val_dataset='KittiMonoDataset',
    test_dataset='KittiMonoTestDataset',
    train_split_file=os.path.join(
        os.path.dirname(__file__), '..', 'splits', 'chen_split', 'train.txt'),
    val_split_file=os.path.join(
        os.path.dirname(__file__), '..', 'splits', 'chen_split', 'val.txt'),
    use_right_image=False,
    is_reproject=False,
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
          keywords=edict(distort_prob=1.0)),
    edict(type_name='Resize', keywords=edict(size=data.augmentation.cropSize)),
    edict(type_name='RandomMirror', keywords=edict(mirror_prob=0.5)),
    edict(type_name='Normalize',
          keywords=edict(mean=data.augmentation.rgb_mean,
                         stds=data.augmentation.rgb_std)),
]
data.test_augmentation = [
    edict(type_name='ConvertToFloat'),
    edict(type_name='Resize', keywords=edict(size=data.augmentation.cropSize)),
    edict(type_name='Normalize',
          keywords=edict(mean=data.augmentation.rgb_mean,
                         stds=data.augmentation.rgb_std)),
]
cfg.data = data

detector = edict()
detector.obj_types = cfg.obj_types
detector.name = 'RetinaNet'
detector.backbone = edict(depth=50, pretrained=True, frozen_stages=1,
                          num_stages=4, out_indices=(1, 2, 3), norm_eval=True,
                          dilations=(1, 1, 1, 1))
detector.neck = edict(in_channels=[512, 1024, 2048], out_channels=256, num_outs=5)
detector.head = edict(
    stacked_convs=4,
    in_channels=256,
    feat_channels=256,
    num_classes=len(cfg.obj_types),
    target_stds=[1.0, 1.0, 1.0, 1.0],
    target_means=[0.0, 0.0, 0.0, 0.0],
    anchors_cfg=edict(
        pyramid_levels=[3, 4, 5, 6, 7],
        strides=[8, 16, 32, 64, 128],
        sizes=[32, 64, 128, 256, 512],
        ratios=np.array([0.5, 1, 2]),
        scales=np.array([2 ** 0, 2 ** (1 / 3), 2 ** (2 / 3)]),
    ),
    loss_cfg=edict(fg_iou_threshold=0.5, bg_iou_threshold=0.4,
                   match_low_quality=True, gamma=2.0,
                   balance_weights=[20.0, 20.0, 20.0]),
    test_cfg=edict(score_thr=0.5, nms_pre=1000, nms_iou_thr=0.5,
                   post_optimization=False),
)
cfg.detector = detector
