"""MonoDepth (DORN-style log-depth U-Net) on KITTI depth prediction.

Mirrors the reference template config/KittiDepth_example.
"""
import os

import numpy as np

from visualdet3d_tpu.config import EasyDict as edict

cfg = edict()
cfg.obj_types = []

cfg.trainer = edict(
    gpu=0,
    max_epochs=20,
    disp_iter=100,
    save_iter=2,
    test_iter=2,
    training_func='train_mono_depth',
    test_func='test_mono_depth',
    evaluate_func='evaluate_kitti_depth',
)

path = edict()
path.raw_path = os.environ.get('KITTI_RAW_PATH', '/data/kitti_raw')
path.depth_path = os.environ.get('KITTI_DEPTH_PATH', '/data/data_depth_annotated/train')
path.validation_path = os.environ.get('KITTI_DEPTH_VAL_PATH',
                                      '/data/depth_selection/val_selection_cropped')
path.test_path = os.environ.get('KITTI_DEPTH_TEST_PATH',
                                '/data/depth_selection/test_depth_prediction_anonymous')
path.project_path = os.path.join(os.environ.get('VD3D_WORKDIR', './workdirs'), 'MonoDepth')
path.log_path = os.path.join(path.project_path, 'log')
path.checkpoint_path = os.path.join(path.project_path, 'checkpoint')
path.preprocessed_path = os.path.join(path.project_path, 'output')
for d in (path.project_path, path.log_path, path.checkpoint_path,
          path.preprocessed_path):
    os.makedirs(d, exist_ok=True)
cfg.path = path

cfg.optimizer = edict(
    type_name='adam',
    keywords=edict(lr=1e-4, weight_decay=0),
    clipped_gradient_norm=0.1,
)
cfg.scheduler = edict(
    type_name='ExponentialLR',
    keywords=edict(gamma=0.98),
)

data = edict(
    batch_size=8,
    num_workers=8,
    rgb_shape=(352, 1216, 3),
    train_dataset='KittiDepthMonoDataset',
    val_dataset='KittiDepthMonoValTestDataset',
    test_dataset='KittiDepthMonoValTestDataset',
)
data.augmentation = edict(
    rgb_mean=np.array([0.485, 0.456, 0.406]),
    rgb_std=np.array([0.229, 0.224, 0.225]),
    cropSize=(data.rgb_shape[0], data.rgb_shape[1]),
    crop_top_height=352,
)
data.train_augmentation = [
    edict(type_name='ConvertToFloat'),
    edict(type_name='PhotometricDistort',
          keywords=edict(distort_prob=1.0)),
    edict(type_name='CropTop', keywords=edict(output_height=352)),
    edict(type_name='RandomCropToWidth', keywords=edict(width=1216)),
    edict(type_name='RandomMirror', keywords=edict(mirror_prob=0.5)),
    edict(type_name='Normalize',
          keywords=edict(mean=data.augmentation.rgb_mean,
                         stds=data.augmentation.rgb_std)),
]
data.test_augmentation = [
    edict(type_name='ConvertToFloat'),
    edict(type_name='CropTop', keywords=edict(output_height=352)),
    edict(type_name='CropRight', keywords=edict(output_width=1216)),
    edict(type_name='Normalize',
          keywords=edict(mean=data.augmentation.rgb_mean,
                         stds=data.augmentation.rgb_std)),
]
cfg.data = data

detector = edict()
detector.name = 'MonoDepth'
detector.max_depth = 50
detector.output_channel = 1
detector.SI_loss_lambda = 0.3
detector.smooth_loss_weight = 0.003
detector.minor_weight = 0.0
detector.preprocessed_path = path.preprocessed_path
detector.backbone = edict(depth=34, pretrained=True, frozen_stages=-1,
                          num_stages=4, out_indices=(0, 1, 2, 3),
                          norm_eval=False, dilations=(1, 1, 1, 1))
cfg.detector = detector
