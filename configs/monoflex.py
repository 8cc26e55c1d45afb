"""MonoFlex center-based monocular 3D detection on KITTI."""
import os

import numpy as np

from visualdet3d_tpu.config import EasyDict as edict

cfg = edict()
cfg.obj_types = ['Car']

cfg.trainer = edict(
    gpu=0,
    max_epochs=100,
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
path.project_path = os.path.join(os.environ.get('VD3D_WORKDIR', './workdirs'), 'MonoFlex')
path.log_path = os.path.join(path.project_path, 'log')
path.checkpoint_path = os.path.join(path.project_path, 'checkpoint')
path.preprocessed_path = os.path.join(path.project_path, 'output')
for d in (path.project_path, path.log_path, path.checkpoint_path,
          path.preprocessed_path):
    os.makedirs(d, exist_ok=True)
cfg.path = path

cfg.optimizer = edict(
    type_name='adam',
    keywords=edict(lr=3e-4, weight_decay=0),
    clipped_gradient_norm=35.0,
)
cfg.scheduler = edict(
    type_name='MultiStepLR',
    keywords=edict(milestones=[60, 80], gamma=0.1),
)

data = edict(
    batch_size=8,
    num_workers=8,
    rgb_shape=(384, 1280, 3),
    train_dataset='KittiMonoFlexDataset',
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
    edict(type_name='Resize',
          keywords=edict(size=data.augmentation.cropSize,
                         preserve_aspect_ratio=False)),
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
detector.name = 'MonoFlex'
detector.backbone = edict(name='dla', depth=34)
detector.head = edict(
    num_classes=len(cfg.obj_types),
    num_joints=10,
    max_objects=32,
    layer_cfg=edict(
        input_features=64,
        head_features=256,
        head_dict={'hm': len(cfg.obj_types), 'bbox2d': 4, 'hps': 20, 'rot': 8,
                   'dim': 3, 'depth': 1, 'depth_uncertainty': 1,
                   'corner_uncertainty': 3, 'reg': 2},
    ),
    loss_cfg=edict(uncertainty_range=[-10, 10], uncertainty_weight=1.0),
    test_cfg=edict(score_thr=0.1, cls_agnostic=True, nms_iou_thr=0.5,
                   top_k=100, post_optimization=False),
)
cfg.detector = detector
