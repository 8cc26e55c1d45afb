"""YOLOStereo3D stereo 3D detection on KITTI (the benchmark flagship).

Mirrors the reference template config/Stereo3D_example.
  python scripts/imdb_precompute_3d.py --config=configs/stereo3d.py
  python scripts/disparity_compute.py --config=configs/stereo3d.py
  python scripts/train.py --config=configs/stereo3d.py
"""
import os

import numpy as np

from visualdet3d_tpu.config import EasyDict as edict

cfg = edict()
cfg.obj_types = ['Car', 'Pedestrian']

cfg.trainer = edict(
    gpu=0,
    max_epochs=80,
    disp_iter=100,
    save_iter=5,
    test_iter=10,
    training_func='train_stereo_detection',
    test_func='test_stereo_detection',
    evaluate_func='evaluate_kitti_obj',
    # compute_dtype='bfloat16': optional mixed-precision training
    # (bf16 compute / f32 master params+grads, pipelines/train_state.py) —
    # measured 59.5 img/s at batch 16 vs 46.4 for f32 batch 8 on one v5e.
    # The torch reference trains pure f32, so f32 stays the default.
)

path = edict()
path.data_path = os.environ.get('KITTI_OBJ_PATH', '/data/kitti_obj/training')
path.test_path = os.environ.get('KITTI_OBJ_TEST_PATH', '/data/kitti_obj/testing')
path.project_path = os.environ.get('VD3D_WORKDIR', './workdirs')
path.project_path = os.path.join(path.project_path, 'Stereo3D')
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
    type_name='CosineAnnealingLR',
    keywords=edict(T_max=cfg.trainer.max_epochs, eta_min=5e-6),
)

data = edict(
    batch_size=4,
    num_workers=4,
    rgb_shape=(288, 1280, 3),
    train_dataset='KittiStereoDataset',
    val_dataset='KittiStereoDataset',
    test_dataset='KittiStereoTestDataset',
    train_split_file=os.path.join(
        os.path.dirname(__file__), '..', 'splits', 'chen_split', 'train.txt'),
    val_split_file=os.path.join(
        os.path.dirname(__file__), '..', 'splits', 'chen_split', 'val.txt'),
)
data.augmentation = edict(
    rgb_mean=np.array([0.485, 0.456, 0.406]),
    rgb_std=np.array([0.229, 0.224, 0.225]),
    cropSize=(data.rgb_shape[0], data.rgb_shape[1]),
    crop_top=100,
)
data.train_augmentation = [
    edict(type_name='ConvertToFloat'),
    edict(type_name='PhotometricDistort',
          keywords=edict(distort_prob=1.0, contrast_lower=0.5, contrast_upper=1.5,
                         saturation_lower=0.5, saturation_upper=1.5,
                         hue_delta=18.0, brightness_delta=32)),
    edict(type_name='CropTop', keywords=edict(crop_top_index=data.augmentation.crop_top)),
    edict(type_name='Resize', keywords=edict(size=data.augmentation.cropSize)),
    edict(type_name='RandomMirror', keywords=edict(mirror_prob=0.5)),
    edict(type_name='Normalize',
          keywords=edict(mean=data.augmentation.rgb_mean, stds=data.augmentation.rgb_std)),
]
data.test_augmentation = [
    edict(type_name='ConvertToFloat'),
    edict(type_name='CropTop', keywords=edict(crop_top_index=data.augmentation.crop_top)),
    edict(type_name='Resize', keywords=edict(size=data.augmentation.cropSize)),
    edict(type_name='Normalize',
          keywords=edict(mean=data.augmentation.rgb_mean, stds=data.augmentation.rgb_std)),
]
cfg.data = data

detector = edict()
detector.obj_types = cfg.obj_types
detector.name = 'Stereo3D'
detector.max_disparity = 96
detector.backbone = edict(
    depth=34, pretrained=True, frozen_stages=-1, num_stages=3,
    out_indices=(0, 1, 2), norm_eval=True, dilations=(1, 1, 1), s2d_stem=True,
)
head_loss = edict(
    fg_iou_threshold=0.5,
    bg_iou_threshold=0.4,
    L1_regression_alpha=5 ** 2,
    focal_loss_gamma=2.0,
    balance_weight=[20.0, 40],
    regression_weight=[1, 1, 1, 1, 1, 1, 12, 1, 1, 0.5, 0.5, 0.5, 1],
)
head_test = edict(
    score_thr=0.75,
    cls_agnostic=False,
    nms_iou_thr=0.4,
    post_optimization=False,
)
anchors = edict(
    pyramid_levels=[4],
    strides=[2 ** 4],
    sizes=[24],
    ratios=np.array([0.5, 1, 2.0]),
    scales=np.array([2 ** (i / 4.0) for i in range(16)]),
)
head_layer = edict(
    num_features_in=1408,
    num_cls_output=len(cfg.obj_types) + 1,
    num_reg_output=12,
    cls_feature_size=256,
    reg_feature_size=1408,
)
detector.head = edict(
    num_regression_loss_terms=13,
    preprocessed_path=path.preprocessed_path,
    num_classes=len(cfg.obj_types),
    anchors_cfg=anchors,
    layer_cfg=head_layer,
    loss_cfg=head_loss,
    test_cfg=head_test,
)
detector.anchors = anchors
detector.loss = head_loss
cfg.detector = detector
