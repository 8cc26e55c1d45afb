"""Extra augmentation-op coverage: photometric chain, warp affine, shuffle,
ResizeToFx, RandomCropToWidth."""
import numpy as np

from visualdet3d_tpu.config import EasyDict as edict
from visualdet3d_tpu.data.augmentations import build_augmentator
from visualdet3d_tpu.data.kitti.kittidata import KittiObj

P2 = np.array([
    [721.5377, 0.0, 609.5593, 44.85728],
    [0.0, 721.5377, 172.854, 0.2163791],
    [0.0, 0.0, 1.0, 0.002745884],
], np.float64)


def _img(h=64, w=128):
    return np.random.default_rng(0).integers(0, 255, (h, w, 3), np.uint8)


def _obj():
    return KittiObj('Car 0.00 0 0.10 30.00 20.00 60.00 50.00 '
                    '1.50 1.60 3.90 2.00 1.60 12.00 0.10')


def test_photometric_distort_changes_pixels_not_geometry():
    aug = build_augmentator([
        edict(type_name='ConvertToFloat'),
        edict(type_name='PhotometricDistort', keywords=edict(distort_prob=1.0)),
    ])
    img = _img()
    obj = _obj()
    out_img, p2, labels = aug(img, p2=P2.copy(), labels=[obj])
    assert out_img.shape == img.shape
    assert not np.allclose(out_img, img.astype(np.float32))
    np.testing.assert_allclose(p2, P2)  # photometric ops never touch calib
    assert labels[0].bbox_l == 30.0


def test_random_warp_affine_calibration_consistency():
    np.random.seed(0)
    aug = build_augmentator([
        edict(type_name='ConvertToFloat'),
        edict(type_name='RandomWarpAffine',
              keywords=edict(scale_lower=0.9, scale_upper=1.1, shift_border=8,
                             output_w=96, output_h=48)),
    ])
    img = _img()
    obj = _obj()
    out_img, p2, labels = aug(img, p2=P2.copy(), labels=[obj])
    assert out_img.shape == (48, 96, 3)
    # projecting a 3D point with the edited P2 must land at the affine-mapped
    # position of its original projection
    pt = np.array([2.0, 1.0, 15.0, 1.0])
    before = P2 @ pt
    u0, v0 = before[0] / before[2], before[1] / before[2]
    after = p2 @ pt
    u1, v1 = after[0] / after[2], after[1] / after[2]
    scale = p2[0, 0] / P2[0, 0]
    # consistency: the label box moved by the same transform
    assert abs((labels[0].bbox_l - obj_bbox_l_expected(obj, scale, p2, P2)) ) < 1e-3


def obj_bbox_l_expected(obj, scale, p2, P2_orig):
    shift_w = p2[0, 2] - P2_orig[0, 2] * scale
    return 30.0 * scale + shift_w


def test_shuffle_applies_all_ops():
    np.random.seed(1)
    aug = build_augmentator([
        edict(type_name='ConvertToFloat'),
        edict(type_name='Shuffle', keywords=edict(aug_list=[
            edict(type_name='RandomBrightness',
                  keywords=edict(distort_prob=1.0, delta=32)),
            edict(type_name='RandomContrast',
                  keywords=edict(distort_prob=1.0, lower=1.2, upper=1.4)),
        ])),
    ])
    img = _img()
    out_img, = aug(img)
    assert not np.allclose(out_img, img.astype(np.float32))


def test_resize_to_fx():
    aug = build_augmentator([
        edict(type_name='ConvertToFloat'),
        edict(type_name='ResizeToFx', keywords=edict(Fx=360.0)),
    ])
    img = _img(64, 128)
    out_img, p2 = aug(img, p2=P2.copy())
    np.testing.assert_allclose(p2[0, 0], 360.0, rtol=0.02)


def test_random_crop_to_width_preserves_projection():
    np.random.seed(2)
    aug = build_augmentator([
        edict(type_name='ConvertToFloat'),
        edict(type_name='RandomCropToWidth', keywords=edict(width=96)),
    ])
    img = _img(64, 128)
    out_img, p2 = aug(img, p2=P2.copy())
    assert out_img.shape[1] == 96
    pt = np.array([2.0, 1.0, 15.0, 1.0])
    before = P2 @ pt
    after = p2 @ pt
    shift = (before[0] / before[2]) - (after[0] / after[2])
    assert 0 <= shift <= 128 - 96 + 1e-6
    # vertical projection untouched
    np.testing.assert_allclose(after[1] / after[2], before[1] / before[2],
                               rtol=1e-9)
