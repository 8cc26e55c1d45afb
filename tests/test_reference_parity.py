"""Golden-parity tests: the rebuild vs the installed PyTorch reference.

Each test runs the *actual reference code* from /root/reference (CPU torch,
import shims in reference_shim.py) and our jnp/numpy implementation on
identical randomized inputs, asserting numerical equality. This is the
de-risking evidence for the "KITTI-val 3D AP within 0.2 of the reference"
north-star (BASELINE.md) without needing real KITTI data.

Covered subsystems (reference file:line):
  1. anchor generation + prior binning + geometric filter (anchors.py:59-238)
  2. 12-term encode/decode (detection_3d_head.py:176-263)
  3. max-IoU assigner incl. low-quality matches (detection_3d_head.py:101-174)
  4. sigmoid focal + modified smooth-L1 losses (losses.py:11-91)
  5. disparity->probability volumes (disparity_loss/disp2prob.py:102-142)
  6. calibration-editing augmentations CropTop/RandomMirror/Resize
     (stereo_augmentator.py:214-259, 374-438, 63-135)
  7. RTM3D gen_position least-squares 3D solve (rtm3d_utils.py:314-455)
  8. the full KITTI AP evaluator on 50 synthetic frames (eval.py:476-790)
"""
import copy
import math
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))

torch = pytest.importorskip('torch')

import jax.numpy as jnp

import reference_shim

# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------

RNG = np.random.default_rng(1234)


def _rand_anchor_boxes(n, lo=0, hi=900):
    x1 = RNG.uniform(lo, hi - 80, n)
    y1 = RNG.uniform(lo, hi - 80, n)
    w = RNG.uniform(8, 120, n)
    h = RNG.uniform(8, 120, n)
    return np.stack([x1, y1, x1 + w, y1 + h], axis=1).astype(np.float32)


def _rand_ann_rows(n, num_classes=2):
    """[x1 y1 x2 y2 cls cx cy z w h l alpha] rows."""
    boxes = _rand_anchor_boxes(n)
    cls = RNG.integers(0, num_classes, n).astype(np.float32)
    cx = (boxes[:, 0] + boxes[:, 2]) / 2 + RNG.uniform(-3, 3, n)
    cy = (boxes[:, 1] + boxes[:, 3]) / 2 + RNG.uniform(-3, 3, n)
    z = RNG.uniform(5, 60, n)
    w3 = RNG.uniform(1.4, 1.9, n)
    h3 = RNG.uniform(1.3, 1.8, n)
    l3 = RNG.uniform(3.0, 4.5, n)
    alpha = RNG.uniform(-np.pi, np.pi, n)
    return np.stack([boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3],
                     cls, cx, cy, z, w3, h3, l3, alpha], axis=1).astype(np.float32)


# ---------------------------------------------------------------------------
# 1. Anchors
# ---------------------------------------------------------------------------

class TestAnchorParity:

    @pytest.fixture(scope='class')
    def prior_dir(self, tmp_path_factory):
        """Synthetic anchor_mean/std npys: [16 scales, 2 ratios, 6]."""
        d = tmp_path_factory.mktemp('priors')
        os.makedirs(d / 'training', exist_ok=True)
        rng = np.random.default_rng(7)
        for t in ('Car', 'Pedestrian'):
            mean = rng.uniform(5, 50, (16, 2, 6))
            std = rng.uniform(0.5, 10, (16, 2, 6))
            # starve a few bins the way imdb_precompute does (mean -100/std 1e10)
            mean[::5, 0] = -100.0
            std[::5, 0] = 1e10
            np.save(d / 'training' / f'anchor_mean_{t}.npy', mean.astype(np.float32))
            np.save(d / 'training' / f'anchor_std_{t}.npy', std.astype(np.float32))
        return str(d)

    def test_anchors_and_filter(self, prior_dir):
        ref_anchors_mod = reference_shim.import_ref('visualDet3D.networks.heads.anchors')
        from visualdet3d_tpu.models.heads.anchors import Anchors

        kw = dict(pyramid_levels=[4], strides=[16], sizes=[24],
                  ratios=np.array([0.5, 1.0]),
                  scales=np.array([2 ** (i / 4.0) for i in range(16)]))
        obj_types = ['Car', 'Pedestrian']

        ref = ref_anchors_mod.Anchors(preprocessed_path=prior_dir,
                                      readConfigFile=1, obj_types=obj_types, **kw)
        ours = Anchors(preprocessed_path=prior_dir, read_config_file=True,
                       obj_types=obj_types, **kw)

        image = torch.zeros(2, 3, 288, 1280)
        P2 = np.array([[721.54, 0, 609.56, 44.86],
                       [0, 721.54, 172.85, 0.22],
                       [0, 0, 1, 0.0027]], np.float32)
        P2_b = torch.tensor(np.stack([P2, P2 * np.float32(1.02)]))

        ref_out = ref(image, P2_b, is_filtering=True)
        ref_anchors, ref_mask, ref_mean_std = [t.detach().numpy() for t in ref_out]

        pack = ours.get((288, 1280))
        our_mask = np.asarray(ours.useful_mask(pack, jnp.asarray(P2_b.numpy())))

        np.testing.assert_allclose(ref_anchors[0], pack['anchors'], atol=1e-3)
        np.testing.assert_allclose(ref_mean_std, pack['anchor_mean_std'],
                                   atol=1e-5)
        assert ref_mask.shape == our_mask.shape
        np.testing.assert_array_equal(ref_mask.astype(bool), our_mask)

    def test_anchors2indexes(self, prior_dir):
        ref_anchors_mod = reference_shim.import_ref('visualDet3D.networks.heads.anchors')
        from visualdet3d_tpu.models.heads.anchors import Anchors
        kw = dict(pyramid_levels=[4], strides=[16], sizes=[24],
                  ratios=np.array([0.5, 1.0]),
                  scales=np.array([2 ** (i / 4.0) for i in range(16)]))
        ref = ref_anchors_mod.Anchors(preprocessed_path=prior_dir,
                                      readConfigFile=0, **kw)
        ours = Anchors(read_config_file=False, **kw)
        boxes = _rand_anchor_boxes(500)
        rs, rr = ref.anchors2indexes(boxes)
        os_, or_ = ours.anchors2indexes(boxes)
        np.testing.assert_array_equal(rs, os_)
        np.testing.assert_array_equal(rr, or_)


# ---------------------------------------------------------------------------
# 2+3. Head codec + assigner
# ---------------------------------------------------------------------------

class TestHeadCodecParity:

    @pytest.fixture(scope='class')
    def ref_head(self):
        mod = reference_shim.import_ref(
            'visualDet3D.networks.heads.detection_3d_head')
        return mod.AnchorBasedDetection3DHead

    def test_encode(self, ref_head):
        from visualdet3d_tpu.models.heads import target_coding
        n = 256
        anchors = _rand_anchor_boxes(n)
        gt = _rand_ann_rows(n)
        mean_std = np.stack([RNG.uniform(1, 40, (n, 6)),
                             RNG.uniform(0.5, 8, (n, 6))], axis=-1).astype(np.float32)

        ref_t, ref_alpha = ref_head._encode(
            None, torch.tensor(anchors), torch.tensor(gt), torch.tensor(mean_std))
        our_t, our_alpha = target_coding.encode(
            jnp.asarray(anchors), jnp.asarray(gt), jnp.asarray(mean_std))

        np.testing.assert_allclose(ref_t.numpy(), np.asarray(our_t),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_array_equal(ref_alpha.numpy(), np.asarray(our_alpha))

    def test_decode(self, ref_head):
        from visualdet3d_tpu.models.heads import target_coding
        n, t = 256, 2
        anchors = _rand_anchor_boxes(n)
        deltas = RNG.normal(0, 1, (n, 12)).astype(np.float32)
        mean_std = np.stack([RNG.uniform(1, 40, (n, t, 6)),
                             RNG.uniform(0.5, 8, (n, t, 6))], axis=-1).astype(np.float32)
        labels = RNG.integers(0, t, n)
        alpha_score = RNG.uniform(0, 1, (n, 1)).astype(np.float32)

        ref_boxes, ref_mask = ref_head._decode(
            None, torch.tensor(anchors), torch.tensor(deltas),
            torch.tensor(mean_std), torch.tensor(labels), torch.tensor(alpha_score))

        sel = target_coding.select_mean_std_by_class(jnp.asarray(mean_std),
                                                     jnp.asarray(labels))
        our_boxes, our_mask = target_coding.decode(
            jnp.asarray(anchors), jnp.asarray(deltas), sel,
            jnp.asarray(alpha_score))

        np.testing.assert_allclose(ref_boxes.numpy(), np.asarray(our_boxes),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_array_equal(ref_mask.numpy(), np.asarray(our_mask))

    @pytest.mark.parametrize('match_low_quality', [False, True])
    def test_assign(self, ref_head, match_low_quality):
        from visualdet3d_tpu.models.heads.detection_3d_head import assign_anchors
        n, m = 600, 7
        anchors = _rand_anchor_boxes(n, hi=500)
        ann = _rand_ann_rows(m)
        # make some anchors exact GT copies so fg matches exist
        anchors[:m] = ann[:, :4]

        ref_res = ref_head._assign(
            None, torch.tensor(anchors), torch.tensor(ann),
            bg_iou_threshold=0.4, fg_iou_threshold=0.5,
            min_iou_threshold=0.0, match_low_quality=match_low_quality)
        ref_assigned = ref_res['assigned_gt_inds'].numpy()  # -1 ign, 0 neg, i+1 pos

        our = assign_anchors(jnp.asarray(anchors), jnp.asarray(ann),
                             jnp.ones(n, bool), fg_iou_threshold=0.5,
                             bg_iou_threshold=0.4,
                             match_low_quality=match_low_quality)
        pos = np.asarray(our['pos_mask'])
        neg = np.asarray(our['neg_mask'])
        gt_index = np.asarray(our['gt_index'])

        np.testing.assert_array_equal(ref_assigned > 0, pos)
        np.testing.assert_array_equal(ref_assigned == 0, neg)
        np.testing.assert_array_equal(ref_assigned[pos] - 1, gt_index[pos])


# ---------------------------------------------------------------------------
# 4. Losses
# ---------------------------------------------------------------------------

class TestLossParity:

    def test_sigmoid_focal(self):
        mod = reference_shim.import_ref('visualDet3D.networks.heads.losses')
        from visualdet3d_tpu.models.heads.losses import sigmoid_focal_loss
        logits = RNG.normal(0, 3, (4, 128, 2)).astype(np.float32)
        targets = RNG.choice([-1.0, 0.0, 1.0], (4, 128, 2),
                             p=[0.2, 0.6, 0.2]).astype(np.float32)
        bw = torch.tensor([20.0])
        ref = mod.SigmoidFocalLoss(gamma=2.0, balance_weights=bw)(
            torch.tensor(logits), torch.tensor(targets)).numpy()
        ours = np.asarray(sigmoid_focal_loss(jnp.asarray(logits),
                                             jnp.asarray(targets), gamma=2.0,
                                             balance_weights=20.0))
        np.testing.assert_allclose(ref, ours, rtol=1e-5, atol=1e-6)

    def test_modified_smooth_l1(self):
        mod = reference_shim.import_ref('visualDet3D.networks.heads.losses')
        from visualdet3d_tpu.models.heads.losses import modified_smooth_l1
        t = RNG.normal(0, 1, (256, 12)).astype(np.float32)
        p = t + RNG.normal(0, 0.3, (256, 12)).astype(np.float32)
        p[:40] = t[:40] + RNG.uniform(-0.009, 0.009, (40, 12)).astype(np.float32)
        ref = mod.ModifiedSmoothL1Loss(25.0)(torch.tensor(t), torch.tensor(p)).numpy()
        ours = np.asarray(modified_smooth_l1(jnp.asarray(t), jnp.asarray(p), 25.0))
        np.testing.assert_allclose(ref, ours, rtol=1e-5, atol=1e-6)


# ---------------------------------------------------------------------------
# 5. disp2prob
# ---------------------------------------------------------------------------

class TestDisp2ProbParity:

    # 'onehot' is not comparable: the reference OneHotDisp2Prob.getProb
    # (disp2prob.py:130-142) reads ``self.index``, which is only set by the
    # base getProb it overrides — the reference class cannot execute at all.
    @pytest.mark.parametrize('kind', ['laplace', 'gaussian'])
    def test_prob_volume(self, kind):
        mod = reference_shim.import_ref(
            'visualDet3D.networks.lib.disparity_loss.disp2prob')
        from visualdet3d_tpu.models.heads import losses as our_losses
        b, h, w, d = 2, 12, 16, 24
        gt = RNG.uniform(-2, d + 4, (b, h, w)).astype(np.float32)
        gt[gt < 0] = 0.0

        ref_cls = {'laplace': mod.LaplaceDisp2Prob,
                   'gaussian': mod.GaussianDisp2Prob,
                   'onehot': mod.OneHotDisp2Prob}[kind]
        ref = ref_cls(d, torch.tensor(gt), variance=0.5).getProb().numpy()
        ref = np.transpose(ref, (0, 2, 3, 1))  # [B,D,H,W] -> [B,H,W,D]

        our_fn = {'laplace': our_losses.laplace_disp_probability,
                  'gaussian': our_losses.gaussian_disp_probability,
                  'onehot': our_losses.onehot_disp_probability}[kind]
        ours, _ = our_fn(jnp.asarray(gt), d, variance=0.5)
        np.testing.assert_allclose(ref, np.asarray(ours), rtol=1e-5, atol=1e-7)


# ---------------------------------------------------------------------------
# 6. Augmentation calibration edits
# ---------------------------------------------------------------------------

def _label_lines():
    return [
        'Car 0.00 0 -1.55 300.0 160.0 420.0 260.0 1.50 1.60 3.90 2.00 1.60 12.00 -1.40',
        'Car 0.00 1 1.85 700.0 170.0 820.0 240.0 1.45 1.65 4.10 -3.00 1.70 20.00 2.00',
        'Pedestrian 0.10 0 0.40 500.0 150.0 540.0 280.0 1.75 0.60 0.80 0.50 1.60 9.00 0.45',
    ]


def _make_objs(kittidata_mod):
    return [kittidata_mod.KittiObj(line) for line in _label_lines()]


class TestAugmentationParity:

    P2 = np.array([[721.5377, 0.0, 609.5593, 44.85728],
                   [0.0, 721.5377, 172.854, 0.2163791],
                   [0.0, 0.0, 1.0, 0.002745884]])
    P3 = np.array([[721.5377, 0.0, 609.5593, -339.5242],
                   [0.0, 721.5377, 172.854, 2.199936],
                   [0.0, 0.0, 1.0, 0.002745884]])

    def _make_images(self, kind='float'):
        rng = np.random.default_rng(0)
        left = rng.integers(0, 255, (370, 1224, 3))
        right = rng.integers(0, 255, (370, 1224, 3))
        if kind == 'uint8':
            return left.astype(np.uint8), right.astype(np.uint8)
        left = left.astype(np.float32)
        right = right.astype(np.float32)
        if kind == 'hsv':
            import cv2
            return (cv2.cvtColor(left, cv2.COLOR_RGB2HSV),
                    cv2.cvtColor(right, cv2.COLOR_RGB2HSV))
        return left, right

    def _run_pair(self, ref_aug, our_aug, seed=None, image_kind='float'):
        """Run reference tuple-API aug and our dict-API aug on identical
        inputs (optionally with identical np.random seeding — both consume
        the same global-RNG draw sequence) and assert equal outputs."""
        ref_kittidata = reference_shim.import_ref('visualDet3D.data.kitti.kittidata')
        from visualdet3d_tpu.data import kitti as our_kitti_pkg  # noqa: F401
        from visualdet3d_tpu.data.kitti import kittidata as our_kittidata

        left, right = self._make_images(image_kind)

        if seed is not None:
            np.random.seed(seed)
        r = ref_aug(left.copy(), right.copy(), self.P2.copy(), self.P3.copy(),
                    _make_objs(ref_kittidata))
        ref_left, ref_right, ref_p2, ref_p3, ref_labels = r[:5]

        s = dict(left_image=left.copy(), right_image=right.copy(),
                 p2=self.P2.copy(), p3=self.P3.copy(),
                 labels=_make_objs(our_kittidata), image_gt=None, lidar=None)
        if seed is not None:
            np.random.seed(seed)
        s = our_aug(s)

        np.testing.assert_allclose(ref_left, s['left_image'], atol=1e-4)
        np.testing.assert_allclose(ref_right, s['right_image'], atol=1e-4)
        np.testing.assert_allclose(ref_p2, s['p2'], atol=1e-9)
        np.testing.assert_allclose(ref_p3, s['p3'], atol=1e-9)
        assert len(ref_labels) == len(s['labels'])
        for ro, oo in zip(ref_labels, s['labels']):
            for attr in ('bbox_l', 'bbox_t', 'bbox_r', 'bbox_b',
                         'x', 'y', 'z', 'ry', 'alpha'):
                assert np.isclose(getattr(ro, attr), getattr(oo, attr),
                                  atol=1e-6), (attr, getattr(ro, attr),
                                               getattr(oo, attr))

    def test_crop_top(self):
        ref_mod = reference_shim.import_ref(
            'visualDet3D.data.pipeline.stereo_augmentator')
        from visualdet3d_tpu.data.augmentations import CropTop
        self._run_pair(ref_mod.CropTop(crop_top_index=100),
                       CropTop(crop_top_index=100))

    def test_random_mirror(self):
        ref_mod = reference_shim.import_ref(
            'visualDet3D.data.pipeline.stereo_augmentator')
        from visualdet3d_tpu.data.augmentations import RandomMirror
        # mirror_prob=2 -> both implementations always mirror regardless of rng
        self._run_pair(ref_mod.RandomMirror(mirror_prob=2.0),
                       RandomMirror(mirror_prob=2.0))

    def test_resize(self):
        ref_mod = reference_shim.import_ref(
            'visualDet3D.data.pipeline.stereo_augmentator')
        from visualdet3d_tpu.data.augmentations import Resize
        self._run_pair(ref_mod.Resize(size=(288, 1280)),
                       Resize(size=(288, 1280)))

    # -- r3: the remaining registered ops, seed-controlled where stochastic --

    def _ref_mod(self):
        return reference_shim.import_ref(
            'visualDet3D.data.pipeline.stereo_augmentator')

    def test_convert_to_float(self):
        from visualdet3d_tpu.data.augmentations import ConvertToFloat
        self._run_pair(self._ref_mod().ConvertToFloat(), ConvertToFloat(),
                       image_kind='uint8')

    def test_normalize(self):
        from visualdet3d_tpu.data.augmentations import Normalize
        mean, stds = [0.485, 0.456, 0.406], [0.229, 0.224, 0.225]
        self._run_pair(self._ref_mod().Normalize(np.array(mean), np.array(stds)),
                       Normalize(mean, stds))

    def test_resize_to_fx(self):
        from visualdet3d_tpu.data.augmentations import ResizeToFx
        self._run_pair(self._ref_mod().ResizeToFx(Fx=500.0),
                       ResizeToFx(Fx=500.0))

    def test_crop_right(self):
        from visualdet3d_tpu.data.augmentations import CropRight
        self._run_pair(self._ref_mod().CropRight(crop_right_index=100),
                       CropRight(crop_right_index=100))
        self._run_pair(self._ref_mod().CropRight(output_width=1000),
                       CropRight(output_width=1000))

    def test_filter_object(self):
        from visualdet3d_tpu.data.augmentations import FilterObject
        # CropTop-style shift pushes one object off-image, then filter
        from visualdet3d_tpu.data.augmentations import CropTop as OurCropTop
        ref_mod = self._ref_mod()

        def ref_chain(*a):
            a = ref_mod.CropTop(crop_top_index=250)(*a)
            return ref_mod.FilterObject()(*a)

        def our_chain(s):
            s = OurCropTop(crop_top_index=250)(s)
            return FilterObject()(s)

        self._run_pair(ref_chain, our_chain)

    def test_random_crop_to_width(self):
        from visualdet3d_tpu.data.augmentations import RandomCropToWidth
        self._run_pair(self._ref_mod().RandomCropToWidth(width=800),
                       RandomCropToWidth(width=800), seed=11)

    def test_random_warp_affine(self):
        from visualdet3d_tpu.data.augmentations import RandomWarpAffine
        kw = dict(scale_lower=0.6, scale_upper=1.4, shift_border=128,
                  output_w=1280, output_h=384)
        for seed in (0, 5):
            self._run_pair(self._ref_mod().RandomWarpAffine(**kw),
                           RandomWarpAffine(**kw), seed=seed)

    def test_random_saturation(self):
        from visualdet3d_tpu.data.augmentations import RandomSaturation
        self._run_pair(self._ref_mod().RandomSaturation(distort_prob=1.0),
                       RandomSaturation(distort_prob=1.0), seed=2,
                       image_kind='hsv')

    def test_random_hue(self):
        from visualdet3d_tpu.data.augmentations import RandomHue
        self._run_pair(self._ref_mod().RandomHue(distort_prob=1.0, delta=18.0),
                       RandomHue(distort_prob=1.0, delta=18.0), seed=3,
                       image_kind='hsv')

    def test_convert_color(self):
        from visualdet3d_tpu.data.augmentations import ConvertColor
        self._run_pair(self._ref_mod().ConvertColor(transform='HSV'),
                       ConvertColor(transform='HSV'))
        self._run_pair(self._ref_mod().ConvertColor(current='HSV',
                                                    transform='RGB'),
                       ConvertColor(current='HSV', transform='RGB'),
                       image_kind='hsv')

    def test_random_contrast(self):
        from visualdet3d_tpu.data.augmentations import RandomContrast
        self._run_pair(self._ref_mod().RandomContrast(distort_prob=1.0),
                       RandomContrast(distort_prob=1.0), seed=4)

    def test_random_brightness(self):
        from visualdet3d_tpu.data.augmentations import RandomBrightness
        self._run_pair(self._ref_mod().RandomBrightness(distort_prob=1.0),
                       RandomBrightness(distort_prob=1.0), seed=5)

    def test_random_eigenvalue_noise(self):
        from visualdet3d_tpu.data.augmentations import RandomEigenvalueNoise
        self._run_pair(self._ref_mod().RandomEigenvalueNoise(distort_prob=1.0),
                       RandomEigenvalueNoise(distort_prob=1.0), seed=6)

    def test_photometric_distort(self):
        from visualdet3d_tpu.data.augmentations import PhotometricDistort
        for seed in (7, 8, 9):  # hits both contrast-first/last branches
            self._run_pair(self._ref_mod().PhotometricDistort(distort_prob=0.8),
                           PhotometricDistort(distort_prob=0.8), seed=seed)

    def test_shuffle(self):
        """Shuffle over stochastic sub-ops: same permutation + sub-draws."""
        from visualdet3d_tpu.config import EasyDict
        from visualdet3d_tpu.data.augmentations import Shuffle
        aug_list = [
            EasyDict(type_name='RandomContrast',
                     keywords=EasyDict(distort_prob=1.0)),
            EasyDict(type_name='RandomBrightness',
                     keywords=EasyDict(distort_prob=1.0)),
            EasyDict(type_name='RandomEigenvalueNoise',
                     keywords=EasyDict(distort_prob=1.0)),
        ]
        ref_builder = reference_shim.import_ref(
            'visualDet3D.data.pipeline.stereo_augmentator')
        self._run_pair(ref_builder.Shuffle(aug_list), Shuffle(aug_list),
                       seed=10)


# ---------------------------------------------------------------------------
# 6b. KM3D / MonoFlex CenterNet target builders
# ---------------------------------------------------------------------------


class TestKM3DTargetParity:
    """RTM3D/MonoFlex _build_target parity (KM3D_dataset.py:57-221, :346-527):
    heatmap stamping with gaussian radii, index/offset/rot-bin targets,
    keypoint visibility + depth-validity masks, FCOS 2D targets, edge
    indices. Ours builds [H, W, C] heatmaps (NHWC); the reference [C, H, W]."""

    P2 = np.array([
        [721.5377, 0.0, 609.5593, 44.85728],
        [0.0, 721.5377, 172.854, 0.2163791],
        [0.0, 0.0, 1.0, 0.002745884],
    ], np.float32)
    IMAGE_HW = (384, 1280)

    def _objs(self, kittidata_mod, n=6, seed=12):
        rng = np.random.default_rng(seed)
        objs = []
        types = ['Car', 'Pedestrian']
        for i in range(n):
            o = kittidata_mod.KittiObj()
            o.type = types[i % 2]
            o.truncated, o.occluded = 0.0, 0
            o.x = float(rng.uniform(-12, 12))
            o.y = float(rng.uniform(1.2, 2.2))
            o.z = float(rng.uniform(6, 50))
            o.ry = float(rng.uniform(-np.pi, np.pi))
            o.h = float(rng.uniform(1.3, 1.8))
            o.w = float(rng.uniform(1.4, 1.9))
            o.l = float(rng.uniform(3.0, 4.5))
            o.alpha = o.ry - np.arctan2(o.x, o.z)
            u = 721.5377 * o.x / o.z + 609.5593
            v = 721.5377 * o.y / o.z + 172.854
            w2 = 721.5377 * o.l / o.z / 2
            h2 = 721.5377 * o.h / o.z / 2
            o.bbox_l, o.bbox_r = u - w2, u + w2
            o.bbox_t, o.bbox_b = v - h2 * 2, v
            objs.append(o)
        # one off-image object exercising the skip branches
        off = kittidata_mod.KittiObj()
        off.type, off.truncated, off.occluded = 'Car', 0.0, 0
        off.x, off.y, off.z, off.ry = 60.0, 1.6, 8.0, 0.5
        off.h, off.w, off.l = 1.5, 1.6, 3.9
        off.alpha = off.ry - np.arctan2(off.x, off.z)
        off.bbox_l, off.bbox_t, off.bbox_r, off.bbox_b = 1500, 100, 1600, 200
        objs.append(off)
        return objs

    def _ref_targets(self, cls_name):
        mod = reference_shim.import_ref('visualDet3D.data.kitti.dataset.KM3D_dataset')
        ref_kittidata = reference_shim.import_ref('visualDet3D.data.kitti.kittidata')
        utils_mod = reference_shim.import_ref('visualDet3D.networks.utils.utils')
        if not hasattr(np, 'long'):  # the reference uses removed np.long
            np.long = np.int64
        ds = object.__new__(getattr(mod, cls_name))
        ds.obj_types = ['Car', 'Pedestrian']
        ds.num_classes = 2
        ds.num_vertexes = 9 if cls_name == 'KittiRTM3DDataset' else 10
        ds.max_objects = 32
        ds.projector = utils_mod.BBox3dProjector()
        corners = {
            'KittiRTM3DDataset': [
                [-1, -1, -1], [1, -1, -1], [1, 1, -1], [1, 1, 1], [1, -1, 1],
                [-1, -1, 1], [-1, 1, 1], [-1, 1, -1], [0, 0, 0]],
            'KittiMonoFlexDataset': [
                [-1, -1, -1], [1, -1, -1], [1, 1, -1], [1, 1, 1], [1, -1, 1],
                [-1, -1, 1], [-1, 1, 1], [-1, 1, -1], [0, 1, 0], [0, -1, 0],
                [0, 0, 0]],
        }[cls_name]
        ds.projector.corner_matrix = torch.tensor(corners).float()
        image = np.zeros((*self.IMAGE_HW, 3), np.float32)
        return ds._build_target(image, self.P2.copy(), self._objs(ref_kittidata))

    def _our_targets(self, cls_name):
        from visualdet3d_tpu.data.kitti.dataset import km3d_dataset as ours
        from visualdet3d_tpu.data.kitti import kittidata as our_kittidata
        cls = {'KittiRTM3DDataset': ours.KittiRTM3DDataset,
               'KittiMonoFlexDataset': ours.KittiMonoFlexDataset}[cls_name]
        ds = object.__new__(cls)
        ds.obj_types = ['Car', 'Pedestrian']
        ds.num_classes = 2
        ds.num_vertexes = cls.num_vertexes
        ds.corner_matrix = cls.corner_matrix
        ds.max_objects = 32
        image = np.zeros((*self.IMAGE_HW, 3), np.float32)
        return ds._build_target(image, self.P2.copy(), self._objs(our_kittidata))

    @pytest.mark.parametrize('cls_name', ['KittiRTM3DDataset',
                                          'KittiMonoFlexDataset'])
    def test_build_target(self, cls_name):
        ref = self._ref_targets(cls_name)
        ours = self._our_targets(cls_name)
        assert set(ref.keys()) == set(ours.keys())
        for key in sorted(ref.keys()):
            r, o = np.asarray(ref[key]), np.asarray(ours[key])
            if key in ('hm', 'hm_hp'):
                r = np.transpose(r, (1, 2, 0))  # [C,H,W] -> ours [H,W,C]
            assert r.shape == o.shape, (key, r.shape, o.shape)
            np.testing.assert_allclose(r, o, rtol=1e-4, atol=1e-4,
                                       err_msg=f'target {key!r} mismatch')


# ---------------------------------------------------------------------------
# 6a2. Mono dataset _reproject
# ---------------------------------------------------------------------------


class TestReprojectParity:
    """Augment-then-reproject consistency rule (mono_dataset.py:62-94): after
    calibration-editing augmentation the 2D GT boxes are re-derived from the
    3D boxes + edited P2, and the image-frame bbox3d_state is rebuilt."""

    def test_reproject(self):
        mono_mod = reference_shim.import_ref(
            'visualDet3D.data.kitti.dataset.mono_dataset')
        ref_kittidata = reference_shim.import_ref('visualDet3D.data.kitti.kittidata')
        utils_mod = reference_shim.import_ref('visualDet3D.networks.utils.utils')
        from visualdet3d_tpu.data.kitti import kittidata as our_kittidata
        from visualdet3d_tpu.data.kitti.dataset.mono_dataset import (
            reproject_3d_boxes)

        P2 = np.array([[721.5377, 0.0, 609.5593, 44.85728],
                       [0.0, 721.5377, 172.854, 0.2163791],
                       [0.0, 0.0, 1.0, 0.002745884]])

        def objs(mod):
            return [mod.KittiObj(line) for line in _label_lines()]

        ds = object.__new__(mono_mod.KittiMonoDataset)
        ds.projector = utils_mod.BBox3dProjector()
        ds.is_reproject = True
        ref_labels, ref_state = ds._reproject(P2.copy(), objs(ref_kittidata))

        our_labels, our_state = reproject_3d_boxes(P2.copy(), objs(our_kittidata))

        np.testing.assert_allclose(ref_state, our_state, rtol=1e-4, atol=1e-4)
        for ro, oo in zip(ref_labels, our_labels):
            for attr in ('bbox_l', 'bbox_t', 'bbox_r', 'bbox_b', 'alpha'):
                assert np.isclose(getattr(ro, attr), getattr(oo, attr),
                                  atol=1e-3), (attr, getattr(ro, attr),
                                               getattr(oo, attr))


# ---------------------------------------------------------------------------
# 6c. KM3D / MonoFlex head losses
# ---------------------------------------------------------------------------


class TestKM3DHeadLossParity(TestKM3DTargetParity):
    """Full KM3D/MonoFlex training losses vs the reference heads
    (km3d_head.py:311-351, monoflex_head.py:181-236) on identical randomized
    head outputs + real builder targets. Reference maps are [B, C, H, W];
    ours [B, H, W, C]. The CUDA-only boxes_iou3d_gpu inside Position_loss is
    monkeypatched on the reference side to OUR (separately unit-tested)
    rotated-IoU3D so both sides share it and the comparison isolates the
    loss logic (same method as the r2 evaluator parity test)."""

    B = 2

    def _targets_batched(self, cls_name):
        from visualdet3d_tpu.data.kitti import kittidata as our_kittidata
        from visualdet3d_tpu.data.kitti.dataset import km3d_dataset as ours
        cls = {'KittiRTM3DDataset': ours.KittiRTM3DDataset,
               'KittiMonoFlexDataset': ours.KittiMonoFlexDataset}[cls_name]
        ds = object.__new__(cls)
        ds.obj_types = ['Car', 'Pedestrian']
        ds.num_classes = 2
        ds.num_vertexes = cls.num_vertexes
        ds.corner_matrix = cls.corner_matrix
        ds.max_objects = 32
        image = np.zeros((*self.IMAGE_HW, 3), np.float32)
        ts = [ds._build_target(image, self.P2.copy(),
                               self._objs(our_kittidata, n=4, seed=20 + i))
              for i in range(self.B)]
        skip = {'edge_indices'}
        return {k: np.stack([t[k] for t in ts]) for k in ts[0]
                if k not in skip}

    def _outputs(self, head_dict, targets, seed=31):
        """Random NHWC maps with realistic values stamped at GT centers so
        the least-squares position solve is well-conditioned."""
        rng = np.random.default_rng(seed)
        hm_h, hm_w = self.IMAGE_HW[0] // 4, self.IMAGE_HW[1] // 4
        out = {name: rng.normal(0, 0.1, (self.B, hm_h, hm_w, ch)).astype(np.float32)
               for name, ch in head_dict.items()}
        for b in range(self.B):
            for k in range(32):
                if not targets['reg_mask'][b, k]:
                    continue
                ind = int(targets['ind'][b, k])
                iy, ix = ind // hm_w, ind % hm_w
                if 'hps' in out:
                    n = out['hps'].shape[-1]
                    out['hps'][b, iy, ix] = (targets['hps'][b, k, :n] +
                                             rng.normal(0, 0.5, n))
                if 'dim' in out:
                    out['dim'][b, iy, ix] = (targets['dim'][b, k] +
                                             rng.normal(0, 0.05, 3))
                if 'rot' in out:
                    alpha = np.arctan2(targets['rots'][b, k, 0],
                                       targets['rots'][b, k, 1]) + \
                        rng.normal(0, 0.1)
                    r = np.array([1, 1, np.sin(alpha + np.pi / 2),
                                  np.cos(alpha + np.pi / 2),
                                  1, -1, np.sin(alpha - np.pi / 2),
                                  np.cos(alpha - np.pi / 2)], np.float32)
                    out['rot'][b, iy, ix] = r + rng.normal(0, 0.05, 8)
                if 'depth' in out:
                    out['depth'][b, iy, ix] = rng.normal(0, 1.0)
        return out

    def _to_ref(self, arr_dict):
        return {k: torch.tensor(np.moveaxis(v, -1, 1)) for k, v in arr_dict.items()}

    def _ref_targets_torch(self, targets):
        t = {}
        for k, v in targets.items():
            if k in ('hm', 'hm_hp'):
                v = np.moveaxis(v, -1, 1)
            t[k] = torch.tensor(v)
        return t

    def _patch_iou3d(self):
        ref_rtm = reference_shim.import_ref('visualDet3D.networks.utils.rtm3d_utils')
        from visualdet3d_tpu.ops.rotated_iou import boxes_iou3d

        def iou3d_stub(a, b):
            return torch.tensor(np.asarray(boxes_iou3d(
                jnp.asarray(a.detach().numpy()), jnp.asarray(b.detach().numpy()))))
        ref_rtm.boxes_iou3d_gpu = iou3d_stub

    def test_km3d_loss(self):
        from visualdet3d_tpu.config import EasyDict
        from visualdet3d_tpu.models.heads import km3d_head as our_head
        mod = reference_shim.import_ref('visualDet3D.networks.heads.km3d_head')
        self._patch_iou3d()

        hm_w = self.IMAGE_HW[1] // 4
        head_dict = {'hm': 2, 'wh': 2, 'hps': 18, 'rot': 8, 'dim': 3,
                     'prob': 1, 'reg': 2, 'hm_hp': 9, 'hp_offset': 2}
        targets = self._targets_batched('KittiRTM3DDataset')
        outputs = self._outputs(head_dict, targets)

        ref_head = mod.KM3DHead(
            num_classes=2, num_joints=9, max_objects=32,
            layer_cfg=EasyDict(input_features=8, head_features=4,
                               head_dict=head_dict),
            loss_cfg=EasyDict(output_w=hm_w, rampup_length=100),
            test_cfg=EasyDict())
        with torch.no_grad():
            ref_loss, ref_stats = ref_head.loss(
                self._to_ref(outputs), self._ref_targets_torch(targets),
                dict(P2=torch.tensor(np.tile(self.P2[None], (self.B, 1, 1))),
                     epoch=5))

        our_loss, our_stats = our_head.km3d_loss(
            {k: jnp.asarray(v) for k, v in outputs.items()},
            {k: jnp.asarray(v) for k, v in targets.items()},
            jnp.asarray(np.tile(self.P2[None], (self.B, 1, 1))),
            jnp.asarray(5.0), hm_w, rampup_length=100)

        for key in ('hm_loss', 'hp_loss', 'hm_hp_loss', 'hp_offset_loss',
                    'wh_loss', 'off_loss', 'dim_loss', 'rot_loss',
                    'prob_loss', 'coor_loss', 'box_score', 'total_loss'):
            r = float(ref_stats[key])
            o = float(np.asarray(our_stats[key]))
            # box_score is a diagnostic (excluded from the weighted total,
            # reference weight_dict :346-349) and is an IoU3D of two f32
            # least-squares solves — grant it the solve's error amplification
            rtol = 3e-2 if key == 'box_score' else 2e-3
            np.testing.assert_allclose(o, r, rtol=rtol, atol=2e-4,
                                       err_msg=f'KM3D {key} mismatch')
        np.testing.assert_allclose(float(np.asarray(our_loss)),
                                   float(ref_loss), rtol=2e-3, atol=2e-4)

    def test_monoflex_loss(self):
        from visualdet3d_tpu.config import EasyDict
        from visualdet3d_tpu.models.heads import monoflex_head as our_head
        mod = reference_shim.import_ref('visualDet3D.networks.heads.monoflex_head')
        self._patch_iou3d()

        head_dict = dict(our_head.MONOFLEX_HEAD_DICT)
        head_dict['hm'] = 2
        targets = self._targets_batched('KittiMonoFlexDataset')
        outputs = self._outputs(head_dict, targets)

        ref_head = mod.MonoFlexHead(
            num_classes=2, num_joints=10, max_objects=32,
            layer_cfg=EasyDict(input_features=8, head_features=4,
                               head_dict=head_dict),
            loss_cfg=EasyDict(uncertainty_range=[-10.0, 10.0],
                              uncertainty_weight=1.0),
            test_cfg=EasyDict())
        ref_targets = self._ref_targets_torch(targets)
        with torch.no_grad():
            ref_loss, ref_stats = ref_head.loss(
                self._to_ref(outputs), ref_targets,
                dict(P2=torch.tensor(np.tile(self.P2[None], (self.B, 1, 1))),
                     epoch=5))

        our_loss, our_stats = our_head.monoflex_loss(
            {k: jnp.asarray(v) for k, v in outputs.items()},
            {k: jnp.asarray(v) for k, v in targets.items()},
            jnp.asarray(np.tile(self.P2[None], (self.B, 1, 1))),
            jnp.asarray(5.0),
            uncertainty_range=(-10.0, 10.0), uncertainty_weight=1.0)

        for key in ('hm_loss', 'hp_loss', 'box2d_loss', 'off_loss',
                    'dim_loss', 'depth_loss', 'kpd_loss', 'rot_loss',
                    'soft_depth_loss', 'total_loss'):
            r = float(ref_stats[key])
            o = float(np.asarray(our_stats[key]))
            np.testing.assert_allclose(o, r, rtol=2e-3, atol=2e-4,
                                       err_msg=f'MonoFlex {key} mismatch')
        np.testing.assert_allclose(float(np.asarray(our_loss)),
                                   float(ref_loss), rtol=2e-3, atol=2e-4)


# ---------------------------------------------------------------------------
# 7. RTM3D gen_position
# ---------------------------------------------------------------------------

class TestGenPositionParity:

    def test_gen_position(self):
        mod = reference_shim.import_ref('visualDet3D.networks.utils.rtm3d_utils')
        from visualdet3d_tpu.models.heads import rtm3d_utils as ours

        b, k = 2, 8
        P2 = np.array([[721.54, 0, 609.56, 44.86],
                       [0, 721.54, 172.85, 0.22],
                       [0, 0, 1, 0.0027]], np.float32)
        calib = np.stack([P2, P2 * np.float32(1.01)])

        # plausible projected keypoints around image positions
        centers = RNG.uniform([200, 100], [1000, 300], (b, k, 2))
        kps = (centers[:, :, None, :] +
               RNG.uniform(-60, 60, (b, k, 9, 2))).reshape(b, k, 18).astype(np.float32)
        dim = RNG.uniform([1.4, 1.3, 3.0], [1.9, 1.8, 4.5], (b, k, 3)).astype(np.float32)
        rot = RNG.normal(0, 1, (b, k, 8)).astype(np.float32)
        # keep atan denominators away from 0 for a fair comparison
        rot[..., 3] = np.sign(rot[..., 3]) * (np.abs(rot[..., 3]) + 0.3)
        rot[..., 7] = np.sign(rot[..., 7]) * (np.abs(rot[..., 7]) + 0.3)

        const = torch.tensor(
            [[-1, 0], [0, -1]] * 8, dtype=torch.float32).reshape(1, 1, 16, 2)
        torch.manual_seed(0)
        ref_pos, ref_roty, ref_alpha, _ = mod.gen_position(
            torch.tensor(kps), torch.tensor(dim), torch.tensor(rot),
            {'calib': torch.tensor(calib)}, const)

        our_pos, our_roty, our_alpha, _ = ours.gen_position(
            jnp.asarray(kps), jnp.asarray(dim), jnp.asarray(rot),
            jnp.asarray(calib))

        np.testing.assert_allclose(ref_alpha.numpy().reshape(b, k),
                                   np.asarray(our_alpha).reshape(b, k),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(ref_roty.numpy().reshape(b, k),
                                   np.asarray(our_roty).reshape(b, k),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(ref_pos.numpy(), np.asarray(our_pos),
                                   rtol=1e-3, atol=2e-3)


# ---------------------------------------------------------------------------
# 7b. Decode + NMS end-to-end (get_bboxes)
# ---------------------------------------------------------------------------


class TestGetBboxesParity:
    """End-to-end inference decode parity: threshold -> decode -> clip -> NMS
    -> truncation, vs the reference get_bboxes
    (detection_3d_head.py:341-400) with torchvision-semantics NMS
    (reference_shim greedy oracle).

    Notes on reference quirks pinned here:
      * the reference indexes ``label[keep_inds]`` with the decode z-prior
        mask NOT applied to ``label`` — a latent misalignment whenever the
        prior mask drops a row; we therefore generate priors with all-valid
        z means (the deployed regime: imdb_precompute always writes z > 0
        for populated bins) so the comparison is well-defined;
      * the cls_agnostic=False branch calls ``label.float().unsqueeze()``
        (missing dim arg -> TypeError): unrunnable in the reference, so only
        the (default) class-agnostic path is comparable.
    """

    NUM_CLASSES = 2
    IMAGE_HW = (288, 1280)

    def _make_head(self, score_thr, nms_iou_thr):
        mod = reference_shim.import_ref(
            'visualDet3D.networks.heads.detection_3d_head')
        utils_mod = reference_shim.import_ref('visualDet3D.networks.utils.utils')
        from visualdet3d_tpu.config import EasyDict
        h = object.__new__(mod.AnchorBasedDetection3DHead)
        torch.nn.Module.__init__(h)
        h.num_classes = self.NUM_CLASSES
        h.test_cfg = EasyDict(score_thr=score_thr, nms_iou_thr=nms_iou_thr,
                              cls_agnositc=True, post_optimization=False)
        h.clipper = utils_mod.ClipBoxes()
        return h

    def _random_inputs(self, n, seed, frac_hot=0.05, hot_logit=3.0):
        rng = np.random.default_rng(seed)
        anchors = _rand_anchor_boxes(n, hi=1200)
        # priors: all-valid z means (see class docstring)
        mean = np.stack([rng.uniform(5, 50, (n, self.NUM_CLASSES, 6))], -1)[..., 0]
        mean[:, :, 0] = rng.uniform(5, 50, (n, self.NUM_CLASSES))  # z > 0
        std = rng.uniform(0.5, 8, (n, self.NUM_CLASSES, 6))
        mean_std = np.stack([mean, std], axis=-1).astype(np.float32)
        cls_logits = rng.normal(-4, 1, (n, self.NUM_CLASSES + 1)).astype(np.float32)
        hot = rng.random(n) < frac_hot
        cls_logits[hot, :self.NUM_CLASSES] += hot_logit
        reg = rng.normal(0, 0.4, (n, 12)).astype(np.float32)
        useful = rng.random(n) < 0.8
        return anchors, mean_std, cls_logits, reg, useful

    def _run_ref(self, head, anchors, mean_std, cls_logits, reg, useful):
        anchors_dict = {
            'anchors': torch.tensor(anchors)[None],
            'anchor_mean_std_3d': torch.tensor(mean_std),
            'mask': torch.tensor(useful)[None],
        }
        img_batch = torch.zeros(1, 3, *self.IMAGE_HW)
        with torch.no_grad():
            scores, bboxes, labels = head.get_bboxes(
                torch.tensor(cls_logits)[None], torch.tensor(reg)[None],
                anchors_dict, None, img_batch)
        return scores.numpy(), bboxes.numpy(), labels.numpy()

    def _run_ours(self, anchors, mean_std, cls_logits, reg, useful,
                  score_thr, nms_iou_thr, max_detections):
        from visualdet3d_tpu.models.heads.detection_3d_head import get_bboxes
        scores, boxes, labels, valid = get_bboxes(
            jnp.asarray(cls_logits), jnp.asarray(reg),
            jnp.asarray(anchors), jnp.asarray(mean_std),
            jnp.asarray(useful),
            num_classes=self.NUM_CLASSES, image_hw=self.IMAGE_HW,
            score_thr=score_thr, nms_iou_thr=nms_iou_thr,
            max_detections=max_detections, pre_top_k=min(1024, len(anchors)),
            cls_agnostic=True)
        return (np.asarray(scores), np.asarray(boxes), np.asarray(labels),
                np.asarray(valid))

    @pytest.mark.parametrize('score_thr,seed,frac_hot', [
        (0.75, 0, 0.02),   # deployed regime: few high-score candidates
        (0.4, 1, 0.05),    # permissive threshold, denser NMS interactions
        (0.1, 2, 0.10),    # many candidates, heavy suppression
    ])
    def test_kept_set_matches(self, score_thr, seed, frac_hot):
        n, max_det = 3000, 64
        head = self._make_head(score_thr, nms_iou_thr=0.4)
        anchors, mean_std, cls_logits, reg, useful = self._random_inputs(
            n, seed, frac_hot=frac_hot)
        r_scores, r_boxes, r_labels = self._run_ref(
            head, anchors, mean_std, cls_logits, reg, useful)
        o_scores, o_boxes, o_labels, o_valid = self._run_ours(
            anchors, mean_std, cls_logits, reg, useful, score_thr, 0.4, max_det)

        n_kept = min(len(r_scores), max_det)
        assert int(o_valid.sum()) == n_kept, (int(o_valid.sum()), n_kept)
        assert n_kept > 0, 'degenerate fixture: no detections survived'
        # both are score-descending: compare row by row
        np.testing.assert_allclose(o_scores[:n_kept], r_scores[:n_kept],
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_array_equal(o_labels[:n_kept], r_labels[:n_kept])
        np.testing.assert_allclose(o_boxes[:n_kept], r_boxes[:n_kept],
                                   rtol=1e-4, atol=1e-4)
        # truncation semantics: scores beyond the valid region are zeroed
        assert np.all(o_scores[n_kept:] == 0)

    def test_zero_detections(self):
        head = self._make_head(score_thr=0.999999, nms_iou_thr=0.4)
        anchors, mean_std, cls_logits, reg, useful = self._random_inputs(
            500, 3, frac_hot=0.0)
        r_scores, _, _ = self._run_ref(head, anchors, mean_std, cls_logits,
                                       reg, useful)
        o_scores, _, _, o_valid = self._run_ours(
            anchors, mean_std, cls_logits, reg, useful, 0.999999, 0.4, 16)
        assert len(r_scores) == 0
        assert int(o_valid.sum()) == 0
        assert np.all(o_scores == 0)

    def test_max_detections_truncation(self):
        """More survivors than max_detections: ours returns the top-K prefix
        of the reference's kept list."""
        score_thr = 0.05
        head = self._make_head(score_thr, nms_iou_thr=0.9)  # barely suppress
        anchors, mean_std, cls_logits, reg, useful = self._random_inputs(
            2000, 4, frac_hot=0.2)
        r_scores, r_boxes, r_labels = self._run_ref(
            head, anchors, mean_std, cls_logits, reg, useful)
        max_det = 8
        assert len(r_scores) > max_det
        o_scores, o_boxes, o_labels, o_valid = self._run_ours(
            anchors, mean_std, cls_logits, reg, useful, score_thr, 0.9, max_det)
        assert int(o_valid.sum()) == max_det
        np.testing.assert_allclose(o_scores, r_scores[:max_det],
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_array_equal(o_labels, r_labels[:max_det])
        np.testing.assert_allclose(o_boxes, r_boxes[:max_det],
                                   rtol=1e-4, atol=1e-4)


# ---------------------------------------------------------------------------
# 7c. Hill-climbing post-optimization
# ---------------------------------------------------------------------------


class TestHillClimbingParity:
    """Test-time yaw refinement vs the reference numba hill climber
    (fast_utils/hill_climbing.py:7-120). The vectorised batch climber must
    reach the same fixed point as the reference's sequential loop."""

    P2 = np.array([[721.5377, 0.0, 609.5593, 44.85728],
                   [0.0, 721.5377, 172.854, 0.2163791],
                   [0.0, 0.0, 1.0, 0.002745884]])

    def test_post_opt(self):
        ref_mod = reference_shim.import_ref(
            'visualDet3D.networks.lib.fast_utils.hill_climbing')
        from visualdet3d_tpu.models.fast_utils.hill_climbing import post_opt

        rng = np.random.default_rng(17)
        for case in range(6):
            x = float(rng.uniform(-8, 8))
            y = float(rng.uniform(1.0, 2.0))
            z = float(rng.uniform(8, 40))
            w, h, l = (float(rng.uniform(1.5, 1.8)), float(rng.uniform(1.4, 1.7)),
                       float(rng.uniform(3.4, 4.3)))
            theta = float(rng.uniform(-np.pi, np.pi))
            alpha = theta - np.arctan2(x, z)
            # image-space center
            c = self.P2 @ np.array([x, y, z, 1.0])
            cx, cy = float(c[0] / c[2]), float(c[1] / c[2])
            # 2D box: projection of a slightly-perturbed yaw, so climbing moves
            from visualdet3d_tpu.models.fast_utils.bbox3d import project_3d_corners
            p2h = np.eye(4)
            p2h[:3] = self.P2
            verts, _ = project_3d_corners(
                p2h, np.array([x]), np.array([y]), np.array([z]),
                np.array([w]), np.array([h]), np.array([l]),
                np.array([theta + 0.15]))
            box2d = np.array([verts[0, :, 0].min(), verts[0, :, 1].min(),
                              verts[0, :, 0].max(), verts[0, :, 1].max()])
            state = np.array([x, y, z, w, h, l, alpha])

            ref_out = ref_mod.post_opt(
                torch.tensor(box2d), torch.tensor(state), self.P2.copy(),
                cx, cy).numpy()
            our_out = post_opt(box2d, state, self.P2, cx, cy)

            # substantive outputs: refined alpha (+ untouched z/dims)
            np.testing.assert_allclose(our_out[2:6], ref_out[2:6], atol=1e-9,
                                       err_msg=f'case {case} z/dims')
            assert np.isclose(our_out[6], ref_out[6], atol=1e-6), \
                (case, our_out[6], ref_out[6])


# ---------------------------------------------------------------------------
# 7d. Monodepth self-supervised loss
# ---------------------------------------------------------------------------


class TestGridSampleParity:
    """ops/sampling.grid_sample vs torch.nn.functional.grid_sample across
    all (align_corners, padding_mode) combinations incl. far-out-of-range
    grid points. Pins the r3 fix: 'zeros' zeroes each OOB corner TAP, not
    the whole sample."""

    @pytest.mark.parametrize('align_corners', [False, True])
    @pytest.mark.parametrize('padding_mode', ['zeros', 'border'])
    def test_matches_torch(self, align_corners, padding_mode):
        import torch.nn.functional as F
        from visualdet3d_tpu.ops.sampling import grid_sample
        rng = np.random.default_rng(5)
        b, h, w, c = 2, 8, 12, 3
        img = rng.uniform(0, 1, (b, h, w, c)).astype(np.float32)
        grid = rng.uniform(-1.3, 1.3, (b, 6, 9, 2)).astype(np.float32)
        ref = F.grid_sample(torch.tensor(np.moveaxis(img, -1, 1)),
                            torch.tensor(grid), mode='bilinear',
                            padding_mode=padding_mode,
                            align_corners=align_corners)
        ref = np.moveaxis(ref.numpy(), 1, -1)
        got = np.asarray(grid_sample(jnp.asarray(img), jnp.asarray(grid),
                                     padding_mode=padding_mode,
                                     align_corners=align_corners))
        np.testing.assert_allclose(got, ref, atol=1e-6)


class TestMonodepthLossParity:
    """Full monodepth-style loss (SSIM + edge-aware smoothness + L-R
    consistency over a 4-scale disparity pyramid) vs the reference
    MonodepthLoss.forward (monodepth_loss.py:6-199)."""

    def test_self_supervised_loss(self):
        mod = reference_shim.import_ref(
            'visualDet3D.networks.heads.monodepth_loss')
        from visualdet3d_tpu.models.heads.monodepth_loss import (
            monodepth_self_supervised_loss)

        rng = np.random.default_rng(21)
        b, h, w = 2, 32, 64
        left = rng.uniform(0, 1, (b, h, w, 3)).astype(np.float32)
        right = rng.uniform(0, 1, (b, h, w, 3)).astype(np.float32)
        disps = [
            (rng.uniform(0, 0.03, (b, h // 2 ** i, w // 2 ** i, 2))
             ).astype(np.float32)
            for i in range(4)]

        ref_loss_mod = mod.MonodepthLoss(n=4, SSIM_w=0.85,
                                         disp_gradient_w=1.0, lr_w=1.0)
        to_nchw = lambda a: torch.tensor(np.moveaxis(a, -1, 1))
        with torch.no_grad():
            ref = float(ref_loss_mod(
                [to_nchw(d) for d in disps],
                (to_nchw(left), to_nchw(right))))

        ours = float(monodepth_self_supervised_loss(
            [jnp.asarray(d) for d in disps],
            jnp.asarray(left), jnp.asarray(right)))
        np.testing.assert_allclose(ours, ref, rtol=5e-3)

    def test_depth_evaluator_errors(self):
        """KITTI depth metrics (mae/rmse/inverse/log/SI-log/relative) vs the
        reference per-pixel accumulation loop (evaluate_depth.py:6-82)."""
        mod = reference_shim.import_ref(
            'visualDet3D.evaluator.kitti_depth_prediction.evaluate_depth')
        from visualdet3d_tpu.evaluator.kitti_depth.evaluate_depth import (
            compute_errors)
        rng = np.random.default_rng(33)
        gt = rng.uniform(0, 60, (48, 96))
        gt[rng.random((48, 96)) < 0.6] = 0.0   # sparse GT
        pred = np.clip(gt + rng.normal(0, 2, (48, 96)), 0.05, None)
        ref = np.asarray(mod.compute_errors(gt, pred))
        ours = np.asarray(compute_errors(gt, pred))
        np.testing.assert_allclose(ours, ref, rtol=1e-6, atol=1e-9)


# ---------------------------------------------------------------------------
# 8. Full KITTI AP evaluator
# ---------------------------------------------------------------------------

def _synth_annos(num_frames=50, seed=99):
    """Random GT/DT anno dicts in kitti_common.get_label_annos format."""
    rng = np.random.default_rng(seed)
    gt_annos, dt_annos = [], []
    names = np.array(['Car', 'Pedestrian', 'DontCare'])
    for _ in range(num_frames):
        n_gt = int(rng.integers(1, 7))
        n_dt = int(rng.integers(0, 9))

        def frame(n, with_score):
            name = names[rng.integers(0, 3 if not with_score else 2, n)]
            x1 = rng.uniform(0, 1100, n)
            y1 = rng.uniform(120, 300, n)
            w = rng.uniform(20, 180, n)
            h = rng.uniform(15, 130, n)
            anno = {
                'name': name,
                'truncated': rng.uniform(0, 0.4, n),
                'occluded': rng.integers(0, 3, n),
                'alpha': rng.uniform(-np.pi, np.pi, n),
                'bbox': np.stack([x1, y1, x1 + w, y1 + h], axis=1),
                'dimensions': rng.uniform([3.0, 1.3, 1.4], [4.5, 1.8, 1.9], (n, 3)),
                'location': np.stack([rng.uniform(-20, 20, n),
                                      rng.uniform(1.2, 2.2, n),
                                      rng.uniform(5, 60, n)], axis=1),
                'rotation_y': rng.uniform(-np.pi, np.pi, n),
            }
            anno['score'] = (rng.uniform(0.05, 1.0, n) if with_score
                             else np.full(n, -1.0))
            return anno

        g = frame(n_gt, False)
        d = frame(n_dt, True)
        # overlap some detections with GT so TPs exist
        n_copy = min(n_gt, n_dt)
        if n_copy:
            d['bbox'][:n_copy] = g['bbox'][:n_copy] + rng.uniform(-6, 6, (n_copy, 4))
            d['location'][:n_copy] = g['location'][:n_copy] + \
                rng.uniform(-0.4, 0.4, (n_copy, 3))
            d['dimensions'][:n_copy] = g['dimensions'][:n_copy]
            d['rotation_y'][:n_copy] = g['rotation_y'][:n_copy] + \
                rng.uniform(-0.1, 0.1, n_copy)
            d['name'][:n_copy] = g['name'][:n_copy]
            # DontCare GT may not appear among detections
            dc = d['name'] == 'DontCare'
            d['name'][dc] = 'Car'
        gt_annos.append(g)
        dt_annos.append(d)
    return gt_annos, dt_annos


class TestEvaluatorParity:

    def test_full_ap_pipeline(self):
        ref_eval = reference_shim.import_ref('visualDet3D.evaluator.kitti.eval')
        from visualdet3d_tpu.evaluator.kitti_object import eval as our_eval
        from visualdet3d_tpu.evaluator.kitti_object.rotate_iou import rotate_iou_eval

        # the numba.cuda rotated IoU cannot run here; give BOTH pipelines the
        # same (separately unit-tested) CPU rotated-IoU so the comparison
        # isolates the matcher/thresholds/PR/AP logic.
        ref_eval.rotate_iou_gpu_eval = rotate_iou_eval

        gt_annos, dt_annos = _synth_annos(50)
        classes = ['Car', 'Pedestrian']

        min_overlaps = np.stack([
            np.array([[0.7, 0.5, 0.5, 0.7, 0.5, 0.7, 0.7, 0.7]] * 3),
            np.array([[0.7, 0.5, 0.5, 0.7, 0.5, 0.5, 0.5, 0.5],
                      [0.5, 0.25, 0.25, 0.5, 0.25, 0.5, 0.5, 0.5],
                      [0.5, 0.25, 0.25, 0.5, 0.25, 0.5, 0.5, 0.5]])], axis=0)
        cls_idx = [0, 1]
        mo = min_overlaps[:, :, cls_idx]

        ref_metrics = ref_eval.do_eval_v3(
            copy.deepcopy(gt_annos), copy.deepcopy(dt_annos), cls_idx, mo,
            compute_aos=True, difficultys=[0, 1, 2])
        our_metrics = our_eval.do_eval_v3(
            copy.deepcopy(gt_annos), copy.deepcopy(dt_annos), cls_idx, mo,
            compute_aos=True, difficultys=(0, 1, 2))

        for metric in ('bbox', 'bev', '3d'):
            np.testing.assert_allclose(
                ref_metrics[metric]['precision'],
                our_metrics[metric]['precision'], atol=1e-6,
                err_msg=f'{metric} precision mismatch')
            if 'orientation' in ref_metrics[metric] and \
                    ref_metrics[metric]['orientation'] is not None:
                ref_aos = ref_metrics[metric]['orientation']
                our_aos = our_metrics[metric].get('orientation')
                if our_aos is not None:
                    np.testing.assert_allclose(ref_aos, our_aos, atol=1e-6,
                                               err_msg=f'{metric} AOS mismatch')

        # end-to-end formatted report numbers
        ref_text = ref_eval.get_official_eval_result(
            copy.deepcopy(gt_annos), copy.deepcopy(dt_annos), classes)
        our_text = our_eval.get_official_eval_result(
            copy.deepcopy(gt_annos), copy.deepcopy(dt_annos), classes)

        def numbers(text):
            import re
            return [float(x) for x in re.findall(r'-?\d+\.\d+', text)]

        np.testing.assert_allclose(numbers(ref_text), numbers(our_text),
                                   atol=0.015)
