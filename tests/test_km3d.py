import numpy as np
import jax
import jax.numpy as jnp
import pytest

from visualdet3d_tpu.config import EasyDict as edict
from visualdet3d_tpu.data.kitti.dataset.km3d_dataset import (
    KittiMonoFlexDataset, KittiRTM3DDataset, RTM3D_CORNERS, _project_corners)
from visualdet3d_tpu.data.kitti.kittidata import KittiObj
from visualdet3d_tpu.models.heads import rtm3d_utils as rtm
from visualdet3d_tpu.registry import DETECTOR_DICT
import visualdet3d_tpu.models.detectors.km3d  # noqa: F401

P2 = np.array([
    [721.5377, 0.0, 609.5593, 44.85728],
    [0.0, 721.5377, 172.854, 0.0],
    [0.0, 0.0, 1.0, 0.0],
], np.float32)


def _make_obj(x=2.0, y=1.6, z=12.0, ry=0.3, h=1.5, w=1.6, l=3.9):
    o = KittiObj()
    o.type = 'Car'
    o.truncated, o.occluded = 0.0, 0
    o.x, o.y, o.z, o.ry = x, y, z, ry
    o.h, o.w, o.l = h, w, l
    o.alpha = ry - np.arctan2(x, z)
    o.bbox_l, o.bbox_t, o.bbox_r, o.bbox_b = 500, 150, 700, 260
    return o


def test_gen_position_recovers_3d_center():
    """Project a known box's 9 keypoints, feed perfect dim/rot -> the
    least-squares solve must recover the 3D center."""
    obj = _make_obj()
    _, homo = _project_corners(P2, [obj], RTM3D_CORNERS)
    kps = homo[0, :, :2].reshape(-1)  # [18], center last
    dim = np.array([[obj.w, obj.h, obj.l]], np.float32)

    # alpha consistent with the decode: rot_y = alpha + atan2(u_c - cx, f).
    # bin2 decodes alpha in (0, pi); this alpha is slightly positive.
    u_c = kps[16]
    alpha = obj.ry - np.arctan2(u_c - P2[0, 2], P2[0, 0])
    assert 0 < alpha < np.pi
    r2 = alpha - 0.5 * np.pi
    rot = np.array([[0, 0, 0.0, 1.0, 0, 1, np.sin(r2), np.cos(r2)]], np.float32)

    pos, rot_y, alpha_pre, _ = rtm.gen_position(
        jnp.asarray(kps)[None, None], jnp.asarray(dim)[None],
        jnp.asarray(rot)[None], jnp.asarray(P2)[None])
    pos = np.asarray(pos)[0, 0]
    center = np.array([obj.x, obj.y - obj.h / 2, obj.z])
    np.testing.assert_allclose(np.asarray(rot_y)[0, 0, 0], obj.ry, atol=1e-3)
    np.testing.assert_allclose(pos, center, atol=0.05)


def test_topk_and_gather():
    hm = np.zeros((1, 8, 10, 2), np.float32)
    hm[0, 3, 4, 0] = 0.9
    hm[0, 6, 2, 1] = 0.8
    scores, inds, clses, ys, xs = rtm.topk(jnp.asarray(hm), k=2)
    assert float(scores[0, 0]) == pytest.approx(0.9)
    assert (int(ys[0, 0]), int(xs[0, 0]), int(clses[0, 0])) == (3, 4, 0)
    assert (int(ys[0, 1]), int(xs[0, 1]), int(clses[0, 1])) == (6, 2, 1)
    feat = np.arange(8 * 10 * 3, dtype=np.float32).reshape(1, 8, 10, 3)
    gathered = rtm.transpose_and_gather_feat(jnp.asarray(feat), inds)
    np.testing.assert_allclose(np.asarray(gathered)[0, 0], feat[0, 3, 4])


def test_heatmap_nms_keeps_peaks():
    hm = np.zeros((1, 9, 9, 1), np.float32)
    hm[0, 4, 4, 0] = 1.0
    hm[0, 4, 5, 0] = 0.5  # non-max neighbour -> suppressed
    out = np.asarray(rtm.heatmap_nms(jnp.asarray(hm)))
    assert out[0, 4, 4, 0] == 1.0
    assert out[0, 4, 5, 0] == 0.0


def _targets_for(objs, dataset_cls, image_hw=(96, 320), obj_types=('Car',)):
    ds = object.__new__(dataset_cls)
    ds.obj_types = list(obj_types)
    ds.num_classes = len(obj_types)
    ds.num_vertexes = dataset_cls.num_vertexes
    ds.corner_matrix = dataset_cls.corner_matrix
    ds.max_objects = 8
    image = np.zeros((*image_hw, 3), np.float32)
    return ds._build_target(image, P2.copy(), objs)


def test_rtm3d_target_builder():
    obj = _make_obj()
    obj.bbox_l, obj.bbox_t, obj.bbox_r, obj.bbox_b = 100, 30, 180, 80
    t = _targets_for([obj], KittiRTM3DDataset)
    assert t['hm'].shape == (24, 80, 1)
    assert t['hm'].max() == 1.0
    assert t['reg_mask'][0] == 1 and t['reg_mask'][1:].sum() == 0
    assert t['hps_mask'][0].sum() == 18
    np.testing.assert_allclose(t['dim'][0], [obj.w, obj.h, obj.l])
    np.testing.assert_allclose(t['location'][0], [obj.x, obj.y - obj.h / 2, obj.z])
    # the center index points at the heatmap peak
    iy, ix = np.unravel_index(t['hm'][:, :, 0].argmax(), t['hm'][:, :, 0].shape)
    assert t['ind'][0] == iy * 80 + ix


def test_monoflex_target_builder():
    # MonoFlex stamps the *projected 3D center*, which for full-KITTI P2
    # lands around u~740 -> keep the full image width so it stays in range
    obj = _make_obj()
    obj.bbox_l, obj.bbox_t, obj.bbox_r, obj.bbox_b = 700, 150, 780, 220
    t = _targets_for([obj], KittiMonoFlexDataset, image_hw=(288, 1280))
    assert t['hm'].shape == (72, 320, 1)
    assert t['hm'].max() == 1.0
    assert t['hps'].shape == (8, 20)
    assert t['kp_detph_mask'].shape == (8, 3)
    assert t['bboxes2d_target'][0].sum() > 0
    assert t['edge_indices'].ndim == 2 and t['edge_indices'].shape[1] == 2


def _km3d_cfg(name='KM3D'):
    return edict(
        obj_types=['Car'],
        name=name,
        backbone=edict(name='dla', depth=34),
        head=edict(
            layer_cfg=edict(head_features=16),
            loss_cfg=edict(rampup_length=100),
            test_cfg=edict(score_thr=0.1, nms_iou_thr=0.5, top_k=20),
        ),
    )


@pytest.mark.parametrize('name', ['KM3D', 'MonoFlex'])
def test_km3d_monoflex_loss_and_predict(name):
    cfg = _km3d_cfg(name)
    system = DETECTOR_DICT[name](cfg)
    image_hw = (64, 160)
    variables = system.init(jax.random.PRNGKey(0), image_hw)

    obj = _make_obj(z=10.0)
    ds_cls = KittiRTM3DDataset if name == 'KM3D' else KittiMonoFlexDataset
    # rescale the object's 2D box into the small test image
    obj.bbox_l, obj.bbox_t, obj.bbox_r, obj.bbox_b = 40, 20, 100, 50
    t = _targets_for([obj], ds_cls, image_hw=image_hw)
    gts = {k: jnp.asarray(np.asarray(v)[None]) for k, v in t.items()}
    images = jnp.asarray(np.random.default_rng(0).standard_normal(
        (1, *image_hw, 3)).astype(np.float32))
    P2b = jnp.asarray(P2)[None]

    (loss, loss_dict), new_state = system.loss(variables, images, gts, P2b,
                                               rng=jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))
    assert float(loss_dict['hm_loss']) > 0

    out = system.predict(variables, images, P2b, max_detections=8)
    assert out['scores'].shape == (1, 8)
    assert out['bboxes'].shape == (1, 8, 11)


@pytest.mark.parametrize('name', ['KM3D', 'MonoFlex'])
def test_km3d_monoflex_batched_predict_matches_single(name):
    """vmapped batch>1 decode must equal per-image batch-1 decodes."""
    cfg = _km3d_cfg(name)
    system = DETECTOR_DICT[name](cfg)
    image_hw = (64, 160)
    variables = system.init(jax.random.PRNGKey(0), image_hw)

    rng = np.random.default_rng(3)
    images = jnp.asarray(rng.standard_normal((2, *image_hw, 3)).astype(np.float32))
    P2b = jnp.asarray(np.stack([P2, P2]))

    batched = system.predict(variables, images, P2b, max_detections=8)
    assert batched['scores'].shape == (2, 8)
    assert batched['bboxes'].shape == (2, 8, 11)
    for i in range(2):
        single = system.predict(variables, images[i:i + 1], P2b[i:i + 1],
                                max_detections=8)
        np.testing.assert_allclose(np.asarray(batched['scores'][i]),
                                   np.asarray(single['scores'][0]), atol=1e-5)
        np.testing.assert_array_equal(np.asarray(batched['labels'][i]),
                                      np.asarray(single['labels'][0]))
        bb, sb = np.asarray(batched['bboxes'][i]), np.asarray(single['bboxes'][0])
        # columns 4:7 (cx3d, cy3d, z3d) come from the least-squares position
        # solve; with an UNTRAINED net z is ~1e-5, so f32 ULP differences in
        # the batched matmuls blow up through the /z projection. Well-
        # conditioned solve exactness is covered by
        # test_gen_position_recovers_3d_location; here check the plumbing.
        np.testing.assert_allclose(bb[:, :4], sb[:, :4], atol=1e-4, rtol=1e-4)
        np.testing.assert_allclose(bb[:, 7:], sb[:, 7:], atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize('backbone', ['resnet', 'dla'])
def test_rtm3d_data_parallel_grad_parity(backbone):
    """8-device sharded vs 1-device unsharded rtm3d training: gradient parity.

    Exercises the nested gts target dict + the scalar `epoch` leaf through
    shard_batch (which must replicate it), and asserts RAW-GRADIENT parity
    (pre-optimizer — the r2 version compared post-Adam params, whose
    sqrt(g^2)-normalized first step amplifies ulp-level sign flips on
    near-zero grads into full ±lr divergences).

    Diagnosis recorded r3 (tools/diag_rtm3d_gradparity.py): the loss scalar
    matches to ~8e-7 relative but raw grads diverge at ~2e-3..2e-2 of
    grad-max (worst at the FIRST conv) for BOTH cores. The amplifiers are
    genuine gradient DISCONTINUITIES crossed by SyncBN reduction-order ulps
    (sharded vs unsharded batch means): the DCN's bilinear-corner floor()
    (corner selection flips while the forward lerp weight -> 0, so the loss
    stays continuous), ReLU kinks (~160k activations, a few land within an
    ulp of 0), and Position_loss's near-singular LSQ backward at init. This
    is inherent to batch-split execution of these models (the reference's
    CUDA DDP included), NOT a sharding bug — so the assertion is
    self-calibrating: permuting the batch on ONE device is mathematically
    identical but changes reduction order the same way, and the sharded
    divergence must not exceed a small multiple of that intrinsic noise
    floor.
    """
    from visualdet3d_tpu.parallel import mesh as mesh_lib
    from visualdet3d_tpu.models.heads import km3d_head as km3d_lib

    devices = jax.devices()
    assert len(devices) >= 8, 'conftest must force 8 CPU devices'
    m = mesh_lib.make_mesh(devices[:8])

    cfg = _km3d_cfg('KM3D')
    if backbone == 'resnet':
        cfg.backbone = edict(name='resnet', depth=18)
    system = DETECTOR_DICT['KM3D'](cfg)
    image_hw = (64, 160)
    variables = system.init(jax.random.PRNGKey(0), image_hw)
    params, batch_stats = variables['params'], variables['batch_stats']

    nprng = np.random.default_rng(3)
    targets = []
    for i in range(8):
        obj = _make_obj(z=8.0 + i)
        obj.bbox_l, obj.bbox_t, obj.bbox_r, obj.bbox_b = 40, 20, 100, 50
        targets.append(_targets_for([obj], KittiRTM3DDataset,
                                    image_hw=image_hw))
    gts = {k: np.stack([t[k] for t in targets]) for k in targets[0]}
    batch = dict(
        images=nprng.standard_normal((8, *image_hw, 3)).astype(np.float32),
        gts=gts,
        P2=np.tile(P2[None], (8, 1, 1)),
        epoch=np.float32(5.0),
    )

    def loss_fn(p, images, g, P2b, epoch):
        v = {'params': p, 'batch_stats': batch_stats}
        output, new_state = system.net.apply(v, images, train=True,
                                             mutable=['batch_stats'])
        loss, _ = km3d_lib.km3d_loss(
            output, g, P2b, jnp.asarray(epoch, jnp.float32),
            image_hw[1] // 4, rampup_length=100)
        return jnp.mean(loss), new_state['batch_stats']

    gfn = jax.jit(jax.value_and_grad(loss_fn, has_aux=True))

    sharded = mesh_lib.shard_batch(m, batch)
    assert len(sharded['epoch'].sharding.device_set) == 8  # replicated scalar
    assert sharded['images'].sharding.is_fully_replicated is False
    params8 = mesh_lib.replicate(m, params)
    dense = jax.tree.map(jnp.asarray, batch)

    (val8, bs8), g8 = gfn(params8, sharded['images'], sharded['gts'],
                          sharded['P2'], sharded['epoch'])
    (val1, bs1), g1 = gfn(params, dense['images'], dense['gts'],
                          dense['P2'], dense['epoch'])
    # intrinsic noise floor: same device, batch reversed (identical math,
    # different reduction order)
    perm = {k: (jnp.flip(v, axis=0) if getattr(v, 'ndim', 0) >= 1 else v)
            for k, v in dense.items() if k != 'gts'}
    perm['gts'] = {k: jnp.flip(v, axis=0) for k, v in dense['gts'].items()}
    (valp, _), gp = gfn(params, perm['images'], perm['gts'],
                        perm['P2'], perm['epoch'])

    def worst_abs(g_a, g_b):
        diffs = jax.tree.map(lambda a, b: float(jnp.max(jnp.abs(a - b))
                                                if a.size else 0.0), g_a, g_b)
        return max(jax.tree.leaves(diffs))

    def grad_max(g):
        return max(jax.tree.leaves(jax.tree.map(
            lambda a: float(jnp.max(jnp.abs(a))) if a.size else 0.0, g)))

    # loss scalar parity (tight)
    np.testing.assert_allclose(float(val8), float(val1), rtol=2e-4)
    np.testing.assert_allclose(float(valp), float(val1), rtol=2e-4)
    # BN batch stats match (GSPMD cross-replica mean == global mean)
    assert worst_abs(bs8, bs1) < 1e-4
    # sharding adds no divergence beyond the intrinsic reduction-order noise
    noise_floor = worst_abs(gp, g1)
    sharded_div = worst_abs(g8, g1)
    gmax = grad_max(g1)
    assert sharded_div <= max(8.0 * noise_floor, 1e-5 * gmax), \
        (backbone, sharded_div, noise_floor, gmax)
    # absolute backstop: a wrong-loss/unsynced-grad bug would blow this
    assert sharded_div <= 5e-2 * gmax, (backbone, sharded_div, gmax)
