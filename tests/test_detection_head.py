import numpy as np
import jax
import jax.numpy as jnp

from visualdet3d_tpu.models.heads import target_coding
from visualdet3d_tpu.models.heads.detection_3d_head import (
    assign_anchors,
    detection_3d_loss,
    get_bboxes,
)
from visualdet3d_tpu.models.heads.anchors import Anchors, generate_base_anchors


def test_generate_base_anchors_area_and_ratio():
    anchors = generate_base_anchors(16, [0.5, 1, 2], [1.0, 2 ** (1 / 3)])
    assert anchors.shape == (6, 4)
    w = anchors[:, 2] - anchors[:, 0]
    h = anchors[:, 3] - anchors[:, 1]
    # ratio blocks of len(scales)
    np.testing.assert_allclose(h[:2] / w[:2], 0.5, rtol=1e-6)
    np.testing.assert_allclose(h[2:4] / w[2:4], 1.0, rtol=1e-6)
    np.testing.assert_allclose(h[4:] / w[4:], 2.0, rtol=1e-6)
    np.testing.assert_allclose(np.sqrt(w * h)[0], 16.0, rtol=1e-6)
    np.testing.assert_allclose(np.sqrt(w * h)[1], 16.0 * 2 ** (1 / 3), rtol=1e-6)


def test_anchors_layout_locations_outer():
    anc = Anchors(read_config_file=False, pyramid_levels=[4], strides=[16],
                  sizes=[24], ratios=[0.5, 1.0], scales=[1.0, 2.0])
    all_anchors = anc.anchors_for_shape((32, 64))
    # 2x4 grid of locations, 4 anchors each
    assert all_anchors.shape == (2 * 4 * 4, 4)
    # first 4 anchors share the first grid center (8, 8)
    cx = 0.5 * (all_anchors[:4, 0] + all_anchors[:4, 2])
    cy = 0.5 * (all_anchors[:4, 1] + all_anchors[:4, 3])
    np.testing.assert_allclose(cx, 8.0, atol=1e-5)
    np.testing.assert_allclose(cy, 8.0, atol=1e-5)
    # anchor block repeats at the next location, shifted by stride in x
    np.testing.assert_allclose(all_anchors[4:8, 0] - all_anchors[:4, 0], 16.0, atol=1e-5)


def _mean_std_for(n, t=1):
    ms = np.zeros((n, t, 6, 2), np.float32)
    ms[..., 0] = np.array([20.0, 0.0, 0.3, 1.6, 1.5, 3.9])  # means
    ms[..., 1] = np.array([10.0, 0.5, 0.5, 0.2, 0.2, 0.5])  # stds
    return jnp.asarray(ms)


def test_encode_decode_roundtrip():
    anchors = jnp.asarray([[100., 100., 148., 124.], [300., 200., 400., 280.]])
    mean_std = _mean_std_for(2)[:, 0]  # [N, 6, 2]
    gt = jnp.asarray([
        # x1, y1, x2, y2, cls, cx, cy, z, w, h, l, alpha
        [105., 96., 150., 130., 0., 127., 112., 18.5, 1.7, 1.4, 4.0, 0.4],
        [295., 210., 380., 270., 0., 330., 240., 33.0, 1.5, 1.6, 3.5, -2.8],
    ])
    targets, alpha_cls = target_coding.encode(anchors, gt, mean_std)
    assert targets.shape == (2, 12)
    # alpha hemisphere: cos(0.4) > 0 -> 1, cos(-2.8) < 0 -> 0
    np.testing.assert_allclose(np.asarray(alpha_cls)[:, 0], [1.0, 0.0])

    alpha_score = alpha_cls  # perfect hemisphere prediction
    boxes, prior_ok = target_coding.decode(anchors, targets, mean_std, alpha_score)
    assert bool(prior_ok.all())
    np.testing.assert_allclose(np.asarray(boxes)[:, :4], np.asarray(gt)[:, :4],
                               rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(boxes)[:, 4:10],
                               np.asarray(gt)[:, [5, 6, 7, 8, 9, 10]],
                               rtol=1e-4, atol=1e-3)
    # alpha recovered modulo 2pi
    d = np.asarray(boxes)[:, 10] - np.asarray(gt)[:, 11]
    d = (d + np.pi) % (2 * np.pi) - np.pi
    np.testing.assert_allclose(d, 0.0, atol=1e-4)


def test_assign_anchors_thresholds():
    anchors = jnp.asarray([
        [0., 0., 10., 10.],     # exact match with gt0 -> positive
        [0., 0., 9., 10.],      # iou 0.9 -> positive
        [20., 20., 30., 30.],   # no overlap -> negative
        [0., 0., 16., 10.],     # iou ~0.625 -> positive (>=0.5)
        [0., 0., 22., 10.],     # iou ~0.45 -> ignored (between 0.4, 0.5)
    ])
    ann = jnp.full((3, 12), -1.0)
    ann = ann.at[0].set(jnp.asarray([0., 0., 10., 10., 0., 5., 5., 20., 1.6, 1.5, 3.9, 0.3]))
    useful = jnp.ones(5, bool)
    out = assign_anchors(anchors, ann, useful, 0.5, 0.4, match_low_quality=False)
    np.testing.assert_array_equal(np.asarray(out['pos_mask']),
                                  [True, True, False, True, False])
    np.testing.assert_array_equal(np.asarray(out['neg_mask']),
                                  [False, False, True, False, False])
    assert np.all(np.asarray(out['gt_index'])[np.asarray(out['pos_mask'])] == 0)


def test_assign_match_low_quality_rescues_best_anchor():
    anchors = jnp.asarray([
        [0., 0., 10., 10.],
        [100., 100., 130., 120.],   # iou with gt ~0.3 but is gt's best anchor
    ])
    ann = jnp.full((2, 12), -1.0)
    ann = ann.at[0].set(jnp.asarray([100., 100., 120., 110., 0., 110., 105., 20., 1.6, 1.5, 3.9, 0.3]))
    useful = jnp.ones(2, bool)
    no_lq = assign_anchors(anchors, ann, useful, 0.5, 0.4, match_low_quality=False)
    assert not bool(no_lq['pos_mask'][1])
    lq = assign_anchors(anchors, ann, useful, 0.5, 0.4, match_low_quality=True)
    assert bool(lq['pos_mask'][1])
    assert int(lq['gt_index'][1]) == 0


def test_detection_loss_runs_and_masks_empty_images():
    n, m, c = 64, 4, 2
    rng = np.random.default_rng(0)
    anchors = []
    for i in range(8):
        for j in range(8):
            anchors.append([j * 16, i * 16, j * 16 + 24, i * 16 + 24])
    anchors = jnp.asarray(np.array(anchors, np.float32))
    mean_std = _mean_std_for(64, t=c)
    cls_preds = jnp.asarray(rng.standard_normal((2, 64, c + 1)).astype(np.float32))
    reg_preds = jnp.asarray(rng.standard_normal((2, 64, 12)).astype(np.float32))
    ann = np.full((2, m, 12), -1.0, np.float32)
    ann[0, 0] = [16, 16, 40, 40, 0, 28, 28, 20.0, 1.6, 1.5, 3.9, 0.3]
    ann[0, 1] = [64, 64, 90, 90, 1, 77, 77, 30.0, 0.6, 1.7, 0.8, -0.2]
    # image 1 has no GT -> must contribute zero loss
    useful = jnp.ones((2, 64), bool)
    cls_loss, reg_loss, loss_dict = detection_3d_loss(
        cls_preds, reg_preds, anchors, mean_std, useful, jnp.asarray(ann),
        num_classes=c, focal_loss_gamma=2.0, balance_weights=[20.0, 40.0],
        regression_weight=[1] * 13, L1_regression_alpha=25.0)
    assert np.isfinite(float(cls_loss[0])) and np.isfinite(float(reg_loss[0]))
    assert float(cls_loss[0]) > 0 and float(reg_loss[0]) > 0

    # all-empty batch -> exactly zero
    ann_empty = jnp.full((2, m, 12), -1.0)
    cls0, reg0, _ = detection_3d_loss(
        cls_preds, reg_preds, anchors, mean_std, useful, ann_empty,
        num_classes=c, focal_loss_gamma=2.0, balance_weights=[20.0, 40.0],
        regression_weight=[1] * 13, L1_regression_alpha=25.0)
    assert float(cls0[0]) == 0.0 and float(reg0[0]) == 0.0


def test_get_bboxes_static_shapes_and_threshold():
    n, c = 64, 2
    anchors = []
    for i in range(8):
        for j in range(8):
            anchors.append([j * 16, i * 16, j * 16 + 24, i * 16 + 24])
    anchors = jnp.asarray(np.array(anchors, np.float32))
    mean_std = _mean_std_for(n, t=c)
    cls_preds = jnp.full((n, c + 1), -8.0)
    cls_preds = cls_preds.at[5, 0].set(8.0)   # one confident detection
    cls_preds = cls_preds.at[5, 2].set(8.0)   # alpha hemisphere
    reg_preds = jnp.zeros((n, 12))
    useful = jnp.ones((n,), bool)
    scores, bboxes, labels, valid = get_bboxes(
        cls_preds, reg_preds, anchors, mean_std, useful,
        num_classes=c, image_hw=(128, 128), score_thr=0.75,
        nms_iou_thr=0.5, max_detections=8, pre_top_k=n)
    assert scores.shape == (8,) and bboxes.shape == (8, 11) and labels.shape == (8,)
    assert int(valid.sum()) == 1
    assert float(scores[0]) > 0.99
    # decoded z equals the prior mean (deltas are zero)
    np.testing.assert_allclose(float(bboxes[0, 6]), 20.0, atol=1e-4)


def test_get_bboxes_pads_when_max_detections_exceeds_pre_top_k():
    """ADVICE r3: pre_top_k < max_detections must pad, not raise at trace.

    Tiny-anchor configs (small feature maps) have k = min(pre_top_k, N) <
    max_detections; the selection is padded with invalid entries so output
    shapes stay static.
    """
    n, c = 16, 2
    anchors = jnp.asarray(
        np.array([[j * 16, 0, j * 16 + 24, 24] for j in range(n)], np.float32))
    mean_std = _mean_std_for(n, t=c)
    cls_preds = jnp.full((n, c + 1), -8.0)
    cls_preds = cls_preds.at[3, 0].set(8.0)
    scores, bboxes, labels, valid = get_bboxes(
        cls_preds, jnp.zeros((n, 12)), anchors, mean_std, jnp.ones((n,), bool),
        num_classes=c, image_hw=(128, 512), score_thr=0.75,
        nms_iou_thr=0.5, max_detections=32, pre_top_k=8)
    assert scores.shape == (32,) and bboxes.shape == (32, 11)
    assert valid.shape == (32,) and labels.shape == (32,)
    assert int(valid.sum()) == 1 and bool(valid[0])
    assert float(jnp.abs(scores[1:]).max()) == 0.0  # padding scores are 0


def test_score_threshold_bf16_band():
    """Pin the documented bf16 threshold semantics (ADVICE r3): a detection
    is kept iff bf16(sigmoid(logit)) > score_thr.

    0.75 is exactly representable in bf16; sigmoid(1.0986) ~ 0.75. Pick
    logits whose bf16 sigmoid lands exactly ON the threshold (dropped: not
    strictly greater) and one bf16 ULP above (kept), so borderline behavior
    is deterministic and tested rather than incidental.
    """
    f = np.float32
    # scan for logits mapping to bf16 score == 0.75 and == nextafter(0.75)
    cand = np.linspace(1.0, 1.2, 20001, dtype=np.float64)
    s_bf16 = jnp.asarray(1 / (1 + np.exp(-cand)), jnp.bfloat16)
    on_thr = cand[np.where(np.asarray(s_bf16, f) == f(0.75))[0][0]]
    above = cand[np.where(np.asarray(s_bf16, f) > f(0.75))[0][0]]

    n, c = 16, 2
    anchors = jnp.asarray(
        np.array([[j * 32, 0, j * 32 + 24, 24] for j in range(n)], np.float32))
    mean_std = _mean_std_for(n, t=c)
    cls_preds = np.full((n, c + 1), -8.0, np.float32)
    cls_preds[3, 0] = on_thr    # exactly at threshold in bf16 -> dropped
    cls_preds[7, 0] = above     # one ULP above -> kept
    scores, _, _, valid = get_bboxes(
        jnp.asarray(cls_preds, jnp.bfloat16), jnp.zeros((n, 12), jnp.bfloat16),
        anchors, mean_std, jnp.ones((n,), bool),
        num_classes=c, image_hw=(128, 512), score_thr=0.75,
        nms_iou_thr=0.5, max_detections=8, pre_top_k=n)
    assert int(valid.sum()) == 1
    assert float(scores[0]) > 0.75


def test_get_bboxes_batched_matches_vmap():
    """get_bboxes_batched (layout-friendly candidate selection on the
    un-flattened channel order) must match vmap(get_bboxes) exactly — same
    scores, boxes, labels, valid — in f32 AND bf16 (the bf16 threshold
    band must be identical too: both compute bf16(sigmoid(logit)))."""
    from visualdet3d_tpu.models.heads.detection_3d_head import (
        get_bboxes_batched)
    b, hw, a, c = 3, 64, 4, 2
    n = hw * a
    rng = np.random.default_rng(0)
    # anchor table: locations outer, anchors inner
    anchors = []
    for i in range(8):
        for j in range(8):
            for t in range(a):
                anchors.append([j * 16, i * 16, j * 16 + 24 + 4 * t,
                                i * 16 + 24 + 2 * t])
    anchors = jnp.asarray(np.array(anchors, np.float32))
    mean_std = _mean_std_for(n, t=c)
    # logits spanning the threshold: a handful confident, many borderline
    cls_np = rng.normal(-4.0, 3.0, (b, n, c + 1)).astype(np.float32)
    reg_np = (0.3 * rng.standard_normal((b, n, 12))).astype(np.float32)
    useful = jnp.asarray(rng.random((b, n)) > 0.1)

    for dtype in (jnp.float32, jnp.bfloat16):
        cls_preds = jnp.asarray(cls_np, dtype)
        reg_preds = jnp.asarray(reg_np, dtype)
        kw = dict(num_classes=c, image_hw=(128, 128), score_thr=0.75,
                  nms_iou_thr=0.5, max_detections=8, pre_top_k=32)
        ref = jax.vmap(lambda cp, rp, m: get_bboxes(
            cp, rp, anchors, mean_std, m, **kw))(cls_preds, reg_preds, useful)
        out = get_bboxes_batched(cls_preds, reg_preds, a, anchors, mean_std,
                                 useful, **kw)
        assert int(np.asarray(ref[3]).sum()) > 0  # non-trivial decode
        for name, r, o in zip(('scores', 'bboxes', 'labels', 'valid'),
                              ref, out):
            np.testing.assert_allclose(np.asarray(r), np.asarray(o),
                                       rtol=0, atol=1e-6,
                                       err_msg=f'{name} {dtype}')
