import numpy as np
import jax
import jax.numpy as jnp
import pytest

from visualdet3d_tpu.registry import DETECTOR_DICT
import visualdet3d_tpu.models.detectors.yolostereo3d  # noqa: F401
from visualdet3d_tpu.config import EasyDict as edict
from visualdet3d_tpu.solver import build_optimizer
from visualdet3d_tpu.pipelines.train_state import (
    create_train_state, make_stereo_train_step)

from helpers import random_annotations, tiny_mono_cfg, write_fake_priors

IMAGE_HW = (64, 160)


def tiny_stereo_cfg(pre):
    cfg = tiny_mono_cfg(pre, obj_types=('Car', 'Pedestrian'), ground_aware=False,
                        depth=18)
    cfg.name = 'Stereo3D'
    cfg.backbone.out_indices = (0, 1, 2)
    cfg.head.layer_cfg.num_features_in = 1408
    cfg.head.layer_cfg.cls_feature_size = 32
    cfg.head.layer_cfg.reg_feature_size = 64
    cfg.head.loss_cfg.pop('match_low_quality')  # stereo default: True
    cfg.head.loss_cfg.balance_weight = [20.0, 40.0]
    cfg.head.test_cfg.nms_iou_thr = 0.4
    return cfg


def sample_P(batch, tx=0.0):
    P = np.array([
        [220.0, 0.0, 80.0, tx],
        [0.0, 220.0, 30.0, 0.1],
        [0.0, 0.0, 1.0, 0.002],
    ], np.float32)
    return np.repeat(P[None], batch, axis=0)


@pytest.fixture(scope='module')
def system(tmp_path_factory):
    pre = str(tmp_path_factory.mktemp('pre'))
    write_fake_priors(pre, ['Car', 'Pedestrian'])
    cfg = tiny_stereo_cfg(pre)
    return DETECTOR_DICT[cfg.name](cfg)


def test_stereo_train_step_with_disparity_loss(system):
    rng = jax.random.PRNGKey(0)
    tx = build_optimizer(
        edict(type_name='adam', keywords=edict(lr=1e-4), clipped_gradient_norm=0.1))
    state = create_train_state(system, rng, IMAGE_HW, tx, batch_size=2)

    nprng = np.random.default_rng(0)
    disparity = np.zeros((2, IMAGE_HW[0] // 4, IMAGE_HW[1] // 4), np.float32)
    disparity[:, 8:, 10:] = nprng.uniform(1, 20, disparity[:, 8:, 10:].shape)
    batch = dict(
        left_images=jnp.asarray(nprng.standard_normal((2, *IMAGE_HW, 3)).astype(np.float32)),
        right_images=jnp.asarray(nprng.standard_normal((2, *IMAGE_HW, 3)).astype(np.float32)),
        P2=jnp.asarray(sample_P(2)),
        P3=jnp.asarray(sample_P(2, tx=-120.0)),
        annotations=jnp.asarray(random_annotations(nprng, 2, num_classes=2,
                                                   image_hw=IMAGE_HW)),
        disparity=jnp.asarray(disparity),
    )
    step = make_stereo_train_step(system, tx, donate=False)
    new_state, metrics = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics['total']))
    assert float(metrics['total']) > 0
    assert float(metrics['disparity_loss'][0]) > 0

    variables = {'params': new_state.params, 'batch_stats': new_state.batch_stats}
    out = system.predict(variables, batch['left_images'], batch['right_images'],
                         batch['P2'], batch['P3'], max_detections=8)
    assert out['scores'].shape == (2, 8)
    assert out['bboxes'].shape == (2, 8, 11)


def test_stereo_feature_channels(system):
    """Channel plan parity: 24/24/96 volumes -> 1152 pyramid + 256|64 left."""
    variables = system.init(jax.random.PRNGKey(0), IMAGE_HW, batch_size=1)
    left = jnp.zeros((1, *IMAGE_HW, 3))
    P2 = jnp.asarray(sample_P(1))
    cls_preds, reg_preds, depth = system.net.apply(
        variables, left, left, P2, train=False)
    n_anchors_total = (IMAGE_HW[0] // 16) * (IMAGE_HW[1] // 16) * system.anchors.num_anchors
    assert cls_preds.shape == (1, n_anchors_total, 3)   # 2 classes + alpha
    assert reg_preds.shape == (1, n_anchors_total, 12)


def test_bf16_inference_path(system):
    """bfloat16 trunk inference must run and produce finite, close outputs."""
    import copy
    variables = system.init(jax.random.PRNGKey(0), IMAGE_HW, batch_size=1)
    nprng = np.random.default_rng(3)
    left = jnp.asarray(nprng.standard_normal((1, *IMAGE_HW, 3)).astype(np.float32))
    right = jnp.asarray(nprng.standard_normal((1, *IMAGE_HW, 3)).astype(np.float32))
    P2 = jnp.asarray(sample_P(1))
    out32 = system.predict(variables, left, right, P2, max_detections=4)
    system.cfg.inference_dtype = 'bfloat16'
    try:
        out16 = system.predict(variables, left, right, P2, max_detections=4)
    finally:
        system.cfg.inference_dtype = 'float32'
    assert np.all(np.isfinite(np.asarray(out16['bboxes'])))
    # same static shapes, scores within bf16 tolerance of f32
    assert out16['scores'].shape == out32['scores'].shape


def test_stereo_data_parallel_step(system):
    """Flagship DP: stereo train step over an 8-device mesh with the batch
    (incl. nested disparity) sharded on the data axis."""
    from visualdet3d_tpu.parallel import mesh as mesh_lib
    devices = jax.devices()
    assert len(devices) >= 8
    m = mesh_lib.make_mesh(devices[:8])

    tx = build_optimizer(
        edict(type_name='adam', keywords=edict(lr=1e-4), clipped_gradient_norm=0.1))
    state = create_train_state(system, jax.random.PRNGKey(0), IMAGE_HW,
                               tx, batch_size=8)
    state = mesh_lib.replicate(m, state)

    nprng = np.random.default_rng(7)
    disparity = np.abs(nprng.standard_normal(
        (8, IMAGE_HW[0] // 4, IMAGE_HW[1] // 4))).astype(np.float32) * 5
    batch = dict(
        left_images=nprng.standard_normal((8, *IMAGE_HW, 3)).astype(np.float32),
        right_images=nprng.standard_normal((8, *IMAGE_HW, 3)).astype(np.float32),
        P2=sample_P(8),
        P3=sample_P(8, tx=-120.0),
        annotations=random_annotations(nprng, 8, num_classes=2, image_hw=IMAGE_HW),
        disparity=disparity,
    )
    sharded = mesh_lib.shard_batch(m, batch)
    for leaf in jax.tree.leaves(sharded):
        assert len(leaf.sharding.device_set) == 8

    step = make_stereo_train_step(system, tx, donate=False)
    compiled = step.lower(state, sharded, jax.random.PRNGKey(3)).compile()

    # A pure data-parallel program must communicate ONLY via gradient /
    # SyncBN all-reduces. Round 2 shipped a cross-module all-to-all here
    # (concatenate(axis=0) of two batch-sharded eyes resharded every left row
    # onto the first half of the mesh) which straggled and aborted XLA:CPU's
    # 40 s collective rendezvous on a loaded host. _stack_eyes keeps the
    # doubled batch shard-local; pin that property at the HLO level.
    hlo = compiled.as_text()
    assert 'all-to-all' not in hlo, 'sharded stereo step reshards the batch'
    assert 'collective-permute' not in hlo, 'unexpected cross-device permute'
    assert 'all-reduce' in hlo  # grads/SyncBN do still communicate

    new_state, metrics = compiled(state, sharded, jax.random.PRNGKey(3))
    assert np.isfinite(float(metrics['total'])) and float(metrics['total']) > 0


def test_stereo_train_step_mixed_precision(system):
    """bf16-compute/f32-master mode (train_state._mixed_precision_interceptor):
    master params/batch_stats/grads stay f32 and the SGD update direction
    agrees with the pure-f32 step (the reference trains pure f32,
    trainers.py:84-128, so the mode must be a numerics-preserving option)."""
    import optax

    rng = jax.random.PRNGKey(0)
    tx = optax.sgd(1e-3)  # delta == -lr * grad: deltas compare gradients
    state = create_train_state(system, rng, IMAGE_HW, tx, batch_size=2)

    nprng = np.random.default_rng(2)
    disparity = np.abs(nprng.standard_normal(
        (2, IMAGE_HW[0] // 4, IMAGE_HW[1] // 4))).astype(np.float32) * 10
    batch = dict(
        left_images=jnp.asarray(nprng.standard_normal((2, *IMAGE_HW, 3)).astype(np.float32)),
        right_images=jnp.asarray(nprng.standard_normal((2, *IMAGE_HW, 3)).astype(np.float32)),
        P2=jnp.asarray(sample_P(2)),
        P3=jnp.asarray(sample_P(2, tx=-120.0)),
        annotations=jnp.asarray(random_annotations(nprng, 2, num_classes=2,
                                                   image_hw=IMAGE_HW)),
        disparity=jnp.asarray(disparity),
    )
    key = jax.random.PRNGKey(1)
    step_f32 = make_stereo_train_step(system, tx, donate=False)
    step_mp = make_stereo_train_step(system, tx, donate=False,
                                     compute_dtype='bfloat16')
    new_f, met_f = step_f32(state, batch, key)
    new_m, met_m = step_mp(state, batch, key)

    # master state stays f32
    for leaf in jax.tree.leaves((new_m.params, new_m.batch_stats)):
        assert leaf.dtype == jnp.float32, leaf.dtype
    tf, tm = float(met_f['total']), float(met_m['total'])
    assert np.isfinite(tm) and tm > 0
    # the loss itself is computed f32 from upcast preds, so it parities
    # tightly (measured 2.5e-6 rel on this fixture)
    assert abs(tm - tf) / abs(tf) < 1e-3, (tf, tm)

    # gradient-direction parity: cosine of the SGD param deltas. At random
    # init the per-leaf cosines are noisy (bf16 forward perturbs
    # near-cancelling contributions; pre-BN conv biases have TRUE grad ~0
    # that only bf16 rounding makes nonzero), so gate the overall direction
    # loosely and the per-leaf grad *magnitudes* for non-degenerate leaves
    # (measured: overall cosine 0.977 on this fixture).
    df = [np.asarray(a - b, np.float64).ravel() for a, b in zip(
        jax.tree.leaves(new_f.params), jax.tree.leaves(state.params))]
    dm = [np.asarray(a - b, np.float64).ravel() for a, b in zip(
        jax.tree.leaves(new_m.params), jax.tree.leaves(state.params))]
    cf, cm = np.concatenate(df), np.concatenate(dm)
    cos = float(cf @ cm / (np.linalg.norm(cf) * np.linalg.norm(cm)))
    assert cos > 0.9, cos
    for a, b in zip(df, dm):
        na, nb = np.linalg.norm(a), np.linalg.norm(b)
        if na > 1e-4 * 1e-3:  # f32 grad norm > 1e-4 (deltas carry lr=1e-3)
            assert 0.5 < nb / na < 2.0, (na, nb)


def test_stereo_data_parallel_step_mixed_precision(system):
    """MP + DP compose: the bf16-compute interceptor step compiles and runs
    over the 8-device data mesh without resharding collectives (same HLO
    property as the f32 DP test) and keeps f32 master state."""
    from visualdet3d_tpu.parallel import mesh as mesh_lib
    m = mesh_lib.make_mesh(jax.devices()[:8])

    tx = build_optimizer(
        edict(type_name='adam', keywords=edict(lr=1e-4), clipped_gradient_norm=0.1))
    state = create_train_state(system, jax.random.PRNGKey(0), IMAGE_HW,
                               tx, batch_size=8)
    state = mesh_lib.replicate(m, state)

    nprng = np.random.default_rng(9)
    batch = dict(
        left_images=nprng.standard_normal((8, *IMAGE_HW, 3)).astype(np.float32),
        right_images=nprng.standard_normal((8, *IMAGE_HW, 3)).astype(np.float32),
        P2=sample_P(8),
        P3=sample_P(8, tx=-120.0),
        annotations=random_annotations(nprng, 8, num_classes=2, image_hw=IMAGE_HW),
        disparity=np.abs(nprng.standard_normal(
            (8, IMAGE_HW[0] // 4, IMAGE_HW[1] // 4))).astype(np.float32) * 5,
    )
    sharded = mesh_lib.shard_batch(m, batch)
    step = make_stereo_train_step(system, tx, donate=False,
                                  compute_dtype='bfloat16')
    compiled = step.lower(state, sharded, jax.random.PRNGKey(3)).compile()
    hlo = compiled.as_text()
    assert 'all-to-all' not in hlo
    assert 'all-reduce' in hlo
    new_state, metrics = compiled(state, sharded, jax.random.PRNGKey(3))
    assert np.isfinite(float(metrics['total'])) and float(metrics['total']) > 0
    for leaf in jax.tree.leaves((new_state.params, new_state.batch_stats)):
        assert leaf.dtype == jnp.float32
