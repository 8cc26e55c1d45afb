import numpy as np
import jax
import jax.numpy as jnp
import pytest

from visualdet3d_tpu.registry import DETECTOR_DICT
import visualdet3d_tpu.models.detectors.yolo3d  # noqa: F401 (registration)
from visualdet3d_tpu.config import EasyDict as edict
from visualdet3d_tpu.solver import build_optimizer
from visualdet3d_tpu.pipelines.train_state import (
    create_train_state, make_detection_train_step)
from visualdet3d_tpu.parallel import mesh as mesh_lib

from helpers import random_annotations, tiny_mono_cfg, write_fake_priors

IMAGE_HW = (64, 160)


def sample_P2(batch):
    P2 = np.array([
        [220.0, 0.0, 80.0, 10.0],
        [0.0, 220.0, 30.0, 0.1],
        [0.0, 0.0, 1.0, 0.002],
    ], np.float32)
    return np.repeat(P2[None], batch, axis=0)


@pytest.fixture(scope='module')
def system(tmp_path_factory):
    pre = str(tmp_path_factory.mktemp('pre'))
    write_fake_priors(pre, ['Car'])
    cfg = tiny_mono_cfg(pre, ground_aware=True)
    return DETECTOR_DICT[cfg.name](cfg)


def test_registry_has_detectors():
    assert 'Yolo3D' in DETECTOR_DICT
    assert 'GroundAwareYolo3D' in DETECTOR_DICT


def test_ground_aware_train_step_and_predict(system):
    rng = jax.random.PRNGKey(0)
    tx = build_optimizer(
        edict(type_name='adam', keywords=edict(lr=1e-4), clipped_gradient_norm=0.1))
    state = create_train_state(system, rng, IMAGE_HW, tx, batch_size=2)

    nprng = np.random.default_rng(0)
    batch = dict(
        images=jnp.asarray(nprng.standard_normal((2, *IMAGE_HW, 3)).astype(np.float32)),
        P2=jnp.asarray(sample_P2(2)),
        annotations=jnp.asarray(random_annotations(nprng, 2, image_hw=IMAGE_HW)),
    )
    step = make_detection_train_step(system, tx, donate=False)
    new_state, metrics = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics['total']))
    assert float(metrics['total']) > 0
    assert float(metrics['reg_loss'][0]) > 0  # positives were assigned
    # params changed somewhere
    changed = any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(state.params),
                        jax.tree.leaves(new_state.params)))
    assert changed

    # prediction path: static shapes
    variables = {'params': new_state.params, 'batch_stats': new_state.batch_stats}
    out = system.predict(variables, batch['images'], batch['P2'], max_detections=8)
    assert out['scores'].shape == (2, 8)
    assert out['bboxes'].shape == (2, 8, 11)
    assert out['valid'].dtype == bool


def test_data_parallel_train_step(system):
    """The same step over an 8-device data mesh: sharded batch, replicated
    params — GSPMD inserts the gradient all-reduce (SyemcBN included)."""
    devices = jax.devices()
    assert len(devices) >= 8, 'conftest must force 8 CPU devices'
    m = mesh_lib.make_mesh(devices[:8])

    rng = jax.random.PRNGKey(0)
    tx = build_optimizer(
        edict(type_name='adam', keywords=edict(lr=1e-4), clipped_gradient_norm=0.1))
    state = create_train_state(system, rng, IMAGE_HW, tx, batch_size=8)
    state = mesh_lib.replicate(m, state)

    nprng = np.random.default_rng(1)
    batch = dict(
        images=nprng.standard_normal((8, *IMAGE_HW, 3)).astype(np.float32),
        P2=sample_P2(8),
        annotations=random_annotations(nprng, 8, image_hw=IMAGE_HW),
    )
    sharded = mesh_lib.shard_batch(m, batch)
    for leaf in jax.tree.leaves(sharded):
        assert len(leaf.sharding.device_set) == 8

    step = make_detection_train_step(system, tx, donate=False)
    new_state, metrics = step(state, sharded, jax.random.PRNGKey(2))
    total = float(metrics['total'])
    assert np.isfinite(total) and total > 0

    # parity: the same batch unsharded on one device gives the same loss
    state1 = create_train_state(system, jax.random.PRNGKey(0), IMAGE_HW, tx,
                                batch_size=8)
    _, metrics1 = step(state1, jax.tree.map(jnp.asarray, batch), jax.random.PRNGKey(2))
    np.testing.assert_allclose(total, float(metrics1['total']), rtol=2e-4)


def test_s2d_stem_exactly_matches_7x7():
    """The space-to-depth stem with the rearranged kernel reproduces the
    7x7/s2 stem bit-for-bit (up to float assoc)."""
    from flax.core import unfreeze
    from visualdet3d_tpu.models.backbones.resnet import (ResNet,
                                                         convert_stem_to_s2d)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, 32, 64, 3)).astype(np.float32))
    net7 = ResNet(depth=18, num_stages=1, out_indices=(0,))
    v7 = unfreeze(net7.init(jax.random.PRNGKey(0), x, train=False))
    net4 = ResNet(depth=18, num_stages=1, out_indices=(0,), s2d_stem=True)
    v4 = unfreeze(net4.init(jax.random.PRNGKey(0), x, train=False))
    v4['params'] = dict(v7['params'])
    v4['params']['conv1'] = {
        'kernel': jnp.asarray(convert_stem_to_s2d(v7['params']['conv1']['kernel']))}
    v4['batch_stats'] = v7['batch_stats']
    y7 = net7.apply(v7, x, train=False)[0]
    y4 = net4.apply(v4, x, train=False)[0]
    np.testing.assert_allclose(np.asarray(y7), np.asarray(y4), atol=1e-4)


def test_backbone_remat_same_params_outputs_grads():
    """remat=True must not change the param tree, outputs, or gradients."""
    from visualdet3d_tpu.models.backbones.resnet import ResNet
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 32, 64, 3)).astype(np.float32))
    net = ResNet(depth=18, num_stages=2, out_indices=(0, 1))
    net_r = ResNet(depth=18, num_stages=2, out_indices=(0, 1), remat=True)
    v = net.init(jax.random.PRNGKey(0), x, train=False)
    v_r = net_r.init(jax.random.PRNGKey(0), x, train=False)
    assert jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(v_r)

    y = net.apply(v, x, train=False)
    y_r = net_r.apply(v_r, x, train=False)
    for a, b in zip(y, y_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)

    def loss(net_, v_):
        out, _ = net_.apply(v_, x, train=True, mutable=['batch_stats'])
        return sum(jnp.sum(o ** 2) for o in out)

    g = jax.grad(lambda v_: loss(net, v_))(v)
    g_r = jax.grad(lambda v_: loss(net_r, v_))(v_r)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-3, rtol=2e-3), g, g_r)
