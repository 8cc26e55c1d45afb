"""BN-folding parity: folded variables must produce (near-)identical eval
outputs on every detector family. Pairing is dataflow-detected
(models/fold_bn.py), so these tests also guard against a conv output being
consumed by both a BN and a residual branch (which folding would corrupt).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from visualdet3d_tpu.models.fold_bn import detect_conv_bn_pairs, fold_batchnorm


def _rand_stats(variables, seed=0):
    """Randomize batch_stats + BN params so folding is non-trivial."""
    rng = np.random.default_rng(seed)

    def walk(tree, is_stats):
        out = {}
        for k, v in tree.items():
            if isinstance(v, dict):
                out[k] = walk(v, is_stats)
            elif is_stats and k == 'mean':
                out[k] = jnp.asarray(rng.uniform(-0.3, 0.3, v.shape), v.dtype)
            elif is_stats and k == 'var':
                out[k] = jnp.asarray(rng.uniform(0.5, 1.5, v.shape), v.dtype)
            else:
                out[k] = v
        return out

    from flax.core import unfreeze
    v = {k: unfreeze(t) for k, t in variables.items()}
    v['batch_stats'] = walk(v['batch_stats'], True)
    return v


def test_fold_bn_simple_module():
    from flax import linen as nn

    class M(nn.Module):
        @nn.compact
        def __call__(self, x):
            x = nn.Conv(8, (3, 3), padding='SAME')(x)           # with bias
            x = nn.BatchNorm(use_running_average=True)(x)
            x = nn.relu(x)
            x = nn.Conv(8, (3, 3), padding='SAME', use_bias=False)(x)
            x = nn.BatchNorm(use_running_average=True)(x)
            y = nn.Conv(8, (1, 1))(x)                           # NO bn after
            return x + y

    m = M()
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 8, 8, 3)),
                    jnp.float32)
    variables = _rand_stats(m.init(jax.random.PRNGKey(0), x))
    pairs = detect_conv_bn_pairs(lambda v, xx: m.apply(v, xx), variables, x)
    assert len(pairs) == 2, pairs

    folded = fold_batchnorm(variables, lambda v, xx: m.apply(v, xx), x)
    ref = m.apply(variables, x)
    got = m.apply(folded, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)
    # the folded conv kernels must differ (the fold actually happened)
    k0 = np.asarray(variables['params']['Conv_0']['kernel'])
    k0f = np.asarray(folded['params']['Conv_0']['kernel'])
    assert np.abs(k0 - k0f).max() > 1e-6


IMAGE_HW = (64, 160)


def _build_system(family, tmp_path_factory):
    from visualdet3d_tpu.config import EasyDict as edict
    from visualdet3d_tpu.registry import DETECTOR_DICT
    import visualdet3d_tpu.models  # noqa: F401
    from helpers import tiny_mono_cfg, write_fake_priors

    rng = np.random.default_rng(1)
    P2 = np.array([[220.0, 0.0, 80.0, 0.0],
                   [0.0, 220.0, 30.0, 0.1],
                   [0.0, 0.0, 1.0, 0.002]], np.float32)

    def imgs(batch):
        return jnp.asarray(rng.standard_normal((batch, *IMAGE_HW, 3)),
                           jnp.float32)

    if family == 'km3d':
        cfg = edict(obj_types=['Car'], name='KM3D',
                    backbone=edict(name='dla', depth=34),
                    head=edict(layer_cfg=edict(head_features=16),
                               loss_cfg=edict(rampup_length=100),
                               test_cfg=edict(score_thr=0.1, nms_iou_thr=0.5,
                                              top_k=20)))
        system = DETECTOR_DICT['KM3D'](cfg)
        make_inputs = lambda batch: (imgs(batch),
                                     jnp.asarray(np.repeat(P2[None], batch, 0)))
        return system, make_inputs

    pre = str(tmp_path_factory.mktemp('pre'))
    write_fake_priors(pre, ['Car'])
    cfg = tiny_mono_cfg(pre, obj_types=('Car',), ground_aware=(family == 'gac'))
    cfg.head.test_cfg.score_thr = 0.05
    if family == 'stereo':
        cfg.name = 'Stereo3D'
        cfg.backbone.out_indices = (0, 1, 2)
        cfg.head.layer_cfg.num_features_in = 1408
        cfg.head.layer_cfg.reg_feature_size = 64
        cfg.head.loss_cfg.pop('match_low_quality')
        system = DETECTOR_DICT['Stereo3D'](cfg)
        make_inputs = lambda batch: (imgs(batch), imgs(batch),
                                     jnp.asarray(np.repeat(P2[None], batch, 0)))
    else:
        system = DETECTOR_DICT[cfg.name](cfg)
        make_inputs = lambda batch: (imgs(batch),
                                     jnp.asarray(np.repeat(P2[None], batch, 0)))
    return system, make_inputs


@pytest.mark.parametrize('family', ['gac', 'stereo', 'km3d'])
def test_fold_bn_detector_parity(family, tmp_path_factory):
    system, make_inputs = _build_system(family, tmp_path_factory)
    variables = _rand_stats(
        system.init(jax.random.PRNGKey(0), IMAGE_HW, batch_size=1), seed=3)
    folded = system.fold_inference_variables(variables, IMAGE_HW, batch_size=2)
    inputs = make_inputs(batch=2)
    ref = jax.tree.map(np.asarray, system.predict(variables, *inputs))
    got = jax.tree.map(np.asarray, system.predict(folded, *inputs))
    # raw network outputs are float-identical up to reassociation; decoded
    # box lists additionally pass through thresholding/NMS (and, for KM3D,
    # an LSQ position solve that amplifies ulp-level diffs under random
    # weights), so compare the continuous outputs loosely and the discrete
    # ones exactly
    rtol = 2e-2 if family == 'km3d' else 2e-3
    for k in ref:
        if ref[k].dtype.kind == 'f':
            np.testing.assert_allclose(got[k], ref[k], rtol=rtol, atol=2e-3,
                                       err_msg=f'{family}:{k}')
        else:
            np.testing.assert_array_equal(got[k], ref[k],
                                          err_msg=f'{family}:{k}')
