"""Diagnose the r2 rtm3d 8-vs-1-device gradient divergence (VERDICT r2 #1ii).

Computes RAW gradients (pre-optimizer) of the rtm3d loss, sharded over an
8-device CPU mesh vs unsharded, overall and per loss term (by zeroing the
other terms' weights), and reports per-leaf relative errors. Run:

  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python tools/diag_rtm3d_gradparity.py

FINDINGS (r3, recorded in tests/test_km3d.py): the loss scalar matches to
~8e-7 relative but raw grads diverge at ~2e-3..2e-2 of grad-max for BOTH
the DLA and resnet cores — SyncBN reduction-order ulps cross genuine
gradient discontinuities (DCN bilinear floor(), ReLU kinks, the
Position_loss LSQ backward). Reordering the batch on ONE device produces
the same divergence scale, so the grad-parity test asserts the sharded
divergence stays within a small multiple of that intrinsic noise floor.
CAUTION when reproducing standalone: without the env vars above, this
image's sitecustomize registers a 1-chip axon TPU and `devices[:8]` is ONE
device — a sharded-vs-dense comparison then trivially (and meaninglessly)
returns bitwise zero.
"""
import os
import sys

os.environ['JAX_PLATFORMS'] = 'cpu'
flags = os.environ.get('XLA_FLAGS', '')
if '--xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (flags + ' --xla_force_host_platform_device_count=8').strip()
if 'jax' in sys.modules:
    import jax
    jax.config.update('jax_platforms', 'cpu')

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', 'tests'))

from visualdet3d_tpu.config import EasyDict as edict
from visualdet3d_tpu.parallel import mesh as mesh_lib
from visualdet3d_tpu.registry import DETECTOR_DICT
import visualdet3d_tpu.models.detectors.km3d  # noqa: F401
from visualdet3d_tpu.models.heads import km3d_head as km3d_lib

from test_km3d import P2, _make_obj, _targets_for, _km3d_cfg
from visualdet3d_tpu.data.kitti.dataset.km3d_dataset import KittiRTM3DDataset


def main():
    devices = jax.devices()
    assert len(devices) >= 8
    m = mesh_lib.make_mesh(devices[:8])

    cfg = _km3d_cfg('KM3D')
    system = DETECTOR_DICT['KM3D'](cfg)
    image_hw = (64, 160)
    variables = system.init(jax.random.PRNGKey(0), image_hw)
    params, batch_stats = variables['params'], variables['batch_stats']

    nprng = np.random.default_rng(3)
    targets = []
    for i in range(8):
        obj = _make_obj(z=8.0 + i)
        obj.bbox_l, obj.bbox_t, obj.bbox_r, obj.bbox_b = 40, 20, 100, 50
        targets.append(_targets_for([obj], KittiRTM3DDataset, image_hw=image_hw))
    gts = {k: np.stack([t[k] for t in targets]) for k in targets[0]}
    batch = dict(
        images=nprng.standard_normal((8, *image_hw, 3)).astype(np.float32),
        gts=gts,
        P2=np.tile(P2[None], (8, 1, 1)),
        epoch=np.float32(5.0),
    )

    def make_grad_fn(term_mask):
        # term_mask: dict name->0/1 multiplier over the loss_dict terms
        def loss_fn(p, images, gts, P2b, epoch):
            v = {'params': p, 'batch_stats': batch_stats}
            output, _ = system.net.apply(v, images, train=True,
                                         mutable=['batch_stats'])
            output_w = images.shape[2] // 4
            loss, loss_dict = km3d_lib.km3d_loss(
                output, gts, P2b, jnp.asarray(epoch, jnp.float32), output_w,
                rampup_length=100)
            if term_mask is None:
                return jnp.mean(loss)
            tot = 0.0
            for k, w in term_mask.items():
                tot = tot + w * jnp.mean(loss_dict[k])
            return tot
        return jax.jit(jax.grad(loss_fn))

    # discover term names
    v = {'params': params, 'batch_stats': batch_stats}
    output, _ = system.net.apply(v, jnp.asarray(batch['images']), train=True,
                                 mutable=['batch_stats'])
    _, loss_dict = km3d_lib.km3d_loss(
        output, jax.tree.map(jnp.asarray, gts), jnp.asarray(batch['P2']),
        jnp.asarray(5.0), image_hw[1] // 4, rampup_length=100)
    terms = [k for k in loss_dict if k.endswith('loss') or '_' in k]
    print('terms:', {k: float(np.mean(loss_dict[k])) for k in loss_dict})

    sharded = mesh_lib.shard_batch(m, batch)
    params8 = mesh_lib.replicate(m, params)
    dense = jax.tree.map(jnp.asarray, batch)

    def compare(tag, gfn):
        g8 = gfn(params8, sharded['images'], sharded['gts'], sharded['P2'],
                 sharded['epoch'])
        g1 = gfn(params, dense['images'], dense['gts'], dense['P2'],
                 dense['epoch'])
        worst_abs, worst_rel, worst_leaf = 0.0, 0.0, None
        for path, a in jax.tree_util.tree_flatten_with_path(g8)[0]:
            b = jax.tree_util.tree_flatten_with_path(g1)[0]
            pass
        flat8 = jax.tree_util.tree_leaves_with_path(g8)
        flat1 = dict(jax.tree_util.tree_leaves_with_path(g1))
        for path, a in flat8:
            b = flat1[path]
            a, b = np.asarray(a), np.asarray(b)
            d = np.abs(a - b)
            absmax = float(d.max()) if d.size else 0.0
            rel = float((d / (np.abs(b) + 1e-8)).max()) if d.size else 0.0
            # rel where |b| is non-trivial
            mask = np.abs(b) > 1e-6
            relm = float((d[mask] / np.abs(b[mask])).max()) if mask.any() else 0.0
            if absmax > worst_abs:
                worst_abs, worst_leaf = absmax, jax.tree_util.keystr(path)
            worst_rel = max(worst_rel, relm)
        print(f'{tag}: worst_abs={worst_abs:.3e} at {worst_leaf}; '
              f'worst_rel(|g|>1e-6)={worst_rel:.3e}')

    compare('ALL-TERMS', make_grad_fn(None))
    for k in loss_dict:
        compare(f'term {k}', make_grad_fn({k: 1.0}))


if __name__ == '__main__':
    main()
