"""Ablation benchmark: time each stage of the stereo forward separately."""
import json
import sys
import time

import numpy as np


def timeit(fn, *args, iters=20):
    import jax
    jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1000  # ms


def main():
    import os
    import sys as _sys
    _sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import jax
    import jax.numpy as jnp
    from flax.core import FrozenDict
    from __graft_entry__ import _build_system
    from visualdet3d_tpu.models.backbones.resnet import resnet
    from visualdet3d_tpu.models.detectors.yolo3d import cast_floating
    from visualdet3d_tpu.models.detectors.yolostereo3d import StereoMerging
    from visualdet3d_tpu.ops.cost_volume import correlation_volume_pallas

    image_hw = (288, 1280)
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    dtype = sys.argv[2] if len(sys.argv) > 2 else 'bfloat16'
    system = _build_system(image_hw)
    system.cfg.inference_dtype = dtype
    variables = system.init(jax.random.PRNGKey(0), image_hw, batch_size=1)
    system.anchor_pack(image_hw)

    rng = np.random.default_rng(0)
    left = jnp.asarray(rng.standard_normal((batch, *image_hw, 3)).astype(np.float32))
    right = jnp.asarray(rng.standard_normal((batch, *image_hw, 3)).astype(np.float32))
    P2 = jnp.asarray(np.tile(np.array([
        [721.5377, 0.0, 609.5593, 44.85728],
        [0.0, 721.5377, 72.854, 0.2163791],
        [0.0, 0.0, 1.0, 0.002745884]], np.float32), (batch, 1, 1)))

    results = {}

    # full predict
    @jax.jit
    def full(v, l, r, p):
        out = system.predict(v, l, r, p, max_detections=32)
        return out['scores']
    results['full_predict_ms'] = timeit(full, variables, left, right, P2)

    # network forward only (no decode/NMS)
    @jax.jit
    def net_only(v, l, r, p):
        v = cast_floating(v, dtype) if dtype != 'float32' else v
        l = l.astype(dtype); r = r.astype(dtype)
        return system.net.apply(v, l, r, p, train=False)[0]
    results['net_forward_ms'] = timeit(net_only, variables, left, right, P2)

    # backbone only (doubled batch)
    bb_cfg = FrozenDict(dict(system.cfg.backbone))
    bb = resnet(**dict(bb_cfg))
    bb_vars = {'params': variables['params']['YoloStereo3DNet' if False else 'resnet_0']} \
        if False else None
    # extract backbone params from the net tree
    pt = variables['params']
    bt = variables['batch_stats']
    bb_key = [k for k in pt.keys() if 'ResNet' in k or 'resnet' in k][0]
    bb_vars = {'params': pt[bb_key], 'batch_stats': bt[bb_key]}

    @jax.jit
    def backbone_only(v, l, r):
        v = cast_floating(v, dtype) if dtype != 'float32' else v
        images = jnp.concatenate([l.astype(dtype), r.astype(dtype)], axis=0)
        return bb.apply(v, images, train=False)[-1]
    results['backbone_ms'] = timeit(backbone_only, bb_vars, left, right)

    # correlation kernels alone
    l4 = jnp.asarray(rng.standard_normal((batch, 72, 320, 64)).astype(np.float32))
    r4 = jnp.asarray(l4)
    results['corr_s4_ms'] = timeit(
        jax.jit(lambda a, b: correlation_volume_pallas(a, b, 24)), l4, r4)
    l8 = jnp.asarray(rng.standard_normal((batch, 36, 160, 128)).astype(np.float32))
    results['corr_s8_ms'] = timeit(
        jax.jit(lambda a, b: correlation_volume_pallas(a, b, 24)), l8, l8)

    results['decode_nms_ms'] = results['full_predict_ms'] - results['net_forward_ms']
    results['merging_head_ms'] = results['net_forward_ms'] - results['backbone_ms']
    print(json.dumps({k: round(v, 2) for k, v in results.items()}))


if __name__ == '__main__':
    main()
