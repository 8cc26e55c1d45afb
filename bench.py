"""Benchmark: flagship forward throughput on one chip (stereo + mono + KM3D).

Primary metric: YOLOStereo3D forward (dual-eye backbone, Pallas correlation
volumes, cost-volume pyramid, head, decode + on-device NMS) at the KITTI
benchmark resolution (288 x 1280). BASELINE.md's primary metric is
"mono3D + stereo3D forward", so `detail` also carries GAC mono fps and
KM3D (DLA-34 + DCN neck) fps. Prints ONE JSON line:
  {"metric": ..., "value": fps, "unit": ..., "vs_baseline": ..., "detail": {...}}

Baseline: the north-star target of 500 frames/s/chip on TPU v5e
(BASELINE.md; the reference YOLOStereo3D paper reports ~12.5 fps on a
GTX 1080Ti). vs_baseline = stereo_fps / 500.

All timings are PROFILER device time with distinct host-uploaded inputs:
wall-clock loops can be cached or elided by the axon execution relay
(CLAUDE.md "Benchmarking on the axon relay").

Usage: python bench.py [batch] [dtype] [stereo|mono|km3d|all]
dtype defaults to 'auto': each model's fastest parity-gated inference
config (int8 MXU trunk for stereo/mono, bf16 for the gather-bound KM3D).
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

KITTI_P2 = np.array([
    [721.5377, 0.0, 609.5593, 44.85728],
    [0.0, 721.5377, 72.854, 0.2163791],
    [0.0, 0.0, 1.0, 0.002745884],
], np.float32)


def _device_ms(fn, argsets, iters=12):
    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.abspath(__file__)), 'tools'))
    from tpu_time import device_ms
    return device_ms(fn, argsets, iters=iters)


def bench_stereo(batch, dtype, bs1_dtype=None):
    """bs1_dtype: dtype for the batch-1 latency measurement. Auto picks bf16
    there: int8's per-call quantize overhead loses below batch ~4 (measured
    r4: bs1 int8 8.63 ms vs 6.99 bf16 device; VERDICT r4 #5)."""
    import jax
    import jax.numpy as jnp
    from __graft_entry__ import _build_system
    from visualdet3d_tpu.models.detectors.yolo3d import cast_floating

    image_hw = (288, 1280)
    system = _build_system(image_hw)
    system.cfg.inference_dtype = dtype
    variables = system.init(jax.random.PRNGKey(0), image_hw, batch_size=1)
    system.anchor_pack(image_hw)
    # fold BN into conv kernels (f32), THEN cast weights once outside jit
    variables = system.fold_inference_variables(variables, image_hw)
    folded_f32 = variables
    rng = np.random.default_rng(0)

    def prep(dt):
        if dt == 'int8':
            # post-training quantization: calibrate activation scales on a
            # couple of batches, move selected conv kernels into the int8
            # 'quant' collection (models/quant.py); predict runs them on the
            # MXU at 394 TOPS with the non-conv remainder in bf16.
            # int8_all (quantize the prediction convs too) measured -1.04 ms
            # stereo / -0.39 ms mono at batch 16 (tools/bench_int8_knobs.py)
            # and matches configs/stereo3d_int8.py.
            system.cfg.int8_all = True
            crng = np.random.default_rng(0)
            P2c = jnp.asarray(np.tile(KITTI_P2, (2, 1, 1)))
            calib = [(jnp.asarray(crng.standard_normal(
                          (2, *image_hw, 3)).astype(np.float32)),
                      jnp.asarray(crng.standard_normal(
                          (2, *image_hw, 3)).astype(np.float32)),
                      P2c) for _ in range(2)]
            absmax = system.calibrate_int8(folded_f32, calib)
            return jax.device_put(
                system.quantize_int8(folded_f32, absmax, image_hw))
        if dt != 'float32':
            return jax.device_put(cast_floating(folded_f32, dt))
        return folded_f32

    variables = prep(dtype)

    def make_forward(dt):
        @jax.jit
        def forward(variables, left, right, P2):
            system.cfg.inference_dtype = dt
            out = system.predict(variables, left, right, P2,
                                 max_detections=32)
            return out['scores'], out['bboxes'], out['labels'], out['valid']
        return forward

    forward = make_forward(dtype)

    rng = np.random.default_rng(0)
    P2 = jnp.asarray(np.tile(KITTI_P2, (batch, 1, 1)))
    n_sets = 6
    sets = [(jnp.asarray(rng.standard_normal((batch, *image_hw, 3)).astype(np.float32)),
             jnp.asarray(rng.standard_normal((batch, *image_hw, 3)).astype(np.float32)))
            for _ in range(n_sets)]
    jax.block_until_ready(forward(variables, sets[0][0], sets[0][1], P2))
    argsets = [(variables, l, r, P2) for l, r in sets]
    ms_device = _device_ms(forward, argsets, iters=12)
    fps = batch / ms_device * 1000

    # p50 latency at batch 1 (distinct inputs per call)
    bs1_dtype = bs1_dtype or dtype
    if bs1_dtype != dtype:
        vars1 = prep(bs1_dtype)
        forward1 = make_forward(bs1_dtype)
    else:
        vars1, forward1 = variables, forward
    P21 = P2[:1]
    # host-uploaded batch-1 inputs (device-computed inputs can be lazily
    # elided by the relay, CLAUDE.md)
    ones = [(jnp.asarray(rng.standard_normal((1, *image_hw, 3)).astype(np.float32)),
             jnp.asarray(rng.standard_normal((1, *image_hw, 3)).astype(np.float32)))
            for _ in range(n_sets)]
    jax.block_until_ready(forward1(vars1, ones[0][0], ones[0][1], P21))
    lats = []
    for i in range(12):
        l1, r1 = ones[i % n_sets]
        t = time.perf_counter()
        jax.block_until_ready(forward1(vars1, l1, r1, P21))
        lats.append(time.perf_counter() - t)
    p50_ms = float(np.median(lats) * 1000)
    # the wall p50 through the axon relay is ~85% HTTP round-trip (measured
    # r3: 37-42 ms wall vs 6.9 ms device); record the honest device number
    p50_dev_ms = _device_ms(forward1,
                            [(vars1, l, r, P21) for l, r in ones],
                            iters=10)
    return fps, ms_device, p50_ms, p50_dev_ms, bs1_dtype


def bench_mono(batch, dtype):
    """GAC mono forward at the same KITTI resolution."""
    import jax
    import jax.numpy as jnp
    from visualdet3d_tpu.registry import DETECTOR_DICT
    import visualdet3d_tpu.models  # noqa: F401
    from visualdet3d_tpu.testing import gac_detector_cfg, write_synthetic_priors
    from visualdet3d_tpu.models.detectors.yolo3d import cast_floating
    import tempfile

    image_hw = (288, 1280)
    pre = os.path.join(tempfile.gettempdir(), 'vd3d_graft_priors_mono')
    write_synthetic_priors(pre, ['Car', 'Pedestrian'])
    cfg = gac_detector_cfg(pre, obj_types=('Car', 'Pedestrian'))
    cfg.inference_dtype = dtype
    system = DETECTOR_DICT[cfg.name](cfg)
    variables = system.init(jax.random.PRNGKey(0), image_hw, batch_size=1)
    system.anchor_pack(image_hw)
    variables = system.fold_inference_variables(variables, image_hw)
    if dtype == 'int8':
        system.cfg.int8_all = True  # measured -0.39 ms (bench_int8_knobs)
        crng = np.random.default_rng(11)
        P2c = jnp.asarray(np.tile(KITTI_P2, (2, 1, 1)))
        calib = [(jnp.asarray(crng.standard_normal(
            (2, *image_hw, 3)).astype(np.float32)), P2c) for _ in range(2)]
        absmax = system.calibrate_int8(variables, calib)
        variables = jax.device_put(
            system.quantize_int8(variables, absmax, image_hw))
    elif dtype != 'float32':
        variables = jax.device_put(cast_floating(variables, dtype))

    @jax.jit
    def forward(variables, images, P2):
        out = system.predict(variables, images, P2, max_detections=32)
        return out['scores'], out['bboxes'], out['labels'], out['valid']

    rng = np.random.default_rng(1)
    P2 = jnp.asarray(np.tile(KITTI_P2, (batch, 1, 1)))
    sets = [jnp.asarray(rng.standard_normal((batch, *image_hw, 3)).astype(np.float32))
            for _ in range(4)]
    jax.block_until_ready(forward(variables, sets[0], P2))
    ms = _device_ms(forward, [(variables, s, P2) for s in sets], iters=8)
    return batch / ms * 1000, ms


def bench_km3d(batch, dtype):
    """KM3D (DLA-34, DCN neck) forward at 384x1280."""
    import jax
    import jax.numpy as jnp
    from visualdet3d_tpu.config import EasyDict as edict
    from visualdet3d_tpu.registry import DETECTOR_DICT
    import visualdet3d_tpu.models  # noqa: F401
    from visualdet3d_tpu.models.detectors.yolo3d import cast_floating

    image_hw = (384, 1280)
    cfg = edict(
        obj_types=['Car'], name='KM3D',
        backbone=edict(name='dla', depth=34),
        head=edict(
            layer_cfg=edict(
                input_features=64, head_features=256,
                head_dict={'hm': 1, 'wh': 2, 'hps': 18, 'rot': 8, 'dim': 3,
                           'prob': 1, 'reg': 2, 'hm_hp': 9, 'hp_offset': 2}),
            loss_cfg=edict(rampup_length=100),
            test_cfg=edict(score_thr=0.1, nms_iou_thr=0.5, top_k=100)))
    cfg.inference_dtype = dtype
    system = DETECTOR_DICT['KM3D'](cfg)
    variables = system.init(jax.random.PRNGKey(0), image_hw)
    variables = system.fold_inference_variables(variables, image_hw)
    if dtype == 'int8':
        crng = np.random.default_rng(13)
        calib = [(jnp.asarray(crng.standard_normal(
            (1, *image_hw, 3)).astype(np.float32)),) for _ in range(2)]
        absmax = system.calibrate_int8(variables, calib)
        variables = jax.device_put(
            system.quantize_int8(variables, absmax, image_hw))
    elif dtype != 'float32':
        variables = jax.device_put(cast_floating(variables, dtype))
    P2 = jnp.asarray(np.tile(KITTI_P2, (batch, 1, 1)))

    @jax.jit
    def forward(v, im, p):
        out = system.predict(v, im, p, max_detections=32)
        return out['scores'], out['bboxes'], out['labels']

    rng = np.random.default_rng(2)
    sets = [jnp.asarray(rng.standard_normal((batch, *image_hw, 3)).astype(np.float32))
            for _ in range(4)]
    jax.block_until_ready(forward(variables, sets[0], P2))
    ms = _device_ms(forward, [(variables, s, P2) for s in sets], iters=6)
    return batch / ms * 1000, ms


def bench_train_stereo(batch, compute_dtype=None):
    """Full stereo training step (fwd+bwd+clip+adam), f32 (training parity
    dtype) or bf16-compute/f32-master mixed precision (compute_dtype=
    'bfloat16' — train_state._mixed_precision_interceptor; batch 16 fits
    HBM only under it). VERDICT r3 #6: the reference is first and foremost
    a training framework (train hot loop reference scripts/train.py:144-196)."""
    import jax
    import jax.numpy as jnp
    from __graft_entry__ import _build_system
    from visualdet3d_tpu.config import EasyDict as edict
    from visualdet3d_tpu.pipelines.train_state import (
        create_train_state, make_stereo_train_step)
    from visualdet3d_tpu.solver import build_optimizer

    image_hw = (288, 1280)
    system = _build_system(image_hw)
    tx = build_optimizer(edict(type_name='adam', keywords=edict(lr=1e-4),
                               clipped_gradient_norm=35.0))
    state = create_train_state(system, jax.random.PRNGKey(0), image_hw, tx,
                               batch_size=1)
    step = make_stereo_train_step(system, tx, donate=False,
                                  compute_dtype=compute_dtype)

    rng = np.random.default_rng(3)
    ann = np.full((batch, 32, 12), -1.0, np.float32)
    ann[:, 0] = [300, 120, 420, 200, 0, 360, 160, 20.0, 1.6, 1.5, 3.9, 0.4]
    ann[:, 1] = [600, 130, 700, 190, 0, 650, 160, 28.0, 1.7, 1.6, 4.1, -0.9]
    P2 = jnp.asarray(np.tile(KITTI_P2, (batch, 1, 1)))
    P3 = np.tile(KITTI_P2, (batch, 1, 1))
    P3[:, 0, 3] = -339.5
    P3 = jnp.asarray(P3)

    def make_batch():
        return dict(
            left_images=jnp.asarray(rng.standard_normal(
                (batch, *image_hw, 3)).astype(np.float32)),
            right_images=jnp.asarray(rng.standard_normal(
                (batch, *image_hw, 3)).astype(np.float32)),
            P2=P2, P3=P3, annotations=jnp.asarray(ann),
            disparity=jnp.asarray(np.abs(rng.standard_normal(
                (batch, image_hw[0] // 4, image_hw[1] // 4))
            ).astype(np.float32) * 20))

    key = jax.random.PRNGKey(1)
    argsets = [(state, make_batch(), key) for _ in range(3)]
    ms = _device_ms(step, argsets, iters=4)
    return ms


def bench_train_km3d(batch):
    """KM3D training step (fwd+bwd+clip+adam), f32: DLA-34 + DCN neck with
    the packed-direct Pallas DCN backward (ops/deform_conv.py). Targets via
    the real RTM3D target builder on a synthetic object (VERDICT r4 #8)."""
    import jax
    import jax.numpy as jnp
    from visualdet3d_tpu.config import EasyDict as edict
    from visualdet3d_tpu.data.kitti.dataset.km3d_dataset import (
        KittiRTM3DDataset)
    from visualdet3d_tpu.data.kitti.kittidata import KittiObj
    from visualdet3d_tpu.registry import DETECTOR_DICT, PIPELINE_DICT
    import visualdet3d_tpu.models  # noqa: F401
    import visualdet3d_tpu.pipelines  # noqa: F401
    from visualdet3d_tpu.pipelines.train_state import create_train_state
    from visualdet3d_tpu.solver import build_optimizer

    image_hw = (384, 1280)
    cfg = edict(
        obj_types=['Car'], name='KM3D',
        backbone=edict(name='dla', depth=34),
        head=edict(
            layer_cfg=edict(
                input_features=64, head_features=256,
                head_dict={'hm': 1, 'wh': 2, 'hps': 18, 'rot': 8, 'dim': 3,
                           'prob': 1, 'reg': 2, 'hm_hp': 9, 'hp_offset': 2}),
            loss_cfg=edict(rampup_length=100),
            test_cfg=edict(score_thr=0.1, nms_iou_thr=0.5, top_k=100)))
    system = DETECTOR_DICT['KM3D'](cfg)
    tx = build_optimizer(edict(type_name='adam', keywords=edict(lr=1e-4),
                               clipped_gradient_norm=35.0))
    state = create_train_state(system, jax.random.PRNGKey(0), image_hw, tx)
    step = PIPELINE_DICT['train_rtm3d'](system, tx, donate=False)

    obj = KittiObj()
    obj.type, obj.truncated, obj.occluded = 'Car', 0.0, 0
    obj.x, obj.y, obj.z, obj.ry = 2.0, 1.6, 12.0, 0.3
    obj.h, obj.w, obj.l = 1.5, 1.6, 3.9
    obj.alpha = obj.ry - np.arctan2(obj.x, obj.z)
    obj.bbox_l, obj.bbox_t, obj.bbox_r, obj.bbox_b = 500, 150, 700, 260
    ds = object.__new__(KittiRTM3DDataset)
    ds.obj_types = ['Car']
    ds.num_classes = 1
    ds.num_vertexes = KittiRTM3DDataset.num_vertexes
    ds.corner_matrix = KittiRTM3DDataset.corner_matrix
    ds.max_objects = 32
    targets = ds._build_target(np.zeros((*image_hw, 3), np.float32),
                               KITTI_P2.copy(), [obj])
    gts = {k: jnp.asarray(np.stack([np.asarray(v)] * batch))
           for k, v in targets.items()}
    P2 = jnp.asarray(np.tile(KITTI_P2, (batch, 1, 1)))

    rng = np.random.default_rng(7)

    def make_batch():
        return dict(images=jnp.asarray(rng.standard_normal(
            (batch, *image_hw, 3)).astype(np.float32)),
            gts=gts, P2=P2, epoch=jnp.asarray(50.0, jnp.float32))

    key = jax.random.PRNGKey(1)
    argsets = [(state, make_batch(), key) for _ in range(3)]
    ms = _device_ms(step, argsets, iters=4)
    return ms


def bench_train_gac(batch):
    """GAC mono training step (fwd+bwd+clip+adam), f32."""
    import jax
    import jax.numpy as jnp
    from visualdet3d_tpu.registry import DETECTOR_DICT
    import visualdet3d_tpu.models  # noqa: F401
    from visualdet3d_tpu.testing import gac_detector_cfg, write_synthetic_priors
    from visualdet3d_tpu.config import EasyDict as edict
    from visualdet3d_tpu.pipelines.train_state import (
        create_train_state, make_detection_train_step)
    from visualdet3d_tpu.solver import build_optimizer
    import tempfile

    image_hw = (288, 1280)
    pre = os.path.join(tempfile.gettempdir(), 'vd3d_graft_priors_mono')
    write_synthetic_priors(pre, ['Car', 'Pedestrian'])
    cfg = gac_detector_cfg(pre, obj_types=('Car', 'Pedestrian'))
    system = DETECTOR_DICT[cfg.name](cfg)
    tx = build_optimizer(edict(type_name='adam', keywords=edict(lr=1e-4),
                               clipped_gradient_norm=35.0))
    state = create_train_state(system, jax.random.PRNGKey(0), image_hw, tx,
                               batch_size=1)
    step = make_detection_train_step(system, tx, donate=False)

    rng = np.random.default_rng(5)
    ann = np.full((batch, 32, 12), -1.0, np.float32)
    ann[:, 0] = [300, 120, 420, 200, 0, 360, 160, 20.0, 1.6, 1.5, 3.9, 0.4]
    P2 = jnp.asarray(np.tile(KITTI_P2, (batch, 1, 1)))

    def make_batch():
        return dict(images=jnp.asarray(rng.standard_normal(
            (batch, *image_hw, 3)).astype(np.float32)),
            P2=P2, annotations=jnp.asarray(ann))

    key = jax.random.PRNGKey(1)
    argsets = [(state, make_batch(), key) for _ in range(3)]
    ms = _device_ms(step, argsets, iters=4)
    return ms


def main():
    import jax

    batch = int(float(sys.argv[1])) if len(sys.argv) > 1 else 16
    dtype = sys.argv[2] if len(sys.argv) > 2 else 'auto'
    which = sys.argv[3] if len(sys.argv) > 3 else \
        os.environ.get('VD3D_BENCH', 'all')

    # 'auto' = each model's fastest parity-gated inference config (r4):
    # int8 MXU trunk for the conv-bound stereo/mono models (test_quant.py
    # gates decode parity + synthetic AP within 0.2 of f32); KM3D stays
    # bf16 (gather-bound DCN neck - int8 convs don't move it).
    auto = dtype == 'auto'
    per_model = {'stereo': 'int8', 'mono': 'int8', 'km3d': 'bfloat16'}

    detail = {'batch': batch,
              'inference_dtype': per_model['stereo'] if auto else dtype,
              'backend': jax.default_backend()}
    fps = 0.0
    if which in ('all', 'stereo'):
        st_dtype = per_model['stereo'] if auto else dtype
        # auto is batch-aware: int8 wins at batch >= ~4, bf16 at bs1 (the
        # quantize overhead dominates small batches — VERDICT r4 #5)
        bs1_dtype = 'bfloat16' if auto else dtype
        fps, ms_device, p50_ms, p50_dev_ms, bs1_dtype = bench_stereo(
            batch, st_dtype, bs1_dtype=bs1_dtype)
        detail.update(stereo_image_hw=[288, 1280],
                      device_ms_per_batch=round(ms_device, 2),
                      p50_latency_ms_bs1=round(p50_ms, 2),
                      p50_device_ms_bs1=round(p50_dev_ms, 2),
                      bs1_dtype=bs1_dtype)
    if which in ('all', 'mono'):
        mono_dtype = per_model['mono'] if auto else dtype
        mono_fps, mono_ms = bench_mono(batch, mono_dtype)
        detail.update(mono_gac_fps=round(mono_fps, 2),
                      mono_device_ms=round(mono_ms, 2),
                      mono_dtype=mono_dtype)
        if which == 'mono':
            fps = mono_fps
    if which in ('all', 'km3d'):
        km3d_dtype = per_model['km3d'] if auto else dtype
        km3d_fps, km3d_ms = bench_km3d(batch, km3d_dtype)
        detail.update(km3d_fps=round(km3d_fps, 2),
                      km3d_device_ms=round(km3d_ms, 2),
                      km3d_dtype=km3d_dtype)
        if which == 'km3d':
            fps = km3d_fps
    if which in ('all', 'train'):
        # training-step device time, f32, batch 8 (the memory-safe single
        # chip training config; batch 16 f32 stereo activations exceed HBM
        # without remat — CLAUDE.md). VERDICT r3 #6.
        def try_train(tag, fn, b, **kw):
            # a failed train measurement (e.g. an HBM-exceeding config)
            # must not kill the whole bench record
            try:
                ms = fn(b, **kw)
            except Exception as e:  # noqa: BLE001
                detail[f'{tag}_error'] = str(e)[:200]
                return
            detail.update({f'{tag}_ms': round(ms, 2), f'{tag}_batch': b,
                           f'{tag}_img_per_s': round(b / ms * 1000, 1)})

        try_train('stereo_train', bench_train_stereo, 8)
        # mixed precision (bf16 compute / f32 master) lets batch 16 fit HBM
        # and is the fastest measured training config (r5: 59.5 img/s vs
        # 46.4 f32 batch 8)
        try_train('stereo_train_bf16', bench_train_stereo, 16,
                  compute_dtype='bfloat16')
        try_train('gac_train', bench_train_gac, 8)
        # KM3D f32 batch 4 exceeds HBM at compile (the train-path DCN
        # pair-gather temps); batch 2 is the single-chip f32 config
        try_train('km3d_train', bench_train_km3d, 2)

    # metric name + baseline divisor follow the selected model (the 500 fps
    # north-star is the stereo target; mono/KM3D report against their own
    # recorded bests so a selector run never mislabels the stereo metric)
    if which == 'train':
        fps = detail.get('stereo_train_bf16_img_per_s',
                         detail.get('stereo_train_img_per_s', 0.0))
    metric = {'all': 'stereo3d_forward_fps_per_chip',
              'stereo': 'stereo3d_forward_fps_per_chip',
              'mono': 'mono_gac_forward_fps_per_chip',
              'km3d': 'km3d_forward_fps_per_chip',
              'train': 'stereo3d_train_img_per_s_per_chip'}[which]
    baseline = {'all': 500.0, 'stereo': 500.0, 'mono': 500.0,
                'km3d': 40.0, 'train': 46.4}[which]
    print(json.dumps({
        'metric': metric,
        'value': round(fps, 2),
        'unit': 'frames/s',
        'vs_baseline': round(fps / baseline, 4),
        'detail': detail,
    }))


if __name__ == '__main__':
    main()
