"""Benchmark: YOLOStereo3D forward throughput on one chip.

Measures the flagship stereo3D inference path (dual-eye backbone, Pallas
correlation volumes, cost-volume pyramid, head, decode + on-device NMS) at
the KITTI benchmark resolution (288 x 1280), and prints ONE JSON line:
  {"metric": ..., "value": fps, "unit": "frames/s/chip", "vs_baseline": ...}

Baseline: the north-star target of 500 frames/s/chip on TPU v5e
(BASELINE.md; the reference YOLOStereo3D paper reports ~12.5 fps on a
GTX 1080Ti). vs_baseline = fps / 500.
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _build_system

    image_hw = (288, 1280)
    batch = int(float(sys.argv[1])) if len(sys.argv) > 1 else 16
    dtype = sys.argv[2] if len(sys.argv) > 2 else 'bfloat16'
    system = _build_system(image_hw)
    system.cfg.inference_dtype = dtype
    variables = system.init(jax.random.PRNGKey(0), image_hw, batch_size=1)
    system.anchor_pack(image_hw)
    if dtype != 'float32':
        # cast weights ONCE outside jit: otherwise every forward streams the
        # f32 params from HBM and casts on device (profiled: multi-ms
        # copy-start ops per conv weight)
        from visualdet3d_tpu.models.detectors.yolo3d import cast_floating
        variables = jax.device_put(cast_floating(variables, dtype))

    @jax.jit
    def forward(variables, left, right, P2):
        out = system.predict(variables, left, right, P2, max_detections=32)
        return out['scores'], out['bboxes'], out['labels'], out['valid']

    rng = np.random.default_rng(0)
    P2 = jnp.asarray(np.tile(np.array([
        [721.5377, 0.0, 609.5593, 44.85728],
        [0.0, 721.5377, 72.854, 0.2163791],
        [0.0, 0.0, 1.0, 0.002745884],
    ], np.float32), (batch, 1, 1)))
    # DISTINCT input buffers per step: the execution relay caches repeated
    # (executable, inputs) pairs, so looping one batch measures the cache
    n_sets = 6
    sets = [(jnp.asarray(rng.standard_normal((batch, *image_hw, 3)).astype(np.float32)),
             jnp.asarray(rng.standard_normal((batch, *image_hw, 3)).astype(np.float32)))
            for _ in range(n_sets)]

    # warmup / compile
    jax.block_until_ready(forward(variables, sets[0][0], sets[0][1], P2))

    # fps from PROFILER device time: wall-clock loops can be cached or
    # elided by the axon execution relay (CLAUDE.md "Benchmarking on the
    # axon relay"); per-module device time is immune to every relay trick.
    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.abspath(__file__)), 'tools'))
    from tpu_time import device_ms
    argsets = [(variables, l, r, P2) for l, r in sets]
    ms_device = device_ms(forward, argsets, iters=12)
    fps = batch / ms_device * 1000

    # p50 latency at batch 1 (distinct inputs per call)
    P21 = P2[:1]
    ones = [(l[:1] + i * 1e-3, r[:1]) for i, (l, r) in enumerate(sets)]
    jax.block_until_ready(forward(variables, ones[0][0], ones[0][1], P21))
    lats = []
    for i in range(12):
        l1, r1 = ones[i % n_sets]
        t = time.perf_counter()
        jax.block_until_ready(forward(variables, l1, r1, P21))
        lats.append(time.perf_counter() - t)
    p50_ms = float(np.median(lats) * 1000)

    print(json.dumps({
        'metric': 'stereo3d_forward_fps_per_chip',
        'value': round(fps, 2),
        'unit': 'frames/s',
        'vs_baseline': round(fps / 500.0, 4),
        'detail': {'batch': batch, 'image_hw': list(image_hw),
                   'device_ms_per_batch': round(ms_device, 2),
                   'p50_latency_ms_bs1': round(p50_ms, 2),
                   'inference_dtype': dtype,
                   'backend': jax.default_backend()},
    }))


if __name__ == '__main__':
    main()
