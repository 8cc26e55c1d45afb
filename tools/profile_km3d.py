"""Per-op TPU profile of the KM3D (DLA-34 + DCN neck) forward.

  python tools/profile_km3d.py [batch] [dtype]
"""
import os
import sys
import tempfile
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
os.environ.setdefault('PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION', 'python')

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from visualdet3d_tpu.config import EasyDict as edict
    from visualdet3d_tpu.registry import DETECTOR_DICT
    import visualdet3d_tpu.models  # noqa: F401
    from visualdet3d_tpu.models.detectors.yolo3d import cast_floating

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    dtype = sys.argv[2] if len(sys.argv) > 2 else 'bfloat16'

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
    if dtype != 'float32':
        variables = jax.device_put(cast_floating(variables, dtype))
    P2 = jnp.asarray(np.tile(np.array([
        [721.5377, 0.0, 609.5593, 44.85728],
        [0.0, 721.5377, 72.854, 0.2163791],
        [0.0, 0.0, 1.0, 0.002745884]], np.float32), (batch, 1, 1)))

    @jax.jit
    def forward(v, im, p):
        out = system.predict(v, im, p, max_detections=32)
        return out['scores'], out['bboxes'], out['labels']

    rng = np.random.default_rng(2)
    sets = [jnp.asarray(rng.standard_normal((batch, *image_hw, 3)).astype(np.float32))
            for _ in range(3)]
    jax.block_until_ready(forward(variables, sets[0], P2))

    iters = 3
    tdir = tempfile.mkdtemp(prefix='km3d_prof_')
    jax.profiler.start_trace(tdir)
    for i in range(iters):
        jax.block_until_ready(forward(variables, sets[i % len(sets)], P2))
    jax.profiler.stop_trace()

    from tensorflow.tsl.profiler.protobuf import xplane_pb2
    import glob
    files = sorted(glob.glob(os.path.join(tdir, '**', '*.xplane.pb'),
                             recursive=True))
    xs = xplane_pb2.XSpace()
    xs.ParseFromString(open(files[-1], 'rb').read())
    per_op = defaultdict(float)
    per_cat = defaultdict(float)
    total = 0.0
    for plane in xs.planes:
        if 'TPU' not in plane.name:
            continue
        md = {k: v.name for k, v in plane.event_metadata.items()}
        mdd = {k: v.display_name or v.name for k, v in plane.event_metadata.items()}
        for line in plane.lines:
            if line.name == 'XLA Modules':
                for ev in line.events:
                    total += ev.duration_ps / 1e9
            if line.name != 'XLA Ops':
                continue
            for ev in line.events:
                name = md.get(ev.metadata_id, '?')
                disp = mdd.get(ev.metadata_id, name)
                per_op[name] += ev.duration_ps / 1e9
                cat = disp.split('.')[0].split('%')[-1]
                per_cat[cat] += ev.duration_ps / 1e9
    print(f'== total {total / iters:.2f} ms/call (batch {batch}, {dtype})')
    print('-- by category:')
    for k, v in sorted(per_cat.items(), key=lambda kv: -kv[1])[:18]:
        print(f'  {v / iters:9.3f} ms  {k}')
    print('-- top ops:')
    for k, v in sorted(per_op.items(), key=lambda kv: -kv[1])[:25]:
        print(f'  {v / iters:9.3f} ms  {k[:130]}')


if __name__ == '__main__':
    main()
