"""Profile the stereo forward per-op on TPU and print the top ops.

  python tools/profile_stereo.py [batch] [dtype] [--fold] [--xla-corr]

Used to chase the corr-operand relayout + misc copies (VERDICT r1 item 3).
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
    from __graft_entry__ import _build_system
    from visualdet3d_tpu.models.detectors.yolo3d import cast_floating

    args = [a for a in sys.argv[1:] if not a.startswith('--')]
    batch = int(args[0]) if args else 16
    dtype = args[1] if len(args) > 1 else 'bfloat16'
    fold = '--fold' in sys.argv
    if '--xla-corr' in sys.argv:
        os.environ['VD3D_CORR_IMPL'] = 'xla'

    image_hw = (288, 1280)
    system = _build_system(image_hw)
    system.cfg.inference_dtype = dtype
    variables = system.init(jax.random.PRNGKey(0), image_hw, batch_size=1)
    system.anchor_pack(image_hw)
    if fold or dtype == 'int8':
        variables = system.fold_inference_variables(variables, image_hw)
    if dtype == 'int8':
        crng = np.random.default_rng(9)
        P2c = jnp.asarray(np.tile(np.array([
            [721.5377, 0.0, 609.5593, 44.85728],
            [0.0, 721.5377, 72.854, 0.2163791],
            [0.0, 0.0, 1.0, 0.002745884]], np.float32), (2, 1, 1)))
        calib = [(jnp.asarray(crng.standard_normal((2, *image_hw, 3)).astype(np.float32)),
                  jnp.asarray(crng.standard_normal((2, *image_hw, 3)).astype(np.float32)),
                  P2c) for _ in range(2)]
        absmax = system.calibrate_int8(variables, calib)
        variables = jax.device_put(system.quantize_int8(variables, absmax, image_hw))
    elif dtype != 'float32':
        variables = jax.device_put(cast_floating(variables, dtype))

    @jax.jit
    def forward(variables, left, right, P2):
        out = system.predict(variables, left, right, P2, max_detections=32)
        return out['scores'], out['bboxes'], out['labels'], out['valid']

    rng = np.random.default_rng(0)
    P2 = jnp.asarray(np.tile(np.array([
        [721.5377, 0.0, 609.5593, 44.85728],
        [0.0, 721.5377, 72.854, 0.2163791],
        [0.0, 0.0, 1.0, 0.002745884]], np.float32), (batch, 1, 1)))
    sets = [(jnp.asarray(rng.standard_normal((batch, *image_hw, 3)).astype(np.float32)),
             jnp.asarray(rng.standard_normal((batch, *image_hw, 3)).astype(np.float32)))
            for _ in range(4)]
    jax.block_until_ready(forward(variables, sets[0][0], sets[0][1], P2))

    iters = 6
    tdir = tempfile.mkdtemp(prefix='stereo_prof_')
    jax.profiler.start_trace(tdir)
    for i in range(iters):
        l, r = sets[i % len(sets)]
        jax.block_until_ready(forward(variables, l, r, P2))
    jax.profiler.stop_trace()

    import glob
    import re
    from tensorflow.tsl.profiler.protobuf import xplane_pb2
    files = sorted(glob.glob(os.path.join(tdir, '**', '*.xplane.pb'),
                             recursive=True))
    xs = xplane_pb2.XSpace()
    xs.ParseFromString(open(files[-1], 'rb').read())
    for plane in xs.planes:
        if 'TPU' not in plane.name:
            continue
        md = {k: v.name for k, v in plane.event_metadata.items()}
        for line in plane.lines:
            if line.name != 'XLA Ops':
                continue
            per = defaultdict(float)
            cat = defaultdict(float)
            for ev in line.events:
                name = md.get(ev.metadata_id, '?')
                ms = ev.duration_ps / 1e9 / iters
                per[name] += ms
                m = re.match(r'%?([a-zA-Z\-_]+)', name)
                cat[m.group(1) if m else '?'] += ms
            total = sum(per.values())
            print(f'== total {total:.2f} ms/call  (fold={fold}, '
                  f"corr={os.environ.get('VD3D_CORR_IMPL', 'pallas')})")
            print('-- by category:')
            for k, v in sorted(cat.items(), key=lambda kv: -kv[1])[:14]:
                print(f'  {v:8.3f} ms  {k}')
            print('-- top ops:')
            for name, ms in sorted(per.items(), key=lambda kv: -kv[1])[:30]:
                print(f'  {ms:8.3f} ms  {name[:120]}')


if __name__ == '__main__':
    main()
