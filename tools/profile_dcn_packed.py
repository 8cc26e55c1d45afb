"""Per-op trace of the packed DCN forward at the DLA-neck probe shape."""
import os
import sys
import tempfile
import glob
import re
from collections import defaultdict

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))
os.environ.setdefault('PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION', 'python')

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    import importlib
    dc = importlib.import_module('visualdet3d_tpu.ops.deform_conv')

    rng = np.random.default_rng(0)
    b, h, w, c = 4, 96, 320, 64
    sets = []
    for _ in range(3):
        x = jnp.asarray(rng.standard_normal((b, h, w, c)).astype(np.float32), jnp.bfloat16)
        off = jnp.asarray(rng.uniform(-3.5, 3.5, (b, h, w, 18)).astype(np.float32), jnp.bfloat16)
        msk = jnp.asarray(rng.uniform(0, 1, (b, h, w, 9)).astype(np.float32), jnp.bfloat16)
        wgt = jnp.asarray((rng.standard_normal((3, 3, c, c)) * 0.05).astype(np.float32), jnp.bfloat16)
        sets.append((x, off, msk, wgt))

    fwd = jax.jit(lambda x, o, m, w_: dc.modulated_deform_conv(x, o, m, w_))
    jax.block_until_ready(fwd(*sets[0]))
    iters = 8
    tdir = tempfile.mkdtemp(prefix='dcnprof_')
    jax.profiler.start_trace(tdir)
    for i in range(iters):
        jax.block_until_ready(fwd(*sets[i % 3]))
    jax.profiler.stop_trace()

    from tensorflow.tsl.profiler.protobuf import xplane_pb2
    files = sorted(glob.glob(os.path.join(tdir, '**', '*.xplane.pb'), recursive=True))
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
            for ev in line.events:
                per[md.get(ev.metadata_id, '?')] += ev.duration_ps / 1e9 / iters
            print(f'== total {sum(per.values()):.2f} ms/call')
            for name, ms in sorted(per.items(), key=lambda kv: -kv[1])[:20]:
                print(f'  {ms:8.3f} ms  {name[:120]}')


if __name__ == '__main__':
    main()
