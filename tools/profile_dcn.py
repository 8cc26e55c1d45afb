"""Profile DCN variants with the TPU profiler (device-time ground truth).

Each variant runs ITERS blocked calls under jax.profiler.start_trace; the
xplane proto is parsed directly for per-module device ms.

Run: python tools/profile_dcn.py [--shape 4,96,320,64] [--bwd]
"""
import argparse
import glob
import os
import shutil
import sys
from collections import defaultdict

os.environ.setdefault('PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION', 'python')
sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))
sys.path.insert(0, os.path.dirname(__file__))


def module_ms(trace_dir, iters):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2
    files = sorted(glob.glob(os.path.join(trace_dir, '**', '*.xplane.pb'),
                             recursive=True))
    xs = xplane_pb2.XSpace()
    xs.ParseFromString(open(files[-1], 'rb').read())
    per = defaultdict(float)
    for plane in xs.planes:
        if 'TPU' not in plane.name:
            continue
        md = {k: v.name for k, v in plane.event_metadata.items()}
        for line in plane.lines:
            if line.name != 'XLA Modules':
                continue
            for ev in line.events:
                per[md.get(ev.metadata_id, '?')] += ev.duration_ps / 1e9
    return {k: v / iters for k, v in per.items()}


def main():
    import functools
    ap = argparse.ArgumentParser()
    ap.add_argument('--shape', default='4,96,320,64')
    ap.add_argument('--cout', type=int, default=64)
    ap.add_argument('--max_residual', type=int, default=4)
    ap.add_argument('--dtype', default='float32')
    ap.add_argument('--bwd', action='store_true')
    ap.add_argument('--iters', type=int, default=3)
    ap.add_argument('--variants', default='current,pairgather',
                    help='comma list: current (naive ref) and/or pairgather '
                         '(modulated_deform_conv, which itself dispatches '
                         'packed/pairs per VD3D_DCN_* env)')
    ap.add_argument('--tag', default='',
                    help='suffix for the trace dir name (so pairs/packed '
                         'runs of the same variant keep separate traces)')
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from visualdet3d_tpu.ops.deform_conv import (
        modulated_deform_conv as mdc_pairgather,
        modulated_deform_conv_reference as mdc_current)

    f = jnp.dtype(args.dtype)
    b, h, w, c = map(int, args.shape.split(','))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((b, h, w, c)), f)
    off = jnp.asarray(rng.uniform(-3.5, 3.5, (b, h, w, 18)), f)
    msk = jnp.asarray(rng.uniform(0, 1, (b, h, w, 9)), f)
    wgt = jnp.asarray(rng.standard_normal((3, 3, c, args.cout)) * 0.05, f)

    variants = [(n, f) for n, f in
                [('current', mdc_current), ('pairgather', mdc_pairgather)]
                if n in args.variants.split(',')]

    for name, fn in variants:
        if args.bwd:
            def run(fn=fn, name=name):
                def loss(x_, o_, m_, w_):
                    # train=True so the dispatcher exercises the TRAINING
                    # path selection (VD3D_DCN_TRAIN_PACKED gates packed
                    # vs pairs there)
                    kw = {'train': True} if name == 'pairgather' else {}
                    return jnp.sum(fn(x_, o_, m_, w_, **kw) ** 2)
                return jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3)))
            jfn = run()
        else:
            jfn = jax.jit(fn)
        jax.block_until_ready(jfn(x, off, msk, wgt))  # compile
        tdir = (f'/tmp/dcnprof_{name}_{"bwd" if args.bwd else "fwd"}'
                f'{args.tag}')
        shutil.rmtree(tdir, ignore_errors=True)
        jax.profiler.start_trace(tdir)
        for i in range(args.iters):
            jax.block_until_ready(jfn(x, off, msk, wgt))
        jax.profiler.stop_trace()
        mods = module_ms(tdir, args.iters)
        total = sum(mods.values())
        detail = ', '.join(f'{k.split("(")[0]}={v:.2f}' for k, v in
                           sorted(mods.items(), key=lambda kv: -kv[1])[:3])
        print(f'{name:9s} device: {total:8.2f} ms/call  [{detail}]', flush=True)


if __name__ == '__main__':
    main()
