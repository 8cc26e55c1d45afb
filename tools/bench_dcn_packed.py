"""Benchmark the packed u32-gather + Pallas-lerp DCN vs the pair-gather path.

Probe shape (4, 96, 320, 64 -> 64), 3x3 — the DLA-neck stride-4 DCN that
pins KM3D. Timing via the profiler (tools/tpu_time.py), distinct
host-uploaded inputs per call.

Run: python tools/bench_dcn_packed.py
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))
sys.path.insert(0, os.path.dirname(__file__))

import jax
import jax.numpy as jnp
import numpy as np

from visualdet3d_tpu.ops import deform_conv as _m
import importlib
dc = importlib.import_module('visualdet3d_tpu.ops.deform_conv')
from tpu_time import device_ms


def make_args(dtype, n_sets=4, shape=(4, 96, 320, 64), cout=64):
    rng = np.random.default_rng(0)
    b, h, w, c = shape
    sets = []
    for _ in range(n_sets):
        x = jnp.asarray(rng.standard_normal((b, h, w, c)).astype(np.float32), dtype)
        off = jnp.asarray(rng.uniform(-3.5, 3.5, (b, h, w, 18)).astype(np.float32), dtype)
        msk = jnp.asarray(rng.uniform(0, 1, (b, h, w, 9)).astype(np.float32), dtype)
        wgt = jnp.asarray((rng.standard_normal((3, 3, c, cout)) * 0.05).astype(np.float32), dtype)
        sets.append((x, off, msk, wgt))
    return sets


def main():
    assert jax.default_backend() == 'tpu', jax.default_backend()
    for dtype_name in ('bfloat16', 'float32'):
        dtype = jnp.dtype(dtype_name)
        sets = make_args(dtype)
        for impl in ('packed', 'pairs'):
            os.environ['VD3D_DCN_IMPL'] = impl

            def fwd(x, off, msk, wgt, _impl=impl):
                return dc.modulated_deform_conv(x, off, msk, wgt)

            try:
                ms = device_ms(jax.jit(fwd), sets, iters=8)
                print(f'{dtype_name:9s} {impl:7s} fwd: {ms:7.2f} ms', flush=True)
            except Exception as e:
                print(f'{dtype_name:9s} {impl:7s} fwd: FAILED {type(e).__name__}: {e}',
                      flush=True)

            def fb(x, off, msk, wgt, _impl=impl):
                def loss(x_, o_, m_, w_):
                    return jnp.sum(dc.modulated_deform_conv(x_, o_, m_, w_)
                                   .astype(jnp.float32) ** 2)
                return jax.grad(loss, argnums=(0, 1, 2, 3))(x, off, msk, wgt)

            try:
                ms = device_ms(jax.jit(fb), sets, iters=6)
                print(f'{dtype_name:9s} {impl:7s} fwd+bwd: {ms:7.2f} ms', flush=True)
            except Exception as e:
                print(f'{dtype_name:9s} {impl:7s} fwd+bwd: FAILED {type(e).__name__}: {e}',
                      flush=True)


if __name__ == '__main__':
    main()
