"""Probe: does the r4 gather source-footprint effect also apply to the
DCN image-gradient SCATTER (tools/probe_gather_height.py found batched
gathers over >32 MB operands run 4x slower than per-item gathers)?

The packed/pairs DCN backward scatters 2N height-1 [1, 2C] row updates
into a zeros [B, R, 2C] operand (ops/deform_conv.py _gather_pairs_bwd /
_packed_conv_bwd). Measure one batched (vmapped) scatter-add vs B
per-item scatters at the KM3D stride-4 training geometry.

Usage: python tools/probe_scatter_split.py [batch]
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), '..'))

import jax
import jax.numpy as jnp
from tpu_time import device_ms


def main():
    hp, wp = 100, 324
    R, C2 = hp * wp, 128
    hw, K = 96 * 320, 9
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    n2 = 2 * hw * K
    rng = np.random.default_rng(0)
    sets = []
    for s in range(2):
        yy, xx = np.meshgrid(np.arange(96), np.arange(320), indexing='ij')
        starts = []
        for k in range(K):
            oy = rng.uniform(-2, 2, hw)
            ox = rng.uniform(-2, 2, hw)
            y0 = np.clip(np.floor(yy.ravel() + k // 3 - 1 + oy), 0, hp - 8)
            x0 = np.clip(np.floor(xx.ravel() + k % 3 - 1 + ox), 0, wp - 2)
            starts.append((y0 * wp + x0).astype(np.int32))
        idx = np.stack([np.concatenate(starts)] * b)
        idx2 = np.concatenate([idx, idx + 1], axis=1)          # [B, 2N]
        upd = rng.standard_normal((b, n2, C2)).astype(np.float32)
        sets.append((jnp.asarray(idx2), jnp.asarray(upd)))

    def scat1(i, u):
        return jnp.zeros((R, C2), u.dtype).at[
            jnp.clip(i, 0, R - 1)].add(u, mode='drop')

    batched = jax.jit(lambda i, u: jax.vmap(scat1)(i, u).sum(
        dtype=jnp.float32))
    split = jax.jit(lambda i, u: sum(
        scat1(i[bi], u[bi]).sum(dtype=jnp.float32) for bi in range(b)))

    for name, fn in [('batched', batched), ('split', split)]:
        ms = device_ms(fn, sets, iters=2)
        print(f'{name:8s} b={b}: {ms:8.3f} ms '
              f'({ms * 1e6 / (b * n2):5.1f} ns/row-update)', flush=True)


if __name__ == '__main__':
    main()
