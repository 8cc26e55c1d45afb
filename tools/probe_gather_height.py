"""Probe: XLA gather cost vs slice HEIGHT at fixed slice count (TPU).

VERDICT r4 #4 asks for one final structural attack on the KM3D DCN gather
floor. The r3 measurement said cost ~ slices x 11 ns with wider ROWS nearly
free; whether taller SLICES are also nearly free decides if any tap-pair /
windowed slice formulation can serve multiple DCN taps from one slice:

  - if a (4, 2C) slice costs ~1 slice: pairing vertically-adjacent taps
    whose offsets coincide could halve the slice count (with an exactness
    fallback still costing full slices - see docs/dcn_gather_closure.md);
  - if cost scales with rows (height-2 ~ 2x height-1), nothing is gained:
    every DCN tap needs its rows paid for regardless of slice shaping.

Usage: python tools/probe_gather_height.py  (profiler device time, relay-proof)
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), '..'))

import jax
import jax.numpy as jnp
from tpu_time import device_ms


def gather_slices(img, idx, height, width):
    """img [H, W]; idx [N, 2] start coords; returns [N, height, width]."""
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2), collapsed_slice_dims=(),
        start_index_map=(0, 1))
    return jax.lax.gather(
        img, idx, dn, slice_sizes=(height, width),
        mode=jax.lax.GatherScatterMode.CLIP)


def main():
    H, W = 4096, 512   # u32 image, 256-lane rows at width=256
    n_slices = 16 * 96 * 320 // 4  # 1/4 the KM3D stride-4 site count
    # (cost ~ slices; smaller count keeps output buffers + compiles fast)
    configs = [(int(a.split('x')[0]), int(a.split('x')[1]))
               for a in sys.argv[1:]] or [(1, 128), (2, 128), (4, 128)]
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.integers(0, 2**31, (H, W), np.int64).astype(np.uint32))
    sets = []
    for s in range(3):
        idx = np.stack([rng.integers(0, H - 8, n_slices),
                        rng.integers(0, W - 256, n_slices)], 1).astype(np.int32)
        sets.append(jnp.asarray(idx))

    for height, width in configs:
        fn = jax.jit(lambda im, ix, h=height, w=width:
                     gather_slices(im, ix, h, w).sum(dtype=jnp.uint32))
        ms = device_ms(fn, [(img, ix) for ix in sets],
                       iters=int(os.environ.get('PROBE_ITERS', '6')))
        rows = n_slices * height
        print(f'width={width:4d} height={height}: {ms:8.3f} ms '
              f'({ms * 1e6 / n_slices:6.1f} ns/slice, '
              f'{ms * 1e6 / rows:6.1f} ns/row)', flush=True)


if __name__ == '__main__':
    main()
