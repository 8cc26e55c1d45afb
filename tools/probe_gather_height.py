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


def gather_rows(src, start, height):
    """Production DCN geometry (ops/deform_conv.py _gather_rows): src
    [R, C], start [N, 1] row indices, full-width (height, C) slices."""
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2), collapsed_slice_dims=(), start_index_map=(0,))
    return jax.lax.gather(
        src, start, dn, slice_sizes=(height, src.shape[1]),
        mode=jax.lax.GatherScatterMode.CLIP)


def main():
    # Production-geometry probe: the KM3D stride-4 DCN gather is
    # [R=(96+4)*(320+4), 2C=128-lane u32] rows addressed by y0*wp+x0 with
    # DCN locality (taps-outer, raster sites, jittered by offsets), one
    # height-1 slice per (site, tap). Measure the same traffic with
    # height-1/2/4 slices to decide whether taller slices are ~free
    # (multi-tap slice formulations) or ~linear in rows (nothing to gain).
    hp, wp = 100, 324
    R, C = hp * wp, 128
    hw, K = 96 * 320, 9
    b = int(os.environ.get('PROBE_BATCH', '2'))  # batch folded into N
    # src_copies=1: all b batch tiles re-read ONE [R, C] source (16.6 MB
    # working set). src_copies=b: source is [b*R, C] with per-copy index
    # offsets — the production layout (265 MB at b=16). The v1 run of this
    # probe used copies=1 and measured 2.5 ns/slice (vs 10-13 production):
    # this flag decides whether that gap is source-locality or noise.
    src_copies = int(os.environ.get('PROBE_SRC_COPIES', '1'))
    n = hw * K * b
    heights = [int(a) for a in sys.argv[1:]] or [1, 2, 4]
    rng = np.random.default_rng(0)
    src = jnp.asarray(rng.integers(
        0, 2**31, (src_copies * R, C), np.int64).astype(np.uint32))
    n_sets = int(os.environ.get('PROBE_SETS', '3'))
    sets = []
    for s in range(n_sets):
        yy, xx = np.meshgrid(np.arange(96), np.arange(320), indexing='ij')
        starts = []
        for k in range(K):
            oy = rng.uniform(-2, 2, hw)
            ox = rng.uniform(-2, 2, hw)
            y0 = np.clip(np.floor(yy.ravel() + k // 3 - 1 + oy), 0, hp - 8)
            x0 = np.clip(np.floor(xx.ravel() + k % 3 - 1 + ox), 0, wp - 2)
            starts.append((y0 * wp + x0).astype(np.int32))
        # taps-outer per batch copy, matching ops/deform_conv.py: the b
        # copies address distinct src regions when src_copies == b.
        idx = np.concatenate(
            [np.concatenate(starts) + (bi % src_copies) * R
             for bi in range(b)])
        sets.append(jnp.asarray(idx[:, None]))

    iters = int(os.environ.get('PROBE_ITERS', str(n_sets)))
    # PROBE_SPLIT=1: issue one gather PER COPY (operand = a [R, C] slice of
    # src) instead of one big gather over the whole [copies*R, C] operand.
    # The copies=1-vs-16 runs showed 2.5 vs 10.6 ns/slice at identical slice
    # counts — gather cost is SOURCE-FOOTPRINT bound. This mode asks whether
    # shrinking each gather op's operand (not the total data touched)
    # recovers the fast rate: per-copy reuse is only ~8.5x vs 136x when all
    # copies alias one source, so a small cache could still miss.
    split = os.environ.get('PROBE_SPLIT') == '1' and src_copies > 1
    for height in heights:
        if split:
            def fn_(sr, ix, h=height):
                per = ix.shape[0] // b
                tot = jnp.uint32(0)
                for bi in range(b):
                    sub = jax.lax.dynamic_slice_in_dim(
                        sr, (bi % src_copies) * R, R, 0)
                    rel = jax.lax.dynamic_slice_in_dim(ix, bi * per, per, 0)
                    tot += gather_rows(sub, rel - (bi % src_copies) * R,
                                       h).sum(dtype=jnp.uint32)
                return tot
            fn = jax.jit(fn_)
        else:
            fn = jax.jit(lambda sr, ix, h=height:
                         gather_rows(sr, ix, h).sum(dtype=jnp.uint32))
        ms = device_ms(fn, [(src, ix) for ix in sets], iters=iters)
        rows = n * height
        print(f'rows[{src_copies}x{R},{C}] b={b} height={height}: '
              f'{ms:8.3f} ms ({ms * 1e6 / n:6.1f} ns/slice, '
              f'{ms * 1e6 / rows:6.1f} ns/row, {n} slices)', flush=True)


if __name__ == '__main__':
    main()
