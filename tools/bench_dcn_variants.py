"""Prototype + benchmark DCN formulations on TPU.

Variants:
  current   - per-tap, per-corner gathers (ops/deform_conv.py today)
  fused     - one combined gather for all 9 taps x 4 corners
  windowed  - residual offsets clamped to [-M, M]; dense SxS patch
              extraction (conv_general_dilated_patches -> MXU) + one-hot
              bilinear weights + batched matmul. Zero gathers.

Run: python tools/bench_dcn_variants.py [--dtype float32|bfloat16]
"""
import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import jax
import jax.numpy as jnp
import numpy as np

from visualdet3d_tpu.ops.deform_conv import (
    modulated_deform_conv_reference as mdc_current)  # naive baseline


def mdc_fused(x, offset, mask, weight, bias=None, stride=1, padding=1, dilation=1):
    b, h, w, c_in = x.shape
    kh, kw, _, c_out = weight.shape
    k = kh * kw
    ho = (h + 2 * padding - dilation * (kh - 1) - 1) // stride + 1
    wo = (w + 2 * padding - dilation * (kw - 1) - 1) // stride + 1

    f = x.dtype
    base_y = jnp.arange(ho, dtype=f) * stride - padding
    base_x = jnp.arange(wo, dtype=f) * stride - padding
    tap_y = (jnp.arange(kh, dtype=f) * dilation)[:, None].repeat(kw, 1).reshape(-1)
    tap_x = (jnp.arange(kw, dtype=f) * dilation)[None, :].repeat(kh, 0).reshape(-1)

    py = base_y[None, :, None, None] + tap_y + offset[..., 0::2]
    px = base_x[None, None, :, None] + tap_x + offset[..., 1::2]
    y0 = jnp.floor(py)
    x0 = jnp.floor(px)
    fy = py - y0
    fx = px - x0
    y0i = y0.astype(jnp.int32)
    x0i = x0.astype(jnp.int32)

    yi = jnp.stack([y0i, y0i, y0i + 1, y0i + 1], -1)      # [B,Ho,Wo,K,4]
    xi = jnp.stack([x0i, x0i + 1, x0i, x0i + 1], -1)
    wgt = jnp.stack([(1 - fy) * (1 - fx), (1 - fy) * fx,
                     fy * (1 - fx), fy * fx], -1)
    inb = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
    idx = jnp.clip(yi, 0, h - 1) * w + jnp.clip(xi, 0, w - 1)

    flat = x.reshape(b, h * w, c_in)
    vals = jnp.take_along_axis(flat, idx.reshape(b, -1)[..., None], axis=1)
    vals = vals.reshape(b, ho, wo, k, 4, c_in)
    wgt = (wgt * inb.astype(f)) * mask[..., None]
    sampled = jnp.einsum('bhwkr,bhwkrc->bhwkc', wgt, vals)
    out = jnp.einsum('bhwkc,kco->bhwo', sampled, weight.reshape(k, c_in, c_out),
                     preferred_element_type=f)
    if bias is not None:
        out = out + bias
    return out


def mdc_pairgather(x, offset, mask, weight, bias=None, stride=1, padding=1,
                   dilation=1):
    """One gather PER TAP (9 total) instead of per corner (36):

    - pad the image by (1 top/left, 2 bottom/right) zeros, so every bilinear
      corner read (after clamping the integer parts) lands on a real zero —
      no in-bounds masks needed;
    - stack each row with the row below it along channels ([C | C_down]), so
      the (y0, y0+1) corner pair is one row read;
    - gather with slice_sizes=(2, 2C) so the (x0, x0+1) pair rides along.
    Each slice is a 2 x 2C block holding all four bilinear corners.
    """
    b, h, w, c_in = x.shape
    kh, kw, _, c_out = weight.shape
    k = kh * kw
    ho = (h + 2 * padding - dilation * (kh - 1) - 1) // stride + 1
    wo = (w + 2 * padding - dilation * (kw - 1) - 1) // stride + 1
    f = x.dtype

    # 2 pad rows/cols on EVERY side: the low-side clamp aliases y0 = -2 onto
    # the (-2, -1) pair, which must both be zero rows (same at high side)
    xp = jnp.pad(x, ((0, 0), (2, 2), (2, 2), (0, 0)))
    hp, wp = h + 4, w + 4
    flat = xp.reshape(b, hp * wp, c_in)
    down = jnp.concatenate(
        [flat[:, wp:], jnp.zeros((b, wp, c_in), f)], axis=1)
    src = jnp.concatenate([flat, down], axis=-1)        # [B, Hp*Wp, 2C]

    base_y = jnp.arange(ho, dtype=f) * stride - padding
    base_x = jnp.arange(wo, dtype=f) * stride - padding
    tap_y = (jnp.arange(kh, dtype=f) * dilation)[:, None].repeat(kw, 1).reshape(-1)
    tap_x = (jnp.arange(kw, dtype=f) * dilation)[None, :].repeat(kh, 0).reshape(-1)
    py = base_y[None, :, None, None] + tap_y + offset[..., 0::2]  # [B,Ho,Wo,K]
    px = base_x[None, None, :, None] + tap_x + offset[..., 1::2]
    y0 = jnp.floor(py)
    x0 = jnp.floor(px)
    fy = py - y0
    fx = px - x0
    y0p = jnp.clip(y0.astype(jnp.int32) + 2, 0, hp - 2)
    x0p = jnp.clip(x0.astype(jnp.int32) + 2, 0, wp - 2)
    start = (y0p * wp + x0p).reshape(b, -1, 1)          # [B, N*K, 1]

    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2), collapsed_slice_dims=(), start_index_map=(0,))
    g = jax.vmap(
        lambda s, i: jax.lax.gather(
            s, i, dnums, slice_sizes=(2, 2 * c_in),
            mode=jax.lax.GatherScatterMode.CLIP)
    )(src, start)                                        # [B, N*K, 2, 2C]

    # two sequential lerps in the gather's flat layout (avoids the 6-D
    # corner-weight einsum + the layout-fixing reshape XLA inserts for it)
    n = ho * wo * k
    fxf = fx.reshape(b, n, 1)
    fyf = (fy * mask).reshape(b, n, 1)   # fold the modulation into the y lerp
    my = ((1 - fy) * mask).reshape(b, n, 1)
    gx = g[:, :, 0, :] * (1 - fxf) + g[:, :, 1, :] * fxf     # [B, N, 2C]
    sampled = gx[..., :c_in] * my + gx[..., c_in:] * fyf     # [B, N, C]
    out = jnp.einsum('bnkc,kco->bno',
                     sampled.reshape(b, ho * wo, k, c_in),
                     weight.reshape(k, c_in, c_out),
                     preferred_element_type=f).reshape(b, ho, wo, c_out)
    if bias is not None:
        out = out + bias
    return out


def mdc_windowed(x, offset, mask, weight, bias=None, stride=1, padding=1,
                 dilation=1, max_residual=4, row_chunk=24):
    b, h, w, c_in = x.shape
    kh, kw, _, c_out = weight.shape
    k = kh * kw
    m = max_residual
    ho = (h + 2 * padding - dilation * (kh - 1) - 1) // stride + 1
    wo = (w + 2 * padding - dilation * (kw - 1) - 1) // stride + 1
    sy = (kh - 1) * dilation + 2 * m + 2
    sx = (kw - 1) * dilation + 2 * m + 2

    f = x.dtype
    tap_y = (jnp.arange(kh, dtype=f) * dilation)[:, None].repeat(kw, 1).reshape(-1)
    tap_x = (jnp.arange(kw, dtype=f) * dilation)[None, :].repeat(kh, 0).reshape(-1)

    dy = jnp.clip(offset[..., 0::2], -m, m)
    dx = jnp.clip(offset[..., 1::2], -m, m)
    # local window coordinate: window row s covers input row h*stride-padding-m+s
    ry = tap_y + dy + m        # in [0, sy-2]
    rx = tap_x + dx + m
    iy = jnp.floor(ry)
    ix = jnp.floor(rx)
    fy = (ry - iy)[..., None]
    fx = (rx - ix)[..., None]
    iy = iy.astype(jnp.int32)
    ix = ix.astype(jnp.int32)
    wy = (jax.nn.one_hot(iy, sy, dtype=f) * (1 - fy)
          + jax.nn.one_hot(iy + 1, sy, dtype=f) * fy)       # [B,Ho,Wo,K,Sy]
    wx = (jax.nn.one_hot(ix, sx, dtype=f) * (1 - fx)
          + jax.nn.one_hot(ix + 1, sx, dtype=f) * fx)
    wt = jnp.einsum('bhwky,bhwkx->bhwkyx', wy * mask[..., None], wx)
    wt = wt.reshape(b, ho, wo, k, sy * sx)

    pad_lo_y = padding + m
    pad_hi_y = (ho - 1) * stride + sy - h - pad_lo_y
    pad_lo_x = padding + m
    pad_hi_x = (wo - 1) * stride + sx - w - pad_lo_x
    xp = jnp.pad(x, ((0, 0), (pad_lo_y, max(pad_hi_y, 0)),
                     (pad_lo_x, max(pad_hi_x, 0)), (0, 0)))

    wflat = weight.reshape(k, c_in, c_out)
    chunks = []
    for h0 in range(0, ho, row_chunk):
        ch = min(row_chunk, ho - h0)
        rows = xp[:, h0 * stride: (h0 + ch - 1) * stride + sy, :, :]
        patches = jax.lax.conv_general_dilated_patches(
            rows, (sy, sx), (stride, stride), 'VALID',
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
        # channel order of patches is (C, Sy, Sx)
        patches = patches.reshape(b, ch, wo, c_in, sy * sx)
        sampled = jnp.einsum('bhwks,bhwcs->bhwkc',
                             wt[:, h0:h0 + ch], patches,
                             preferred_element_type=f)
        chunks.append(jnp.einsum('bhwkc,kco->bhwo', sampled, wflat,
                                 preferred_element_type=f))
    out = jnp.concatenate(chunks, axis=1) if len(chunks) > 1 else chunks[0]
    if bias is not None:
        out = out + bias
    return out


def bench(fn, args, chain, n_iters=10):
    """Chained-dependency timing: each call's offset input depends on the
    previous call's output, so the axon relay cannot skip, cache, or
    elide any execution (see CLAUDE.md 'honest benchmarking')."""
    x, off, msk, wgt = args
    out = jax.block_until_ready(fn(x, off, msk, wgt))  # compile
    jchain = jax.jit(chain)
    off_i = jax.block_until_ready(jchain(off, out))
    t0 = time.perf_counter()
    for _ in range(n_iters):
        out = fn(x, off_i, msk, wgt)
        off_i = jchain(off_i, out)
    s = float(jnp.sum(off_i))  # scalar HOST fetch: forces the whole chain
    dt = (time.perf_counter() - t0) / n_iters * 1000
    assert np.isfinite(s)
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--dtype', default='float32')
    ap.add_argument('--shape', default='4,96,320,64')
    ap.add_argument('--cout', type=int, default=64)
    ap.add_argument('--max_residual', type=int, default=4)
    ap.add_argument('--skip_check', action='store_true')
    ap.add_argument('--no_bwd', action='store_true')
    args = ap.parse_args()
    f = jnp.dtype(args.dtype)
    b, h, w, c = map(int, args.shape.split(','))

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((b, h, w, c)), f)
    off = jnp.asarray(rng.uniform(-3.5, 3.5, (b, h, w, 18)), f)
    msk = jnp.asarray(rng.uniform(0, 1, (b, h, w, 9)), f)
    wgt = jnp.asarray(rng.standard_normal((3, 3, c, args.cout)) * 0.05, f)

    if not args.skip_check:
        ref = np.asarray(jax.jit(mdc_current)(x, off, msk, wgt), np.float32)
        for name, fn in [('fused', mdc_fused),
                         ('windowed', functools.partial(
                             mdc_windowed, max_residual=args.max_residual))]:
            got = np.asarray(jax.jit(fn)(x, off, msk, wgt), np.float32)
            err = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9)
            print(f'{name}: max rel err vs current = {err:.2e}')

    variants = [('current', mdc_current), ('fused', mdc_fused),
                ('windowed', functools.partial(
                    mdc_windowed, max_residual=args.max_residual))]

    fwd_chain = lambda o, out: o + 1e-6 * out[..., :18]
    for name, fn in variants:
        ms = bench(jax.jit(fn), (x, off, msk, wgt), fwd_chain)
        print(f'{name:9s} fwd: {ms:8.2f} ms', flush=True)

    def make_fb(fn):
        def loss(x_, o_, m_, w_):
            return jnp.sum(fn(x_, o_, m_, w_) ** 2)
        return jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3)))

    if args.no_bwd:
        return
    bwd_chain = lambda o, grads: o + 1e-6 * grads[1]
    for name, fn in variants:
        ms = bench(make_fb(fn), (x, off, msk, wgt), bwd_chain)
        print(f'{name:9s} fwd+bwd: {ms:8.2f} ms', flush=True)


if __name__ == '__main__':
    main()
