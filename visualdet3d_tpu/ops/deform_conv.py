"""Deformable convolution v1/v2 (modulated), TPU-native.

Replaces the reference's 1.7k-line CUDA extension
(visualDet3D/networks/lib/ops/dcn/src/deform_conv_cuda_kernel.cu,
deform_conv_ext.cpp:149-161). Per-element dynamic gathers run on the TPU
scalar core at a fixed ~40 GB/s regardless of dtype, so the design goal is
ONE gather per kernel tap that pulls all four bilinear corners in a single
contiguous slice:

  1. zero-pad the image by 2 on every side so that, after clamping the
     integer offset parts, every corner read lands on a real zero — the
     CUDA `dmcn_im2col_bilinear` out-of-bounds rule falls out with NO masks
     (2 pads, not 1: the clamp aliases py < -1 onto the (-2, -1) row pair,
     which must both be zero);
  2. stack each row with the row below it along channels ([C | C_down]) so
     the (y0, y0+1) corner pair is one row read;
  3. lax.gather with slice_sizes=(2, 2C): the (x0, x0+1) pair rides along.
     Each slice is a 2 x 2C block holding all four corners;
  4. recombine with two sequential lerps in the gather's flat layout (a 6-D
     corner einsum makes XLA insert a multi-ms layout-fixing reshape), then
     one [N, K*C] x [K*C, C_out] MXU matmul.

Profiled at (4, 96, 320, 64), 3x3, on v5e: 20.3 ms f32 / 16.4 ms bf16 vs
34.0 / 31.5 for the naive per-corner-gather formulation (still available as
`modulated_deform_conv_reference`; tests cross-check the two). The whole op
is differentiable jnp, so the backward pass (the 867-line CUDA kernel in
the reference) comes from autodiff.

Layouts: NHWC activations, HWIO weights (TPU-native conv layouts).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _tap_coords(offset, ho, wo, kh, kw, stride, padding, dilation, dtype):
    """Float sample coords per output position and tap: [B, Ho, Wo, K] x2.

    Offset channel layout matches the reference conv_offset_mask output
    (dcn/deform_conv.py:446-455): (dy, dx) for tap k at channels (2k, 2k+1).
    """
    base_y = jnp.arange(ho, dtype=dtype) * stride - padding
    base_x = jnp.arange(wo, dtype=dtype) * stride - padding
    tap_y = (jnp.arange(kh, dtype=dtype) * dilation)[:, None]
    tap_y = tap_y.repeat(kw, 1).reshape(-1)
    tap_x = (jnp.arange(kw, dtype=dtype) * dilation)[None, :]
    tap_x = tap_x.repeat(kh, 0).reshape(-1)
    py = base_y[None, :, None, None] + tap_y + offset[..., 0::2]
    px = base_x[None, None, :, None] + tap_x + offset[..., 1::2]
    return py, px


def _raw_gather_pairs(src: jnp.ndarray, start: jnp.ndarray) -> jnp.ndarray:
    """[B, R, Ck], [B, N, 1] -> [B, N, 2, Ck] row-pair gather, any dtype."""
    cols = src.shape[-1]
    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2), collapsed_slice_dims=(), start_index_map=(0,))
    return jax.vmap(
        lambda s, i: jax.lax.gather(
            s, i, dnums, slice_sizes=(2, cols),
            mode=jax.lax.GatherScatterMode.CLIP)
    )(src, start)


@jax.custom_vjp
def _gather_pairs(src: jnp.ndarray, start: jnp.ndarray) -> jnp.ndarray:
    """Batched gather of [2, 2C] corner blocks: [B,R,2C],[B,N,1] -> [B,N,2,2C].

    custom_vjp because the natural transpose (scatter-add of overlapping
    2-row slices) makes XLA emit a fully serialized scatter (~4 s at the
    DLA-neck shape); scattering the two rows separately as height-1 slices
    keeps the fast row-scatter path.
    """
    return _raw_gather_pairs(src, start)


def _gather_pairs_fwd(src, start):
    return _gather_pairs(src, start), (start, src.shape)


def _gather_pairs_bwd(res, g):
    start, src_shape = res
    b, r, c2 = src_shape
    idx = start[:, :, 0]
    idx2 = jnp.concatenate([idx, idx + 1], axis=1)            # [B, 2N]
    upd = jnp.concatenate([g[:, :, 0, :], g[:, :, 1, :]], axis=1)

    def scat(i, u):
        return jnp.zeros((r, c2), u.dtype).at[
            jnp.clip(i, 0, r - 1)].add(u, mode='drop')
    return jax.vmap(scat)(idx2, upd), None


_gather_pairs.defvjp(_gather_pairs_fwd, _gather_pairs_bwd)


def modulated_deform_conv(x: jnp.ndarray,
                          offset: jnp.ndarray,
                          mask: jnp.ndarray,
                          weight: jnp.ndarray,
                          bias: jnp.ndarray | None = None,
                          stride: int = 1,
                          padding: int = 1,
                          dilation: int = 1) -> jnp.ndarray:
    """Modulated deformable conv (DCNv2) forward.

    Args:
      x: [B, H, W, C_in].
      offset: [B, Ho, Wo, 2K] with (dy, dx) per tap k at channels (2k, 2k+1).
      mask: [B, Ho, Wo, K] modulation scalars (post-sigmoid).
      weight: [kh, kw, C_in, C_out].
      bias: optional [C_out].
      stride/padding/dilation: ints (square).
    Returns:
      [B, Ho, Wo, C_out].

    reference semantics: visualDet3D/networks/lib/ops/dcn/deform_conv.py
    (ModulatedDeformConvFunction) + modulated_deformable_im2col CUDA kernel.
    """
    b, h, w, c_in = x.shape
    kh, kw, _, c_out = weight.shape
    k = kh * kw
    ho = (h + 2 * padding - dilation * (kh - 1) - 1) // stride + 1
    wo = (w + 2 * padding - dilation * (kw - 1) - 1) // stride + 1
    assert offset.shape[:3] == (b, ho, wo), (offset.shape, (b, ho, wo))
    f = x.dtype

    xp = jnp.pad(x, ((0, 0), (2, 2), (2, 2), (0, 0)))
    hp, wp = h + 4, w + 4
    flat = xp.reshape(b, hp * wp, c_in)
    down = jnp.concatenate([flat[:, wp:], jnp.zeros((b, wp, c_in), f)], axis=1)
    src = jnp.concatenate([flat, down], axis=-1)          # [B, Hp*Wp, 2C]

    py, px = _tap_coords(offset, ho, wo, kh, kw, stride, padding, dilation, f)
    y0 = jnp.floor(py)
    x0 = jnp.floor(px)
    fy = py - y0
    fx = px - x0
    y0p = jnp.clip(y0.astype(jnp.int32) + 2, 0, hp - 2)
    x0p = jnp.clip(x0.astype(jnp.int32) + 2, 0, wp - 2)
    start = (y0p * wp + x0p).reshape(b, -1, 1)            # [B, N*K, 1]

    g = _gather_pairs(src, start)                          # [B, N*K, 2, 2C]

    # two sequential lerps in the gather's flat layout: XLA fuses them INTO
    # the (scalar-core-bound) gather fusion, so they cost ~nothing. A 6-D
    # corner einsum — or any layout-changing consumer — breaks that fusion
    # and adds multi-ms copies.
    n = ho * wo * k
    fxf = fx.reshape(b, n, 1)
    fyf = (fy * mask).reshape(b, n, 1)    # modulation folded into the y lerp
    myf = ((1 - fy) * mask).reshape(b, n, 1)
    gx = g[:, :, 0, :] * (1 - fxf) + g[:, :, 1, :] * fxf   # [B, N, 2C]
    sampled = gx[..., :c_in] * myf + gx[..., c_in:] * fyf  # [B, N, C]
    out = jnp.einsum('bnkc,kco->bno',
                     sampled.reshape(b, ho * wo, k, c_in),
                     weight.reshape(k, c_in, c_out),
                     preferred_element_type=f).reshape(b, ho, wo, c_out)
    if bias is not None:
        out = out + bias
    return out


def _bilinear_sample_zero(image: jnp.ndarray, py: jnp.ndarray, px: jnp.ndarray) -> jnp.ndarray:
    """Sample image [H, W, C] at float coords (py, px) [...]-shaped, zero pad.

    Matches the CUDA `dmcn_im2col_bilinear` boundary semantics: values outside
    [-1, H) x [-1, W) contribute zero, corners partially outside contribute
    their in-bounds taps.
    """
    h, w, c = image.shape
    y0 = jnp.floor(py)
    x0 = jnp.floor(px)
    wy = (py - y0)[..., None]
    wx = (px - x0)[..., None]

    y0i = y0.astype(jnp.int32)
    x0i = x0.astype(jnp.int32)

    flat = image.reshape(h * w, c)

    def tap(yi, xi):
        inb = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
        idx = jnp.clip(yi, 0, h - 1) * w + jnp.clip(xi, 0, w - 1)
        vals = flat[idx.reshape(-1)].reshape(idx.shape + (c,))
        return jnp.where(inb[..., None], vals, 0.0)

    v00 = tap(y0i, x0i)
    v01 = tap(y0i, x0i + 1)
    v10 = tap(y0i + 1, x0i)
    v11 = tap(y0i + 1, x0i + 1)

    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    return top * (1 - wy) + bot * wy


def modulated_deform_conv_reference(x: jnp.ndarray,
                                    offset: jnp.ndarray,
                                    mask: jnp.ndarray,
                                    weight: jnp.ndarray,
                                    bias: jnp.ndarray | None = None,
                                    stride: int = 1,
                                    padding: int = 1,
                                    dilation: int = 1) -> jnp.ndarray:
    """Naive per-tap, per-corner gather formulation (kept for cross-checks).

    Same semantics as `modulated_deform_conv`; ~1.7x slower on TPU.
    """
    b, h, w, c_in = x.shape
    kh, kw, _, c_out = weight.shape
    ho = (h + 2 * padding - dilation * (kh - 1) - 1) // stride + 1
    wo = (w + 2 * padding - dilation * (kw - 1) - 1) // stride + 1
    assert offset.shape[:3] == (b, ho, wo), (offset.shape, (b, ho, wo))

    py, px = _tap_coords(offset, ho, wo, kh, kw, stride, padding, dilation,
                         x.dtype)
    out = jnp.zeros((b, ho, wo, c_out), dtype=x.dtype)
    for k in range(kh * kw):
        sampled = jax.vmap(_bilinear_sample_zero)(x, py[..., k], px[..., k])
        sampled = sampled * mask[..., k:k + 1]
        out = out + jnp.einsum('bhwc,co->bhwo', sampled,
                               weight.reshape(kh * kw, c_in, c_out)[k],
                               preferred_element_type=out.dtype)
    if bias is not None:
        out = out + bias
    return out


def deform_conv(x: jnp.ndarray,
                offset: jnp.ndarray,
                weight: jnp.ndarray,
                bias: jnp.ndarray | None = None,
                stride: int = 1,
                padding: int = 1,
                dilation: int = 1) -> jnp.ndarray:
    """Plain (v1, non-modulated) deformable conv: mask == 1 everywhere.

    reference: DeformConvPack (dcn/deform_conv.py:53-200).
    """
    b, ho, wo = offset.shape[0], offset.shape[1], offset.shape[2]
    k = offset.shape[-1] // 2
    ones = jnp.ones((b, ho, wo, k), dtype=x.dtype)
    return modulated_deform_conv(x, offset, ones, weight, bias, stride, padding, dilation)
