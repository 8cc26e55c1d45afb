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

For bf16 INFERENCE there is a second formulation (`_packed_conv`) that
packs the (row y, row y+1) bf16 channel pairs into uint32 — halving the
per-VALUE-bound gather — and fuses unpack + bilinear lerp + the tap matmul
into one Pallas kernel (sampled taps never touch HBM): **10.35 ms bf16**
at the probe shape, 1.6x the pair-gather path. See the section banner
below for the full design rationale.

Layouts: NHWC activations, HWIO weights (TPU-native conv layouts).
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


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


# The v5e gather engine is SOURCE-FOOTPRINT bound, not slice-count bound:
# at the KM3D stride-4 geometry (4.42 M height-1 [1, 128-lane-u32] slices,
# identical index pattern) one batched gather over a 16x32400x128 u32
# operand (265 MB) measures 10.6 ns/slice, while 16 per-item gathers over
# its 16.6 MB [32400, 128] slices measure 2.7 ns/slice — 3.9x — even
# though per-item row reuse is only ~8.5x (tools/probe_gather_height.py,
# r4). Splitting the batched gather into per-item gathers is therefore
# nearly-free bandwidth; below this operand footprint the batched form is
# kept (one HLO, no concat).
_SPLIT_GATHER_MIN_BYTES = 32 << 20
# ... but only when the PER-ITEM gather is itself substantial. Splitting
# pays B fixed costs (op dispatch, lost fusion with the consumer, the
# re-batching stack): the r4 split at the stereo head's 18x80 DCN (13k
# slices/item on a 166 MB packed operand) regressed the whole stereo
# forward ~11 ms (BENCH_r04 349.8 fps vs the pre-split 466.5), while at
# KM3D's stride-4 (276k slices/item) it won 2.1x. Split only in the
# many-slices regime where the locality win dwarfs the per-op overhead.
_SPLIT_GATHER_MIN_SLICES = 50_000


def _split_gather(src, start, gather1):
    """Dispatch [B, ...] gathers: per-item when the operand is large AND the
    per-item slice count amortizes the per-op overhead (the gather-locality
    win above), one vmapped/batched gather otherwise."""
    b = src.shape[0]
    nbytes = int(np.prod(src.shape)) * src.dtype.itemsize
    if (b > 1 and nbytes > _SPLIT_GATHER_MIN_BYTES
            and start.shape[1] >= _SPLIT_GATHER_MIN_SLICES
            and os.environ.get('VD3D_DCN_SPLIT_GATHER', '1') == '1'):
        return jnp.stack([gather1(src[i], start[i]) for i in range(b)])
    return jax.vmap(gather1)(src, start)


def _raw_gather_pairs(src: jnp.ndarray, start: jnp.ndarray) -> jnp.ndarray:
    """[B, R, Ck], [B, N, 1] -> [B, N, 2, Ck] row-pair gather, any dtype."""
    cols = src.shape[-1]
    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2), collapsed_slice_dims=(), start_index_map=(0,))
    return _split_gather(
        src, start,
        lambda s, i: jax.lax.gather(
            s, i, dnums, slice_sizes=(2, cols),
            mode=jax.lax.GatherScatterMode.CLIP))


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


# ---------------------------------------------------------------------------
# Packed bf16 inference path: u32 corner gather + fused Pallas lerp-matmul.
#
# The XLA gather is per-VALUE bound (~17-19 G gathered values/s on v5e,
# CLAUDE.md), so packing the (row y, row y+1) bf16 channel pairs into one
# uint32 halves the gather (measured 16.5 -> 6.5 ms at the DLA-neck probe
# shape), and horizontally stacking the (x0, x0+1) columns makes each tap
# ONE contiguous (1, 2C) u32 row slice — the gather output IS the kernel's
# input layout, no reshape copies. XLA loses the packing win back to unpack
# layout copies (CLAUDE.md dead-end); a Pallas kernel does not: it splits
# lo/hi via the width-preserving shift-bitcast trick (bf16 bits b == f32
# bits b << 16), applies both bilinear lerps + the DCNv2 modulation, and
# feeds the MXU tap-matmul directly from VMEM — the 9x-sized sampled-tap
# tensor never touches HBM.
# ---------------------------------------------------------------------------


def _lerp_matmul_kernel(g_ref, w_ref, wk_ref, o_ref, acc, *, c: int, k: int):
    """Fused bilinear-lerp + tap-matmul block.

    Grid (pix_tiles, K); rows are ordered taps-OUTER ([B, K, HW]) so each
    (tile, k) block is TP contiguous rows of tap k. The kernel lerps the
    block to sampled taps [TP, C], multiplies by that tap's weight slice
    [C, Cout] on the MXU, and accumulates in an f32 scratch; the output
    tile [TP, Cout] is written once on the last tap. This keeps the
    sampled-tap tensor (9x the conv output) entirely in VMEM.
    """
    kk = pl.program_id(1)
    g = g_ref[:]
    lo = jax.lax.bitcast_convert_type(g << 16, jnp.float32)
    hi = jax.lax.bitcast_convert_type(g & jnp.uint32(0xFFFF0000), jnp.float32)
    # lerp weights arrive bf16: the producer's [N, 4] operand needs a
    # transposed layout copy before the custom call (stack-minor vs
    # row-major); bf16 halves that copy (5 x 3.5 -> ~1.7 ms at the KM3D
    # batch-16 stride-4 shape) and the weights carry bf16 precision anyway
    # (fy/fx are computed in the input dtype upstream)
    wq = w_ref[:].astype(jnp.float32)
    v = lo * wq[:, 2:3] + hi * wq[:, 3:4]
    lane = jax.lax.broadcasted_iota(jnp.int32, v.shape, 1)
    wx = jnp.where(lane < c, wq[:, 0:1], wq[:, 1:2])
    vw = v * wx
    sampled = (vw[:, :c] + vw[:, c:]).astype(jnp.bfloat16)   # [TP, C]

    @pl.when(kk == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)

    acc[:] += jnp.dot(sampled, wk_ref[0],
                      preferred_element_type=jnp.float32)

    @pl.when(kk == k - 1)
    def _():
        o_ref[:] = acc[:].astype(o_ref.dtype)


def _pick_pixrows(hw: int, c: int, cout: int,
                  budget: int = 8 * 2 ** 20) -> int | None:
    """Pixel rows per block: VMEM cost with lane padding (the [TP, 4] f32
    weights block pads 4 -> 128 lanes, ~5 in-kernel [TP, 2C] f32 temporaries
    get distinct stack slots, plus the f32 accumulator)."""
    per_row = (2 * ((2 * c) * 4 + 128 * 4) + 5 * (2 * c) * 4
               + max(cout, 128) * 4 + max(cout, 128) * 2)
    for tp in (2048, 1024, 512, 256, 128, 64, 32, 16, 8):
        if hw % tp == 0 and tp * per_row <= budget:
            return tp
    return None


def _packed_ok(hw: int, c_in: int, c_out: int, dtype) -> bool:
    """bf16 packed-u32 path gate. c_in % 64 keeps the (2C) gathered row
    lane-aligned (2C % 128 == 0); the VMEM fit itself is what _pick_pixrows
    encodes (the r2 c_in <= 512 gate was a redundant safety margin — lifted
    r3, the 1408-channel head DCN now takes this path too)."""
    if dtype != jnp.bfloat16 or c_in % 64:
        return False
    return (_pick_pixrows(hw, c_in, c_out) is not None
            and os.environ.get('VD3D_DCN_IMPL', 'packed') == 'packed')


def _pick_pixrows_f32(hw: int, c: int, cout: int,
                      budget: int = 8 * 2 ** 20) -> int | None:
    """Row budget for the f32 4C-corner kernel: [TP, 4C] f32 input block,
    [TP, 4] weights (lane-padded to 128), ~4 [TP, 4C] f32 temporaries, the
    f32 accumulator and bf16-free output."""
    per_row = ((4 * c) * 4 + 128 * 4 + 4 * (4 * c) * 4
               + max(cout, 128) * 4 + max(cout, 128) * 4)
    for tp in (2048, 1024, 512, 256, 128, 64, 32, 16, 8):
        if hw % tp == 0 and tp * per_row <= budget:
            return tp
    return None


def _packed_f32_ok(hw: int, c_in: int, c_out: int, dtype) -> bool:
    if dtype != jnp.float32 or c_in % 32:  # 4C % 128 == 0 lane alignment
        return False
    return (_pick_pixrows_f32(hw, c_in, c_out) is not None
            and os.environ.get('VD3D_DCN_IMPL', 'packed') == 'packed')


def _gather_rows(src: jnp.ndarray, start: jnp.ndarray) -> jnp.ndarray:
    """[B, R, C2], [B, N, 1] -> [B, N, C2] single-row gather."""
    cols = src.shape[-1]
    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(1,), collapsed_slice_dims=(0,), start_index_map=(0,))
    return _split_gather(
        src, start,
        lambda s, i: jax.lax.gather(
            s, i, dnums, slice_sizes=(1, cols),
            mode=jax.lax.GatherScatterMode.CLIP))


def _lerp_matmul_alltaps_kernel(g_ref, w_ref, wk_ref, o_ref, *, c: int,
                                kt: int, cout: int):
    """All-taps-per-block variant: blocks g [1, K, TP, 2C] u32,
    w [1, K, TP, 4] bf16, wk [K, C, Cout] bf16 (whole) -> out [1, TP, Cout].
    One contiguous multi-tap DMA per pixel tile instead of K separate grid
    steps (the per-tap grid spent ~2x the kernel floor on block overheads
    at KM3D's 4320-block stride-4 shape)."""
    tp = g_ref.shape[2]

    def body(kk, acc):
        g = g_ref[0, kk]
        wq = w_ref[0, kk].astype(jnp.float32)
        lo = jax.lax.bitcast_convert_type(g << 16, jnp.float32)
        hi = jax.lax.bitcast_convert_type(g & jnp.uint32(0xFFFF0000),
                                          jnp.float32)
        v = lo * wq[:, 2:3] + hi * wq[:, 3:4]
        lane = jax.lax.broadcasted_iota(jnp.int32, v.shape, 1)
        wx = jnp.where(lane < c, wq[:, 0:1], wq[:, 1:2])
        vw = v * wx
        sampled = (vw[:, :c] + vw[:, c:]).astype(jnp.bfloat16)
        return acc + jnp.dot(sampled, wk_ref[kk],
                             preferred_element_type=jnp.float32)

    acc = jax.lax.fori_loop(
        0, kt, body, jnp.zeros((tp, cout), jnp.float32))
    o_ref[0] = acc.astype(o_ref.dtype)


def _pick_pixrows_alltaps(hw: int, c: int, cout: int, kt: int,
                          budget: int = 10 * 2 ** 20) -> int | None:
    """Pixel rows per all-taps block: K-tap g/w blocks double-buffered, the
    whole wk, ~4 in-loop [TP, 2C] f32 temporaries, carry + output."""
    wk_bytes = kt * c * cout * 2
    if wk_bytes > 4 * 2 ** 20:
        return None  # big-channel DCNs keep the per-tap grid (wk streams)
    for tp in (1024, 512, 256, 128, 64, 32, 16, 8):
        per_row = (2 * kt * (2 * c) * 4 + 2 * kt * 128 * 2
                   + 4 * (2 * c) * 4 + cout * 4 + cout * 2)
        if hw % tp == 0 and tp * per_row + wk_bytes <= budget:
            return tp
    return None


def _lerp_matmul_pallas(g2, wts, wk, b, hw):
    """g2 [B*K*HW, 2C] u32, wts [B*K*HW, 4] bf16, wk [K, C, Cout] bf16
    -> [B*HW, Cout] bf16 (rows taps-outer: row = (b*K + k)*HW + p)."""
    kt, c, cout = wk.shape
    interpret = jax.default_backend() != 'tpu'

    # all-taps-per-block variant: MEASURED REGRESSION at the KM3D shapes
    # (494 -> 615 ms): the [B*K*HW, 2C] -> [B, K, HW, 2C] operand reshapes
    # materialize ~110 ms of relayout/pad (XLA re-tiles the 4-D view), far
    # exceeding the ~15 ms of per-tap grid overhead it removes. Kept behind
    # VD3D_DCN_ALLTAPS=1 for narrower-channel shapes where it may win.
    tp2 = (_pick_pixrows_alltaps(hw, c, cout, kt)
           if os.environ.get('VD3D_DCN_ALLTAPS') == '1' else None)
    if tp2 is not None:
        g4 = g2.reshape(b, kt, hw, 2 * c)
        w4 = wts.reshape(b, kt, hw, 4)
        out = pl.pallas_call(
            functools.partial(_lerp_matmul_alltaps_kernel, c=c, kt=kt,
                              cout=cout),
            out_shape=jax.ShapeDtypeStruct((b, hw, cout), jnp.bfloat16),
            grid=(b, hw // tp2),
            in_specs=[
                pl.BlockSpec((1, kt, tp2, 2 * c), lambda bb, t: (bb, 0, t, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, kt, tp2, 4), lambda bb, t: (bb, 0, t, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((kt, c, cout), lambda bb, t: (0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, tp2, cout), lambda bb, t: (bb, t, 0),
                                   memory_space=pltpu.VMEM),
            cost_estimate=pl.CostEstimate(
                flops=2 * b * hw * kt * c * cout + 8 * b * hw * kt * c,
                transcendentals=0,
                bytes_accessed=b * hw * kt * (2 * c * 4 + 8)
                + b * hw * cout * 2),
            interpret=interpret,
        )(g4, w4, wk)
        return out.reshape(b * hw, cout)

    tp = _pick_pixrows(hw, c, cout)
    assert tp is not None, 'caller must check _packed_ok first'
    ppb = hw // tp                      # pixel blocks per (image, tap)
    row_map = lambda t, kk: ((t // ppb) * (kt * ppb) + kk * ppb + (t % ppb), 0)
    return pl.pallas_call(
        functools.partial(_lerp_matmul_kernel, c=c, k=kt),
        out_shape=jax.ShapeDtypeStruct((b * hw, cout), jnp.bfloat16),
        grid=(b * ppb, kt),
        in_specs=[
            pl.BlockSpec((tp, 2 * c), row_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((tp, 4), row_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c, cout), lambda t, kk: (kk, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tp, cout), lambda t, kk: (t, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((tp, cout), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * b * hw * kt * c * cout + 8 * b * hw * kt * c,
            transcendentals=0,
            bytes_accessed=b * hw * kt * (2 * c * 4 + 16) + b * hw * cout * 2),
        interpret=interpret,
    )(g2, wts, wk)


def _lerp_matmul_f32_kernel(g_ref, w_ref, wk_ref, o_ref, acc, *, c: int, k: int):
    """f32 variant of _lerp_matmul_kernel: the gathered row holds all four
    corners side by side ([v00 | v01 | v10 | v11], 4C f32 lanes) instead of
    bit-packed u32 pairs; same lerp + tap-matmul + f32 accumulation."""
    kk = pl.program_id(1)
    g = g_ref[:]                                         # [TP, 4C] f32
    lane = jax.lax.broadcasted_iota(jnp.int32, g.shape, 1)
    blk = lane // c                                      # 0..3 corner block
    wx = jnp.where((blk == 0) | (blk == 2), w_ref[:, 0:1], w_ref[:, 1:2])
    wy = jnp.where(blk < 2, w_ref[:, 2:3], w_ref[:, 3:4])
    vw = g * wx * wy
    sampled = (vw[:, :c] + vw[:, c:2 * c] + vw[:, 2 * c:3 * c]
               + vw[:, 3 * c:])                          # [TP, C] f32

    @pl.when(kk == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)

    acc[:] += jnp.dot(sampled, wk_ref[0], preferred_element_type=jnp.float32)

    @pl.when(kk == k - 1)
    def _():
        o_ref[:] = acc[:].astype(o_ref.dtype)


def _lerp_matmul_f32_pallas(g4, wts, wk, b, hw):
    """g4 [B*K*HW, 4C] f32, wts [B*K*HW, 4] f32, wk [K, C, Cout] f32
    -> [B*HW, Cout] f32 (rows taps-outer, same convention as the u32 path)."""
    kt, c, cout = wk.shape
    tp = _pick_pixrows_f32(hw, c, cout)
    assert tp is not None, 'caller must check _packed_f32_ok first'
    ppb = hw // tp
    row_map = lambda t, kk: ((t // ppb) * (kt * ppb) + kk * ppb + (t % ppb), 0)
    interpret = jax.default_backend() != 'tpu'
    return pl.pallas_call(
        functools.partial(_lerp_matmul_f32_kernel, c=c, k=kt),
        out_shape=jax.ShapeDtypeStruct((b * hw, cout), jnp.float32),
        grid=(b * ppb, kt),
        in_specs=[
            pl.BlockSpec((tp, 4 * c), row_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((tp, 4), row_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c, cout), lambda t, kk: (kk, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tp, cout), lambda t, kk: (t, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((tp, cout), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * b * hw * kt * c * cout + 12 * b * hw * kt * c,
            transcendentals=0,
            bytes_accessed=b * hw * kt * (4 * c * 4 + 16) + b * hw * cout * 4),
        interpret=interpret,
    )(g4, wts, wk)


def _lerp_accum_kernel(g_ref, w_ref, o_ref, acc, *, c: int, k: int):
    """Lerp-only variant of _lerp_matmul_kernel for the PRE-MULTIPLIED
    table: rows are already in output-channel space, so the kernel just
    unpacks + lerps + accumulates the K taps in f32."""
    kk = pl.program_id(1)
    g = g_ref[:]
    lo = jax.lax.bitcast_convert_type(g << 16, jnp.float32)
    hi = jax.lax.bitcast_convert_type(g & jnp.uint32(0xFFFF0000), jnp.float32)
    wq = w_ref[:].astype(jnp.float32)
    v = lo * wq[:, 2:3] + hi * wq[:, 3:4]
    lane = jax.lax.broadcasted_iota(jnp.int32, v.shape, 1)
    wx = jnp.where(lane < c, wq[:, 0:1], wq[:, 1:2])
    vw = v * wx
    sampled = vw[:, :c] + vw[:, c:]                     # [TP, Cout] f32

    @pl.when(kk == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)

    acc[:] += sampled

    @pl.when(kk == k - 1)
    def _():
        o_ref[:] = acc[:].astype(o_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6,))
def _premul_conv(flat, startk, fx, fym, my, wk, dims):
    """Channel-reducing DCNv2: multiply by the tap weights BEFORE the
    gather. Bilinear sampling is linear in the gathered rows, so
    lerp(X) @ Wk == lerp(X @ Wk) exactly (up to one extra bf16 rounding of
    the pre-multiplied table); gathering in output-channel space cuts the
    per-value-bound gather by c_in / c_out (2-8x on the DLA proj DCNs).

    flat: [B, R, C_in] bf16; startk: [B, K*HW, 1] taps-outer row indices;
    fx/fym/my: [B, K*HW]; wk: [K, C_in, C_out]. Returns [B, HW, C_out] bf16.
    """
    out, _ = _premul_conv_fwd(flat, startk, fx, fym, my, wk, dims)
    return out


def _premul_conv_fwd(flat, startk, fx, fym, my, wk, dims):
    return (_premul_conv_impl(flat, startk, fx, fym, my, wk, dims),
            (flat, startk, fx, fym, my, wk))


def _premul_conv_bwd(dims, res, ct):
    wp, hw = dims
    flat, startk, fx, fym, my, wk = res
    _, vjp = jax.vjp(
        lambda fl, f1, f2, f3, w_: _pairs_conv_ref(fl, startk, f1, f2, f3, w_,
                                                   wp, hw),
        flat, fx, fym, my, wk)
    d_flat, d_fx, d_fym, d_my, d_wk = vjp(ct.astype(flat.dtype))
    return d_flat, None, d_fx, d_fym, d_my, d_wk


def _premul_conv_impl(flat, startk, fx, fym, my, wk, dims):
    wp, hw = dims
    b, r, c_in = flat.shape
    kt, _, cout = wk.shape
    n = startk.shape[1]
    # per-tap dense projection of the padded table: [B, R, K*Cout]
    y = jnp.einsum('brc,kco->brko', flat, wk.astype(flat.dtype),
                   preferred_element_type=jnp.bfloat16)
    y = y.astype(jnp.bfloat16)
    # pack vertical bf16 pairs into u32 and stack the (x0, x0+1) columns —
    # same layout trick as _packed_conv_fwd, per tap
    lo = jax.lax.bitcast_convert_type(y, jnp.uint16).astype(jnp.uint32)
    down = jnp.concatenate([lo[:, wp:], jnp.zeros_like(lo[:, :wp])], axis=1)
    packed = lo | (down << 16)                          # [B, R, K, Cout] u32
    right = jnp.concatenate([packed[:, 1:], jnp.zeros_like(packed[:, :1])],
                            axis=1)
    src = jnp.concatenate([packed, right], axis=-1)     # [B, R, K, 2Cout]
    src = src.transpose(0, 2, 1, 3).reshape(b * kt, r, 2 * cout)
    # taps-outer start rows [B, K, HW] -> per-(b, k) tables
    g = _gather_rows(src, startk.reshape(b * kt, hw, 1))  # [B*K, HW, 2Cout]
    wts = jnp.stack([1.0 - fx, fx, my, fym], axis=-1).astype(jnp.bfloat16)

    tp = _pick_pixrows(hw, cout, cout)
    assert tp is not None, 'caller must check _premul_ok first'
    ppb = hw // tp
    row_map = lambda t, kk: ((t // ppb) * (kt * ppb) + kk * ppb + (t % ppb), 0)
    interpret = jax.default_backend() != 'tpu'
    out = pl.pallas_call(
        functools.partial(_lerp_accum_kernel, c=cout, k=kt),
        out_shape=jax.ShapeDtypeStruct((b * hw, cout), jnp.bfloat16),
        grid=(b * ppb, kt),
        in_specs=[
            pl.BlockSpec((tp, 2 * cout), row_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((tp, 4), row_map, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tp, cout), lambda t, kk: (t, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((tp, cout), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=8 * b * hw * kt * cout,
            transcendentals=0,
            bytes_accessed=b * hw * kt * (2 * cout * 4 + 8)
            + b * hw * cout * 2),
        interpret=interpret,
    )(g.reshape(b * kt * hw, 2 * cout), wts.reshape(b * n, 4))
    return out.reshape(b, hw, cout)


_premul_conv.defvjp(_premul_conv_fwd, _premul_conv_bwd)


def _premul_ok(hw: int, c_in: int, c_out: int, dtype) -> bool:
    """Pre-multiply gate — OFF by default (VD3D_DCN_PREMUL=1 to enable).

    Measured on v5e (KM3D batch 16, r3): the XLA gather at these shapes is
    per-SLICE bound (~10-13 ns per gathered row, NOT per value), so halving
    the row width only cut the stride-8 proj gathers 14.6 -> 11.8 ms while
    the pre-multiplied table construction (einsum + pack + per-tap
    transpose) added ~26 ms — a net LOSS (494 -> 515 ms end to end). Kept
    behind a flag because the trade flips wherever c_in/c_out >= ~4 with
    small spatial extents."""
    if os.environ.get('VD3D_DCN_PREMUL') != '1':
        return False
    if dtype != jnp.bfloat16 or c_out % 64 or c_out >= c_in:
        return False
    return (_pick_pixrows(hw, c_out, c_out) is not None
            and os.environ.get('VD3D_DCN_IMPL', 'packed') == 'packed')


@functools.partial(jax.custom_vjp, nondiff_argnums=(6,))
def _packed_f32_conv(flat, start, fx, fym, my, wk, dims):
    """f32 fused bilinear + tap matmul (inference): one (1, 4C) row slice
    gathers all four corners, the Pallas kernel lerps + matmuls from VMEM.
    Same argument convention as _packed_conv."""
    out, _ = _packed_f32_conv_fwd(flat, start, fx, fym, my, wk, dims)
    return out


def _packed_f32_conv_fwd(flat, start, fx, fym, my, wk, dims):
    wp, hw = dims
    b, r, c = flat.shape
    n = start.shape[1]
    down = jnp.concatenate([flat[:, wp:], jnp.zeros_like(flat[:, :wp])], axis=1)
    right = lambda a: jnp.concatenate([a[:, 1:], jnp.zeros_like(a[:, :1])],
                                      axis=1)
    # [v00 | v01 | v10 | v11] in one 4C row: the gather output IS the
    # kernel's input layout (no reshape copies)
    src = jnp.concatenate([flat, right(flat), down, right(down)], axis=-1)
    g = _gather_rows(src, start)                          # [B, N, 4C]
    wts = jnp.stack([1.0 - fx, fx, my, fym], axis=-1).astype(jnp.float32)
    out = _lerp_matmul_f32_pallas(g.reshape(b * n, 4 * c),
                                  wts.reshape(b * n, 4),
                                  wk.astype(jnp.float32), b, hw)
    return out.reshape(b, hw, wk.shape[-1]), (flat, start, fx, fym, my, wk)


def _packed_f32_conv_bwd(dims, res, ct):
    wp, hw = dims
    flat, start, fx, fym, my, wk = res
    _, vjp = jax.vjp(
        lambda fl, f1, f2, f3, w_: _pairs_conv_ref(fl, start, f1, f2, f3, w_,
                                                   wp, hw),
        flat, fx, fym, my, wk)
    d_flat, d_fx, d_fym, d_my, d_wk = vjp(ct.astype(flat.dtype))
    return d_flat, None, d_fx, d_fym, d_my, d_wk


_packed_f32_conv.defvjp(_packed_f32_conv_fwd, _packed_f32_conv_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6,))
def _packed_conv(flat, start, fx, fym, my, wk, dims):
    """Packed bilinear sampling + tap matmul: the DCNv2 hot loop.

    flat: [B, R, C] bf16 zero-padded image rows (R = Hp*Wp);
    start: [B, N, 1] int32 flat (y0, x0) corner index, rows taps-OUTER
      (N = K*HW ordered [K, HW]);
    fx/fym/my: [B, N] lerp weights ((fy, 1-fy) pre-multiplied by the DCNv2
      modulation mask), same order; wk: [K, C, Cout] tap weights;
    dims: static (wp, hw).
    Returns [B, HW, Cout] bf16.
    """
    out, _ = _packed_conv_fwd(flat, start, fx, fym, my, wk, dims)
    return out


def _packed_conv_fwd(flat, start, fx, fym, my, wk, dims):
    wp, hw = dims
    b, r, c = flat.shape
    n = start.shape[1]
    lo = jax.lax.bitcast_convert_type(flat, jnp.uint16).astype(jnp.uint32)
    down = jnp.concatenate([lo[:, wp:], jnp.zeros_like(lo[:, :wp])], axis=1)
    packed = lo | (down << 16)                       # [B, R, C] u32
    # stack the (x0, x0+1) columns along channels so ONE (1, 2C) row slice
    # holds all four corners — the gather then emits rows that are ALREADY
    # the kernel's [R2, 2C] lane layout. (A (2, C) slice_sizes gather needs
    # a sublane->lane merging reshape afterwards, which XLA materialises as
    # a full copy of the 0.5 GB gathered tensor — measured +3 ms.)
    right = jnp.concatenate([packed[:, 1:], jnp.zeros_like(packed[:, :1])],
                            axis=1)
    src = jnp.concatenate([packed, right], axis=-1)   # [B, R, 2C] u32
    if os.environ.get('VD3D_DCN_GATHER_BARRIER') == '1':
        # Probe lever (kept for A/B): forbid XLA from fusing the
        # pack/concat producer or index arithmetic into the gather program.
        # RESOLVED r4: the 4x bare-vs-in-model gap was NOT fusion — it was
        # the batched operand's footprint (tools/probe_gather_height.py:
        # 2.5 ns/slice on a 16.6 MB source vs 10.6 on 265 MB, identical
        # slice count/pattern). _split_gather exploits it.
        src, start = jax.lax.optimization_barrier((src, start))
    g = _gather_rows(src, start)                      # [B, N, 2C] u32
    wts = jnp.stack([1.0 - fx, fx, my, fym], axis=-1).astype(jnp.bfloat16)
    out = _lerp_matmul_pallas(g.reshape(b * n, 2 * c),
                              wts.reshape(b * n, 4),
                              wk.astype(jnp.bfloat16), b, hw)
    return out.reshape(b, hw, wk.shape[-1]), (flat, start, fx, fym, my, wk)


def _pairs_conv_ref(flat, start, fx, fym, my, wk, wp, hw):
    """Pair-gather formulation of _packed_conv (identical math, plain jnp):
    used as the backward-pass oracle via jax.vjp."""
    b, r, c = flat.shape
    kt = wk.shape[0]
    down = jnp.concatenate([flat[:, wp:], jnp.zeros_like(flat[:, :wp])], axis=1)
    src = jnp.concatenate([flat, down], axis=-1)
    g = _gather_pairs(src, start)                     # [B, N, 2, 2C]
    fx1 = fx[..., None]
    gx = g[:, :, 0, :] * (1 - fx1) + g[:, :, 1, :] * fx1
    sampled = gx[..., :c] * my[..., None] + gx[..., c:] * fym[..., None]
    sampled = sampled.reshape(b, kt, hw, c)
    return jnp.einsum('bkpc,kco->bpo', sampled, wk,
                      preferred_element_type=sampled.dtype)


def _packed_conv_bwd_pairsref(dims, res, ct):
    """Legacy backward: full recompute through the pairs formulation
    (VD3D_DCN_BWD=pairs). Measured 77 ms fwd+bwd at (4,96,320,64) bf16 —
    slower than running pairs end to end (67 ms), which is why r2/r3
    training stayed on the pairs path."""
    wp, hw = dims
    flat, start, fx, fym, my, wk = res
    _, vjp = jax.vjp(
        lambda fl, f1, f2, f3, w_: _pairs_conv_ref(fl, start, f1, f2, f3, w_,
                                                   wp, hw),
        flat, fx, fym, my, wk)
    d_flat, d_fx, d_fym, d_my, d_wk = vjp(ct.astype(flat.dtype))
    return d_flat, None, d_fx, d_fym, d_my, d_wk


def _lerp_matmul_bwd_kernel(g_ref, w_ref, ct_ref, wk_ref,
                            dcorner_ref, dwts_ref, dwk_ref, *, c: int):
    """Backward of the fused lerp + tap-matmul block.

    Grid (K, pix_tiles) — taps OUTER so the [C, Cout] per-tap weight-grad
    output block is revisited consecutively across the inner pixel steps
    (f32 accumulate in the output block itself). Recomputes the fwd
    kernel's intermediates (incl. the bf16 cast of `sampled`, so d_wk is
    the exact vjp of what the fwd actually multiplied), then emits:
      dcorner [TP, 4C] = [d(y0,x0) | d(y1,x0) | d(y0,x1) | d(y1,x1)]
        (row-scatter-ready: lanes :2C update flat row x0 in the
        [flat | down] pairs space, lanes 2C: update row x0+1);
      dwts    [TP, 4]  = d(1-fx), d(fx), d(my), d(fym);
      dwk     [C, Cout] f32 (accumulated over pixels and batch).
    """
    t = pl.program_id(1)
    g = g_ref[:]
    lo = jax.lax.bitcast_convert_type(g << 16, jnp.float32)
    hi = jax.lax.bitcast_convert_type(g & jnp.uint32(0xFFFF0000), jnp.float32)
    wq = w_ref[:].astype(jnp.float32)           # [TP, 4]: 1-fx, fx, my, fym
    v = lo * wq[:, 2:3] + hi * wq[:, 3:4]       # [TP, 2C]
    lane = jax.lax.broadcasted_iota(jnp.int32, v.shape, 1)
    wx = jnp.where(lane < c, wq[:, 0:1], wq[:, 1:2])
    vw = v * wx
    sampled = (vw[:, :c] + vw[:, c:]).astype(jnp.bfloat16)   # [TP, C]
    dy = ct_ref[:].astype(jnp.bfloat16)         # [TP, Cout]

    @pl.when(t == 0)
    def _():
        dwk_ref[...] = jnp.zeros_like(dwk_ref)

    dwk_ref[0] += jax.lax.dot_general(
        sampled, dy, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)     # [C, Cout]

    ds = jax.lax.dot_general(
        dy, wk_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)     # [TP, C]
    ds2 = jnp.concatenate([ds, ds], axis=1)     # both x-halves see ds
    dv = ds2 * wx
    dwx = ds2 * v
    dw0 = jnp.sum(dwx[:, :c], axis=1, keepdims=True)    # d(1-fx)
    dw1 = jnp.sum(dwx[:, c:], axis=1, keepdims=True)    # d(fx)
    dw2 = jnp.sum(dv * lo, axis=1, keepdims=True)       # d(my)
    dw3 = jnp.sum(dv * hi, axis=1, keepdims=True)       # d(fym)
    dwts_ref[:] = jnp.concatenate(
        [dw0, dw1, dw2, dw3], axis=1).astype(dwts_ref.dtype)
    dlo = dv * wq[:, 2:3]
    dhi = dv * wq[:, 3:4]
    dcorner_ref[:] = jnp.concatenate(
        [dlo[:, :c], dhi[:, :c], dlo[:, c:], dhi[:, c:]],
        axis=1).astype(dcorner_ref.dtype)


def _pick_pixrows_bwd(hw: int, c: int, cout: int,
                      budget: int = 8 * 2 ** 20) -> int | None:
    """VMEM-budgeted pixel rows per bwd block: ~10 [TP, 2C] f32 temporaries
    (distinct stack slots), the [TP, 4C] output, two [TP, 4->128] blocks,
    ct + ds, and the f32 [C, Cout] accumulator held across steps."""
    per_row = (10 * (2 * c) * 4 + (4 * c) * 2 + 2 * 128 * 4
               + max(cout, 128) * 2 + max(c, 128) * 4)
    for tp in (1024, 512, 256, 128, 64, 32, 16, 8):
        if hw % tp == 0 and tp * per_row + c * max(cout, 128) * 4 <= budget:
            return tp
    return None


def _packed_conv_bwd(dims, res, ct):
    """Direct backward of the packed path (default; VD3D_DCN_BWD=pairs for
    the legacy recompute). Re-packs and re-gathers the u32 corner rows
    (~6.5 ms at the probe shape vs 15.3 for the pairs re-gather), runs one
    Pallas kernel for all lerp/matmul grads (the [N, 2C] intermediate
    chains never touch HBM), and keeps the proven height-1 row-scatter for
    the image gradient."""
    if os.environ.get('VD3D_DCN_BWD') == 'pairs':
        return _packed_conv_bwd_pairsref(dims, res, ct)
    wp, hw = dims
    flat, start, fx, fym, my, wk = res
    b, r, c = flat.shape
    n = start.shape[1]
    kt = wk.shape[0]
    cout = wk.shape[-1]
    if _pick_pixrows_bwd(hw, c, cout) is None:
        # the bwd kernel's VMEM budget is tighter than the fwd's; shapes
        # that fit fwd but not bwd fall back to the pairs-recompute vjp
        return _packed_conv_bwd_pairsref(dims, res, ct)

    lo = jax.lax.bitcast_convert_type(flat, jnp.uint16).astype(jnp.uint32)
    down = jnp.concatenate([lo[:, wp:], jnp.zeros_like(lo[:, :wp])], axis=1)
    packed = lo | (down << 16)
    right = jnp.concatenate([packed[:, 1:], jnp.zeros_like(packed[:, :1])],
                            axis=1)
    src = jnp.concatenate([packed, right], axis=-1)   # [B, R, 2C] u32
    g = _gather_rows(src, start)                      # [B, N, 2C] u32
    wts = jnp.stack([1.0 - fx, fx, my, fym], axis=-1).astype(jnp.bfloat16)

    tp = _pick_pixrows_bwd(hw, c, cout)
    assert tp is not None, 'packed bwd needs a VMEM-fitting pixel tile'
    ppb = hw // tp
    row_map = lambda kk, t: ((t // ppb) * (kt * ppb) + kk * ppb + (t % ppb),
                             0)
    interpret = jax.default_backend() != 'tpu'
    dcorner, dwts, dwk = pl.pallas_call(
        functools.partial(_lerp_matmul_bwd_kernel, c=c),
        out_shape=(
            jax.ShapeDtypeStruct((b * n, 4 * c), jnp.bfloat16),
            jax.ShapeDtypeStruct((b * n, 4), jnp.float32),
            jax.ShapeDtypeStruct((kt, c, cout), jnp.float32),
        ),
        grid=(kt, b * ppb),
        in_specs=[
            pl.BlockSpec((tp, 2 * c), row_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((tp, 4), row_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((tp, cout), lambda kk, t: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c, cout), lambda kk, t: (kk, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((tp, 4 * c), row_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((tp, 4), row_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c, cout), lambda kk, t: (kk, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        cost_estimate=pl.CostEstimate(
            flops=16 * b * n * c * cout // kt * kt + 12 * b * n * 2 * c,
            transcendentals=0,
            bytes_accessed=b * n * (2 * c * 4 + 4 * c * 2 + cout * 2 + 32)),
        interpret=interpret,
    )(g.reshape(b * n, 2 * c), wts.reshape(b * n, 4),
      ct.reshape(b * hw, cout), wk.astype(jnp.bfloat16))

    # image gradient: scatter into the pairs [flat | down] space as
    # height-1 row slices (the overlapping 2-row scatter serializes — see
    # _gather_pairs). Row x0 takes lanes :2C of dcorner, row x0+1 lanes 2C:.
    dcorner = dcorner.reshape(b, n, 4 * c)
    idx = start[:, :, 0]
    idx2 = jnp.concatenate([idx, idx + 1], axis=1)               # [B, 2N]
    upd = jnp.concatenate(
        [dcorner[..., :2 * c], dcorner[..., 2 * c:]], axis=1)    # [B,2N,2C]
    upd = upd.astype(flat.dtype)

    def scat(i, u):
        return jnp.zeros((r, 2 * c), u.dtype).at[
            jnp.clip(i, 0, r - 1)].add(u, mode='drop')

    srcgrad = jax.vmap(scat)(idx2, upd)                          # [B, R, 2C]
    d_flat = srcgrad[:, :, :c] + jnp.concatenate(
        [jnp.zeros((b, wp, c), srcgrad.dtype), srcgrad[:, :r - wp, c:]],
        axis=1)

    dwts = dwts.reshape(b, n, 4)
    d_fx = (dwts[..., 1] - dwts[..., 0]).astype(fx.dtype)
    d_my = dwts[..., 2].astype(my.dtype)
    d_fym = dwts[..., 3].astype(fym.dtype)
    return (d_flat.astype(flat.dtype), None, d_fx, d_fym, d_my,
            dwk.astype(wk.dtype))


_packed_conv.defvjp(_packed_conv_fwd, _packed_conv_bwd)


def modulated_deform_conv(x: jnp.ndarray,
                          offset: jnp.ndarray,
                          mask: jnp.ndarray,
                          weight: jnp.ndarray,
                          bias: jnp.ndarray | None = None,
                          stride: int = 1,
                          padding: int = 1,
                          dilation: int = 1,
                          train: bool = False) -> jnp.ndarray:
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

    # coordinates ALWAYS in f32: at x ~ 320 a bf16 coordinate has ULP 2.0,
    # which would discard the fractional offsets entirely on the image's
    # right half. The lerp weights in [0, 1] are well-represented in f, so
    # only the base+offset sum needs the precision.
    py, px = _tap_coords(offset.astype(jnp.float32), ho, wo, kh, kw, stride,
                         padding, dilation, jnp.float32)
    y0 = jnp.floor(py)
    x0 = jnp.floor(px)
    fy = (py - y0).astype(f)
    fx = (px - x0).astype(f)
    y0p = jnp.clip(y0.astype(jnp.int32) + 2, 0, hp - 2)
    x0p = jnp.clip(x0.astype(jnp.int32) + 2, 0, wp - 2)
    start = (y0p * wp + x0p).reshape(b, -1, 1)            # [B, N*K, 1]
    n = ho * wo * k

    # the premul/f32-packed paths are inference-only; the bf16 packed path
    # now also serves TRAINING (r4): its direct Pallas backward
    # (_packed_conv_bwd) replaced the pairs-recompute vjp that made it a
    # net loss in r2 (77 ms vs 67 pairs fwd+bwd at the probe shape).
    # VD3D_DCN_TRAIN_PACKED=0 falls back to the pairs path for training.
    train_packed = os.environ.get('VD3D_DCN_TRAIN_PACKED', '1') == '1'
    use_pre = not train and _premul_ok(ho * wo, c_in, c_out, f)
    use_p16 = ((not train or train_packed) and not use_pre
               and _packed_ok(ho * wo, c_in, c_out, f))
    use_p32 = (not train and not use_pre and not use_p16
               and _packed_f32_ok(ho * wo, c_in, c_out, f))
    if use_pre or use_p16 or use_p32:
        perm = (0, 3, 1, 2)  # [B,Ho,Wo,K] -> [B,K,Ho,Wo]: taps-outer rows
        startk = (y0p * wp + x0p).transpose(perm).reshape(b, n, 1)
        if use_pre:
            packed_fn = _premul_conv
        else:
            packed_fn = _packed_conv if use_p16 else _packed_f32_conv
        out = packed_fn(
            flat, startk,
            fx.transpose(perm).reshape(b, n),
            (fy * mask).transpose(perm).reshape(b, n),
            ((1 - fy) * mask).transpose(perm).reshape(b, n),
            weight.reshape(k, c_in, c_out), (wp, ho * wo))
        out = out.reshape(b, ho, wo, c_out)
        if bias is not None:
            out = out + bias
        return out
    else:
        down = jnp.concatenate([flat[:, wp:], jnp.zeros((b, wp, c_in), f)],
                               axis=1)
        src = jnp.concatenate([flat, down], axis=-1)       # [B, Hp*Wp, 2C]
        g = _gather_pairs(src, start)                      # [B, N*K, 2, 2C]

        # two sequential lerps in the gather's flat layout: XLA fuses them
        # INTO the (scalar-core-bound) gather fusion, so they cost ~nothing.
        # A 6-D corner einsum — or any layout-changing consumer — breaks
        # that fusion and adds multi-ms copies.
        fxf = fx.reshape(b, n, 1)
        fyf = (fy * mask).reshape(b, n, 1)  # modulation folded into y lerp
        myf = ((1 - fy) * mask).reshape(b, n, 1)
        gx = g[:, :, 0, :] * (1 - fxf) + g[:, :, 1, :] * fxf  # [B, N, 2C]
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

    py, px = _tap_coords(offset.astype(jnp.float32), ho, wo, kh, kw, stride,
                         padding, dilation, jnp.float32)
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
                dilation: int = 1,
                train: bool = False) -> jnp.ndarray:
    """Plain (v1, non-modulated) deformable conv: mask == 1 everywhere.

    reference: DeformConvPack (dcn/deform_conv.py:53-200).
    """
    b, ho, wo = offset.shape[0], offset.shape[1], offset.shape[2]
    k = offset.shape[-1] // 2
    ones = jnp.ones((b, ho, wo, k), dtype=x.dtype)
    return modulated_deform_conv(x, offset, ones, weight, bias, stride,
                                 padding, dilation, train=train)
