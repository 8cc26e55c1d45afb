"""Fused int8 ResNet BasicBlock as one Pallas whole-item-in-VMEM kernel.

Why this exists (r5 stereo int8 profile, docs/int8_roofline.md): XLA's
int8 conv emitter at 64 channels NEVER fuses the requantize epilogue, no
matter how the surrounding graph is written — each layer1 conv writes its
raw s32 [32,72,320,64] output (94 MB) to HBM at ~126 GB/s (6x 0.748 ms),
plus separate s8 requant passes and residual-requant tuples: ~9.3 of
44.6 ms of the int8 stereo forward. The XLA-level flat-chain rewrite
(quant.py ``_int8_basic_block``) measured exactly neutral, so the only
way out is to bypass the XLA conv emitter: this kernel computes a whole
identity-shortcut BasicBlock per batch item with every intermediate in
VMEM —

    int8 x_pad  ->  conv1 (9 shifted-slice int8 MXU dots, s32 acc)
                ->  f32 affine (w*act*BN scale + shift)  ->  relu
                ->  requantize (int8, VMEM scratch)
                ->  conv2 (9 dots)  ->  f32 affine
                ->  + dequantized residual  ->  relu  ->  bf16 out

so HBM sees only the quantized input (1 byte/px/ch) and the bf16 output.
Conv taps are flat-row shifts dy*(W+2)+dx over the zero-padded image —
int8 jnp.dot and STATIC unaligned shifted slices both probed exact
on-chip (tools/probe_pallas_int8.py). Mosaic rejects any DYNAMIC sublane
offset it cannot prove ≡ 0 mod 8 (a grid-dependent tile base plus a
static tap shift is unprovable — both the fori and unrolled tiled
variants failed to compile), so the kernel holds the WHOLE padded item
in VMEM and runs one batch item per grid step: every slice offset is a
Python int. At layer1 geometry (72x320x64 int8 = 1.5 MB/item) the item,
the conv1 scratch, and the 9 unrolled tap temporaries together stay well
under VMEM; the grid pipelines item b+1's DMA behind item b's compute.

Residual precision: the shortcut adds the DEQUANTIZED int8 input
(xq * act_scale) instead of the float input — the residual is carried at
trunk precision, like int8 deployments generally do. The decode-parity /
raw-error / synthetic-AP gates in tests/test_quant.py arbitrate.

reference anchor: the BasicBlock this fuses,
visualDet3D/networks/backbones/resnet.py:23-53.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round8(n: int) -> int:
    return -(-n // 8) * 8


def _block_kernel(x_ref, w1_ref, w2_ref, p_ref, o_ref, h_ref, *,
                  c: int, wp: int, h_img: int, n_o: int, r2: int):
    """One grid step = one batch item, conv1 then conv2, all in VMEM.

    x_ref  [r2, c] int8   padded quantized input (one batch item) in
                          flat-row layout (pixel (i,j) at row i*wp+j)
    w1/w2  [9c, c] int8   taps-outer kernels (rows i*c:(i+1)*c = tap i)
    p_ref  [8, c]  f32    rows: sc1, sh1, inv_act2, sc2, sh2, act1, 0, 0
    o_ref  [n_o, c]       output rows (padded-row layout, see wrapper)
    h_ref  [r2, c] int8   VMEM scratch: conv1's requantized output
    """
    lo = wp + 1                      # first interior row
    last = (h_img + 2) * wp - wp - 1   # one past the last interior row

    @pl.when(pl.program_id(0) == 0)
    def _init():
        # h's pad ring rows above/below the interior must read as zero for
        # conv2; the interior is fully rewritten every item.
        h_ref[0:lo, :] = jnp.zeros((lo, c), jnp.int8)
        h_ref[lo + n_o:r2, :] = jnp.zeros((r2 - lo - n_o, c), jnp.int8)

    def _taps(src_ref, w_ref):
        # Python-unrolled static offsets: the only slice form Mosaic
        # accepts at arbitrary (mod 8) alignment
        acc = jnp.zeros((n_o, c), jnp.int32)
        for dy in range(3):
            for dx in range(3):
                i = 3 * dy + dx
                s = lo - wp - 1 + dy * wp + dx
                acc = acc + jnp.dot(src_ref[s:s + n_o, :],
                                    w_ref[i * c:(i + 1) * c, :],
                                    preferred_element_type=jnp.int32)
        return acc

    # interior mask in flat-row coords: absolute row a = lo + p is a real
    # pixel iff its column is not the L/R pad and it is above the bottom pad
    a = lo + jax.lax.broadcasted_iota(jnp.int32, (n_o, 1), 0)
    col = jax.lax.rem(a, wp)
    ok = (col >= 1) & (col <= wp - 2) & (a < last)

    acc = _taps(x_ref, w1_ref)
    hf = acc.astype(jnp.float32) * p_ref[0:1, :] + p_ref[1:2, :]
    hf = jnp.maximum(hf, 0.0) * p_ref[2:3, :]
    hq = jnp.clip(jnp.round(hf), -127.0, 127.0).astype(jnp.int8)
    h_ref[lo:lo + n_o, :] = jnp.where(ok, hq, jnp.int8(0))

    acc2 = _taps(h_ref, w2_ref)
    yf = acc2.astype(jnp.float32) * p_ref[3:4, :] + p_ref[4:5, :]
    res = x_ref[lo:lo + n_o, :].astype(jnp.float32) * p_ref[5:6, :]
    o_ref[...] = jnp.maximum(yf + res, 0.0).astype(o_ref.dtype)


def int8_basic_block_fused(x, be, compute_dtype=jnp.bfloat16):
    """Fused int8 BasicBlock forward. ``x`` [B,H,W,C] float activations;
    ``be`` a quant block entry ({e1, e2, bn{1,2}_scale, bn{1,2}_shift},
    models/quant.py collect_block_entries). Returns [B,H,W,C]
    ``compute_dtype``. Stride 1, dilation 1, 3x3, cin == cout only."""
    e1, e2 = be['e1'], be['e2']
    b, h_img, w_img, c = x.shape
    wp = w_img + 2
    r = (h_img + 2) * wp
    n_rows = h_img * wp              # interior rows in padded-row layout
    n_o = _round8(n_rows)            # kernel computes a few tail pad rows
    lo = wp + 1
    # taps read [lo - wp - 1, lo + n_o + wp + 2); h's tail strip must exist
    r2 = _round8(max(r, lo + n_o + wp + 2))

    a1 = e1['act_scale'].astype(jnp.float32)
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) * (1.0 / a1)),
                  -127, 127).astype(jnp.int8)
    xq = jnp.pad(xq, ((0, 0), (1, 1), (1, 1), (0, 0))).reshape(b, r, c)
    xq = jnp.pad(xq, ((0, 0), (0, r2 - r), (0, 0)))
    xq = xq.reshape(b * r2, c)

    w1 = e1['kernel_q'].reshape(9 * c, c)
    w2 = e2['kernel_q'].reshape(9 * c, c)
    zero = jnp.zeros((c,), jnp.float32)
    params = jnp.stack([
        (e1['w_scale'] * a1 * be['bn1_scale']).astype(jnp.float32),
        be['bn1_shift'].astype(jnp.float32),
        jnp.broadcast_to(1.0 / e2['act_scale'].astype(jnp.float32), (c,)),
        (e2['w_scale'] * e2['act_scale'] * be['bn2_scale']
         ).astype(jnp.float32),
        be['bn2_shift'].astype(jnp.float32),
        jnp.broadcast_to(a1, (c,)),
        zero, zero,
    ])

    out_dtype = jnp.dtype(compute_dtype)
    interpret = jax.default_backend() != 'tpu'
    out = pl.pallas_call(
        functools.partial(_block_kernel, c=c, wp=wp, h_img=h_img,
                          n_o=n_o, r2=r2),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((r2, c), lambda bb: (bb, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9 * c, c), lambda bb: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9 * c, c), lambda bb: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, c), lambda bb: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=jax.ShapeDtypeStruct((b * n_o, c), out_dtype),
        out_specs=pl.BlockSpec((n_o, c), lambda bb: (bb, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((r2, c), jnp.int8)],
        # the 9 unrolled tap slices + the s32 accumulator measure ~20 MB of
        # Mosaic scoped stack at layer1 geometry — over the 16 MB default
        # limit but far under the 128 MB v5e VMEM (blocks+scratch add ~8 MB)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * 9 * b * n_o * c * c,
            transcendentals=0,
            bytes_accessed=b * (r2 * c * 2
                                + n_o * c * out_dtype.itemsize)),
        interpret=interpret,
    )(xq, w1, w2, params)

    # output row p = a - lo: p = q*wp + s is pixel (q+1, s+1) of the padded
    # image, i.e. image pixel (q, s) — the valid columns are s in [0, W)
    out = out.reshape(b, n_o, c)[:, :n_rows]
    return out.reshape(b, h_img, wp, c)[:, :, :w_img].astype(compute_dtype)
