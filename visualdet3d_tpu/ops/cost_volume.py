"""Stereo cost-volume ops, TPU-native.

The reference builds cost volumes with Python loops over the disparity
channel on GPU (visualDet3D/networks/lib/PSM_cost_volume.py:58-64, 90-95).
Here the correlation volume is a single fused Pallas kernel: one HBM read of
each feature tile into VMEM, all D disparity shifts computed in-register, one
HBM write of the [*, W, D] volume. An XLA (pure jnp) implementation with
identical semantics is kept as fallback/reference and for non-TPU backends.

Layouts are NHWC (channels-last), the native TPU conv layout.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _on_tpu() -> bool:
    try:
        return jax.default_backend() == 'tpu'
    except Exception:
        return False


# ---------------------------------------------------------------------------
# Correlation (PSMCosine) volume: cost[b,h,w,d] = mean_c l[b,h,w,c]*r[b,h,w-d,c]
# ---------------------------------------------------------------------------

def correlation_volume_xla(left: jnp.ndarray, right: jnp.ndarray, num_disp: int) -> jnp.ndarray:
    """Reference XLA implementation. left/right: [B, H, W, C] -> [B, H, W, D].

    Matches PSMCosineModule semantics (PSM_cost_volume.py:80-96): entries with
    w < d are zero.
    """
    b, h, w, c = left.shape
    cols = []
    for d in range(num_disp):
        if d == 0:
            prod = jnp.mean(left * right, axis=-1)
        elif d >= w:  # disparity exceeds width: whole column is zero
            prod = jnp.zeros((b, h, w), left.dtype)
        else:
            shifted = jnp.pad(right[:, :, :w - d, :], ((0, 0), (0, 0), (d, 0), (0, 0)))
            prod = jnp.mean(left * shifted, axis=-1)
        cols.append(prod)
    return jnp.stack(cols, axis=-1)


def _pick_unroll(num_disp: int) -> int:
    for u in (8, 6, 4, 3, 2):
        if num_disp % u == 0:
            return u
    return 1


def _corr_loop(l, r0, store, num_disp: int):
    """Shared disparity loop: l/r0 [TR, W, C] f32; store(d, col [TR, W]).

    VMEM-shape lessons baked in (all paid for on real v5e):
    * each per-disparity slice is a 2-D [TR, W] tile with W on lanes — a
      [TR, W, 1] temporary pads its lane dim 1 -> 128 (128x blowup);
    * a fully Python-unrolled disparity loop gives every iteration's
      temporaries distinct stack slots (24 x ~1.3 MB -> OOM), while
      fori_loop bodies reuse slots;
    * a DYNAMIC-shift pltpu.roll lowers to ~log2(W) masked shift stages
      (~9x the shuffle work of a static roll) — the r1 all-dynamic loop
      spent ~4 ms/call in rolls alone at the stride-4 shape. So the loop is
      two-level: a fori outer carrying the r window pre-rotated by
      ``unroll`` (one STATIC roll per outer step), and a Python-unrolled
      inner with STATIC shifts 0..unroll-1 (unroll x [TR, W, C] f32
      temporaries — sized to fit scoped VMEM via the block-row budget).
    """
    scale = jnp.asarray(1.0 / l.shape[-1], jnp.float32)
    tr, w, _ = l.shape
    w_ids = jax.lax.broadcasted_iota(jnp.int32, (tr, w), 1)
    unroll = _pick_unroll(num_disp)

    def outer(i, r_base):
        d0 = i * unroll
        for j in range(unroll):
            # r_sh[t, w] = r[t, (w - (d0+j)) mod W]; w < d masked below
            r_sh = pltpu.roll(r_base, shift=j, axis=1) if j else r_base
            col = jnp.sum(l * r_sh, axis=-1) * scale  # [TR, W]
            col = jnp.where(w_ids >= d0 + j, col, 0.0)
            store(d0 + j, col)
        return pltpu.roll(r_base, shift=unroll, axis=1)

    jax.lax.fori_loop(0, num_disp // unroll, outer, r0)


def _corr_kernel(l_ref, r_ref, o_ref, *, num_disp: int, c: int):
    """Blocks: l/r [TR, W, C] -> o [D, TR, W] (see _corr_loop)."""
    # DMA in the input dtype (bf16 halves HBM traffic) but compute/rotate in
    # f32 — Mosaic's rotate only supports 32-bit data
    def store(d, col):
        o_ref[pl.ds(d, 1)] = col.astype(o_ref.dtype)[None]

    _corr_loop(l_ref[:].astype(jnp.float32), r_ref[:].astype(jnp.float32),
               store, num_disp)


def _corr_kernel_eyes(l_ref, r_ref, o_ref, *, num_disp: int, c: int):
    """Interleaved dual-eye blocks: l/r [1, TR, W, C] (even/odd batch rows
    of the SAME [2B, H, W, C] operand, selected by the BlockSpec index
    maps) -> o [D, 1, TR, W]."""
    def store(d, col):
        o_ref[pl.ds(d, 1)] = col.astype(o_ref.dtype)[None, None]

    _corr_loop(l_ref[0].astype(jnp.float32), r_ref[0].astype(jnp.float32),
               store, num_disp)


@functools.partial(jax.jit, static_argnames=('num_disp', 'interpret'))
def correlation_volume_pallas(left: jnp.ndarray, right: jnp.ndarray, num_disp: int,
                              interpret: bool = False) -> jnp.ndarray:
    """Fused Pallas correlation volume. left/right: [B, H, W, C] -> [B, H, W, D]."""
    b, h, w, c = left.shape
    bh = b * h
    l2 = left.reshape(bh, w, c)
    r2 = right.reshape(bh, w, c)

    # rows per block: two double-buffered input tiles, the f32 l/r_base
    # upcasts plus `unroll` static-shift r_sh temporaries (distinct stack
    # slots), and the output tile must fit comfortably in ~16 MB of VMEM.
    # Mosaic requires the block's sublane dim (rows, second-to-last of the
    # output block) to be a multiple of 8 or the full dimension.
    unroll = _pick_unroll(num_disp)
    itemsize = jnp.dtype(left.dtype).itemsize
    bytes_per_row = (2 * 2 * w * c * itemsize + (2 + unroll) * 4 * w * c
                     + 2 * w * num_disp * 4)
    budget_rows = max(1, (4 * 1024 * 1024) // max(bytes_per_row, 1))
    tr = None
    for cand in range(min(bh, budget_rows), 7, -1):
        if cand % 8 == 0 and bh % cand == 0:
            tr = cand
            break
    if tr is None:
        # fat rows blow the soft budget at every multiple of 8: take the
        # smallest legal tile rather than falling back to the whole array
        # (TR = BH OOM'd scoped VMEM at [72, 320, 64] f32, batch 1)
        tr = 8 if bh % 8 == 0 else bh

    grid = (bh // tr,)
    out = pl.pallas_call(
        functools.partial(_corr_kernel, num_disp=num_disp, c=c),
        out_shape=jax.ShapeDtypeStruct((num_disp, bh, w), left.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tr, w, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tr, w, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((num_disp, tr, w), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(l2, r2)
    # [D, BH, W] -> [B, H, W, D]; XLA fuses this transpose into the consumer
    return out.transpose(1, 2, 0).reshape(b, h, w, num_disp)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _correlation_volume_tpu(left, right, num_disp):
    return correlation_volume_pallas(left, right, num_disp)


def _corr_tpu_fwd(left, right, num_disp):
    return correlation_volume_pallas(left, right, num_disp), (left, right)


def _corr_tpu_bwd(num_disp, residuals, g):
    # backward via the (XLA-fused) reference formulation:
    #   dL[w] = sum_d g[w, d] * R[w-d] / C ; dR[w] = sum_d g[w+d, d] * L[w+d] / C
    left, right = residuals
    _, vjp = jax.vjp(lambda l, r: correlation_volume_xla(l, r, num_disp), left, right)
    return vjp(g)


_correlation_volume_tpu.defvjp(_corr_tpu_fwd, _corr_tpu_bwd)


def correlation_volume(left: jnp.ndarray, right: jnp.ndarray, num_disp: int,
                       use_pallas: bool | None = None) -> jnp.ndarray:
    """PSM cosine (correlation) cost volume.

    Differentiable either way: the Pallas path carries a custom VJP whose
    backward is the XLA formulation.

    Implementation choice (measured e2e on v5e with distinct-input honest
    benchmarking): Pallas 293 fps vs XLA-unrolled 212 fps at batch 16 — the
    kernel's single VMEM round-trip beats the D-shift XLA formulation's
    HBM traffic even though the custom call forces an operand relayout.
    VD3D_CORR_IMPL=xla to switch.
    """
    if use_pallas is None:
        import os
        impl = os.environ.get('VD3D_CORR_IMPL', 'pallas')
        use_pallas = impl == 'pallas' and _on_tpu()
    if use_pallas:
        return _correlation_volume_tpu(left, right, num_disp)
    return correlation_volume_xla(left, right, num_disp)


@functools.partial(jax.jit, static_argnames=('num_disp', 'interpret'))
def correlation_volume_pallas_interleaved(both: jnp.ndarray, num_disp: int,
                                          interpret: bool = False) -> jnp.ndarray:
    """Correlation volume straight off the interleaved dual-eye trunk.

    ``both``: [2B, H, W, C] with rows (2b, 2b+1) = (left, right) of pair b
    (the _stack_eyes layout) -> [B, H, W, D]. The eye de-interleave happens
    in the BlockSpec index maps — left blocks read even batch rows, right
    blocks odd rows of the SAME operand — so the [B,2,H,W,C] split copies
    AND the custom call's operand relayout disappear: the kernel input IS
    the barrier-pinned row-major trunk output (r4 int8 profile: ~1.0 ms of
    copy.205 + fusion.352 at the stride-4 shape, batch 16).
    """
    b2, h, w, c = both.shape
    b = b2 // 2
    unroll = _pick_unroll(num_disp)
    itemsize = jnp.dtype(both.dtype).itemsize
    bytes_per_row = (2 * 2 * w * c * itemsize + (2 + unroll) * 4 * w * c
                     + 2 * w * num_disp * 4)
    budget_rows = max(1, (4 * 1024 * 1024) // max(bytes_per_row, 1))
    tr = None
    for cand in range(min(h, budget_rows), 7, -1):
        if cand % 8 == 0 and h % cand == 0:
            tr = cand
            break
    if tr is None:
        # rows are independent, so a non-dividing block is safe: Pallas
        # masks the padded tail writes (verified on v5e at H=36, TR=8)
        tr = 8
    grid = (b, pl.cdiv(h, tr))
    out = pl.pallas_call(
        functools.partial(_corr_kernel_eyes, num_disp=num_disp, c=c),
        out_shape=jax.ShapeDtypeStruct((num_disp, b, h, w), both.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tr, w, c), lambda bi, i: (2 * bi, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tr, w, c), lambda bi, i: (2 * bi + 1, i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((num_disp, 1, tr, w),
                               lambda bi, i: (0, bi, i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(both, both)
    # [D, B, H, W] -> [B, H, W, D]; XLA fuses this transpose into the consumer
    return out.transpose(1, 2, 3, 0)


def _split_interleaved(both: jnp.ndarray):
    b = both.shape[0] // 2
    x = both.reshape(b, 2, *both.shape[1:])
    return x[:, 0], x[:, 1]


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def _correlation_volume_interleaved_tpu(both, num_disp):
    return correlation_volume_pallas_interleaved(both, num_disp)


def _corr_eyes_fwd(both, num_disp):
    return correlation_volume_pallas_interleaved(both, num_disp), both


def _corr_eyes_bwd(num_disp, both, g):
    def f(x):
        l, r = _split_interleaved(x)
        return correlation_volume_xla(l, r, num_disp)

    _, vjp = jax.vjp(f, both)
    return vjp(g)


_correlation_volume_interleaved_tpu.defvjp(_corr_eyes_fwd, _corr_eyes_bwd)


def correlation_volume_interleaved(both: jnp.ndarray, num_disp: int,
                                   use_pallas: bool | None = None) -> jnp.ndarray:
    """PSM cosine volume on the interleaved dual-eye tensor [2B, H, W, C].

    Semantically identical to ``correlation_volume(both[0::2], both[1::2])``
    (pinned by test); on TPU the de-interleave is free (index maps)."""
    if use_pallas is None:
        import os
        impl = os.environ.get('VD3D_CORR_IMPL', 'pallas')
        use_pallas = impl == 'pallas' and _on_tpu()
    if use_pallas:
        return _correlation_volume_interleaved_tpu(both, num_disp)
    l, r = _split_interleaved(both)
    return correlation_volume_xla(l, r, num_disp)


# ---------------------------------------------------------------------------
# Concat cost volume (PSM CostVolume): [B, H, W, F] x2 -> [B, D, H, W, 2F]
# ---------------------------------------------------------------------------

def concat_volume(left: jnp.ndarray, right: jnp.ndarray, num_disp: int) -> jnp.ndarray:
    """Concatenation cost volume for 3D-conv aggregation (NDHWC).

    Matches CostVolume semantics (PSM_cost_volume.py:44-68): for disparity d,
    the left half is left masked to w >= d and the right half is right shifted
    by d; entries with w < d are zero in both halves.
    """
    b, h, w, f = left.shape
    vols = []
    for d in range(num_disp):
        if d == 0:
            l_d, r_d = left, right
        elif d >= w:
            l_d = jnp.zeros_like(left)
            r_d = jnp.zeros_like(right)
        else:
            zero = jnp.zeros((b, h, d, f), left.dtype)
            l_d = jnp.concatenate([zero, left[:, :, d:, :]], axis=2)
            r_d = jnp.concatenate([zero, right[:, :, :w - d, :]], axis=2)
        vols.append(jnp.concatenate([l_d, r_d], axis=-1))
    return jnp.stack(vols, axis=1)  # [B, D, H, W, 2F]


def double_correlation_volume(left: jnp.ndarray, right: jnp.ndarray,
                              num_disp: int) -> jnp.ndarray:
    """Correlation at integer + half-pixel shifts, concatenated on the
    disparity axis -> [B, H, W, 2D].

    reference: DoublePSMCosineModule (PSM_cost_volume.py:98-113): the second
    volume correlates against the right features resampled half a pixel to
    the left (grid_sample with a -1/W x-offset).
    """
    from visualdet3d_tpu.ops.sampling import grid_sample

    b, h, w, c = left.shape
    xs = jnp.linspace(-1.0, 1.0, w) - 1.0 / w
    ys = jnp.linspace(-1.0, 1.0, h)
    grid = jnp.stack(jnp.meshgrid(xs, ys, indexing="xy"), axis=-1)
    grid = jnp.broadcast_to(grid[None], (b, h, w, 2))
    right_shifted = grid_sample(right, grid, padding_mode="zeros",
                                align_corners=False)
    cost1 = correlation_volume(left, right, num_disp)
    cost2 = correlation_volume(left, right_shifted, num_disp)
    return jnp.concatenate([cost1, cost2], axis=-1)
