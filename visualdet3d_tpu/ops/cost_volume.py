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
        else:
            shifted = jnp.pad(right[:, :, :-d, :], ((0, 0), (0, 0), (d, 0), (0, 0)))
            prod = jnp.mean(left * shifted, axis=-1)
        cols.append(prod)
    return jnp.stack(cols, axis=-1)


def _corr_kernel(l_ref, r_ref, o_ref, *, num_disp: int, c: int):
    l = l_ref[:]  # [TR, W, C]
    r = r_ref[:]
    scale = jnp.asarray(1.0 / c, l.dtype)
    tr, w, _ = l.shape
    cols = []
    for d in range(num_disp):
        if d == 0:
            r_sh = r
        else:
            r_sh = jnp.concatenate(
                [jnp.zeros((tr, d, c), r.dtype), r[:, :w - d, :]], axis=1)
        cols.append((jnp.sum(l * r_sh, axis=-1) * scale)[:, :, None])
    o_ref[:] = jnp.concatenate(cols, axis=-1)


@functools.partial(jax.jit, static_argnames=('num_disp', 'interpret'))
def correlation_volume_pallas(left: jnp.ndarray, right: jnp.ndarray, num_disp: int,
                              interpret: bool = False) -> jnp.ndarray:
    """Fused Pallas correlation volume. left/right: [B, H, W, C] -> [B, H, W, D]."""
    b, h, w, c = left.shape
    bh = b * h
    l2 = left.reshape(bh, w, c)
    r2 = right.reshape(bh, w, c)

    # rows per block: keep (2 inputs + 1 output) tiles within a few MB of VMEM
    bytes_per_row = (2 * w * c + w * num_disp) * 4
    tr = max(1, min(bh, (2 * 1024 * 1024) // max(bytes_per_row, 1)))
    while bh % tr != 0:
        tr -= 1

    grid = (bh // tr,)
    out = pl.pallas_call(
        functools.partial(_corr_kernel, num_disp=num_disp, c=c),
        out_shape=jax.ShapeDtypeStruct((bh, w, num_disp), left.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tr, w, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tr, w, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tr, w, num_disp), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(l2, r2)
    return out.reshape(b, h, w, num_disp)


def correlation_volume(left: jnp.ndarray, right: jnp.ndarray, num_disp: int,
                       use_pallas: bool | None = None) -> jnp.ndarray:
    """PSM cosine (correlation) cost volume; picks the fused kernel on TPU."""
    if use_pallas is None:
        use_pallas = _on_tpu()
    if use_pallas:
        return correlation_volume_pallas(left, right, num_disp)
    return correlation_volume_xla(left, right, num_disp)


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
        else:
            zero = jnp.zeros((b, h, d, f), left.dtype)
            l_d = jnp.concatenate([zero, left[:, :, d:, :]], axis=2)
            r_d = jnp.concatenate([zero, right[:, :, :w - d, :]], axis=2)
        vols.append(jnp.concatenate([l_d, r_d], axis=-1))
    return jnp.stack(vols, axis=1)  # [B, D, H, W, 2F]
