"""Bilinear sampling ops (NHWC), the JAX/XLA analogue of
``torch.nn.functional.grid_sample`` used by the reference's LookGround
(visualDet3D/networks/lib/look_ground.py:66-71) and DoublePSMCosineModule.

Implemented as four gathers + lerp on flattened spatial indices, which XLA
lowers to efficient TPU dynamic-gathers; fully differentiable so no custom
VJP is required.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _gather_hw(image: jnp.ndarray, iy: jnp.ndarray, ix: jnp.ndarray) -> jnp.ndarray:
    """Gather image [H, W, C] at integer coords iy/ix [...]-shaped -> [..., C]."""
    h, w = image.shape[0], image.shape[1]
    flat = image.reshape(h * w, image.shape[2])
    idx = iy * w + ix
    return flat[idx.reshape(-1)].reshape(idx.shape + (image.shape[2],))


def grid_sample_2d(image: jnp.ndarray, coords: jnp.ndarray,
                   padding_mode: str = 'border') -> jnp.ndarray:
    """Bilinear sample a single image at pixel coordinates.

    Args:
      image: [H, W, C].
      coords: [..., 2] (x, y) in *pixel* units (not normalised).
      padding_mode: 'border' clamps, 'zeros' returns 0 outside.
    Returns:
      [..., C] sampled values.
    """
    h, w = image.shape[0], image.shape[1]
    x = coords[..., 0]
    y = coords[..., 1]

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = (x - x0)[..., None]
    wy = (y - y0)[..., None]

    x0r = x0.astype(jnp.int32)
    y0r = y0.astype(jnp.int32)

    if padding_mode == 'zeros':
        # torch semantics: each CORNER tap outside the image contributes 0
        # individually — samples straddling the border keep their in-bounds
        # partial weights (the r2 version zeroed the whole sample whenever
        # the sample POINT left [0, size-1]; caught by the r3 monodepth
        # golden-parity test)
        def tap(yi, xi):
            inb = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
            v = _gather_hw(image, jnp.clip(yi, 0, h - 1),
                           jnp.clip(xi, 0, w - 1))
            return jnp.where(inb[..., None], v, 0.0)

        v00 = tap(y0r, x0r)
        v01 = tap(y0r, x0r + 1)
        v10 = tap(y0r + 1, x0r)
        v11 = tap(y0r + 1, x0r + 1)
    else:
        x0i = jnp.clip(x0r, 0, w - 1)
        x1i = jnp.clip(x0r + 1, 0, w - 1)
        y0i = jnp.clip(y0r, 0, h - 1)
        y1i = jnp.clip(y0r + 1, 0, h - 1)
        v00 = _gather_hw(image, y0i, x0i)
        v01 = _gather_hw(image, y0i, x1i)
        v10 = _gather_hw(image, y1i, x0i)
        v11 = _gather_hw(image, y1i, x1i)

    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    return top * (1 - wy) + bot * wy


def grid_sample(images: jnp.ndarray, grid: jnp.ndarray,
                padding_mode: str = 'border', align_corners: bool = True) -> jnp.ndarray:
    """Batched grid_sample with torch-style normalised grids.

    Args:
      images: [B, H, W, C].
      grid: [B, Ho, Wo, 2] normalised (x, y) in [-1, 1].
      padding_mode: 'border' | 'zeros'.
      align_corners: matches torch semantics for the [-1, 1] -> pixel mapping.
    Returns:
      [B, Ho, Wo, C].
    """
    h, w = images.shape[1], images.shape[2]
    gx = grid[..., 0]
    gy = grid[..., 1]
    if align_corners:
        px = (gx + 1.0) * 0.5 * (w - 1)
        py = (gy + 1.0) * 0.5 * (h - 1)
    else:
        px = ((gx + 1.0) * w - 1.0) * 0.5
        py = ((gy + 1.0) * h - 1.0) * 0.5
    coords = jnp.stack([px, py], axis=-1)
    return jax.vmap(lambda im, co: grid_sample_2d(im, co, padding_mode))(images, coords)
