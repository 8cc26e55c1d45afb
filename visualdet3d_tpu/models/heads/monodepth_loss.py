"""Monodepth self-supervised losses (SSIM, disparity smoothness, L-R
consistency) + the SI-log supervised depth loss helpers. NHWC, pure jnp.

reference: visualDet3D/networks/heads/monodepth_loss.py:6-199 and the SI-log
loss inside MonoDepth.training_forward (unet_monodepth.py:80-98).
"""
from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp

from visualdet3d_tpu.ops.sampling import grid_sample


def gradient_x(img: jnp.ndarray) -> jnp.ndarray:
    """Horizontal forward difference with edge replicate. img: [B, H, W, C]."""
    img = jnp.pad(img, ((0, 0), (0, 0), (0, 1), (0, 0)), mode='edge')
    return img[:, :, :-1] - img[:, :, 1:]


def gradient_y(img: jnp.ndarray) -> jnp.ndarray:
    img = jnp.pad(img, ((0, 0), (0, 1), (0, 0), (0, 0)), mode='edge')
    return img[:, :-1] - img[:, 1:]


def apply_disparity(img: jnp.ndarray, disp: jnp.ndarray) -> jnp.ndarray:
    """Warp img by a horizontal disparity field (normalised [0,1] units).

    img: [B, H, W, C]; disp: [B, H, W, 1]. reference monodepth_loss.py:44-60.
    The reference calls F.grid_sample WITHOUT align_corners, i.e. the
    torch>=1.3 default False (its base grid is linspace(0,1) pixel-exact
    only under True — a known quirk of the monodepth lineage); replicated
    verbatim for parity (r3 golden test pins it).
    """
    b, h, w, _ = img.shape
    xs = jnp.linspace(0, 1, w)
    ys = jnp.linspace(0, 1, h)
    x_base = jnp.broadcast_to(xs[None, None, :], (b, h, w))
    y_base = jnp.broadcast_to(ys[None, :, None], (b, h, w))
    flow = jnp.stack([x_base + disp[..., 0], y_base], axis=-1)
    return grid_sample(img, 2.0 * flow - 1.0, padding_mode='zeros',
                       align_corners=False)


def ssim(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Windowed SSIM distance in [0, 1] (reference :65-84)."""
    c1, c2 = 0.01 ** 2, 0.03 ** 2

    def avg_pool(v):
        return jax.lax.reduce_window(v, 0.0, jax.lax.add, (1, 3, 3, 1),
                                     (1, 1, 1, 1), 'VALID') / 9.0
    mu_x, mu_y = avg_pool(x), avg_pool(y)
    sigma_x = avg_pool(x * x) - mu_x ** 2
    sigma_y = avg_pool(y * y) - mu_y ** 2
    sigma_xy = avg_pool(x * y) - mu_x * mu_y
    num = (2 * mu_x * mu_y + c1) * (2 * sigma_xy + c2)
    den = (mu_x ** 2 + mu_y ** 2 + c1) * (sigma_x + sigma_y + c2)
    return jnp.clip((1 - num / den) / 2, 0, 1)


def smooth_loss(depth: jnp.ndarray, image: jnp.ndarray) -> jnp.ndarray:
    """Edge-aware smoothness (reference smooth_loss :103-116)."""
    dgx, dgy = gradient_x(depth), gradient_y(depth)
    igx, igy = gradient_x(image), gradient_y(image)
    wx = jnp.exp(-20 * jnp.mean(jnp.abs(igx), axis=-1, keepdims=True))
    wy = jnp.exp(-20 * jnp.mean(jnp.abs(igy), axis=-1, keepdims=True))
    return jnp.mean(jnp.abs(dgx * wx) + jnp.abs(dgy * wy))


def reshape_depth(gt_depth: jnp.ndarray, shape: Tuple[int, int]) -> jnp.ndarray:
    """Downsample sparse depth by max-pooling the inverse (keeps the nearest
    return in each cell; reference unet_monodepth.py:24-33). gt: [B, H, W]."""
    mask = gt_depth < 0.1
    inv = jnp.where(mask, 1e-9, 1.0 / (gt_depth + 1e-9))
    b, h, w = inv.shape
    ky, kx = h // shape[0], w // shape[1]
    pooled = jax.lax.reduce_window(inv, -jnp.inf, jax.lax.max,
                                   (1, ky, kx), (1, ky, kx), 'VALID')
    out = 1.0 / (pooled + 1e-9)
    return jnp.where(pooled < 1e-8, 0.0, out)


def si_log_loss(depth_prediction: jnp.ndarray, reshaped_gt: jnp.ndarray,
                max_depth: float = 50.0, si_lambda: float = 0.3) -> jnp.ndarray:
    """Scale-invariant log loss over valid pixels (reference
    unet_monodepth.py:84-98). Inputs [B, H, W] (positive depths)."""
    diff = jnp.log(depth_prediction) - jnp.log(jnp.clip(reshaped_gt, 1e-9, None))
    valid = (reshaped_gt > 0.1) & (reshaped_gt < max_depth) & (jnp.abs(diff) > 0.001)
    num = jnp.clip(jnp.sum((reshaped_gt > 0.1) & (reshaped_gt < max_depth)), 1, None)
    diff = jnp.where(valid, diff, 0.0)
    return jnp.sum(diff ** 2) / num - si_lambda * (jnp.sum(diff) / num) ** 2


def _resize_align_corners(img: jnp.ndarray, nh: int, nw: int) -> jnp.ndarray:
    """Bilinear resize with align_corners=True (out[i] samples the input at
    i*(n_in-1)/(n_out-1)) — matches the reference's F.interpolate(...,
    align_corners=True) (monodepth_loss.py:22-26), which jax.image.resize
    (half-pixel centers) does not. Implemented as two small interpolation
    matrices applied on the MXU."""
    b, h, w, c = img.shape

    def weight(n_out, n_in):
        if n_out == 1:
            m = jnp.zeros((1, n_in)).at[0, 0].set(1.0)
            return m
        pos = jnp.arange(n_out) * ((n_in - 1) / (n_out - 1))
        lo = jnp.floor(pos).astype(jnp.int32)
        f = (pos - lo).astype(img.dtype)
        hi = jnp.clip(lo + 1, 0, n_in - 1)
        rows = jnp.arange(n_out)
        m = jnp.zeros((n_out, n_in), img.dtype)
        m = m.at[rows, lo].add(1.0 - f)
        m = m.at[rows, hi].add(f)
        return m

    out = jnp.einsum('yh,bhwc->bywc', weight(nh, h), img)
    return jnp.einsum('xw,bywc->byxc', weight(nw, w), out)


def scale_pyramid(img: jnp.ndarray, num_scales: int) -> List[jnp.ndarray]:
    out = [img]
    _, h, w, _ = img.shape
    for i in range(num_scales - 1):
        r = 2 ** (i + 1)
        out.append(_resize_align_corners(img, h // r, w // r))
    return out


def monodepth_self_supervised_loss(disps: List[jnp.ndarray],
                                   left: jnp.ndarray, right: jnp.ndarray,
                                   ssim_w: float = 0.85,
                                   disp_gradient_w: float = 1.0,
                                   lr_w: float = 1.0) -> jnp.ndarray:
    """Full monodepth-style loss over a disparity pyramid
    (reference forward :118-199). disps: list of [B, H, W, 2]."""
    n = len(disps)
    left_pyr = scale_pyramid(left, n)
    right_pyr = scale_pyramid(right, n)
    dl = [d[..., 0:1] for d in disps]
    dr = [d[..., 1:2] for d in disps]

    left_est = [apply_disparity(right_pyr[i], -dl[i]) for i in range(n)]
    right_est = [apply_disparity(left_pyr[i], dr[i]) for i in range(n)]
    rl_disp = [apply_disparity(dr[i], -dl[i]) for i in range(n)]
    lr_disp = [apply_disparity(dl[i], dr[i]) for i in range(n)]

    def smoothness(d, pyr):
        out = []
        for i in range(n):
            wx = jnp.exp(-jnp.mean(jnp.abs(gradient_x(pyr[i])), -1, keepdims=True))
            wy = jnp.exp(-jnp.mean(jnp.abs(gradient_y(pyr[i])), -1, keepdims=True))
            out.append(jnp.abs(gradient_x(d[i]) * wx) + jnp.abs(gradient_y(d[i]) * wy))
        return out

    sl = smoothness(dl, left_pyr)
    sr = smoothness(dr, right_pyr)

    image_loss = sum(
        ssim_w * jnp.mean(ssim(left_est[i], left_pyr[i])) +
        (1 - ssim_w) * jnp.mean(jnp.abs(left_est[i] - left_pyr[i]))
        for i in range(n)) + sum(
        ssim_w * jnp.mean(ssim(right_est[i], right_pyr[i])) +
        (1 - ssim_w) * jnp.mean(jnp.abs(right_est[i] - right_pyr[i]))
        for i in range(n))
    lr_loss = sum(jnp.mean(jnp.abs(rl_disp[i] - dl[i])) for i in range(n)) + \
        sum(jnp.mean(jnp.abs(lr_disp[i] - dr[i])) for i in range(n))
    grad_loss = sum(jnp.mean(jnp.abs(sl[i])) / 2 ** i for i in range(n)) + \
        sum(jnp.mean(jnp.abs(sr[i])) / 2 ** i for i in range(n))
    return image_loss + disp_gradient_w * grad_loss + lr_w * lr_loss
