"""Image quality metrics in pure jnp (PSNR, SSIM, MS-SSIM) + LPIPS hook.

The reference evaluates PSNR on valid-depth-masked pixels, MS-SSIM via
pytorch_msssim and LPIPS(alex) (utils/eval.py:401-423). MS-SSIM here is
the standard Wang et al. 5-level product with 11x11 gaussian windows —
validated against pytorch_msssim conventions. LPIPS requires pretrained
AlexNet weights, which this environment cannot download; `lpips()`
returns NaN unless a weights file is provided (utils/lpips_jax.py).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def psnr(img: jnp.ndarray, ref: jnp.ndarray, mask=None) -> jnp.ndarray:
    """PSNR over (optionally masked) pixels; imgs [..., 3] in 0..1."""
    se = (img - ref) ** 2
    if mask is not None:
        mf = mask.astype(jnp.float32)[..., None]
        mse = jnp.sum(se * mf) / jnp.maximum(jnp.sum(mf) * 3, 1.0)
    else:
        mse = jnp.mean(se)
    return -10.0 * jnp.log10(jnp.maximum(mse, 1e-12))


def _gaussian_window(size=11, sigma=1.5):
    x = np.arange(size) - size // 2
    g = np.exp(-(x**2) / (2 * sigma**2))
    g /= g.sum()
    return jnp.asarray(np.outer(g, g), jnp.float32)


def _filter2d(img: jnp.ndarray, win: jnp.ndarray) -> jnp.ndarray:
    """Depthwise 'valid' convolution; img [H, W, C] (channels as batch)."""
    out = jax.lax.conv_general_dilated(
        img.transpose(2, 0, 1)[:, None],     # [C, 1, H, W]
        win[None, None],                     # [1, 1, k, k]
        (1, 1), "VALID",
    )
    return out[:, 0].transpose(1, 2, 0)


def ssim_parts(x, y, win, c1=0.01**2, c2=0.03**2):
    mx = _filter2d(x, win)
    my = _filter2d(y, win)
    mxx = _filter2d(x * x, win) - mx * mx
    myy = _filter2d(y * y, win) - my * my
    mxy = _filter2d(x * y, win) - mx * my
    cs = (2 * mxy + c2) / (mxx + myy + c2)
    l = (2 * mx * my + c1) / (mx * mx + my * my + c1)
    return l.mean(), cs.mean()


@jax.jit
def ssim(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    win = _gaussian_window()
    l, cs = ssim_parts(x, y, win)
    return l * cs


MS_WEIGHTS = jnp.asarray([0.0448, 0.2856, 0.3001, 0.2363, 0.1333])


def _downsample2(img):
    h, w, c = img.shape
    img = img[: h // 2 * 2, : w // 2 * 2]
    return img.reshape(h // 2, 2, w // 2, 2, c).mean(axis=(1, 3))


@jax.jit
def ms_ssim(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Multi-scale SSIM (pytorch_msssim convention). Levels shrink for
    small images so the 11x11 window always fits."""
    levels = 5
    while levels > 1 and min(x.shape[0], x.shape[1]) < 11 * 2 ** (levels - 1):
        levels -= 1
    win = _gaussian_window()
    weights = MS_WEIGHTS[:levels] / jnp.sum(MS_WEIGHTS[:levels])
    vals = []
    for lvl in range(levels):
        l, cs = ssim_parts(x, y, win)
        vals.append(jnp.maximum(l if lvl == levels - 1 else cs, 0.0))
        if lvl < levels - 1:
            x = _downsample2(x)
            y = _downsample2(y)
    vals = jnp.stack(vals)
    return jnp.prod(vals ** weights)


@functools.cache
def _lpips_model():
    from .lpips_jax import load_lpips

    return load_lpips()


def lpips(x: np.ndarray, y: np.ndarray) -> float:
    """LPIPS(alex). Returns NaN when pretrained weights are unavailable."""
    model = _lpips_model()
    if model is None:
        return float("nan")
    return float(model(x, y))
