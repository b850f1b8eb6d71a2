"""Image quality metrics: PSNR / SSIM (pure jnp) / optional LPIPS.

Parity notes vs the reference:
  * PSNR is computed inline everywhere in the reference as
    ``-10*log10(mse)`` (nerf/train_nerf.py:160, siren/train_img.py:85,
    nerf/test_nerf.py:107) — identical here.
  * SSIM mirrors the vendored Gaussian-window implementation
    (nerf/pytorch_ssim/__init__.py:7-73): 11x11 window, sigma 1.5, SAME
    padding, per-channel (grouped) convolution, C1=0.01^2, C2=0.03^2.
  * LPIPS in the reference uses the pip `lpips` package with pretrained
    AlexNet weights (nerf/test_nerf.py:80).  Pretrained weights cannot be
    assumed available; `lpips()` returns None unless a weights file is
    provided, and eval harnesses record null for it.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np


def mse(a, b):
    return jnp.mean((a - b) ** 2)


def psnr(a, b=None, *, mse_value=None):
    """-10*log10(mse).  Pass two images, or a precomputed mse."""
    m = mse(a, b) if mse_value is None else mse_value
    return -10.0 * jnp.log10(m)


def _gaussian_window(window_size: int, sigma: float) -> np.ndarray:
    g = np.array(
        [math.exp(-((x - window_size // 2) ** 2) / (2.0 * sigma**2))
         for x in range(window_size)],
        dtype=np.float32,
    )
    g /= g.sum()
    return np.outer(g, g)


def ssim(img1, img2, window_size: int = 11, size_average: bool = True):
    """SSIM over NCHW images (matches nerf/pytorch_ssim/__init__.py:17-37).

    Accepts [N, C, H, W] or [H, W, C] (auto-promoted).  Computed host-side in
    float64: the textbook variance form conv(x^2) - mu^2 catastrophically
    cancels in fp32 on smooth/near-identical images (values can exceed 1 —
    the reference's vendored fp32 implementation has the same artifact);
    float64 keeps the map in [-1, 1] for an eval-only metric.
    """
    img1 = np.asarray(img1, np.float64)
    img2 = np.asarray(img2, np.float64)
    if img1.ndim == 3:  # HWC -> NCHW
        img1 = np.transpose(img1, (2, 0, 1))[None]
        img2 = np.transpose(img2, (2, 0, 1))[None]
    g = np.array(
        [math.exp(-((x - window_size // 2) ** 2) / (2.0 * 1.5**2))
         for x in range(window_size)], dtype=np.float64)
    g /= g.sum()

    from scipy.ndimage import convolve1d

    def conv(x):
        # SAME zero-padded depthwise conv, matching F.conv2d(padding=K//2).
        # The Gaussian window is separable (outer(g, g)), so two 1-D passes
        # vectorised over [N, C] replace the per-channel 2-D python loop —
        # a 400^2 frame takes milliseconds instead of seconds.
        out = convolve1d(x, g, axis=-1, mode="constant")
        return convolve1d(out, g, axis=-2, mode="constant")
    mu1, mu2 = conv(img1), conv(img2)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = conv(img1 * img1) - mu1_sq
    sigma2_sq = conv(img2 * img2) - mu2_sq
    sigma12 = conv(img1 * img2) - mu1_mu2

    c1, c2 = 0.01**2, 0.03**2
    ssim_map = ((2 * mu1_mu2 + c1) * (2 * sigma12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (sigma1_sq + sigma2_sq + c2)
    )
    if size_average:
        return float(np.mean(ssim_map))
    return np.mean(ssim_map, axis=(1, 2, 3))


_lpips_cache = {}


def lpips(img1, img2, weights_dir: str | None = None):
    """LPIPS(alex) as used by nerf/test_nerf.py:80,109.

    `weights_dir` must contain `alexnet.pth` (torchvision state_dict) and
    `lpips_lin.pth` (LPIPS v0.1 linear heads).  Without them (no-network
    environments) returns None and callers record null; the full metric
    implementation lives in core/lpips.py and activates when weights exist.
    """
    import os

    if weights_dir is None or not os.path.isdir(weights_dir):
        return None
    if weights_dir not in _lpips_cache:
        from .lpips import LPIPS
        _lpips_cache[weights_dir] = LPIPS.from_torch_checkpoint(
            os.path.join(weights_dir, "alexnet.pth"),
            os.path.join(weights_dir, "lpips_lin.pth"))
    return float(_lpips_cache[weights_dir](img1, img2))
