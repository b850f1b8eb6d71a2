"""LPIPS perceptual metric (AlexNet backbone), pure jnp.

The reference computes LPIPS via the pip `lpips` package with pretrained
AlexNet weights downloaded at first use (nerf/test_nerf.py:11,80,109).  This
environment has no network access, so the metric is implemented here in full
(feature extractor + unit-normalisation + linear heads + spatial averaging,
exactly the LPIPS v0.1 definition) and activates when a weights file is
supplied:

    lp = LPIPS.from_torch_checkpoint("alexnet.pth", "lpips_lin.pth")
    score = lp(img1, img2)   # [H, W, 3] or [N, 3, H, W] in [0, 1]

Without weights, `core.metrics.lpips` keeps returning None and eval
harnesses record null (PSNR/SSIM stay exact).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# AlexNet feature config: (out_ch, kernel, stride, padding) per conv layer,
# with maxpool positions matching torchvision.models.alexnet.features.
_ALEX_CONVS = [
    (64, 11, 4, 2),
    (192, 5, 1, 2),
    (384, 3, 1, 1),
    (256, 3, 1, 1),
    (256, 3, 1, 1),
]
# torchvision .features indices of the conv weights
_TV_IDX = [0, 3, 6, 8, 10]
# maxpool after conv 0 and 1 (and 4, but LPIPS taps activations before it)
_POOL_AFTER = {0, 1}

# LPIPS input normalisation (the "scaling layer")
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def _conv(x, w, b, stride, pad):
    y = jax.lax.conv_general_dilated(
        x, w, (stride, stride), [(pad, pad)] * 2,
        dimension_numbers=("NCHW", "OIHW", "NCHW"))
    return y + b[None, :, None, None]


def _maxpool(x):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 1, 3, 3), (1, 1, 2, 2), "VALID")


class LPIPS:
    """params: {'convs': [(w, b) x5], 'lins': [w x5]} as jnp arrays."""

    def __init__(self, params):
        self.params = params

    # -- weight loading ----------------------------------------------------
    @classmethod
    def from_torch_checkpoint(cls, alexnet_path: str, lin_path: str):
        """alexnet_path: torchvision alexnet state_dict (.pth);
        lin_path: lpips 0.1 linear-head state_dict (lin0.model.1.weight...)."""
        import torch

        alex = torch.load(alexnet_path, map_location="cpu",
                          weights_only=True)
        lin = torch.load(lin_path, map_location="cpu", weights_only=True)
        convs = []
        for i in _TV_IDX:
            w = jnp.asarray(alex[f"features.{i}.weight"].numpy())
            b = jnp.asarray(alex[f"features.{i}.bias"].numpy())
            convs.append((w, b))
        lins = []
        for i in range(5):
            for k in (f"lin{i}.model.1.weight", f"lins.{i}.model.1.weight"):
                if k in lin:
                    lins.append(jnp.asarray(lin[k].numpy()))
                    break
        if len(lins) != 5:
            raise ValueError("unrecognised lpips linear-head checkpoint")
        return cls({"convs": convs, "lins": lins})

    @classmethod
    def random_init(cls, key, seed_scale=0.1):
        """Random weights — NOT a calibrated perceptual metric; for tests
        and as an untrained-feature distance only."""
        convs = []
        in_ch = 3
        for i, (out_ch, k, _, _) in enumerate(_ALEX_CONVS):
            key, k1 = jax.random.split(key)
            w = jax.random.normal(k1, (out_ch, in_ch, k, k)) * seed_scale \
                / np.sqrt(in_ch * k * k)
            convs.append((w, jnp.zeros((out_ch,))))
            in_ch = out_ch
        lins = []
        for out_ch, *_ in _ALEX_CONVS:
            key, k1 = jax.random.split(key)
            lins.append(jnp.abs(jax.random.normal(k1, (1, out_ch, 1, 1)))
                        * 0.01)
        return cls({"convs": convs, "lins": lins})

    # -- forward -----------------------------------------------------------
    def features(self, x):
        """x [N, 3, H, W] in [0, 1] -> list of 5 activation maps."""
        x = 2.0 * x - 1.0  # lpips expects [-1, 1]
        x = (x - jnp.asarray(_SHIFT)[None, :, None, None]) / \
            jnp.asarray(_SCALE)[None, :, None, None]
        feats = []
        h = x
        for i, (w, b) in enumerate(self.params["convs"]):
            _, _, stride, pad = _ALEX_CONVS[i]
            h = jax.nn.relu(_conv(h, w, b, stride, pad))
            feats.append(h)
            if i in _POOL_AFTER:
                h = _maxpool(h)
        return feats

    def __call__(self, img1, img2):
        img1, img2 = _to_nchw(img1), _to_nchw(img2)
        f1, f2 = self.features(img1), self.features(img2)
        total = 0.0
        for a, b, lin in zip(f1, f2, self.params["lins"]):
            a = a / (jnp.linalg.norm(a, axis=1, keepdims=True) + 1e-10)
            b = b / (jnp.linalg.norm(b, axis=1, keepdims=True) + 1e-10)
            d = (a - b) ** 2
            # 1x1 conv head then spatial average
            d = jnp.sum(d * lin[0][None], axis=1, keepdims=True)
            total = total + jnp.mean(d, axis=(1, 2, 3))
        return total if total.shape[0] > 1 else total[0]


def _to_nchw(img):
    img = jnp.asarray(img, jnp.float32)
    if img.ndim == 3:  # HWC
        img = jnp.transpose(img, (2, 0, 1))[None]
    return img
