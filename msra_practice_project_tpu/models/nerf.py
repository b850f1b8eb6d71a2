"""NeRF and SirenNeRF radiance-field MLPs.

Functional re-design of nerf/nerf.py:52-170.  Contract matches the renderer's
expectation: `apply(params, x[..., 6]) -> [..., 4]` where the input packs
(position, view direction) and the output packs (rgb in [0,1], sigma >= 0).

Architecture (ref: nerf/nerf.py:58-94): 8x256 trunk with skip-concat of the
embedded position at layer 5, ReLU sigma head on the trunk, and a view-dir
branch 256 -> (+dir PE) -> 128 -> rgb sigmoid.  PE: pos length 10 (60-d), dir
length 4 (24-d).  SirenNeRF (ref: nerf/nerf.py:120-170) swaps sine layers in,
drops the PEs, and skips the *raw* position instead.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from ..core import nn


@dataclass(frozen=True)
class NeRFConfig:
    hidden_dim: int = 256
    use_siren: bool = False
    pe_pos_length: int = 10
    pe_dir_length: int = 4


class NeRFModel:
    def __init__(self, cfg: NeRFConfig = NeRFConfig()):
        self.cfg = cfg

    # -- init -------------------------------------------------------------
    def init(self, key):
        cfg = self.cfg
        h = cfg.hidden_dim
        ks = jax.random.split(key, 12)
        if cfg.use_siren:
            pos_in = 3
            skip_in = h + 3
            layers_pos = (
                nn.siren_init(ks[0], pos_in, h, scheme="nerf_first"),
                nn.siren_init(ks[1], h, h, scheme="nerf"),
                nn.siren_init(ks[2], h, h, scheme="nerf"),
                nn.siren_init(ks[3], h, h, scheme="nerf"),
                nn.siren_init(ks[4], h, h, scheme="nerf"),
                nn.siren_init(ks[5], skip_in, h, scheme="nerf"),
                nn.siren_init(ks[6], h, h, scheme="nerf"),
                nn.siren_init(ks[7], h, h, scheme="nerf"),
            )
            dir_in = h + 3
            layers_dir = (
                nn.dense_init(ks[8], h, h, "linear"),
                nn.siren_init(ks[9], dir_in, h // 2, scheme="nerf"),
            )
        else:
            pos_in = nn.positional_encoding_dim(3, cfg.pe_pos_length)  # 60
            dir_pe = nn.positional_encoding_dim(3, cfg.pe_dir_length)  # 24
            skip_in = h + pos_in
            layers_pos = (
                nn.dense_init(ks[0], pos_in, h, "relu"),
                nn.dense_init(ks[1], h, h, "relu"),
                nn.dense_init(ks[2], h, h, "relu"),
                nn.dense_init(ks[3], h, h, "relu"),
                nn.dense_init(ks[4], h, h, "relu"),
                nn.dense_init(ks[5], skip_in, h, "relu"),
                nn.dense_init(ks[6], h, h, "relu"),
                nn.dense_init(ks[7], h, h, "relu"),
            )
            layers_dir = (
                nn.dense_init(ks[8], h, h, "linear"),
                nn.dense_init(ks[9], h + dir_pe, h // 2, "relu"),
            )
        return {
            "layers_pos": layers_pos,
            "layers_dir": layers_dir,
            "sigma": nn.dense_init(ks[10], h, 1, "relu"),
            "rgb": nn.dense_init(ks[11], h // 2, 3, "sigmoid"),
        }

    # -- forward ----------------------------------------------------------
    def apply(self, params, x):
        cfg = self.cfg
        pos, direction = x[..., :3], x[..., 3:6]
        lp = params["layers_pos"]
        if cfg.use_siren:
            h = nn.siren_apply(lp[0], pos)
            for p in lp[1:5]:
                h = nn.siren_apply(p, h)
            h = jnp.concatenate([pos, h], axis=-1)
            for p in lp[5:8]:
                h = nn.siren_apply(p, h)
            sigma = nn.dense_apply(params["sigma"], h, "relu")
            h = nn.dense_apply(params["layers_dir"][0], h, "linear")
            h = jnp.concatenate([h, direction], axis=-1)
            h = nn.siren_apply(params["layers_dir"][1], h)
        else:
            # NOTE: skip concat order is [embedded_pos, h] (nerf/nerf.py:84)
            # and dir concat order is [h, embedded_dir] (nerf/nerf.py:90).
            e_pos = nn.positional_encoding(pos, cfg.pe_pos_length)
            e_dir = nn.positional_encoding(direction, cfg.pe_dir_length)
            h = nn.dense_apply(lp[0], e_pos, "relu")
            for p in lp[1:5]:
                h = nn.dense_apply(p, h, "relu")
            h = jnp.concatenate([e_pos, h], axis=-1)
            for p in lp[5:8]:
                h = nn.dense_apply(p, h, "relu")
            sigma = nn.dense_apply(params["sigma"], h, "relu")
            h = nn.dense_apply(params["layers_dir"][0], h, "linear")
            h = jnp.concatenate([h, e_dir], axis=-1)
            h = nn.dense_apply(params["layers_dir"][1], h, "relu")
        rgb = nn.dense_apply(params["rgb"], h, "sigmoid")
        return jnp.concatenate([rgb, sigma], axis=-1)

    def bound_apply(self, params):
        return jax.tree_util.Partial(self.apply, params)


def nerf_model(use_siren: bool = False) -> NeRFModel:
    """Factory matching the `use_siren` config switch (nerf/train_nerf.py:89-94)."""
    return NeRFModel(NeRFConfig(use_siren=use_siren))
