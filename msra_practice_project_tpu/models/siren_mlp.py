"""Implicit-representation MLP zoo: SIREN / Tanh / ReLU / ReLU+PE.

Functional re-design of siren/modules.py:74-172.  Each model is a lightweight
config object with pure `init(key) -> params` / `apply(params, x) -> y`;
params are plain dicts so they vmap/shard/serialise trivially.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax

from ..core import nn


@dataclass(frozen=True)
class MLPConfig:
    input_dim: int
    output_dim: int
    hidden_dim: int = 256
    hidden_layers: int = 3
    kind: str = "siren"  # siren | tanh | relu | relu_pe
    pe_length: int = 10  # only for relu_pe (ref: siren/modules.py:138)


class ImplicitMLP:
    """f: R^in -> R^out, three flavours matching the reference exactly.

    SIREN init (ref: siren/modules.py:79-86): first layer U(+-1/in) weight,
    torch-default bias; hidden U(+-sqrt(6/h)/30) weight, torch-default bias;
    output U(+-sqrt(6/h)/30) weight, zero bias.  w0 = 30.
    """

    def __init__(self, cfg: MLPConfig):
        self.cfg = cfg

    def init(self, key):
        cfg = self.cfg
        ks = jax.random.split(key, cfg.hidden_layers + 2)
        in_dim = cfg.input_dim
        if cfg.kind == "relu_pe":
            in_dim = nn.positional_encoding_dim(cfg.input_dim, cfg.pe_length)

        if cfg.kind == "siren":
            inp = nn.siren_init(ks[0], in_dim, cfg.hidden_dim, scheme="first")
            hidden = tuple(
                nn.siren_init(ks[i + 1], cfg.hidden_dim, cfg.hidden_dim,
                              scheme="hidden")
                for i in range(cfg.hidden_layers)
            )
            out = nn.siren_init(ks[-1], cfg.hidden_dim, cfg.output_dim,
                                scheme="nerf")  # U(+-sqrt(6/h)/30), zero bias
        else:
            act = "tanh" if cfg.kind == "tanh" else "relu"
            inp = nn.dense_init(ks[0], in_dim, cfg.hidden_dim, act)
            hidden = tuple(
                nn.dense_init(ks[i + 1], cfg.hidden_dim, cfg.hidden_dim, act)
                for i in range(cfg.hidden_layers)
            )
            out = nn.dense_init(ks[-1], cfg.hidden_dim, cfg.output_dim,
                                "linear")
        return {"input": inp, "hidden": hidden, "output": out}

    def apply(self, params, x):
        cfg = self.cfg
        if cfg.kind == "relu_pe":
            x = nn.positional_encoding(x, cfg.pe_length)
        if cfg.kind == "siren":
            h = nn.siren_apply(params["input"], x)
            for p in params["hidden"]:
                h = nn.siren_apply(p, h)
        else:
            act = "tanh" if cfg.kind == "tanh" else "relu"
            h = nn.dense_apply(params["input"], x, act)
            for p in params["hidden"]:
                h = nn.dense_apply(p, h, act)
        return params["output"]["b"] + h @ params["output"]["w"]

    def bound_apply(self, params):
        """`jax.tree_util.Partial` closure for passing through jit as a pytree."""
        return jax.tree_util.Partial(self.apply, params)


def img_model(model_type: str) -> ImplicitMLP:
    """f(x, y) -> intensity (ref: siren/modules.py:154-162)."""
    return ImplicitMLP(MLPConfig(2, 1, 256, 3, kind=model_type))


def sdf_model(model_type: str) -> ImplicitMLP:
    """f(x, y, z) -> signed distance (ref: siren/modules.py:164-172)."""
    return ImplicitMLP(MLPConfig(3, 1, 256, 3, kind=model_type))
