from . import nn, config, ckpt, metrics, mesh, image_io, logging  # noqa: F401
