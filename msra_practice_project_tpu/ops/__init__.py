from . import rays, sampling, composite, render  # noqa: F401
