from . import siren_mlp, nerf, pigan  # noqa: F401
