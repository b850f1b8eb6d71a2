"""msra_practice_project_tpu — a TPU-native (JAX/XLA/Pallas) framework with the
capabilities of the reference project "2D Image Generation Model Based on 3D
Perception" (JeffreyXiang/MSRA-practice-project).

Three experiment stacks, sharing one functional core:

* ``models.siren_mlp`` + ``train.train_img`` / ``train.train_sdf`` — implicit
  neural representations (SIREN/Tanh/ReLU/ReLU+PE) for 2D images and 3D SDFs.
* ``models.nerf`` + ``ops.render`` + ``train.train_nerf`` — hierarchical
  (coarse/fine) NeRF volume rendering on Blender-synthetic scenes.
* ``models.pigan`` + ``train.train_pigan`` — pi-GAN 3D-aware image generation
  (mapping network -> FiLM-SIREN NeRF -> volume renderer, progressive-growing
  CoordConv discriminator), GAN inversion, demos and mesh extraction.

Unlike the reference (three copy-pasted PyTorch script directories), the volume
rendering core lives in exactly one place (``ops/``), every compute path is a
pure function jitted for TPU, and batch work (rays / latent samples) shards
over a ``jax.sharding.Mesh`` for multi-chip scale-out (``parallel/``).
"""

__version__ = "0.1.0"

# Every entry point (trainers, eval scripts, tools, bench) pays the remote
# TPU compiler per process without this; see core/compile_cache.py.
from .core import compile_cache as _compile_cache

_compile_cache.enable()
del _compile_cache
