"""Device mesh + sharding helpers: data parallelism over ICI.

The reference's entire distribution story is single-process
`torch.nn.DataParallel` around the pi-GAN models (pi_GAN/train.py:50-52) —
in-process scatter/gather over local GPUs.  The TPU-native equivalent, used
by every trainer here, is:

  * a 1-D `jax.sharding.Mesh` over all chips with a single 'data' axis,
  * batch work (NeRF rays, GAN latents + real images) sharded along 'data',
  * parameters + optimizer state replicated,
  * gradients reduced by the psum XLA inserts automatically when a jitted
    step consumes sharded batches and produces replicated updates — riding
    ICI, never host memory.

For the tiny MLPs in this workload DP over the batch/ray axis is the whole
scale story (the real scale axis is rays x samples, SURVEY.md §2.4).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(n_devices: int | None = None, axis: str = DATA_AXIS) -> Mesh:
    """1-D mesh over the first `n_devices` devices (default: all)."""
    devs = jax.devices()
    if n_devices is not None:
        if len(devs) < n_devices:
            raise ValueError(
                f"requested {n_devices} devices, have {len(devs)}")
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def batch_sharding(mesh: Mesh, axis: str = DATA_AXIS) -> NamedSharding:
    """Shard leading (batch) dimension across the mesh."""
    return NamedSharding(mesh, P(axis))


def chunk_sharding(mesh: Mesh, axis: str = DATA_AXIS) -> NamedSharding:
    """Shard dim 1 of a [K, B, ...] multi-step batch stack (dim 0 = scan
    steps stays whole, the per-step batch splits across the mesh)."""
    return NamedSharding(mesh, P(None, axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(x, mesh: Mesh, axis: str = DATA_AXIS):
    """Place an array (or pytree of arrays) with the batch dim sharded."""
    sh = batch_sharding(mesh, axis)
    return jax.tree.map(lambda a: jax.device_put(a, sh), x)


def replicate(x, mesh: Mesh):
    sh = replicated(mesh)
    return jax.tree.map(lambda a: jax.device_put(a, sh), x)


