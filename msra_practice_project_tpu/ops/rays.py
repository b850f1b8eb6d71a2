"""Camera poses + per-pixel ray generation, fully on-device.

The reference generates rays on host with numpy (nerf/render.py:7-23) and
ships them to the GPU per call; here pose math and ray generation are jnp and
trace-safe, so the pi-GAN generator can sample a *random traced pose per
latent* inside one jitted step, and NeRF ray pre-batching stays on-device.

Pose conventions (two in the reference!):
  * nerf/data_loader.py:39-51 — `camera_pos_to_transform_matrix(r, theta, phi)`
    takes DEGREES.
  * pi_GAN/render.py:37-49 — same name, takes RADIANS.
Here: `camera_pose(...)` takes radians; `camera_pose_deg(...)` degrees.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

# World-coordinate change-of-basis for Blender scenes
# (ref: nerf/data_loader.py:31-36).
BLENDER_COORD = np.array(
    [
        [-1, 0, 0, 0],
        [0, 0, 1, 0],
        [0, 1, 0, 0],
        [0, 0, 0, 1],
    ],
    dtype=np.float32,
)


def trans_t(t):
    m = jnp.eye(4, dtype=jnp.float32)
    return m.at[2, 3].set(t)


def rot_phi(phi):
    """Pitch (+ down, - up), ref: nerf/data_loader.py:16-21."""
    c, s = jnp.cos(phi), jnp.sin(phi)
    return jnp.array(
        [[1, 0, 0, 0], [0, c, -s, 0], [0, s, c, 0], [0, 0, 0, 1]],
        dtype=jnp.float32,
    )


def rot_theta(th):
    """Yaw (+ right, - left), ref: nerf/data_loader.py:24-29."""
    c, s = jnp.cos(th), jnp.sin(th)
    return jnp.array(
        [[c, 0, -s, 0], [0, 1, 0, 0], [s, 0, c, 0], [0, 0, 0, 1]],
        dtype=jnp.float32,
    )


def camera_pose(radius, theta, phi):
    """Camera-to-world matrix from spherical position, angles in RADIANS
    (ref: pi_GAN/render.py:37-49).  Trace-safe (all jnp)."""
    c2w = trans_t(radius)
    c2w = rot_phi(phi) @ c2w
    c2w = rot_theta(theta) @ c2w
    return c2w


def camera_pose_deg(radius, theta, phi):
    """Degrees variant (ref: nerf/data_loader.py:39-51)."""
    return camera_pose(radius, jnp.deg2rad(theta), jnp.deg2rad(phi))


def pose_to_camera_pos(c2w):
    """Transform matrix -> (radius, theta_deg, phi_deg)
    (ref: nerf/data_loader.py:54-66)."""
    c2w = np.asarray(c2w)
    pos = (c2w @ np.array([0.0, 0.0, 0.0, 1.0]))[:3]
    radius = float(np.linalg.norm(pos))
    theta = float(np.arctan2(-pos[0], pos[2])) / np.pi * 180
    phi = float(np.arctan(-pos[1] / np.linalg.norm(pos[::2]))) / np.pi * 180
    return radius, theta, phi


@partial(jax.jit, static_argnums=(0, 1))
def get_rays(width: int, height: int, focal, c2w):
    """Pinhole rays for every pixel (ref: nerf/render.py:7-23).

    Returns (rays_o, rays_d), each [H, W, 3], on device.  Row-major pixel
    order matches the reference's numpy meshgrid(indexing='xy').
    """
    j, i = jnp.meshgrid(
        jnp.arange(height, dtype=jnp.float32),
        jnp.arange(width, dtype=jnp.float32),
        indexing="ij",
    )
    dirs = jnp.stack(
        [(i - width * 0.5) / focal, -(j - height * 0.5) / focal,
         -jnp.ones_like(i)],
        axis=-1,
    )
    rays_d = dirs @ c2w[:3, :3].T
    rays_o = jnp.broadcast_to(c2w[:3, -1], rays_d.shape)
    return rays_o, rays_d


def get_rays_flat(width: int, height: int, focal, c2w):
    """[H*W, 3] origins and directions."""
    o, d = get_rays(width, height, focal, c2w)
    return o.reshape(-1, 3), d.reshape(-1, 3)
