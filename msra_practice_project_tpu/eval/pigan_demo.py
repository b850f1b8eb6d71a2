"""pi-GAN demo suite: the reference's six demo modes
(ref: pi_GAN/demo.py:48-69, pi_GAN/utils.py:183-295).

  0  save_demo          8x8 random-sample grid
  1  multiview          rows of identities across a circle of yaw poses
  2  yaw extrapolation  wider yaw range than the training pose prior
  3  fov sweep          6..30 degree field of view
  4  orbit GIF          one identity, yaw orbit video
  5  interpolation      z-space vs w(film)-space interpolation rows
  6  style mixing       film-code crossover at each of the 9 FiLM layers

NOTE the reference's demo.py:31-33 sets `render_coarse_sample_num` twice and
never `render_fine_sample_num`, so modes crash with NameError at :36 — we
implement the intended behaviour (coarse 32 / fine 64 at 128^2).

Run: python -m msra_practice_project_tpu.eval.pigan_demo <config.json> <mode>
"""

from __future__ import annotations

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

from ..core import ckpt as ckpt_lib
from ..core import diagnostics, image_io
from ..core.config import PIGAN_TRAIN_DEFAULTS, log_dir
from ..models import pigan
from ..train import common


def resolve_saved(config):
    """Prefer the train-resolved config.json written into the experiment
    dir (the reference's reproducibility mechanism; the NeRF eval path does
    the same via nerf_common.load_experiment).  Without this, train-time
    key=value CLI overrides (render_far=..., use_dir=...) are silently lost
    at eval and the generator is rebuilt from the defaults table."""
    saved = os.path.join(log_dir(config), "config.json")
    if os.path.exists(saved):
        return common.parse_cli([saved], PIGAN_TRAIN_DEFAULTS)
    return config


def _eval_watchdog(config):
    """Arm the experiment's watchdog for long demo renders (same 900 s
    floor rationale as eval/test_nerf.py: the first render pays the cold
    remote compile)."""
    t = float(config.get("watchdog_timeout", 0.0) or 0.0)
    return diagnostics.Watchdog(max(t, 900.0) if t > 0 else 0.0,
                                log_dir(config))

DEMO_RES = 128
DEMO_COARSE, DEMO_FINE = 32, 64


# Activation-memory budget for demo renders: the fully-batched training path
# would allocate B x rays x samples x 256 floats at once; demo geometries
# (64 ids at 64^2+, or 128^2 with 96 samples) overflow HBM, so demos render
# identities in chunks (the reference loops per-sample for the same reason,
# pi_GAN/utils.py:195-198 — we just pick the largest chunk that fits).
_POINT_BUDGET = 2_000_000  # point-samples per render call (~2 GB activations)


def _chunk_size(resolution, coarse, fine):
    pts = resolution * resolution * (2 * coarse + fine)
    return max(1, _POINT_BUDGET // max(pts, 1))


def _render_chunked(generator, g_params, key, film, theta, phi, resolution,
                    coarse, fine, fov=None, beat=None):
    c = _chunk_size(resolution, coarse, fine)
    outs = []
    for lo in range(0, film.shape[0], c):
        if beat is not None:
            beat(f"render chunk {lo}/{film.shape[0]}")
        outs.append(np.asarray(generator.render_film(
            g_params, jax.random.fold_in(key, 7000 + lo),
            film[lo:lo + c], theta[lo:lo + c], phi[lo:lo + c],
            resolution=resolution, coarse_samples=coarse,
            fine_samples=fine, fov=fov)))
    return np.concatenate(outs, axis=0)


def render_films(generator, g_params, key, film, poses, resolution=DEMO_RES,
                 coarse=DEMO_COARSE, fine=DEMO_FINE, fov=None, beat=None):
    """film [B, 9, 512] x poses [(theta, phi), ...] -> [B, P, H, W, 3].
    `beat` (optional callable) is invoked per pose — watchdog liveness for
    long orbit renders driven under a supervisor."""
    out = []
    for i, pose in enumerate(poses):
        if beat is not None:
            beat(f"render pose {i}/{len(poses)}")
        theta = jnp.full((film.shape[0],), float(pose[0]))
        phi = jnp.full((film.shape[0],), float(pose[1]))
        f = float(pose[2]) if len(pose) >= 3 else fov
        img = _render_chunked(generator, g_params,
                              jax.random.fold_in(key, i), film, theta, phi,
                              resolution, coarse, fine, f, beat=beat)
        out.append(img)
    return np.stack(out, axis=1)


def _grid(imgs_2d):
    """[R, C, H, W, 3] -> single image."""
    rows = [np.concatenate(list(r), axis=1) for r in imgs_2d]
    return np.concatenate(rows, axis=0)


def save_demo(generator, g_params, key, file_name, rows=8, columns=8,
              resolution=64, coarse=DEMO_COARSE, fine=DEMO_FINE, beat=None):
    """Random-sample grid at *random* prior poses (ref: pi_GAN/utils.py:185-204)."""
    num = rows * columns
    kz, kp, kr = jax.random.split(key, 3)
    z = jax.random.normal(kz, (num, generator.cfg.z_dim))
    film = generator.get_mapping(g_params, z)
    theta, phi = generator.sample_poses(kp, num)
    imgs = _render_chunked(generator, g_params, kr, film, theta, phi,
                           resolution, coarse, fine, beat=beat)
    image_io.imwrite(file_name, _grid(imgs.reshape(rows, columns,
                                                   *imgs.shape[1:])))


def demo_multiview(generator, g_params, key, file_name, poses, rows=4,
                   film=None, resolution=DEMO_RES, coarse=DEMO_COARSE,
                   fine=DEMO_FINE, beat=None):
    if film is None:
        z = jax.random.normal(jax.random.fold_in(key, 0),
                              (rows, generator.cfg.z_dim))
        film = generator.get_mapping(g_params, z)
    imgs = render_films(generator, g_params, jax.random.fold_in(key, 1),
                        film, poses, resolution, coarse, fine, beat=beat)
    image_io.imwrite(file_name, _grid(imgs))


def demo_video(generator, g_params, key, file_name, poses, film=None,
               resolution=DEMO_RES, coarse=DEMO_COARSE, fine=DEMO_FINE,
               beat=None):
    """Orbit GIF (ref: pi_GAN/utils.py:231-243)."""
    if film is None:
        z = jax.random.normal(jax.random.fold_in(key, 0),
                              (1, generator.cfg.z_dim))
        film = generator.get_mapping(g_params, z)
    imgs = render_films(generator, g_params, jax.random.fold_in(key, 1),
                        film, poses, resolution, coarse, fine, beat=beat)[0]
    image_io.mimwrite(file_name, [image_io.to8b(f) for f in imgs],
                      duration=0.1)


def demo_interpolate(generator, g_params, key, file_name, cols,
                     pose=(0.0, 0.0), resolution=DEMO_RES,
                     coarse=DEMO_COARSE, fine=DEMO_FINE, beat=None):
    """z-space (top row) vs film/w-space (bottom row) interpolation
    (ref: pi_GAN/utils.py:246-272)."""
    z2 = jax.random.normal(jax.random.fold_in(key, 0),
                           (2, generator.cfg.z_dim))
    k = jnp.linspace(0.0, 1.0, cols)
    z = z2[0][None] * (1 - k[:, None]) + z2[1][None] * k[:, None]
    film_z = generator.get_mapping(g_params, z)
    f2 = generator.get_mapping(g_params, z2)
    film_w = f2[0][None] * (1 - k[:, None, None]) + \
        f2[1][None] * k[:, None, None]
    row_z = render_films(generator, g_params, jax.random.fold_in(key, 1),
                         film_z, [pose], resolution, coarse, fine,
                         beat=beat)[:, 0]
    row_w = render_films(generator, g_params, jax.random.fold_in(key, 1),
                         film_w, [pose], resolution, coarse, fine,
                         beat=beat)[:, 0]
    image_io.imwrite(file_name, _grid(np.stack([row_z, row_w])))


def demo_style_mix(generator, g_params, key, file_name, rows,
                   pose=(0.0, 0.0), resolution=DEMO_RES,
                   coarse=DEMO_COARSE, fine=DEMO_FINE, beat=None):
    """Crossover film codes at layer k for k=9..0 (ref: pi_GAN/utils.py:275-295)."""
    num = 2 * rows
    z = jax.random.normal(jax.random.fold_in(key, 0),
                          (num, generator.cfg.z_dim))
    film = generator.get_mapping(g_params, z)
    grid_rows = []
    for i in range(rows):
        mixes = []
        for cut in range(9, -1, -1):
            mixed = jnp.concatenate([film[2 * i][:cut],
                                     film[2 * i + 1][cut:]], axis=0)
            mixes.append(mixed)
        mixed_film = jnp.stack(mixes)
        row = render_films(generator, g_params, jax.random.fold_in(key, i + 1),
                           mixed_film, [pose], resolution, coarse, fine,
                           beat=beat)[:, 0]
        grid_rows.append(row)
    image_io.imwrite(file_name, _grid(np.stack(grid_rows)))


def load_generator(config):
    """Rebuild G(+D) from a training checkpoint (frozen)."""
    gen_cfg = pigan.GeneratorConfig(
        z_dim=config["z_dim"], resolution=64,
        near=config["render_near"], far=config["render_far"], fov=12.0,
        coarse_samples=config["render_coarse_sample_num"],
        fine_samples=config["render_fine_sample_num"],
        horizontal_std=0.45, vertical_std=0.15, use_dir=config["use_dir"])
    generator = pigan.Generator(gen_cfg)
    discriminator = pigan.Discriminator()
    g_tx = common.adam(1e-4, betas=(0.0, 0.9))
    template = {"g": common.init_state(generator.init(jax.random.PRNGKey(0)),
                                       g_tx),
                "d": common.init_state(
                    discriminator.init(jax.random.PRNGKey(1)), g_tx),
                "step": 0}
    log_path = log_dir(config)
    found = ckpt_lib.restore_latest(log_path, template)
    if found is None:
        print(f"[warn] no checkpoint under {log_path}; using fresh init")
        step, state = 0, template
    else:
        step, state = found
    return generator, discriminator, state, step


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    config = common.parse_cli(argv[:1], PIGAN_TRAIN_DEFAULTS)
    mode = int(argv[1]) if len(argv) > 1 else 0
    config = resolve_saved(config)
    generator, _, state, step = load_generator(config)
    g_params = state["g"]["params"]
    log_path = log_dir(config)
    os.makedirs(log_path, exist_ok=True)  # fresh-init path has no dir yet
    watchdog = _eval_watchdog(config)
    beat = watchdog.beat
    key = jax.random.PRNGKey(42)
    out = os.path.join(log_path, f"demo_{mode}")

    n_pose = 9
    if mode == 0:
        save_demo(generator, g_params, key, out + ".png", beat=beat)
    elif mode == 1:
        poses = [(0.15 * (i - (n_pose - 1) / 2), 0.0) for i in range(n_pose)]
        demo_multiview(generator, g_params, key, out + ".png", poses,
                       beat=beat)
    elif mode == 2:  # yaw extrapolation
        poses = [(0.3 * (i - (n_pose - 1) / 2), 0.0) for i in range(n_pose)]
        demo_multiview(generator, g_params, key, out + ".png", poses,
                       beat=beat)
    elif mode == 3:  # fov sweep
        poses = [(0.0, 0.0, fov) for fov in np.linspace(6, 30, n_pose)]
        demo_multiview(generator, g_params, key, out + ".png", poses,
                       beat=beat)
    elif mode == 4:  # orbit gif
        poses = [(a, 0.0) for a in np.linspace(-1, 1, 41)[:-1]]
        demo_video(generator, g_params, key, out + ".gif", poses, beat=beat)
    elif mode == 5:
        demo_interpolate(generator, g_params, key, out + ".png", cols=8,
                         beat=beat)
    elif mode == 6:
        demo_style_mix(generator, g_params, key, out + ".png", rows=4,
                       beat=beat)
    else:
        raise SystemExit(f"unknown demo mode {mode}")
    watchdog.stop()
    print(f"demo mode {mode} (ckpt step {step}) -> {out}")


if __name__ == "__main__":
    main()


def show_pose_distribution(generator, key, n=1000, save_path=None):
    """Scatter of the camera-pose prior theta~N(0,h_std), phi~N(0,v_std)
    (ref: pi_GAN/modules.py:148-152 Renderer.show_distribution)."""
    import matplotlib
    if save_path is not None:
        matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    theta, phi = generator.sample_poses(key, n)
    plt.figure(figsize=(4, 4))
    plt.scatter(np.asarray(theta), np.asarray(phi), s=3)
    plt.xlabel("theta (rad)")
    plt.ylabel("phi (rad)")
    plt.tight_layout()
    if save_path is not None:
        plt.savefig(save_path, dpi=150)
        plt.close()
    else:
        plt.show()
