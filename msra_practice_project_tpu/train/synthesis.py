"""GAN inversion ("synthesis"): optimise a film code to reconstruct a target
image with a frozen pi-GAN generator + discriminator realism prior.

TPU re-design of pi_GAN/synthesis.py: the optimisation variable is the
[9, 512] film tensor (not z); loss = 1e2 * MSE(render(film, pose=0), target)
+ softplus(D(render(film, random pose))) (the reference's
`-mean(loss_f(-gen_label))`, synthesis.py:103).

NOTE the reference's sample-count block (synthesis.py:33-34) assigns
`render_coarse_sample_num` twice (8 then 16) and leaves the fine count from
config — we implement the intent: coarse 8, fine 16.

Run: python -m msra_practice_project_tpu.train.synthesis <config.json> [target.png]
"""

from __future__ import annotations

import os
import sys
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..core import ckpt as ckpt_lib
from ..core import diagnostics, image_io
from ..core import logging as logging_lib
from ..core.config import PIGAN_TRAIN_DEFAULTS, log_dir
from ..eval.pigan_demo import demo_multiview, demo_video, load_generator
from . import common

RESOLUTION = 64
COARSE, FINE = 8, 16
FINAL_RES, FINAL_COARSE, FINAL_FINE = 128, 32, 64  # ref: synthesis.py:131
ITERATIONS = 5000
I_PRINT, I_SAVE, I_IMAGE = 10, 1000, 100


def make_syn_step(generator, discriminator, g_params, d_params, target, tx):
    g_render = generator.render_film
    d_apply = discriminator.apply

    @jax.jit
    def step(state, key):
        k1, k2, k3 = jax.random.split(key, 3)

        def loss_fn(film):
            film_b = film[None]
            # Reconstruction at the canonical pose (theta=phi=0).
            rec = g_render(g_params, k1, film_b, jnp.zeros((1,)),
                           jnp.zeros((1,)), resolution=RESOLUTION,
                           coarse_samples=COARSE, fine_samples=FINE)[0]
            rec_loss = jnp.mean((rec - target) ** 2)
            # Realism at a random prior pose.
            theta, phi = generator.sample_poses(k2, 1)
            img = g_render(g_params, k3, film_b, theta, phi,
                           resolution=RESOLUTION, coarse_samples=COARSE,
                           fine_samples=FINE)
            label = d_apply(d_params, jnp.transpose(img, (0, 3, 1, 2)),
                            RESOLUTION, -1.0)
            g_loss = jnp.mean(jax.nn.softplus(label))
            return 1e2 * rec_loss + g_loss, {"rec": rec_loss, "g": g_loss}

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state["params"])
        updates, opt_state = tx.update(grads, state["opt_state"],
                                       state["params"])
        return {
            "params": optax.apply_updates(state["params"], updates),
            "opt_state": opt_state,
            "step": state["step"] + 1,
        }, {"loss": loss, **aux}

    @partial(jax.jit, static_argnums=(3,))
    def multi_step(state, base_key, start_step, n_steps):
        """K steps in ONE dispatch (lax.scan) — identical math to K step()
        calls; amortises the ~1.2 ms/dispatch tunnel cost (the 1-sample
        synthesis step is only ~a few ms of compute).  Keys derive INSIDE
        the scan (fold_in(base_key, start_step+1+i), the single-step
        stream) — host-side key building cost ~1 dispatch/step (r3)."""
        def body(st, i):
            return step(st, jax.random.fold_in(base_key, start_step + 1 + i))
        return jax.lax.scan(body, state, jnp.arange(n_steps))

    return step, multi_step


def synthesize(config, target_path: str | None = None) -> dict:
    generator, discriminator, state, _ = load_generator(config)
    g_params = state["g"]["params"]
    d_params = state["d"]["params"]

    # Target image.
    if target_path and os.path.exists(target_path):
        target = image_io.imread(target_path, resize=(RESOLUTION, RESOLUTION))
        target = jnp.asarray(target[..., :3])
    else:
        # fall back to a generated sample (self-inversion sanity target)
        key = jax.random.PRNGKey(123)
        z = jax.random.normal(key, (1, generator.cfg.z_dim))
        film_t = generator.get_mapping(g_params, z)
        target = generator.render_film(
            g_params, key, film_t, jnp.zeros((1,)), jnp.zeros((1,)),
            resolution=RESOLUTION, coarse_samples=COARSE,
            fine_samples=FINE)[0]
        print("[data] no target image given - inverting a generated sample")

    syn_log_path = log_dir(config) + "_syn"
    os.makedirs(syn_log_path, exist_ok=True)

    key = jax.random.PRNGKey(config.get("seed", 0) + 7)
    z0 = jax.random.normal(key, (1, generator.cfg.z_dim))
    film0 = generator.get_mapping(g_params, z0)[0]
    tx = common.adam(1e-4)
    syn_state = common.init_state(film0, tx)
    global_step, syn_state = common.resume(syn_log_path, syn_state)

    step_fn, multi_fn = make_syn_step(generator, discriminator, g_params,
                                      d_params, target, tx)
    loss_log = []
    loss_file = os.path.join(syn_log_path, "syn_loss.npy")
    if global_step and os.path.exists(loss_file):
        # merged loss history must span the whole run across supervised
        # restarts; truncate a log that ran ahead of the restored ckpt
        loss_log = [float(v) for v in np.load(loss_file)][:global_step]
    n_pose = 9
    poses = [(0.15 * (i - (n_pose - 1) / 2), 0.0) for i in range(n_pose)]
    iterations = config.get("syn_iterations", ITERATIONS)
    steps_per_call = int(config.get("steps_per_call", I_PRINT))

    def dist_to(step, every):
        return every - (step % every)

    watchdog = diagnostics.watchdog_from_config(config, syn_log_path)
    while global_step < iterations:
        watchdog.beat(f"step {global_step}")
        n_chunk = min(
            steps_per_call, iterations - global_step,
            dist_to(global_step, I_PRINT),
            dist_to(global_step, I_SAVE),
            dist_to(global_step, I_IMAGE),
        )
        if n_chunk > 1:
            syn_state, ms = multi_fn(syn_state, key, global_step, n_chunk)
            loss_log.append(ms["loss"])  # [K] vector; flattened at flush
        else:
            syn_state, m = step_fn(syn_state,
                                   jax.random.fold_in(key, global_step + 1))
            loss_log.append(m["loss"])  # lazy; floats at print/end
        global_step += n_chunk
        if global_step % I_PRINT == 0:
            loss_log[:] = logging_lib.flush_scalar_list(loss_log)
            print(f"[Train] Iter: {global_step} loss: {loss_log[-1]}")
        if global_step % I_SAVE == 0:
            # Sidecar BEFORE ckpt (same crash-consistency order as the
            # trainers: log-ahead is truncated on resume, log-behind would
            # hole the history).
            loss_log[:] = logging_lib.flush_scalar_list(loss_log)
            np.save(loss_file, np.asarray(loss_log, np.float64))
            p = ckpt_lib.save(syn_log_path, global_step, syn_state)
            print(f"Saved checkpoints at {p}")
        if global_step % I_IMAGE == 0:
            demo_multiview(generator, g_params, jax.random.fold_in(key, 10_000_001),
                           os.path.join(syn_log_path,
                                        f"{global_step:06d}.png"),
                           poses, film=syn_state["params"][None],
                           resolution=RESOLUTION)

    # Keep the watchdog armed through the trailing device phases (final
    # flush + 128^2 multiview + orbit GIF) — a production wedge was observed
    # in exactly this post-loop phase; disarming early hangs unsupervised.
    watchdog.beat("final flush")
    loss_log[:] = logging_lib.flush_scalar_list(loss_log)
    # Final 128^2 multiview + orbit GIF (ref: synthesis.py:131-139).
    film = syn_state["params"][None]
    watchdog.beat("final multiview")
    demo_multiview(generator, g_params, jax.random.fold_in(key, 10_000_002),
                   os.path.join(syn_log_path, "demo.png"), poses, film=film,
                   resolution=FINAL_RES, coarse=FINAL_COARSE,
                   fine=FINAL_FINE, beat=watchdog.beat)
    orbit = [(a, 0.0) for a in np.linspace(-1, 1, 41)[:-1]]
    # per-frame beats: one beat over the whole 40-frame orbit would race a
    # cold-compile window against the timeout
    demo_video(generator, g_params, jax.random.fold_in(key, 10_000_003),
               os.path.join(syn_log_path, "demo.gif"), orbit, film=film,
               resolution=FINAL_RES, coarse=FINAL_COARSE, fine=FINAL_FINE,
               beat=watchdog.beat)
    watchdog.stop()
    return {"film": syn_state["params"], "loss_log": loss_log,
            "target": target}


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    config = common.parse_cli(argv[:1], PIGAN_TRAIN_DEFAULTS)
    target = argv[1] if len(argv) > 1 else None
    synthesize(config, target)


if __name__ == "__main__":
    main()
