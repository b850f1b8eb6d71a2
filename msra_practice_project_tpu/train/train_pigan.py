"""pi-GAN training: progressive-resolution adversarial training.

TPU re-design of pi_GAN/train.py + pi_GAN/utils.py:
  * The generator renders the whole latent batch in one traced computation
    (no per-sample Python loop) — see models/pigan.py.
  * Non-saturating losses with the reference's exact sign convention
    (pi_GAN/utils.py:28-29, train.py:117,133):
        loss_f(u) = -softplus(-u)
        d_loss = -E[loss_f(D(fake))] - E[loss_f(-D(real))] + lambda*R1
        g_loss =  E[loss_f(D(fake))]
  * R1 gradient penalty on real images via jax.grad-through-jax.grad
    (pi_GAN/utils.py:32-37), lambda = 1.
  * Progressive stages from config lists (iterations/fade_in_itrs/batch_size/
    resolution, pi_GAN/train.py:30-33): resolution is static per stage — one
    XLA program per stage, recompiled at each of the (few) stage switches.
  * Dual Adam (betas (0, 0.9)) with the interpolated exponential decay
    (pi_GAN/train.py:138-147).
  * Optional training-dynamics knobs beyond the reference driver, both
    defaulting to its exact behaviour: `r1_lambda` (default 1) and
    `instance_noise`/`instance_noise_anneal`/`instance_noise_floor`
    (default 0 = off) — annealed pixel noise on real+fake before D, for
    datasets where clean disjoint supports let D win and the saturating
    g_loss starve G.  The floor anneals to sigma_min instead of 0 (the
    bigface probe's structure decay began exactly when the noise died —
    a floor keeps the supports overlapped for the whole horizon).

Run: python -m msra_practice_project_tpu.train.train_pigan configs/pi_gan/test.json
"""

from __future__ import annotations

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..core import ckpt as ckpt_lib
from ..core import diagnostics
from ..core.config import PIGAN_TRAIN_DEFAULTS, log_dir, save_config
from ..core import logging as logging_lib
from ..core.logging import log_print
from ..data.image_folder import ImageFolder, make_synthetic_faces
from ..models import pigan
from . import common


def loss_f(u):
    """-softplus(-u) == log sigmoid(u) (ref: pi_GAN/utils.py:28-29)."""
    return -jax.nn.softplus(-u)


def r1_penalty(d_apply, d_params, real, resolution, alpha):
    """E[||grad_x D(x)||^2] (ref: pi_GAN/utils.py:32-37)."""
    def score_sum(x):
        return d_apply(d_params, x, resolution, alpha).sum()

    grads = jax.grad(score_sum)(real)
    g = grads.reshape(real.shape[0], -1)
    return jnp.mean(jnp.sum(g * g, axis=-1))


def noise_schedule(noise0: float, anneal: int, floor: float,
                   step: int) -> float:
    """Instance-noise std at `step`: linear anneal from noise0 to `floor`
    over `anneal` iterations (floor 0 = the original anneal-to-zero)."""
    return max(floor, noise0 * max(0.0, 1.0 - step / max(anneal, 1)))


def make_gan_steps(generator: pigan.Generator,
                   discriminator: pigan.Discriminator,
                   g_tx, d_tx, resolution: int, r1_lambda: float = 1.0,
                   instance_noise: bool = False,
                   d_skip_margin: float | None = None,
                   diff_augment_policy: str = "",
                   g_nonsat: bool = False):
    """Jitted (d_step, g_step) for a progressive stage (static resolution).

    `instance_noise=True` compiles steps that add N(0, noise_std^2) pixel
    noise to BOTH real and fake images before D (Sonderby et al. 2017 /
    Roth et al. 2017): on data where real/fake supports are disjoint (our
    clean synthetic gates) D reaches near-zero loss and the reference's
    saturating g_loss starves G of gradient — noise overlaps the supports
    so D stays informative.  Off (the default) the compiled graphs are the
    reference's exact dynamics (pi_GAN/train.py:100-136); both variants
    take a traced `noise_std` so one XLA program serves the whole anneal.

    `d_skip_margin` (None = off = reference dynamics) caps D's advantage:
    when E[D(fake)] already exceeds the margin (fake pushed towards +inf in
    the reference's sign convention), D's parameter/optimizer update is
    dropped for that step (loss still measured).  On easy synthetic data D
    otherwise saturates within ~2k iterations (E[D(fake)] ~ +3.4 measured)
    and the saturating g_loss gradient sigma(-u) starves G; the cap keeps
    the game in the informative-gradient regime.  In-graph via jnp.where,
    so one compiled program serves both outcomes.

    Measured caveat (bigface probe, margin 1.5): an extended freeze makes
    D static and G can overfit the frozen landscape into a degenerate
    minimum (observed: exact-zero empty-field renders by 1k iterations,
    stuck through 3k with fake_label pinned at 2.3).  Prefer a lower
    discriminator lr (a continuous rebalance that keeps D learning) for
    chronic D dominance; reserve the margin for shaving rare saturation
    spikes with a HIGH threshold (>= 3).

    `diff_augment_policy` ("" = off = reference dynamics): DiffAugment
    (Zhao et al. 2020) — the same random differentiable augmentations on
    real AND fake before D, in both losses (see train/diff_augment.py).
    The data-efficient-GAN fix for D memorising a small real set.

    `g_nonsat` (False = reference dynamics): replace the generator's
    SATURATING loss E[-softplus(-D(fake))] (pi_GAN/utils.py:28-29,
    train.py:133 — its gradient w.r.t. the label is sigmoid(-label),
    which VANISHES exactly when D dominates) with the standard
    non-saturating form E[softplus(D(fake))] (Goodfellow 2014's -log D
    trick in this sign convention: gradient sigmoid(+label) -> 1 when D
    wins).  Same fixed point, same D loss.  Motivated by the r4 flagship
    post-mortem: stage-1 fake_label ran 1.1-2.9, attenuating G's
    gradient 3-20x for ~50k iterations while the samples never formed
    structure, even though the r5 bisect proved the generator can
    represent the data (BASELINE r5 bisect row)."""
    g_apply = generator.apply
    d_apply = discriminator.apply
    use_aug = bool(diff_augment_policy)
    if use_aug:
        from . import diff_augment as da
        da.parse_policy(diff_augment_policy)  # fail fast on a bad policy

    def noisy(x, key, noise_std):
        if not instance_noise:
            return x
        return x + noise_std * jax.random.normal(key, x.shape, x.dtype)

    def aug(x, key):
        if not use_aug:
            return x
        from . import diff_augment as da
        return da.augment(x, key, diff_augment_policy)

    @jax.jit
    def d_step(d_state, g_params, real, z, key, alpha, noise_std=0.0):
        # noise-only and off paths keep their exact pre-existing RNG
        # streams (deterministic resume of older runs)
        if use_aug and instance_noise:
            k_fake, k_nf, k_nr, k_af, k_ar = jax.random.split(key, 5)
        elif instance_noise:
            (k_fake, k_nf, k_nr), k_af, k_ar = \
                jax.random.split(key, 3), None, None
        elif use_aug:
            (k_fake, k_af, k_ar), k_nf, k_nr = \
                jax.random.split(key, 3), None, None
        else:
            k_fake, k_nf, k_nr, k_af, k_ar = key, None, None, None, None

        def loss_fn(d_params):
            fake = g_apply(jax.lax.stop_gradient(g_params), k_fake, z,
                           resolution)
            fake = noisy(aug(fake, k_af), k_nf, noise_std)
            real_n = noisy(aug(real, k_ar), k_nr, noise_std)
            fake_label = d_apply(d_params, fake, resolution, alpha)
            real_label = d_apply(d_params, real_n, resolution, alpha)
            r1 = r1_penalty(d_apply, d_params, real_n, resolution, alpha)
            loss = (-jnp.mean(loss_f(fake_label))
                    - jnp.mean(loss_f(-real_label)) + r1_lambda * r1)
            return loss, {"d_loss": loss, "r1": r1,
                          "real_label": jnp.mean(real_label),
                          "fake_label": jnp.mean(fake_label)}

        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            d_state["params"])
        updates, opt_state = d_tx.update(grads, d_state["opt_state"],
                                         d_state["params"])
        new_params = optax.apply_updates(d_state["params"], updates)
        if d_skip_margin is not None:
            apply_upd = metrics["fake_label"] < d_skip_margin
            new_params = jax.tree.map(
                lambda new, old: jnp.where(apply_upd, new, old),
                new_params, d_state["params"])
            opt_state = jax.tree.map(
                lambda new, old: jnp.where(apply_upd, new, old),
                opt_state, d_state["opt_state"])
            metrics = dict(metrics, d_skipped=1.0 - apply_upd)
        return {
            "params": new_params,
            "opt_state": opt_state,
            "step": d_state["step"] + 1,
        }, metrics

    @jax.jit
    def g_step(g_state, d_params, z, key, alpha, noise_std=0.0):
        if use_aug and instance_noise:
            k_fake, k_nf, k_af = jax.random.split(key, 3)
        elif instance_noise:
            (k_fake, k_nf), k_af = jax.random.split(key), None
        elif use_aug:
            (k_fake, k_af), k_nf = jax.random.split(key), None
        else:
            k_fake, k_nf, k_af = key, None, None

        def loss_fn(g_params):
            fake = g_apply(g_params, k_fake, z, resolution)
            fake = noisy(aug(fake, k_af), k_nf, noise_std)
            fake_label = d_apply(jax.lax.stop_gradient(d_params), fake,
                                 resolution, alpha)
            if g_nonsat:
                loss = jnp.mean(jax.nn.softplus(fake_label))
            else:
                loss = jnp.mean(loss_f(fake_label))
            return loss, {"g_loss": loss}

        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            g_state["params"])
        updates, opt_state = g_tx.update(grads, g_state["opt_state"],
                                         g_state["params"])
        return {
            "params": optax.apply_updates(g_state["params"], updates),
            "opt_state": opt_state,
            "step": g_state["step"] + 1,
        }, metrics

    return d_step, g_step


def save_demo_grid(generator, g_params, key, path, rows=4, cols=4,
                   resolution=None):
    """rows x cols random-sample grid (ref: pi_GAN/utils.py:185-204).

    Delegates to the eval helper's HBM-budgeted chunked render (one shared
    grid implementation) so a large rows*cols*resolution grid cannot
    overflow activation memory mid-training."""
    from ..eval.pigan_demo import save_demo

    save_demo(generator, g_params, key, path, rows=rows, columns=cols,
              resolution=resolution or generator.cfg.resolution,
              coarse=generator.cfg.coarse_samples,
              fine=generator.cfg.fine_samples)


def stage_of(global_step: int, iterations: list[int]) -> int:
    """iterations already [0]-prefixed (ref: pi_GAN/train.py:44,79-84)."""
    stage = 0
    for i in range(len(iterations)):
        if global_step > iterations[i]:
            stage = i
        else:
            break
    return stage


def train(config) -> dict:
    log_path = log_dir(config)
    os.makedirs(log_path, exist_ok=True)
    save_config(config, log_path)
    diagnostics.enable_from_config(config)
    profiler = diagnostics.StepProfiler(log_path,
                                        config.get("profile_steps", 0))
    watchdog = diagnostics.watchdog_from_config(config, log_path)

    iterations = [0] + list(config.iterations)
    fade_in_itrs = list(config.fade_in_itrs)
    batch_sizes = list(config.batch_size)
    resolutions = list(config.resolution)

    gen_cfg = pigan.GeneratorConfig(
        z_dim=config.z_dim, resolution=resolutions[0],
        near=config.render_near, far=config.render_far, fov=12.0,
        coarse_samples=config.render_coarse_sample_num,
        fine_samples=config.render_fine_sample_num,
        horizontal_std=0.45, vertical_std=0.15, use_dir=config.use_dir)
    generator = pigan.Generator(gen_cfg)
    discriminator = pigan.Discriminator()

    seed = config.get("seed", 0)
    key = jax.random.PRNGKey(seed)
    kg, kd, ksteps = jax.random.split(key, 3)
    g_sched = common.interp_lr(config.generator_lr, config.generator_lr_end,
                               config.lr_decay)
    d_sched = common.interp_lr(config.discriminator_lr,
                               config.discriminator_lr_end, config.lr_decay)
    g_tx = common.adam(g_sched, betas=(0.0, 0.9))
    d_tx = common.adam(d_sched, betas=(0.0, 0.9))
    g_state = common.init_state(generator.init(kg), g_tx)
    d_state = common.init_state(discriminator.init(kd), d_tx)
    common.summary_module("generator", g_state["params"])
    common.summary_module("discriminator", d_state["params"])

    # loss_log lists are python floats; kept out of the restored pytree
    # (shape-checked) by storing them in a sidecar .npy.
    found = ckpt_lib.restore_latest(log_path, {"g": g_state, "d": d_state,
                                               "step": 0})
    loss_log = {"g_loss": [], "d_loss": []}
    if found is not None:
        global_step, restored = found
        g_state, d_state = restored["g"], restored["d"]
        # Resume the loss history too (the reference keeps loss_log inside
        # the ckpt, pi_GAN/train.py:162-172; here it rides the sidecar
        # .npy).  Truncate to global_step entries in case the sidecar was
        # written at a different save point than the restored ckpt.
        log_file = os.path.join(log_path, "loss_log.npy")
        if os.path.isfile(log_file):
            prev = np.load(log_file, allow_pickle=True).item()
            loss_log = {k: [float(v) for v in prev.get(k, [])][:global_step]
                        for k in loss_log}
        log_print(f"Resumed at step {global_step} "
                  f"({len(loss_log['g_loss'])} logged losses)")
    else:
        global_step = 0

    data_path = config["data_path"]
    if not os.path.isdir(data_path):
        log_print(f"[data] {data_path!r} not found - generating synthetic "
                  "face blobs")
        data_path = os.path.join(log_path, "_synthetic_faces")
        if not os.path.isdir(data_path):
            make_synthetic_faces(
                data_path, n=config.get("data_n", 256),
                variant=config.get("data_variant", "shaded"))

    # Training-dynamics knobs beyond the reference driver (defaults = the
    # reference's exact dynamics: lambda 1, no noise).  instance_noise is
    # the initial pixel-noise std, linearly annealed to 0 over
    # instance_noise_anneal iterations — used by the synthetic-data gates
    # where clean disjoint supports let D win outright.
    r1_lambda = float(config.get("r1_lambda", 1.0))
    noise0 = float(config.get("instance_noise", 0.0))
    noise_anneal = int(config.get("instance_noise_anneal", 10000))
    noise_floor = float(config.get("instance_noise_floor", 0.0))
    d_skip_margin = config.get("d_skip_margin", None)
    d_skip_margin = None if d_skip_margin is None else float(d_skip_margin)
    aug_policy = str(config.get("diff_augment", "") or "")
    g_nonsat = bool(config.get("g_nonsat", False))
    if (noise0 > 0.0 or noise_floor > 0.0 or d_skip_margin is not None
            or aug_policy or g_nonsat):
        log_print(f"[train] instance noise {noise0} annealed over "
                  f"{noise_anneal} iters to floor {noise_floor}; "
                  f"r1_lambda {r1_lambda}; d_skip_margin {d_skip_margin}; "
                  f"diff_augment '{aug_policy}'; g_nonsat {g_nonsat}")

    def noise_at(step: int) -> float:
        return noise_schedule(noise0, noise_anneal, noise_floor, step)

    stage = stage_of(global_step, iterations)
    dataset = ImageFolder(data_path, batch_sizes[stage],
                          resize=resolutions[stage] / 64.0)
    d_step_fn, g_step_fn = make_gan_steps(generator, discriminator, g_tx,
                                          d_tx, resolutions[stage],
                                          r1_lambda=r1_lambda,
                                          instance_noise=(noise0 > 0.0 or noise_floor > 0.0),
                                          d_skip_margin=d_skip_margin,
                                          diff_augment_policy=aug_policy,
                                          g_nonsat=g_nonsat)
    log_print(f"Starting at stage {stage}, batch_size:{batch_sizes[stage]}, "
              f"resolution:{resolutions[stage]}")

    # Data parallelism: latents + real images shard over the 'data' mesh
    # axis, parameters replicate, XLA reduces gradients over ICI (the
    # TPU-native replacement for the reference's torch.nn.DataParallel,
    # pi_GAN/train.py:50-52).
    devices = jax.devices()
    use_dp = (len(devices) > 1
              and all(b % len(devices) == 0 for b in batch_sizes))
    if use_dp:
        from ..parallel import mesh as mesh_lib
        dp_mesh = mesh_lib.make_mesh()
        g_state = mesh_lib.replicate(g_state, dp_mesh)
        d_state = mesh_lib.replicate(d_state, dp_mesh)
        batch_shard = mesh_lib.batch_sharding(dp_mesh)
        log_print(f"[parallel] data-parallel over {len(devices)} devices")

    m_d = {"d_loss": jnp.nan}
    m_g = {"g_loss": jnp.nan}
    for global_step in range(global_step + 1, iterations[-1] + 1):
        profiler.tick(global_step)
        watchdog.beat(f"step {global_step}")
        epoch_idx, batch_idx, real = dataset.get()
        real = jnp.transpose(real, (0, 3, 1, 2))  # NHWC -> NCHW

        # fade-in alpha ramp (ref: pi_GAN/train.py:96-98)
        fade_alpha = -1.0
        if (fade_in_itrs[stage] > 0
                and global_step < iterations[stage] + fade_in_itrs[stage]):
            fade_alpha = ((global_step - iterations[stage])
                          / fade_in_itrs[stage])

        k = jax.random.fold_in(ksteps, global_step)
        k1, k2, k3, k4 = jax.random.split(k, 4)
        z = jax.random.normal(k1, (batch_sizes[stage], config.z_dim))
        if use_dp:
            real = jax.device_put(real, batch_shard)
            z = jax.device_put(z, batch_shard)
        noise_std = noise_at(global_step)
        d_state, m_d = d_step_fn(d_state, g_state["params"], real, z, k2,
                                 fade_alpha, noise_std)
        z = jax.random.normal(k3, (batch_sizes[stage], config.z_dim))
        if use_dp:
            z = jax.device_put(z, batch_shard)
        g_state, m_g = g_step_fn(g_state, d_state["params"], z, k4,
                                 fade_alpha, noise_std)
        # lazy append — converted to floats at print/save cadence (a float()
        # per step would sync the device every step)
        loss_log["d_loss"].append(m_d["d_loss"])
        loss_log["g_loss"].append(m_g["g_loss"])

        # stage switch (ref: pi_GAN/train.py:149-156)
        if (stage + 1 < len(iterations)
                and global_step == iterations[stage + 1]):
            stage += 1
            if stage < len(resolutions):
                dataset.close()
                dataset = ImageFolder(data_path, batch_sizes[stage],
                                      resize=resolutions[stage] / 64.0)
                d_step_fn, g_step_fn = make_gan_steps(
                    generator, discriminator, g_tx, d_tx,
                    resolutions[stage], r1_lambda=r1_lambda,
                    instance_noise=(noise0 > 0.0 or noise_floor > 0.0),
                    d_skip_margin=d_skip_margin,
                    diff_augment_policy=aug_policy,
                    g_nonsat=g_nonsat)
                log_print(f"[Train] Entering stage {stage}, batch_size:"
                          f"{batch_sizes[stage]}, resolution:"
                          f"{resolutions[stage]}")

        if global_step % config.i_print == 0:
            _flush_loss_log(loss_log)
            # D-saturation visibility: fake_label -> +inf with a tiny
            # |g_loss| means G's gradient sigma(-fake_label) has starved
            # (one extra scalar sync per i_print steps — negligible)
            log_print(f"[Train] Iter: {global_step}({epoch_idx}-{batch_idx})"
                      f" d_loss: {loss_log['d_loss'][-1]} "
                      f"g_loss: {loss_log['g_loss'][-1]} "
                      f"fake_label: {float(m_d['fake_label']):.3f}"
                      + (f" d_skipped: {float(m_d['d_skipped']):.0f}"
                         if "d_skipped" in m_d else ""))
        if global_step % config.i_save == 0:
            # Sidecar BEFORE ckpt: resume truncates a loss_log that ran
            # ahead ([:global_step]), but one left behind (kill between the
            # two writes) would hole the merged history permanently.
            _flush_loss_log(loss_log)
            np.save(os.path.join(log_path, "loss_log.npy"), loss_log)
            p = ckpt_lib.save(log_path, global_step,
                              {"g": g_state, "d": d_state,
                               "step": global_step})
            log_print(f"Saved checkpoints at {p}")
        if global_step % config.i_image == 0:
            # stage can equal len(resolutions) on the very last step (the
            # final switch has no next stage) — render at the last res.
            res_now = resolutions[min(stage, len(resolutions) - 1)]
            save_demo_grid(
                generator, g_state["params"],
                jax.random.fold_in(k, 99),
                os.path.join(log_path, f"{global_step:06d}.png"),
                resolution=res_now)

    profiler.stop()
    # final flush is a device sync — keep the watchdog armed through it
    _flush_loss_log(loss_log)
    np.save(os.path.join(log_path, "loss_log.npy"), loss_log)
    watchdog.stop()
    return {"g_state": g_state, "d_state": d_state, "loss_log": loss_log,
            "generator": generator, "discriminator": discriminator}


def _flush_loss_log(loss_log: dict) -> None:
    """One batched device->host transfer per key (core/logging has the
    ~28 ms/scalar measurement)."""
    for k, vs in loss_log.items():
        loss_log[k] = logging_lib.flush_scalar_list(vs)


def main(argv=None):
    config = common.parse_cli(argv if argv is not None else sys.argv[1:],
                              PIGAN_TRAIN_DEFAULTS)
    train(config)


if __name__ == "__main__":
    main()
