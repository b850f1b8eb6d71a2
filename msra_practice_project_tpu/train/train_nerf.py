"""NeRF training on Blender-synthetic scenes — the canonical hot loop.

TPU re-design of nerf/train_nerf.py:
  * Ray pre-batching builds one device-resident, pre-shuffled [N*H*W, 10]
    buffer (6 ray + 4 rgba floats) — as the reference does on GPU
    (nerf/train_nerf.py:78-86) — but ray generation itself is jnp on device.
  * The start-up phase (first `start_up_itrs` iters sample only from the
    centre crop of one random train image, nerf/train_nerf.py:117-137) uses a
    precomputed [N_img, crop_pixels, 10] buffer and a jitted
    gather-without-replacement step.
  * Coarse+fine MSE (+0.1 * alpha/acc loss when `use_alpha`), Adam with the
    exact exponential decay lr*0.1^(step/(decay*1000)).
  * Epoch reshuffle actually reshuffles (the reference's reshuffle is a no-op
    bug — it assigns to a dead variable, nerf/train_nerf.py:143-144; we build
    the *intended* behaviour and note the divergence).
  * Data parallelism: the ray batch shards over the 'data' mesh axis; params
    replicate; XLA inserts the gradient psum (SURVEY.md §2.4).

Run: python -m msra_practice_project_tpu.train.train_nerf configs/nerf/lego.json
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
from ..core.config import NERF_TRAIN_DEFAULTS, log_dir, save_config
from ..core.logging import MetricLogger, log_print
from ..data import blender
from ..models.nerf import nerf_model
from ..ops import rays as ray_ops
from ..ops.render import render_image, render_rays
from ..parallel import mesh as mesh_lib
from . import common


# ---------------------------------------------------------------------------
# Ray pre-batching
# ---------------------------------------------------------------------------


def build_ray_buffer(images, poses, width, height, focal, key):
    """All train rays+rgba as one shuffled device buffer [N*H*W, 10]
    (ref: nerf/train_nerf.py:78-86)."""
    per_image = []
    for img, pose in zip(images, poses):
        ro, rd = ray_ops.get_rays(width, height, focal,
                                  jnp.asarray(pose[:3, :4]))
        rows = jnp.concatenate(
            [ro.reshape(-1, 3), rd.reshape(-1, 3),
             jnp.asarray(img).reshape(-1, 4)], axis=1)
        per_image.append(rows)
    buf = jnp.concatenate(per_image, axis=0)
    perm = jax.random.permutation(key, buf.shape[0])
    return buf[perm]


def build_startup_buffer(images, poses, width, height, focal):
    """Centre-crop ray buffer per train image [N, s_h*s_w, 10].

    The reference generates rays for a half-size image with the SAME focal,
    which is exactly the centre crop of the full image's ray grid
    (nerf/train_nerf.py:125-137).
    """
    s_w, s_h = int(width / 2), int(height / 2)
    s_left, s_top = int(width / 4), int(height / 4)
    out = []
    for img, pose in zip(images, poses):
        ro, rd = ray_ops.get_rays(s_w, s_h, focal, jnp.asarray(pose[:3, :4]))
        crop = jnp.asarray(img[s_top:s_top + s_h, s_left:s_left + s_w])
        rows = jnp.concatenate(
            [ro.reshape(-1, 3), rd.reshape(-1, 3), crop.reshape(-1, 4)],
            axis=1)
        out.append(rows)
    return jnp.stack(out)


# ---------------------------------------------------------------------------
# Train step
# ---------------------------------------------------------------------------


def _make_step_impl(coarse_model, fine_model, tx, cfg):
    """Unjitted step(state, batch [B,10], key) -> (state, metrics)."""
    use_fine = cfg["use_fine_model"]
    use_alpha = cfg["use_alpha"]
    near, far = cfg["render_near"], cfg["render_far"]
    nc, nf = cfg["render_coarse_sample_num"], cfg["render_fine_sample_num"]
    use_fused = (cfg.get("use_fused_mlp", True)
                 and not cfg.get("use_siren", False)
                 and jax.default_backend() == "tpu")
    if use_fused:
        from ..ops.pallas.nerf_mlp import fused_nerf_apply
        # need_dx=False: train points are functions of ray data (non-diff)
        # and stop-gradient'd z values, so input grads are dead work.
        # save_acts=True: spill bf16 activations so the backward skips its
        # forward recompute (identical grads, ~2.5 ms/step on v5e).
        apply_c = apply_f = lambda p, x: fused_nerf_apply(
            p, x, True, False, False, True)
    else:
        apply_c, apply_f = coarse_model.apply, fine_model.apply

    def loss_fn(params, batch, key):
        rays_o, rays_d = batch[:, 0:3], batch[:, 3:6]
        target_rgb, target_alpha = batch[:, 6:9], batch[:, 9]
        coarse_fn = jax.tree_util.Partial(apply_c, params["coarse"])
        fine_fn = (jax.tree_util.Partial(apply_f, params["fine"])
                   if use_fine else coarse_fn)
        out = render_rays(key, rays_o, rays_d, near, far, coarse_fn, fine_fn,
                          nc, nf)
        loss_coarse = jnp.mean((out["rgb_coarse"] - target_rgb) ** 2)
        loss_fine = jnp.mean((out["rgb_fine"] - target_rgb) ** 2)
        psnr = -10.0 * jnp.log10(loss_fine)
        if use_alpha:
            loss_coarse += 0.1 * jnp.mean(
                (out["acc_coarse"] - target_alpha) ** 2)
            loss_fine += 0.1 * jnp.mean((out["acc_fine"] - target_alpha) ** 2)
        loss = loss_fine + (loss_coarse if use_fine else 0.0)
        return loss, {"loss": loss, "loss_coarse": loss_coarse,
                      "loss_fine": loss_fine, "psnr": psnr}

    def step(state, batch, key):
        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state["params"], batch, key)
        updates, opt_state = tx.update(grads, state["opt_state"],
                                       state["params"])
        return {
            "params": optax.apply_updates(state["params"], updates),
            "opt_state": opt_state,
            "step": state["step"] + 1,
        }, metrics

    return step


def make_train_step(coarse_model, fine_model, tx, cfg):
    """Returns a jitted step(state, batch [B,10], key) -> (state, metrics).

    cfg['use_fused_mlp'] routes the MLP evaluation through the fused Pallas
    kernel (ops/pallas/nerf_mlp.py): faster fwd+bwd via VMEM-resident
    weights + bf16 MXU matmuls.  Only valid for the PE (non-siren) NeRF.
    """
    return jax.jit(_make_step_impl(coarse_model, fine_model, tx, cfg))


def make_train_multistep(coarse_model, fine_model, tx, cfg):
    """Returns a jitted multi(state, batches [K,B,10], base_key, start_step)
    that runs K train steps in ONE dispatch via lax.scan.

    The axon tunnel costs ~1.2 ms per dispatch (BASELINE.md); scanning K
    steps amortises it to ~1.2/K ms.  Per-step RNG keys are derived INSIDE
    the scan — fold_in(fold_in(base_key, start_step+1+i), 2), the exact
    stream the single-step path uses — because building them host-side cost
    ~2 dispatches per step and halved the production step rate vs bench
    (soak measurement, r3).  Identical math to K make_train_step calls.
    K is a runtime leading dim, one compile per K.
    """
    step = _make_step_impl(coarse_model, fine_model, tx, cfg)

    @jax.jit
    def multi(state, batches, base_key, start_step):
        def body(st, ib):
            i, batch = ib
            k = jax.random.fold_in(
                jax.random.fold_in(base_key, start_step + 1 + i), 2)
            return step(st, batch, k)
        n = batches.shape[0]
        return jax.lax.scan(body, state, (jnp.arange(n), batches))

    return multi


@partial(jax.jit, static_argnames=("batch_size",))
def sample_startup_batch(startup_buf, key, *, batch_size: int):
    """One random image, `batch_size` crop rays without replacement
    (ref: nerf/train_nerf.py:128-137)."""
    k_img, k_rows = jax.random.split(key)
    img_idx = jax.random.randint(k_img, (), 0, startup_buf.shape[0])
    # without replacement like the reference, unless the crop has fewer
    # pixels than the batch (tiny smoke datasets)
    replace = batch_size > startup_buf.shape[1]
    rows = jax.random.choice(
        k_rows, startup_buf.shape[1], (batch_size,), replace=replace)
    return startup_buf[img_idx][rows]


# ---------------------------------------------------------------------------
# Driver
# ---------------------------------------------------------------------------


def load_dataset(config):
    data_path = config["data_path"]
    if os.path.isdir(data_path):
        images, poses, width, height, focal, train_idx = \
            blender.load_blender_data(
                data_path, config["data_resize"], config["data_skip"],
                config["data_view_dir_range"], config["data_target_num"],
                config["data_train_idx"],
                rng=np.random.default_rng(config.get("seed", 0)))
    else:
        log_print(f"[data] {data_path!r} not found - generating synthetic "
                  "blender scene")
        tmp = os.path.join(log_dir(config), "_synthetic_data")
        blender.make_synthetic_blender(tmp, size=config.get("data_size", 32))
        images, poses, width, height, focal, train_idx = \
            blender.load_blender_data(tmp, 1.0, 1)
    blender.premultiply_white(images)
    if config["data_view_dir_noise"] is not None:
        poses["train"] = poses["train"] + (
            np.random.default_rng(0).normal(size=poses["train"].shape)
            * np.sqrt(config["data_view_dir_noise"])).astype(np.float32)
    return images, poses, width, height, focal, train_idx


def train(config) -> dict:
    log_path = log_dir(config)
    os.makedirs(log_path, exist_ok=True)
    diagnostics.enable_from_config(config)
    profiler = diagnostics.StepProfiler(log_path,
                                        config.get("profile_steps", 0))
    watchdog = diagnostics.watchdog_from_config(config, log_path)

    images, poses, width, height, focal, train_idx = load_dataset(config)
    if config.get("data_show_distribution", False):
        blender.show_data_distribution(
            poses, save_path=os.path.join(log_path, "distribution.png"))
    config["data_train_idx"] = train_idx
    path = save_config(config, log_path)
    log_print(f"Config file write to: {path}")

    seed = config.get("seed", 0)
    root_key = jax.random.PRNGKey(seed)
    k_shuffle, k_init_c, k_init_f, k_steps = jax.random.split(root_key, 4)

    buf = build_ray_buffer(images["train"], poses["train"], width, height,
                           focal, k_shuffle)
    startup_buf = (build_startup_buffer(images["train"], poses["train"],
                                        width, height, focal)
                   if config["start_up_itrs"] > 0 else None)
    batch_size = config["batch_size"]
    n_rays = buf.shape[0]
    batch_num = int(np.ceil(n_rays / batch_size))
    log_print(f"Batching Finished: size={tuple(buf.shape)}, "
              f"batch_size={batch_size}, batch_num={batch_num}")

    # Models + optimizer (one Adam over both sets of params, as the
    # reference concatenates the parameter lists, nerf/train_nerf.py:95-98).
    coarse_model = nerf_model(config["use_siren"])
    fine_model = nerf_model(config["use_siren"])
    params = {"coarse": coarse_model.init(k_init_c),
              "fine": (fine_model.init(k_init_f)
                       if config["use_fine_model"] else None)}
    schedule = common.exponential_lr(config["learning_rate"],
                                     config["learning_rate_decay"])
    tx = common.adam(schedule)
    state = common.init_state(params, tx)
    global_step, state = common.resume(log_path, state)

    # Data-parallel placement: batch shards over chips, params replicate.
    devices = jax.devices()
    use_dp = len(devices) > 1 and batch_size % len(devices) == 0
    if use_dp:
        dp_mesh = mesh_lib.make_mesh()
        state = mesh_lib.replicate(state, dp_mesh)
        # Rays are the scale axis (SURVEY §2.4): shard the buffer rows over
        # 'data' so per-chip HBM holds 1/N of it (the reference's full lego
        # geometry is ~2.6 GB of rays).  Batches re-shard per step — a ~40 KB
        # ICI gather, negligible next to the step.  Contents are identical
        # to the replicated layout, so DP ≡ single-device still holds
        # (tests/test_parallel.py).
        buf = mesh_lib.shard_batch(buf, dp_mesh)
        batch_shard = mesh_lib.batch_sharding(dp_mesh)
        chunk_shard = mesh_lib.chunk_sharding(dp_mesh)
        log_print(f"[parallel] data-parallel over {len(devices)} devices; "
                  f"ray buffer sharded ({buf.nbytes / len(devices) / 2**20:.1f}"
                  f" MiB/chip)")

    # Exact resume (kill-anywhere semantics): the batch stream is a pure
    # function of (seed, config, global_step) — epoch reshuffle keys derive
    # from the boundary step — so on resume we replay the elapsed epoch
    # permutations and restore the intra-epoch cursor.  The post-resume
    # stream is then IDENTICAL to an uninterrupted run (tested in
    # tests/test_train.py).  The reference restarts with a fresh shuffle
    # (nerf/train_nerf.py:78-86) and loses stream continuity.
    batch_idx = 0
    epoch_len = n_rays // batch_size
    if global_step > config["start_up_itrs"] and epoch_len > 0:
        done = global_step - config["start_up_itrs"]
        n_epochs = done // epoch_len
        if n_epochs > 0:
            idx = jnp.arange(n_rays)
            for e in range(1, n_epochs + 1):
                g = config["start_up_itrs"] + e * epoch_len
                k_e = jax.random.fold_in(
                    jax.random.fold_in(k_steps, g + 1), 1)
                idx = idx[jax.random.permutation(k_e, n_rays)]
            buf = buf[idx]
            if use_dp:
                buf = mesh_lib.shard_batch(buf, dp_mesh)
        batch_idx = done % epoch_len
        log_print(f"[resume] replayed {n_epochs} epoch permutations, "
                  f"batch cursor {batch_idx}/{epoch_len}")

    step_fn = make_train_step(coarse_model, fine_model, tx, config)
    # Multi-step dispatch: scan `steps_per_call` steps in one XLA program to
    # amortise the ~1.2 ms/dispatch tunnel cost.  Identical math; chunks
    # never cross cadence/epoch/startup boundaries, so prints, saves,
    # renders and reshuffles land on the exact same steps.
    steps_per_call = int(config.get("steps_per_call",
                                    NERF_TRAIN_DEFAULTS["steps_per_call"]))
    multi_fn = (make_train_multistep(coarse_model, fine_model, tx, config)
                if steps_per_call > 1 else None)
    logger = MetricLogger(["loss", "psnr"])
    if global_step > 0:
        log_file = os.path.join(log_path, "log.npy")
        if os.path.exists(log_file):
            # seed with the pre-kill history (truncated to the restored
            # step) so the final log.npy spans the whole run
            logger.preload(MetricLogger.load(log_file), global_step)

    def dist_to(step, every):
        return every - (step % every)

    iterations = config["iterations"]
    while global_step < iterations:
        profiler.tick(global_step + 1)
        watchdog.beat(f"step {global_step}")
        k = jax.random.fold_in(k_steps, global_step + 1)

        # Epoch boundary: real reshuffle (fixes the reference's
        # dead-variable bug at nerf/train_nerf.py:143-144).
        if (global_step >= config["start_up_itrs"]
                and (batch_idx + 1) * batch_size > n_rays):
            perm = jax.random.permutation(jax.random.fold_in(k, 1), n_rays)
            buf = buf[perm]
            if use_dp:  # keep the permuted buffer row-sharded over chips
                buf = mesh_lib.shard_batch(buf, dp_mesh)
            batch_idx = 0

        n_chunk = 1
        if multi_fn is not None and global_step >= config["start_up_itrs"]:
            n_chunk = min(
                steps_per_call,
                iterations - global_step,
                (n_rays - batch_idx * batch_size) // batch_size,
                dist_to(global_step, config["i_print"]),
                dist_to(global_step, config["i_save"]),
                dist_to(global_step, config["i_image"]),
            )

        if n_chunk > 1:
            lo = batch_idx * batch_size
            batches = jax.lax.dynamic_slice_in_dim(
                buf, lo, n_chunk * batch_size).reshape(
                    n_chunk, batch_size, buf.shape[-1])
            if use_dp:
                batches = jax.device_put(batches, chunk_shard)
            start_step = global_step
            batch_idx += n_chunk
            global_step += n_chunk
            state, ms = multi_fn(state, batches, k_steps, start_step)
            logger.append_vec(loss=ms["loss"], psnr=ms["psnr"])
            m = {key_: v[-1] for key_, v in ms.items()}
        else:
            if global_step + 1 <= config["start_up_itrs"]:
                batch = sample_startup_batch(startup_buf, k,
                                             batch_size=batch_size)
            else:
                batch = jax.lax.dynamic_slice_in_dim(
                    buf, batch_idx * batch_size, batch_size)
                batch_idx += 1
            if use_dp:
                batch = jax.device_put(batch, batch_shard)
            global_step += 1
            state, m = step_fn(state, batch, jax.random.fold_in(k, 2))
            logger.append(loss=m["loss"], psnr=m["psnr"])

        if global_step % config["i_print"] == 0:
            rate = config["i_print"] / max(logger.step_time(), 1e-9)
            log_print(f"[Train] Iter: {global_step} "
                      f"Loss: {float(m['loss'])} PSNR: {float(m['psnr'])} "
                      f"({rate:.1f} steps/s)")
        if global_step % config["i_save"] == 0:
            # Log BEFORE ckpt: resume truncates a log that ran ahead of the
            # ckpt (preload n=step), but a log left behind one (kill between
            # the two writes) would hole the merged history permanently.
            logger.save(log_path)
            p = ckpt_lib.save(log_path, global_step, state)
            log_print(f"Saved checkpoints at {p}")
        if global_step % config["i_image"] == 0:
            frame = render_eval_image(config, coarse_model, fine_model,
                                      state, width, height, focal,
                                      jax.random.fold_in(k, 3))
            image_io.imwrite(
                os.path.join(log_path, f"{global_step:06d}.png"), frame)

    profiler.stop()
    # final flush is a device sync — keep the watchdog armed through it
    logger.save(log_path)
    watchdog.stop()
    return {"state": state, "log": logger.data, "models":
            (coarse_model, fine_model), "geometry":
            (width, height, focal)}


def render_eval_image(config, coarse_model, fine_model, state, width, height,
                      focal, key, pose=None):
    """Periodic eval render from the fixed pose (4, 0, 0)
    (ref: nerf/train_nerf.py:191-201)."""
    params = state["params"]
    coarse_fn = jax.tree_util.Partial(coarse_model.apply, params["coarse"])
    fine_fn = (jax.tree_util.Partial(fine_model.apply, params["fine"])
               if config["use_fine_model"] else coarse_fn)
    if pose is None:
        pose = ray_ops.camera_pose_deg(4.0, 0.0, 0.0)
    rgb, _, _ = render_image(
        key, width, height, focal, pose,
        config["render_near"], config["render_far"], coarse_fn, fine_fn,
        config["render_coarse_sample_num"], config["render_fine_sample_num"])
    return np.asarray(rgb)


def main(argv=None):
    config = common.parse_cli(argv if argv is not None else sys.argv[1:],
                              NERF_TRAIN_DEFAULTS)
    train(config)


if __name__ == "__main__":
    main()
