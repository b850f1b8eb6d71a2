"""SIREN image fitting: f(x, y) -> intensity on a single grayscale image.

TPU re-design of siren/train_img.py.  The whole dataset (a few hundred
thousand (x, y, v) rows) lives on device; each jitted step dynamic-slices its
batch out of the buffer, so the hot loop never touches the host.  PSNR/loss
history is kept for log.npy parity; periodic full-grid renders and
step-stamped checkpoints match the reference cadence.

Run: python -m msra_practice_project_tpu.train.train_img configs/siren/siren_img.json
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
from ..core import diagnostics
from ..core import image_io
from ..core.config import SIREN_IMG_DEFAULTS, log_dir, save_config
from ..core.logging import MetricLogger, log_print
from ..data import image as image_data
from ..models.siren_mlp import img_model
from . import common

DEFAULT_IMAGE = "./data/image/cameraman.jpg"


def _step_impl(state, buffer, batch_start, apply_fn, tx, batch_size,
               batch_spec=None):
    batch = jax.lax.dynamic_slice_in_dim(buffer, batch_start, batch_size)
    # DP: the buffer is row-sharded over the 'data' mesh axis; a traced
    # slice start keeps GSPMD from proving shard alignment, so without a
    # constraint it would all-gather AND compute replicated.  Pinning the
    # slice back to the batch sharding keeps the MLP work sharded (grads
    # psum automatically); contents are placement-independent, so
    # DP == single-device exactly (tests/test_train.py).
    if batch_spec is not None:
        batch = jax.lax.with_sharding_constraint(batch, batch_spec)
    pos, target = batch[:, :2], batch[:, 2:]

    def loss_fn(params):
        pred = apply_fn(params, pos)
        return jnp.mean((pred - target) ** 2)

    loss, grads = jax.value_and_grad(loss_fn)(state["params"])
    updates, opt_state = tx.update(grads, state["opt_state"], state["params"])
    new_state = {
        "params": optax.apply_updates(state["params"], updates),
        "opt_state": opt_state,
        "step": state["step"] + 1,
    }
    psnr = -10.0 * jnp.log10(loss)
    return new_state, {"loss": loss, "psnr": psnr}


@partial(jax.jit,
         static_argnames=("apply_fn", "tx", "batch_size", "batch_spec"))
def _train_step(state, buffer, batch_start, *, apply_fn, tx, batch_size,
                batch_spec=None):
    return _step_impl(state, buffer, batch_start, apply_fn, tx, batch_size,
                      batch_spec)


@partial(jax.jit,
         static_argnames=("apply_fn", "tx", "batch_size", "batch_spec"))
def _train_multistep(state, buffer, batch_starts, *, apply_fn, tx,
                     batch_size, batch_spec=None):
    """K steps in ONE dispatch (lax.scan over slice starts) — amortises the
    ~1.2 ms/dispatch tunnel cost the same way train_nerf's multi-step does.
    The whole dataset is device-resident, so the host contributes nothing
    per step."""
    def body(st, start):
        return _step_impl(st, buffer, start, apply_fn, tx, batch_size,
                          batch_spec)

    return jax.lax.scan(body, state, batch_starts)


@partial(jax.jit, static_argnames=("apply_fn", "width", "height"))
def render_grid(params, *, apply_fn, width: int, height: int):
    """Full-grid eval -> [H, W] image (ref: siren/utils_img.py:6-16)."""
    xs, ys = jnp.meshgrid(jnp.linspace(-1, 1, width),
                          jnp.linspace(-1, 1, height))
    pos = jnp.stack([xs.reshape(-1), ys.reshape(-1)], axis=1)
    out = apply_fn(params, pos)
    return out.reshape(height, width)


def train(config) -> dict:
    log_path = log_dir(config)
    os.makedirs(log_path, exist_ok=True)
    save_config(config, log_path)
    diagnostics.enable_from_config(config)
    profiler = diagnostics.StepProfiler(log_path,
                                        config.get("profile_steps", 0))
    watchdog = diagnostics.watchdog_from_config(config, log_path)

    # Data: reference hardcodes ./data/image/cameraman.jpg
    # (siren/train_img.py:32); we honour an optional data_path key and fall
    # back to a synthetic band-limited image when neither exists.
    data_path = config.get("data_path", DEFAULT_IMAGE)
    if os.path.exists(data_path):
        img = image_data.load_image_grayscale(data_path)
    else:
        log_print(f"[data] {data_path} not found - using synthetic image")
        img = image_data.make_synthetic_image(config.get("data_size", 256))
    height, width = img.shape[:2]
    buffer = jnp.asarray(image_data.image_to_coords(img, shuffle=True))
    n = buffer.shape[0]
    batch_size = min(config.batch_size, n)

    model = img_model(config.model_type)
    params = model.init(jax.random.PRNGKey(config.get("seed", 0)))
    tx = common.adam(config.learning_rate)
    state = common.init_state(params, tx)
    global_step, state = common.resume(log_path, state)

    # Data parallelism (same recipe as train_nerf): coordinate buffer rows
    # shard over the 'data' mesh axis, params/opt state replicate, grads
    # psum over ICI.  The reference siren scripts are single-GPU; at the
    # reference batch of 65,536 rows the step is embarrassingly data
    # parallel, so the mesh path comes for free here.
    devices = jax.devices()
    use_dp = (len(devices) > 1 and batch_size % len(devices) == 0
              and n % len(devices) == 0)
    batch_spec = None
    if use_dp:
        from ..parallel import mesh as mesh_dp
        dp_mesh = mesh_dp.make_mesh()
        state = mesh_dp.replicate(state, dp_mesh)
        buffer = mesh_dp.shard_batch(buffer, dp_mesh)
        batch_spec = mesh_dp.batch_sharding(dp_mesh)
        log_print(f"[parallel] data-parallel over {len(devices)} devices; "
                  f"coordinate buffer sharded")

    logger = MetricLogger(["loss", "psnr"])
    log_file = os.path.join(log_path, "log.npy")
    if global_step and os.path.exists(log_file):
        # merged log must span the WHOLE run across supervised restarts
        logger.preload(MetricLogger.load(log_file), global_step)
    apply_fn = jax.tree_util.Partial(model.apply)

    batch_idx = 0
    epoch_idx = 0
    batch_num = max(n // batch_size, 1)
    steps_per_call = int(config.get("steps_per_call", 8))
    iterations = config.iterations

    def dist_to(step, every):
        return every - (step % every)

    while global_step < iterations:
        profiler.tick(global_step + 1)
        watchdog.beat(f"step {global_step}")
        n_chunk = min(
            steps_per_call, iterations - global_step,
            dist_to(global_step, config.i_print),
            dist_to(global_step, config.i_save),
            dist_to(global_step, config.i_image),
        )
        if n_chunk > 1:
            starts = jnp.asarray(
                [((batch_idx + i) % batch_num) * batch_size
                 for i in range(n_chunk)], jnp.int32)
            state, ms = _train_multistep(
                state, buffer, starts,
                apply_fn=apply_fn, tx=tx, batch_size=batch_size,
                batch_spec=batch_spec)
            logger.append_vec(loss=ms["loss"], psnr=ms["psnr"])
            m = {key_: v[-1] for key_, v in ms.items()}
        else:
            state, m = _train_step(
                state, buffer, batch_idx * batch_size,
                apply_fn=apply_fn, tx=tx, batch_size=batch_size,
                batch_spec=batch_spec)
            logger.append(loss=m["loss"], psnr=m["psnr"])
        batch_idx += n_chunk
        epoch_idx += batch_idx // batch_num
        batch_idx %= batch_num
        global_step += n_chunk

        if global_step % config.i_print == 0:
            log_print(f"[Train] Iter: {global_step}({epoch_idx}-{batch_idx}) "
                      f"Loss: {float(m['loss'])} PSNR: {float(m['psnr'])}")
        if global_step % config.i_image == 0:
            frame = render_grid(state["params"], apply_fn=apply_fn,
                                width=width, height=height)
            image_io.imwrite(
                os.path.join(log_path, f"{global_step:06d}.png"),
                np.asarray(frame))
        if global_step % config.i_save == 0:
            # Log BEFORE ckpt: resume truncates a log that ran ahead of the
            # ckpt, but one left behind (kill between the writes) would
            # hole the merged history permanently.
            logger.save(log_path)
            path = ckpt_lib.save(log_path, global_step, state)
            log_print(f"Saved checkpoints at {path}")

    profiler.stop()
    # final flush is a device sync — keep the watchdog armed through it
    logger.save(log_path)
    watchdog.stop()
    return {"state": state, "log": logger.data, "model": model,
            "image": img, "width": width, "height": height}


def main(argv=None):
    config = common.parse_cli(argv if argv is not None else sys.argv[1:],
                              SIREN_IMG_DEFAULTS)
    train(config)


if __name__ == "__main__":
    main()
