"""SIREN SDF fitting from an oriented point cloud + mesh extraction.

TPU re-design of siren/train_sdf.py + siren/utils_sdf.py.  The reference's
double-autograd hot spot (torch.autograd.grad with create_graph,
siren/train_sdf.py:73-76) becomes a plain `jax.grad`-inside-`jax.grad`
composition: input gradients for the eikonal/normal terms are one extra
backward through the (independent-rows) MLP, and the outer parameter grad
differentiates straight through it.

Loss (ref: siren/utils_sdf.py:14-21):
  3e3 * mean(f_on^2) + 1e2 * mean(exp(-100 |f_off|))
  + 5e1 * mean((||grad f|| - 1)^2)  [on+off concat]
  + 1e2 * mean(1 - cos(grad f_on, normal))

Run: python -m msra_practice_project_tpu.train.train_sdf configs/siren/siren_sdf_1.json
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
from ..core import mesh as mesh_lib
from ..core.config import SIREN_SDF_DEFAULTS, log_dir, save_config
from ..core.logging import MetricLogger, log_print
from ..data.pointcloud import load_point_cloud, make_synthetic_sphere_cloud
from ..models.siren_mlp import sdf_model
from . import common

LOSS_WEIGHTS = (3e3, 1e2, 5e1, 1e2)


def sdf_loss(apply_fn, params, on_point, on_norm, off_point):
    """The 4-term SIREN SDF loss with input-gradient terms."""
    def f_sum(pts):
        return apply_fn(params, pts).sum()

    on_pred = apply_fn(params, on_point)
    off_pred = apply_fn(params, off_point)
    # Row-independent outputs => grad of the sum gives per-point input grads.
    on_grad = jax.grad(f_sum)(on_point)
    off_grad = jax.grad(f_sum)(off_point)

    on_loss = jnp.mean(on_pred**2)
    off_loss = jnp.mean(jnp.exp(-1e2 * jnp.abs(off_pred)))
    all_grad = jnp.concatenate([on_grad, off_grad], axis=0)
    grad_loss = jnp.mean((jnp.linalg.norm(all_grad, axis=-1) - 1.0) ** 2)
    cos = jnp.sum(on_grad * on_norm, -1) / (
        jnp.linalg.norm(on_grad, axis=-1) * jnp.linalg.norm(on_norm, axis=-1)
        + 1e-9)
    normal_loss = jnp.mean(1.0 - cos)
    k = LOSS_WEIGHTS
    return (k[0] * on_loss + k[1] * off_loss + k[2] * grad_loss
            + k[3] * normal_loss)


def _step_impl(state, cloud, batch_start, key, apply_fn, tx, batch_size,
               batch_spec=None):
    batch = jax.lax.dynamic_slice_in_dim(cloud, batch_start, batch_size)
    # DP: the cloud is row-sharded; constrain the traced-start slice (and
    # the same-shape off-surface sample) back to the batch sharding so the
    # double-autograd MLP work shards instead of all-gathering + running
    # replicated.  Values are placement-independent (same RNG bits), so
    # DP == single-device exactly (tests/test_train.py).
    if batch_spec is not None:
        batch = jax.lax.with_sharding_constraint(batch, batch_spec)
    on_point, on_norm = batch[:, :3], batch[:, 3:]
    off_point = jax.random.uniform(key, (batch_size, 3), minval=-1.0,
                                   maxval=1.0)
    if batch_spec is not None:
        off_point = jax.lax.with_sharding_constraint(off_point, batch_spec)

    loss, grads = jax.value_and_grad(
        lambda p: sdf_loss(apply_fn, p, on_point, on_norm, off_point)
    )(state["params"])
    updates, opt_state = tx.update(grads, state["opt_state"], state["params"])
    return {
        "params": optax.apply_updates(state["params"], updates),
        "opt_state": opt_state,
        "step": state["step"] + 1,
    }, {"loss": loss}


@partial(jax.jit,
         static_argnames=("apply_fn", "tx", "batch_size", "batch_spec"))
def _train_step(state, cloud, batch_start, key, *, apply_fn, tx, batch_size,
                batch_spec=None):
    return _step_impl(state, cloud, batch_start, key, apply_fn, tx,
                      batch_size, batch_spec)


@partial(jax.jit,
         static_argnames=("apply_fn", "tx", "batch_size", "batch_spec"))
def _train_multistep(state, cloud, batch_starts, keys, *, apply_fn, tx,
                     batch_size, batch_spec=None):
    """K steps in ONE dispatch (lax.scan) — amortises the ~1.2 ms/dispatch
    tunnel cost; identical math to K _train_step calls (same slice starts and
    per-step off-surface RNG keys)."""
    def body(st, sk):
        start, key = sk
        return _step_impl(st, cloud, start, key, apply_fn, tx, batch_size,
                          batch_spec)

    return jax.lax.scan(body, state, (batch_starts, keys))


@partial(jax.jit, static_argnames=("apply_fn", "n", "bound"))
def _sdf_slice(params, xi_coord, *, apply_fn, n: int, bound: float = 1.0):
    """Evaluate one x-slice of the N^3 grid: [n, n] SDF values."""
    grid = jnp.linspace(-bound, bound, n)
    yy, zz = jnp.meshgrid(grid, grid, indexing="ij")
    pts = jnp.stack([jnp.full_like(yy, xi_coord), yy, zz], axis=-1)
    return apply_fn(params, pts.reshape(-1, 3)).reshape(n, n)


def create_mesh(apply_fn, params, filename: str, n: int = 256,
                level: float = 0.0, bound: float = 1.0, watchdog=None):
    """Dense-grid eval (slice-by-slice on device) -> marching tetrahedra ->
    PLY (ref: siren/utils_sdf.py:25-83).

    `watchdog` (optional core.diagnostics.Watchdog): beaten per device
    slice — a wedged dispatch still trips it — then PAUSED for the
    host-side marching pass, which can legitimately exceed the heartbeat
    timeout on large grids (a fire there would restart-loop the run
    deterministically at the same i_mesh step)."""
    xs = np.linspace(-bound, bound, n)
    values = np.empty((n, n, n), np.float32)
    for i, x in enumerate(xs):
        if watchdog is not None:
            watchdog.beat(f"mesh slice {i}/{n}")
        values[i] = np.asarray(_sdf_slice(params, jnp.float32(x),
                                          apply_fn=apply_fn, n=n,
                                          bound=bound))
    voxel_size = 2.0 * bound / (n - 1)
    if watchdog is not None:
        watchdog.pause()
    try:
        verts, faces = mesh_lib.extract_mesh_from_grid(
            values, level, (-bound,) * 3, voxel_size, filename + ".ply")
    finally:
        if watchdog is not None:
            watchdog.resume()
    return values, verts, faces


def train(config) -> dict:
    log_path = log_dir(config)
    os.makedirs(log_path, exist_ok=True)
    save_config(config, log_path)
    diagnostics.enable_from_config(config)
    profiler = diagnostics.StepProfiler(log_path,
                                        config.get("profile_steps", 0))
    watchdog = diagnostics.watchdog_from_config(config, log_path)

    data_path = config.get("data_path", "")
    if data_path and os.path.exists(data_path):
        cloud_np = load_point_cloud(data_path)
    else:
        log_print(f"[data] {data_path!r} not found - using synthetic sphere "
                  "point cloud")
        cloud_np = make_synthetic_sphere_cloud(
            config.get("data_points", 100000))
    cloud = jnp.asarray(cloud_np)
    n = cloud.shape[0]
    batch_size = min(config.batch_size, n)

    model = sdf_model(config.model_type)
    params = model.init(jax.random.PRNGKey(config.get("seed", 0)))
    tx = common.adam(config.learning_rate)
    state = common.init_state(params, tx)
    global_step, state = common.resume(log_path, state)

    apply_fn = jax.tree_util.Partial(model.apply)
    logger = MetricLogger(["loss"])
    log_file = os.path.join(log_path, "log.npy")
    if global_step and os.path.exists(log_file):
        # merged log must span the WHOLE run across supervised restarts
        logger.preload(MetricLogger.load(log_file), global_step)
    root_key = jax.random.PRNGKey(config.get("seed", 0) + 1)

    # Initial + per-epoch reshuffle of the on-surface cloud — the intended
    # behaviour of siren/train_sdf.py:70-71 (whose reshuffle result is
    # assigned to a dead variable), mirroring the NeRF fix.
    shuffle_key = jax.random.PRNGKey(config.get("seed", 0) + 2)
    cloud = jax.random.permutation(jax.random.fold_in(shuffle_key, 0),
                                   cloud, axis=0)

    # Data parallelism (same recipe as train_nerf): cloud rows shard over
    # the 'data' mesh axis, params/opt state replicate, grads psum over ICI.
    # The reference siren scripts are single-GPU; the 65,536-point SDF batch
    # with grad-in-grad is the heaviest SIREN step and shards cleanly.
    devices = jax.devices()
    use_dp = (len(devices) > 1 and batch_size % len(devices) == 0
              and n % len(devices) == 0)
    batch_spec = None
    if use_dp:
        from ..parallel import mesh as mesh_dp
        dp_mesh = mesh_dp.make_mesh()
        state = mesh_dp.replicate(state, dp_mesh)
        cloud = mesh_dp.shard_batch(cloud, dp_mesh)
        batch_spec = mesh_dp.batch_sharding(dp_mesh)
        log_print(f"[parallel] data-parallel over {len(devices)} devices; "
                  f"point cloud sharded")

    batch_idx, epoch_idx = 0, 0
    batch_num = max(n // batch_size, 1)
    i_mesh = config.get("i_mesh", 1000)
    mesh_n = config.get("mesh_n", 128)
    steps_per_call = int(config.get("steps_per_call", 8))
    iterations = config.iterations

    def dist_to(step, every):
        return every - (step % every)

    while global_step < iterations:
        profiler.tick(global_step + 1)
        watchdog.beat(f"step {global_step}")
        # Chunks never cross cadence or epoch-reshuffle boundaries, so
        # prints, meshes, saves and reshuffles land on the exact same steps.
        n_chunk = min(
            steps_per_call, iterations - global_step,
            batch_num - batch_idx,
            dist_to(global_step, config.i_print),
            dist_to(global_step, i_mesh),
            dist_to(global_step, config.i_save),
        )
        if n_chunk > 1:
            starts = jnp.asarray(
                [(batch_idx + i) * batch_size for i in range(n_chunk)],
                jnp.int32)
            keys = jnp.stack(
                [jax.random.fold_in(root_key, global_step + 1 + i)
                 for i in range(n_chunk)])
            state, ms = _train_multistep(
                state, cloud, starts, keys,
                apply_fn=apply_fn, tx=tx, batch_size=batch_size,
                batch_spec=batch_spec)
            logger.append_vec(loss=ms["loss"])
            m = {"loss": ms["loss"][-1]}
        else:
            state, m = _train_step(
                state, cloud, batch_idx * batch_size,
                jax.random.fold_in(root_key, global_step + 1),
                apply_fn=apply_fn, tx=tx, batch_size=batch_size,
                batch_spec=batch_spec)
            logger.append(loss=m["loss"])
        batch_idx += n_chunk
        global_step += n_chunk
        if (batch_idx + 1) * batch_size > n:
            batch_idx = 0
            epoch_idx += 1
            cloud = jax.random.permutation(
                jax.random.fold_in(shuffle_key, epoch_idx), cloud, axis=0)
            if use_dp:  # keep the permuted cloud row-sharded over chips
                cloud = mesh_dp.shard_batch(cloud, dp_mesh)

        if global_step % config.i_print == 0:
            log_print(f"[Train] Iter: {global_step}({epoch_idx}-{batch_idx}) "
                      f"Loss: {float(m['loss'])}")
        if global_step % i_mesh == 0:
            create_mesh(apply_fn, state["params"],
                        os.path.join(log_path, f"{global_step:06d}"),
                        n=mesh_n, watchdog=watchdog)
        if global_step % config.i_save == 0:
            # Log BEFORE ckpt: resume truncates a log that ran ahead of the
            # ckpt, but one left behind (kill between the writes) would
            # hole the merged history permanently.
            logger.save(log_path)
            path = ckpt_lib.save(log_path, global_step, state)
            log_print(f"Saved checkpoints at {path}")

    profiler.stop()
    logger.save(log_path)  # final flush is a device sync — watchdog armed
    # Final high-res mesh (ref: siren/train_sdf.py:101, N=512): the ~N
    # device slice dispatches stay watchdog-guarded (per-slice beats); only
    # the host-side marching pass, which can legitimately exceed the
    # heartbeat, is paused inside create_mesh.
    create_mesh(apply_fn, state["params"], os.path.join(log_path, "test"),
                n=config.get("final_mesh_n", 512), watchdog=watchdog)
    watchdog.stop()
    return {"state": state, "log": logger.data, "model": model}


def main(argv=None):
    config = common.parse_cli(argv if argv is not None else sys.argv[1:],
                              SIREN_SDF_DEFAULTS)
    train(config)


if __name__ == "__main__":
    main()
