"""GAN-dynamics probe: does the trained D's boundary carry SHAPE signal?

Context: the r5 bisect proved the generator can represent bigface heads
through the flagship geometry (runs/bisect_r5), yet every adversarial run
— including the kitchen-sink r5c retry (instance-noise floor, dlr/4,
DiffAugment, non-saturating G loss) — stalls at structureless colour
fields: G matches colour statistics (hist/rf-Fréchet improve) but never
forms a blob or flattens the corners to the dataset background.

Two remaining hypotheses, distinguished by this probe for ~3 min of chip:

  (L) LOOP: D's decision boundary DOES point toward heads, but the
      two-player loop never lets G accumulate the change (D re-adapts
      faster than G moves).  Evidence: G trained against the FROZEN final
      D grows head structure (center-corner contrast up, corner-background
      error down).  Remedy: pacing — multiple G steps per D step, slower D.
  (B) BOUNDARY: D separates real/fake via features that carry no layout
      information (speckle/texture statistics); its pixel gradient dD/dx
      is structure-free noise, so no pacing fix can ever work.  Evidence:
      G fools the frozen D (fake_label drops) WITHOUT forming structure;
      saliency maps show unstructured dD/dx.  Remedy: force D to see
      layout first — e.g. an annealed blur on both real and fake inputs
      (low-frequency curriculum), so early dD/dx can only encode layout.

Outputs (runs/probe_dynamics/):
  saliency.png  — rows: fake, dD/dx on fake, real, dD/dx on real
                  (per-image normalised |grad| summed over RGB)
  frozen_d.png  — G samples before/after the frozen-D fit
  stdout        — per-module G-grad norms + metric trajectories

Run: python tools/probe_dynamics.py [exp_dir] [steps] [lr]   (TPU)

Reference counterpart of the dynamics being probed: pi_GAN/train.py:100-136
(alternating D/G Adam steps); the probe isolates the G half against a
frozen D, which the reference never does — this is a diagnostic, not a
training mode.
"""

from __future__ import annotations

import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from msra_practice_project_tpu.core import image_io
from msra_practice_project_tpu.core.artifacts import run_dir
from msra_practice_project_tpu.data.image_folder import ImageFolder
from msra_practice_project_tpu.eval.pigan_demo import load_generator
from msra_practice_project_tpu.train import common
from tools.mine_flagship import corner_background_error
from tools.validate_pigan import center_corner_contrast, lowfreq_spatial_std

RES = 64
BATCH = 16


def tree_grad_norms(grads, prefix=""):
    """Flatten a grad pytree into {dotted.path: l2-norm} at depth <= 2."""
    out = {}
    if isinstance(grads, dict):
        for k, v in grads.items():
            out.update(tree_grad_norms(v, f"{prefix}{k}."))
    elif isinstance(grads, (list, tuple)):
        leaves = jax.tree.leaves(grads)
        sq = sum(float(jnp.sum(g * g)) for g in leaves)
        out[prefix.rstrip(".")] = float(np.sqrt(sq))
    else:
        out[prefix.rstrip(".")] = float(jnp.linalg.norm(grads.ravel()))
    return out


def _viz_grad(g):
    """|grad| summed over channels, per-image robust-normalised to [0,1]."""
    a = np.abs(np.asarray(g)).sum(axis=1)  # NCHW -> NHW
    lo = np.percentile(a, 2, axis=(1, 2), keepdims=True)
    hi = np.percentile(a, 98, axis=(1, 2), keepdims=True)
    a = np.clip((a - lo) / np.maximum(hi - lo, 1e-12), 0, 1)
    return np.repeat(a[..., None], 3, axis=-1)  # NHW3 grayscale


def main(exp: str, steps: int = 2000, lr: float = 5e-5):
    out_dir = run_dir("probe_dynamics")
    os.makedirs(out_dir, exist_ok=True)
    config = json.load(open(os.path.join(exp, "config.json")))
    config["output_path"] = os.path.dirname(os.path.abspath(exp))
    config["experiment_name"] = os.path.basename(exp.rstrip("/"))

    generator, disc, state, step0 = load_generator(config)
    g_params = state["g"]["params"]
    d_params = state["d"]["params"]
    print(f"[probe] loaded ckpt step {step0} from {exp}")

    ds = ImageFolder(os.path.join(exp, "_synthetic_faces"), BATCH,
                     resize=RES / 64.0)
    _, _, real = ds.get()
    real_nchw = jnp.transpose(jnp.asarray(real), (0, 3, 1, 2))
    real_np = np.asarray(real)
    bg = float(np.median(np.concatenate([real_np[:, :8, :8, :].ravel(),
                                         real_np[:, :8, -8:, :].ravel()])))
    cc_real = center_corner_contrast(real_np)
    cbe_real = corner_background_error(real_np, bg)
    lf_real = lowfreq_spatial_std(real_np)
    print(f"[probe] real: cc {cc_real:.4f} corner-bg-err {cbe_real:.4f} "
          f"lowfreq {lf_real:.4f} (bg {bg:.3f})")

    key = jax.random.PRNGKey(123)
    z = jax.random.normal(key, (BATCH, config["z_dim"]))

    g_apply = generator.apply
    d_apply = disc.apply

    # ---- 1. saliency: dD/dx on fakes and reals under the final D --------
    fake = g_apply(g_params, jax.random.fold_in(key, 1), z, RES)  # NCHW

    def d_mean(x):
        return jnp.mean(d_apply(d_params, x, RES, -1.0))

    grad_fake = jax.grad(d_mean)(fake)
    grad_real = jax.grad(d_mean)(real_nchw)
    fk = np.asarray(jnp.transpose(fake, (0, 2, 3, 1)))
    rows = [np.concatenate(list(a), axis=1) for a in
            (fk, _viz_grad(grad_fake), real_np, _viz_grad(grad_real))]
    image_io.imwrite(os.path.join(out_dir, "saliency.png"),
                     np.concatenate(rows, axis=0))
    print(f"[probe] saliency grid -> {out_dir}/saliency.png "
          f"(rows: fake, |dD/dx| fake, real, |dD/dx| real)")

    # ---- 2. per-module G gradient norms under the GAN loss --------------
    def g_loss_fn(gp, k, nonsat):
        img = g_apply(gp, k, z, RES)
        lbl = d_apply(d_params, img, RES, -1.0)
        return jnp.mean(jax.nn.softplus(lbl) if nonsat
                        else -jax.nn.softplus(-lbl))

    for nonsat in (False, True):
        grads = jax.grad(lambda p: g_loss_fn(p, jax.random.fold_in(key, 2),
                                             nonsat))(g_params)
        norms = tree_grad_norms(grads)
        tag = "nonsat" if nonsat else "saturating"
        print(f"[probe] G grad norms ({tag}): " +
              "  ".join(f"{k}={v:.3e}" for k, v in sorted(norms.items())))

    # ---- 3. frozen-D G-only training -------------------------------------
    tx = common.adam(lr, betas=(0.0, 0.9))
    g_state = common.init_state(g_params, tx)

    def loss_fn(gp, k):
        kz, kp = jax.random.split(k)
        zz = jax.random.normal(kz, (BATCH, config["z_dim"]))
        img = g_apply(gp, kp, zz, RES)
        lbl = d_apply(d_params, img, RES, -1.0)
        return jnp.mean(jax.nn.softplus(lbl)), jnp.mean(lbl)

    @jax.jit
    def g_step(st, k):
        (loss, lbl), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            st["params"], k)
        updates, opt_state = tx.update(grads, st["opt_state"], st["params"])
        return ({"params": optax.apply_updates(st["params"], updates),
                 "opt_state": opt_state, "step": st["step"] + 1},
                (loss, lbl))

    @partial(jax.jit, static_argnums=(2,))
    def multi(st, base_key, n):
        def body(s, i):
            return g_step(s, jax.random.fold_in(base_key, i))
        return jax.lax.scan(body, st, jnp.arange(n))

    k_eval = jax.random.fold_in(key, 9)
    theta, phi = generator.sample_poses(jax.random.fold_in(key, 10), BATCH)

    def sample_metrics(gp):
        film = generator.get_mapping(gp, z)
        img = np.asarray(generator.render_film(gp, k_eval, film, theta, phi,
                                               resolution=RES))
        lbl = float(jnp.mean(d_apply(
            d_params, jnp.transpose(jnp.asarray(img), (0, 3, 1, 2)),
            RES, -1.0)))
        return img, {"cc": center_corner_contrast(img) / cc_real,
                     "cbe": corner_background_error(img, bg),
                     "lf": lowfreq_spatial_std(img) / lf_real,
                     "fake_label": lbl}

    img0, m0 = sample_metrics(g_state["params"])
    print(f"[probe] frozen-D fit start: cc {m0['cc']:.2f} of real, "
          f"corner-bg-err {m0['cbe']:.3f} (real {cbe_real:.3f}), "
          f"lowfreq {m0['lf']:.2f}, fake_label {m0['fake_label']:.2f}")
    t0 = time.perf_counter()
    done, chunk = 0, 250
    while done < steps:
        n = min(chunk, steps - done)
        g_state, (losses, lbls) = multi(g_state, jax.random.fold_in(key, done),
                                        n)
        done += n
        _, m = sample_metrics(g_state["params"])
        print(f"[probe] it {done}: g_loss {float(np.asarray(losses)[-1]):.3f}"
              f" train-lbl {float(np.asarray(lbls)[-1]):.2f} | eval cc "
              f"{m['cc']:.2f} cbe {m['cbe']:.3f} lf {m['lf']:.2f} "
              f"fake_label {m['fake_label']:.2f} "
              f"({time.perf_counter() - t0:.0f}s)")
    img1, m1 = sample_metrics(g_state["params"])
    grid = np.concatenate([np.concatenate(list(img0), axis=1),
                           np.concatenate(list(img1), axis=1),
                           np.concatenate(list(real_np), axis=1)], axis=0)
    image_io.imwrite(os.path.join(out_dir, "frozen_d.png"), grid)
    print(f"[probe] frozen-D grid -> {out_dir}/frozen_d.png "
          "(rows: before, after, real)")

    fooled = m1["fake_label"] < 0.0
    structured = m1["cc"] > 2 * m0["cc"] and m1["cbe"] < 0.75 * m0["cbe"]
    if structured:
        verdict = ("LOOP: frozen-D gradient DOES build structure -> pace "
                   "the two-player game (more G steps / slower D)")
    elif fooled:
        verdict = ("BOUNDARY: G fooled the frozen D with NO structure -> "
                   "D's boundary carries no layout signal; force a "
                   "low-frequency curriculum (annealed blur before D)")
    else:
        verdict = ("NEITHER: G could not even fool a FROZEN D at this lr/"
                   "steps — suspect G-side conditioning (lr, film scale)")
    print(f"[probe] VERDICT: {verdict}")
    return m0, m1


if __name__ == "__main__":
    exp = sys.argv[1] if len(sys.argv) > 1 else \
        "runs/pigan_validate/exp_r5c_nonsat"
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 2000
    lr = float(sys.argv[3]) if len(sys.argv) > 3 else 5e-5
    main(exp, steps, lr)
