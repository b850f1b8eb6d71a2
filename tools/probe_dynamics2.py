"""Dynamics probe, part 2: WHAT does the unfoolable D actually read?

probe_dynamics.py established (r5c ckpt, 10k, kitchen-sink knobs):
  * D's saliency on real images outlines heads/eyes (layout signal exists);
  * G CANNOT fool the FROZEN final D (fake_label pinned ~3.1 over 2000
    nonsat steps at lr 5e-5, while G's params move substantially).

An ordinary CNN classifier is trivially foolable by unconstrained pixel
ascent; a generator confined to (a) its render manifold and (b) the
EXPECTATION over stochastic render keys (pose + stratified-sampling
jitter, fresh every step) may not be.  The fakes carry visible white
speckle = rays whose jittered samples missed the density, compositing to
the white background (reference parity: pi_GAN/render.py:146 white
composite, :176-178 always-jittered stratified sampling).  If D keys on
that noise's statistics, the per-step parameter gradient of the noise is
itself noise — it averages to nothing, G stalls forever, D stays ahead:
exactly the observed stalled equilibrium.

Micro-tests (seconds each on the chip):
  1. NOISE-FEATURE TEST: D's score on (i) a single render, (ii) the same
     params averaged over K render keys, (iii) a 4x-sample-count render.
     Score dropping a lot for (ii)/(iii) => render noise IS a major D
     feature, and more samples is a direct remedy.
  2. PIXEL-SPACE ADVERSARIAL FIT: Adam on free pixels from a fake start.
     Label crashing => D is an ordinary foolable CNN; the wall is the
     render manifold/stochasticity, not D robustness.
  3. HIGHER-LR G FIT: 2000 steps at lr 3e-4 (vs 5e-5) — separates "too
     few effective steps" from a genuine wall.

Run: python tools/probe_dynamics2.py [exp_dir] [g_steps] (TPU, ~5 min)
"""

from __future__ import annotations

import json
import os
import sys
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
from tools.validate_pigan import center_corner_contrast

RES = 64
BATCH = 16


def main(exp: str, g_steps: int = 2000):
    out_dir = run_dir("probe_dynamics")
    os.makedirs(out_dir, exist_ok=True)
    config = json.load(open(os.path.join(exp, "config.json")))
    config["output_path"] = os.path.dirname(os.path.abspath(exp))
    config["experiment_name"] = os.path.basename(exp.rstrip("/"))
    generator, disc, state, step0 = load_generator(config)
    g_params = state["g"]["params"]
    d_params = state["d"]["params"]
    print(f"[probe2] ckpt step {step0} from {exp}")

    ds = ImageFolder(os.path.join(exp, "_synthetic_faces"), BATCH,
                     resize=RES / 64.0)
    _, _, real = ds.get()
    real_np = np.asarray(real)
    real_nchw = jnp.transpose(jnp.asarray(real), (0, 3, 1, 2))
    bg = float(np.median(np.concatenate([real_np[:, :8, :8, :].ravel(),
                                         real_np[:, :8, -8:, :].ravel()])))
    cc_real = center_corner_contrast(real_np)

    key = jax.random.PRNGKey(123)
    z = jax.random.normal(key, (BATCH, config["z_dim"]))
    theta, phi = generator.sample_poses(jax.random.fold_in(key, 10), BATCH)
    film = generator.get_mapping(g_params, z)

    def d_score(img_nhwc):
        x = jnp.transpose(jnp.asarray(img_nhwc), (0, 3, 1, 2))
        return float(jnp.mean(disc.apply(d_params, x, RES, -1.0)))

    def render(gp, k, coarse=None, fine=None):
        return generator.render_film(
            gp, k, generator.get_mapping(gp, z), theta, phi, resolution=RES,
            coarse_samples=coarse or generator.cfg.coarse_samples,
            fine_samples=fine or generator.cfg.fine_samples)

    # ---- 1. noise-feature test ------------------------------------------
    singles = [render(g_params, jax.random.fold_in(key, i)) for i in range(8)]
    lbl_single = [d_score(s) for s in singles]
    avg = jnp.mean(jnp.stack(singles), axis=0)
    lbl_avg = d_score(avg)
    hi = render(g_params, jax.random.fold_in(key, 0), coarse=32, fine=64)
    lbl_hi = d_score(hi)
    noise_mag = float(jnp.mean(jnp.abs(singles[0] - singles[1])))
    print(f"[probe2] NOISE TEST: single-render labels "
          f"{[round(l, 2) for l in lbl_single]} (mean "
          f"{np.mean(lbl_single):.2f})")
    print(f"[probe2]   8-key averaged render label: {lbl_avg:.2f}")
    print(f"[probe2]   4x samples (32+64) label:    {lbl_hi:.2f}")
    print(f"[probe2]   mean |render_a - render_b| (key-to-key noise): "
          f"{noise_mag:.4f}")
    print(f"[probe2]   real batch label:            {d_score(real_np):.2f}")
    image_io.imwrite(
        os.path.join(out_dir, "noise_test.png"),
        np.concatenate([
            np.concatenate(np.asarray(singles[0]), axis=1),
            np.concatenate(np.asarray(avg), axis=1),
            np.concatenate(np.asarray(hi), axis=1)], axis=0))

    # ---- 2. pixel-space adversarial fit ----------------------------------
    x0 = jnp.transpose(singles[0], (0, 3, 1, 2))

    def pix_loss(x):
        return jnp.mean(jax.nn.softplus(disc.apply(d_params, x, RES, -1.0)))

    tx = optax.adam(1e-2)
    opt = tx.init(x0)
    x = x0

    @jax.jit
    def pix_step(x, opt):
        loss, g = jax.value_and_grad(pix_loss)(x)
        upd, opt = tx.update(g, opt, x)
        return optax.apply_updates(x, upd), opt, loss

    for i in range(300):
        x, opt, loss = pix_step(x, opt)
        if i % 100 == 99:
            lbl = float(jnp.mean(disc.apply(d_params, x, RES, -1.0)))
            print(f"[probe2] PIXEL FIT it {i + 1}: label {lbl:.2f} "
                  f"(delta from start {float(jnp.mean(jnp.abs(x - x0))):.4f})")

    # ---- 3. higher-lr frozen-D G fit -------------------------------------
    lr = 3e-4
    tx_g = common.adam(lr, betas=(0.0, 0.9))
    g_state = common.init_state(g_params, tx_g)
    g_apply = generator.apply

    def loss_fn(gp, k):
        kz, kp = jax.random.split(k)
        zz = jax.random.normal(kz, (BATCH, config["z_dim"]))
        img = g_apply(gp, kp, zz, RES)
        return jnp.mean(jax.nn.softplus(disc.apply(d_params, img, RES, -1.0)))

    @jax.jit
    def g_step(st, k):
        loss, grads = jax.value_and_grad(loss_fn)(st["params"], k)
        upd, opt_state = tx_g.update(grads, st["opt_state"], st["params"])
        return ({"params": optax.apply_updates(st["params"], upd),
                 "opt_state": opt_state, "step": st["step"] + 1}, loss)

    @partial(jax.jit, static_argnums=(2,))
    def multi(st, base_key, n):
        return jax.lax.scan(lambda s, i: g_step(s, jax.random.fold_in(
            base_key, i)), st, jnp.arange(n))

    done, chunk = 0, 250
    while done < g_steps:
        g_state, losses = multi(g_state, jax.random.fold_in(key, 77 + done),
                                min(chunk, g_steps - done))
        done += min(chunk, g_steps - done)
        img = np.asarray(render(g_state["params"],
                                jax.random.fold_in(key, 5)))
        print(f"[probe2] G FIT lr {lr} it {done}: g_loss "
              f"{float(np.asarray(losses)[-1]):.3f} label {d_score(img):.2f}"
              f" cc {center_corner_contrast(img) / cc_real:.2f} "
              f"cbe {corner_background_error(img, bg):.3f}")
    img1 = np.asarray(render(g_state["params"], jax.random.fold_in(key, 5)))
    image_io.imwrite(os.path.join(out_dir, "gfit_hilr.png"),
                     np.concatenate([np.concatenate(
                         np.asarray(singles[0]), axis=1),
                         np.concatenate(img1, axis=1),
                         np.concatenate(real_np, axis=1)], axis=0))
    print(f"[probe2] artifacts -> {out_dir}")


if __name__ == "__main__":
    exp = sys.argv[1] if len(sys.argv) > 1 else \
        "runs/pigan_validate/exp_r5c_nonsat"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 2000
    main(exp, n)
