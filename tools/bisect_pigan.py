"""Representation-vs-dynamics bisect for the pi-GAN flagship failure.

The r4 flagship (100k-iter reference schedule on bigface) completed but
never formed head structure (BASELINE post-mortem row).  Two hypotheses:
  (R) REPRESENTATION: the generator architecture + flagship render geometry
      (64^2, 8+16 samples, fov 12, near 0.5 / far 1.5, camera radius 1)
      cannot express frame-filling heads with eye/mouth features at all —
      then no adversarial recipe can ever work and the geometry/sampling
      must be fixed first.
  (D) DYNAMICS: the generator CAN represent the data and the adversarial
      trajectory never got there — then round 5 attacks the GAN dynamics.

Probe (VERDICT r4 #1): fit renders to 4 REAL bigface images by plain MSE
(no discriminator) through the exact flagship geometry:

  A. film-only — optimise the [9, 512] FiLM codes of a FROZEN random-init
     trunk (the mapping network's degrees of freedom at init);
  B. film + trunk — jointly optimise the FiLM codes AND the SIREN trunk
     (the degrees of freedom adversarial training actually moves).

Decision rule: probe B >= 25 dB mean PSNR with visible eye/mouth features
=> representation OK, failure is (D).  Probe B failing => (R).

Run: python tools/bisect_pigan.py [iters_a] [iters_b]   (TPU, ~5-10 min)
Artifacts: runs/bisect_r5/{targets,recon_a,recon_b,grid}.png + stdout.

Reference counterpart of the machinery: pi_GAN/synthesis.py:81-106 (film
optimisation against an image target); here the realism prior is dropped
and the trunk is optionally unfrozen, because the question is capacity,
not inversion quality.
"""

from __future__ import annotations

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import optax

RES = 64
COARSE, FINE = 8, 16
N_TARGETS = 4


def psnr(a, b):
    mse = float(np.mean((np.asarray(a) - np.asarray(b)) ** 2))
    return -10.0 * np.log10(max(mse, 1e-12))


def load_targets(out_dir):
    """4 real bigface images at 64^2 (reuse the flagship's dataset dir when
    it survives; regenerate the same distribution otherwise)."""
    from msra_practice_project_tpu.data.image_folder import (
        ImageFolder, make_synthetic_faces)

    flagship = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "runs", "pigan_validate",
        "exp2_bigface", "_synthetic_faces")
    if os.path.isdir(flagship):
        data_dir, resize = flagship, RES / 64.0  # flagship images are 64^2
    else:
        data_dir = os.path.join(out_dir, "_faces")
        make_synthetic_faces(data_dir, n=64, size=RES, variant="bigface")
        resize = 1.0
    ds = ImageFolder(data_dir, N_TARGETS, resize=resize, preload=False,
                     prefetch=False)
    # deterministic pick: first batch of the seeded shuffle
    _, _, batch = ds.get()
    return jnp.asarray(batch[:N_TARGETS])


def make_fit_step(generator, targets, tx, fit_trunk: bool, frozen_trunk):
    """fit_trunk=False: var = {film} and the trunk closes over (no grads
    computed for it).  fit_trunk=True: var = {film, trunk}."""
    g_render = generator.render_film
    zeros = jnp.zeros((N_TARGETS,))

    def render(var, key):
        trunk_params = var["trunk"] if fit_trunk else frozen_trunk
        return g_render({"trunk": trunk_params}, key, var["film"], zeros,
                        zeros, resolution=RES, coarse_samples=COARSE,
                        fine_samples=FINE)

    def loss_fn(var, key):
        rec = render(var, key)
        return jnp.mean((rec - targets) ** 2)

    @jax.jit
    def step(state, key):
        loss, grads = jax.value_and_grad(loss_fn)(state["params"], key)
        updates, opt_state = tx.update(grads, state["opt_state"],
                                       state["params"])
        return {"params": optax.apply_updates(state["params"], updates),
                "opt_state": opt_state, "step": state["step"] + 1}, loss

    @partial(jax.jit, static_argnums=(2,))
    def multi(state, base_key, n):
        def body(st, i):
            return step(st, jax.random.fold_in(base_key, i))
        return jax.lax.scan(body, state, jnp.arange(n))

    return render, multi


def run_probe(name, generator, g_params, targets, iters, fit_trunk, key,
              lr):
    from msra_practice_project_tpu.train import common

    film0 = generator.get_mapping(
        g_params, jax.random.normal(key, (N_TARGETS, generator.cfg.z_dim)))
    var = {"film": film0}
    if fit_trunk:
        var["trunk"] = g_params["trunk"]
    tx = common.adam(lr)
    state = common.init_state(var, tx)
    render, multi = make_fit_step(generator, targets, tx, fit_trunk,
                                  g_params["trunk"])

    chunk = 250
    t0 = time.perf_counter()
    k_eval = jax.random.fold_in(key, 999)
    rec = render(state["params"], k_eval)
    p0 = psnr(rec, targets)
    print(f"[{name}] start PSNR {p0:.2f} dB")
    done = 0
    while done < iters:
        n = min(chunk, iters - done)
        state, losses = multi(state, jax.random.fold_in(key, done), n)
        done += n
        rec = render(state["params"], k_eval)
        print(f"[{name}] iter {done}: loss {float(np.asarray(losses)[-1]):.5f}"
              f"  PSNR {psnr(rec, targets):.2f} dB"
              f"  ({time.perf_counter() - t0:.0f}s)")
    rec = np.asarray(render(state["params"], k_eval))
    per = [psnr(rec[i], np.asarray(targets)[i]) for i in range(N_TARGETS)]
    return rec, per, state["params"]


def main(iters_a=2000, iters_b=3000):
    from msra_practice_project_tpu.core.artifacts import run_dir
    from msra_practice_project_tpu.core import image_io
    from msra_practice_project_tpu.models import pigan

    out_dir = run_dir("bisect_r5")
    os.makedirs(out_dir, exist_ok=True)
    targets = load_targets(out_dir)
    image_io.imwrite(os.path.join(out_dir, "targets.png"),
                     np.concatenate(np.asarray(targets), axis=1))

    # EXACT flagship geometry (runs/pigan_validate/exp2_bigface/config.json)
    gen_cfg = pigan.GeneratorConfig(
        z_dim=256, resolution=RES, near=0.5, far=1.5, fov=12.0,
        coarse_samples=COARSE, fine_samples=FINE)
    generator = pigan.Generator(gen_cfg)
    g_params = generator.init(jax.random.PRNGKey(0))

    key = jax.random.PRNGKey(7)
    rec_a, per_a, _ = run_probe("A film-only", generator, g_params, targets,
                                iters_a, False, key, lr=1e-2)
    rec_b, per_b, _ = run_probe("B film+trunk", generator, g_params, targets,
                                iters_b, True, jax.random.fold_in(key, 1),
                                lr=5e-4)

    from tools.validate_pigan import center_corner_contrast
    cc_real = center_corner_contrast(np.asarray(targets))
    cc_a = center_corner_contrast(rec_a)
    cc_b = center_corner_contrast(rec_b)

    image_io.imwrite(os.path.join(out_dir, "recon_a.png"),
                     np.concatenate(rec_a, axis=1))
    image_io.imwrite(os.path.join(out_dir, "recon_b.png"),
                     np.concatenate(rec_b, axis=1))
    grid = np.concatenate([np.concatenate(np.asarray(targets), axis=1),
                           np.concatenate(rec_a, axis=1),
                           np.concatenate(rec_b, axis=1)], axis=0)
    image_io.imwrite(os.path.join(out_dir, "grid.png"), grid)

    print(f"[bisect] per-target PSNR A (film-only, {iters_a} it): "
          f"{[round(p, 2) for p in per_a]} mean {np.mean(per_a):.2f} dB")
    print(f"[bisect] per-target PSNR B (film+trunk, {iters_b} it): "
          f"{[round(p, 2) for p in per_b]} mean {np.mean(per_b):.2f} dB")
    print(f"[bisect] center-corner contrast: real {cc_real:.4f}, "
          f"A {cc_a:.4f} ({100 * cc_a / cc_real:.0f}%), "
          f"B {cc_b:.4f} ({100 * cc_b / cc_real:.0f}%)")
    rep_ok = np.mean(per_b) >= 25.0 and cc_b > 0.5 * cc_real
    print("[bisect] VERDICT:",
          "REPRESENTATION OK -> failure is adversarial DYNAMICS"
          if rep_ok else
          "REPRESENTATION LIMITED -> fix geometry/sampling/capacity first")
    print(f"[bisect] artifacts -> {out_dir}")
    return rep_ok


if __name__ == "__main__":
    a = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    b = int(sys.argv[2]) if len(sys.argv) > 2 else 3000
    main(a, b)
