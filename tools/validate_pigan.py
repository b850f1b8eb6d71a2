"""End-to-end pi-GAN validation: does the generator learn the data
distribution, and do its samples stay 3D-consistent?

Trains on the synthetic blob dataset (a single coloured Gaussian blob on a
light background per image) and checks, before vs after training:
  * colour-histogram distance between generated samples and the dataset
    shrinks substantially,
  * per-sample diversity stays non-degenerate (no mode collapse to one
    image),
  * the same latent rendered at two nearby yaws produces similar but
    non-identical images (3D consistency of the radiance field).

Run: python tools/validate_pigan.py [iterations]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from msra_practice_project_tpu.core.config import PIGAN_TRAIN_DEFAULTS, resolve
from msra_practice_project_tpu.train import train_pigan


def color_hist(imgs, bins=16):
    """imgs [N, H, W, 3] in [0,1] -> normalised per-channel histogram."""
    hs = []
    for c in range(3):
        h, _ = np.histogram(imgs[..., c], bins=bins, range=(0, 1),
                            density=True)
        hs.append(h / bins)
    return np.concatenate(hs)


def lowfreq_spatial_std(imgs, pool=4):
    """Within-image spatial std AFTER pool x pool mean-pooling.

    The raw per-pixel spatial std is fooled by speckle: the 30k face run
    collapsed to per-pixel colour noise yet scored 73% of the real data's
    std.  Mean-pooling kills iid noise (std / pool) while genuine blob/face
    structure survives, so this is the gated form."""
    imgs = np.asarray(imgs)
    n, h, w, c = imgs.shape
    p = imgs[:, :h - h % pool, :w - w % pool, :]
    p = p.reshape(n, h // pool, pool, w // pool, pool, c).mean(axis=(2, 4))
    return float(p.std(axis=(1, 2)).mean())


def center_corner_contrast(imgs, frac=4):
    """Mean |center-patch colour - corner-patch colour| per image.

    Direct head-formation detector for the face/bigface datasets (coloured
    head at frame centre, light background at the corners): fog and
    mottled colour fields score ~0 regardless of their variance, which the
    pooled-std metric can be partially fooled by.  Diagnostic, not gated."""
    imgs = np.asarray(imgs)
    h, w = imgs.shape[1:3]
    ph, pw = h // frac, w // frac
    center = imgs[:, (h - ph) // 2:(h + ph) // 2,
                  (w - pw) // 2:(w + pw) // 2, :].mean(axis=(1, 2))
    corners = np.stack([
        imgs[:, :ph, :pw, :].mean(axis=(1, 2)),
        imgs[:, :ph, -pw:, :].mean(axis=(1, 2)),
        imgs[:, -ph:, :pw, :].mean(axis=(1, 2)),
        imgs[:, -ph:, -pw:, :].mean(axis=(1, 2)),
    ]).mean(axis=0)
    return float(np.abs(center - corners).mean())


def corner_patches(imgs, frac=8):
    """[N, 4*ph, pw, 3] stack of the four h//frac corner patches."""
    imgs = np.asarray(imgs)
    h, w = imgs.shape[1:3]
    ph, pw = h // frac, w // frac
    return np.concatenate([
        imgs[:, :ph, :pw, :], imgs[:, :ph, -pw:, :],
        imgs[:, -ph:, :pw, :], imgs[:, -ph:, -pw:, :]], axis=1)


def corner_background_error(imgs, bg, frac=8):
    """Mean |corner-patch pixel - bg| per image (r5 gate).

    Real bigface corners are the (soft-silhouette-tinted) light
    background; mottled colour-gradient fields (the r4 flagship's failure
    mode) put arbitrary colour there.  `bg` is the MEDIAN of the real
    batch's own corner pixels — against it the measured separation on the
    flagship artifacts is real 0.057 vs flagship-final 0.202 (3.5x) at
    frac 8, vs only 1.4x against the nominal 0.9 grey at frac 4 (heads
    intrude into quarter-size corners).  A separator head-less runs can't
    scrape, unlike center-corner contrast (structureless ceiling 33%)."""
    return float(np.abs(corner_patches(imgs, frac) - bg).mean())


def decide_resume(exp_dir, resume=False, fresh=False):
    """Host-restart-safe resume decision (VERDICT r3 #2).

    After a full host restart, SUPERVISE_ATTEMPT is 1 again and argv flags
    are whatever the relauncher typed — the only durable signal is the
    experiment dir itself.  So: checkpoints in the durable dir => resume,
    unless --fresh explicitly asks for a wipe.  SUPERVISE_ATTEMPT > 1
    (in-session watchdog restart) still forces resume as before.
    """
    attempt = int(os.environ.get("SUPERVISE_ATTEMPT", "1"))
    # --fresh is honored only on the FIRST supervise attempt: supervise.py
    # replays the identical argv on every watchdog restart, so a run launched
    # `supervise.py -- ... --fresh` would otherwise wipe its experiment dir
    # and restart from step 0 on every tunnel wedge (ADVICE r4, medium).
    if fresh and attempt == 1:
        return False
    if attempt > 1:
        return True
    if resume:
        return True
    if os.path.isdir(exp_dir):
        from msra_practice_project_tpu.core import ckpt as ckpt_lib
        if ckpt_lib.list_checkpoints(exp_dir):
            print(f"[validate] checkpoints found in {exp_dir} — "
                  "auto-resuming (pass --fresh to wipe and restart)")
            return True
    return False


def sample(generator, g_params, key, n, res):
    z = jax.random.normal(key, (n, generator.cfg.z_dim))
    film = generator.get_mapping(g_params, z)
    theta, phi = generator.sample_poses(jax.random.fold_in(key, 1), n)
    return np.asarray(generator.render_film(
        g_params, jax.random.fold_in(key, 2), film, theta, phi,
        resolution=res)), film


def main(iterations=1200, stage1_iters=0, fade=200, batch0=16, data_n=128,
         resume=False, variant="shaded", noise=0.0, dlr=None, floor=0.0,
         margin=None, augment="", fresh=False, nonsat=False, zdim=256,
         exp_name=None):
    """Single-stage gate (stage1_iters=0) or the full two-stage progressive
    schedule (ref: pi_GAN/configs/test.json, train.py:30-33,96-98 — 32^2 ->
    10k fade-in -> 64^2, scaled down): stage 0 for `iterations`, then
    `stage1_iters` at 64^2 with a `fade`-iteration fade-in.  Gates are
    checked on the FINAL stage's resolution, i.e. after the switch.
    `batch0` is the stage-0 batch size (the reference trains stage 0 at
    batch 64, pi_GAN/configs/test.json); stage 1 stays at 16."""
    two_stage = stage1_iters > 0
    # Durable root (default <repo>/runs), NOT /tmp: the r3 flagship died at
    # ~30k when a host restart wiped its /tmp experiment dir (BASELINE.md).
    from msra_practice_project_tpu.core.artifacts import run_dir
    base = run_dir("pigan_validate")
    # --name overrides the derived experiment dir so retries never clobber
    # a prior campaign's durable artifacts (the r4 flagship's 20 ckpts +
    # evolution grids under exp2_bigface are post-mortem evidence)
    name = exp_name or (("exp2" if two_stage else "exp") +
                        ("" if variant == "shaded" else f"_{variant}"))
    # Resume on: explicit --resume, a supervised restart (watchdog exit),
    # OR checkpoints already present in the durable dir (host-restart
    # relaunch, where both other signals are lost).  --fresh wipes.
    resume = decide_resume(os.path.join(base, name), resume, fresh)
    if not resume:
        import shutil
        shutil.rmtree(os.path.join(base, name), ignore_errors=True)
    if two_stage:
        schedule = {
            "iterations": [iterations, iterations + stage1_iters],
            "fade_in_itrs": [0, fade],
            "batch_size": [batch0, 16], "resolution": [32, 64],
        }
    else:
        schedule = {
            "iterations": [iterations], "fade_in_itrs": [0],
            "batch_size": [batch0], "resolution": [32],
        }
    total = schedule["iterations"][-1]
    res = schedule["resolution"][-1]
    cfg = resolve({
        "output_path": base, "experiment_name": name,
        "data_path": "/nonexistent", "z_dim": zdim,
        "render_coarse_sample_num": 8, "render_fine_sample_num": 16,
        # i_save divides the watchdog-restart replay loss; cap it at 2500 so
        # a wedge on a reference-scale run (total 100k) costs <= ~6 min of
        # recompute (140 MB per ckpt; the durable run root has >100 GB free)
        "i_print": max(min(total // 5, 2500), 1),
        "i_save": max(min(total // 10, 2500), 1),
        "i_image": total, "data_n": data_n, "data_variant": variant,
        # long-horizon runs hit real tunnel wedges (BASELINE 30k row):
        # stall -> exit 17; restart with --resume (or supervise.py).
        # Do NOT set this below ~900: the r5 flagship's stage-1 entry
        # (cold 64^2 compile under service load) blew through a 600 s
        # watchdog, and a kill mid-compile leaves no cache entry — the
        # replay faces the identical compile and loops. 1200 s covers the
        # worst observed remote compile with margin
        "watchdog_timeout": 1200,
        # annealed instance noise (see train_pigan docstring): on clean
        # synthetic data D otherwise reaches ~0 loss and the saturating
        # g_loss starves G (the 30k face run's stage-0 flat-field collapse)
        "instance_noise": noise,
        "instance_noise_anneal": max(total // 2, 1),
        # --floor: anneal to sigma_min instead of 0 (keeps real/fake
        # supports overlapped at horizon; the bigface probe's structure
        # decay began exactly when the noise reached zero)
        "instance_noise_floor": floor,
        # --margin: cap D's advantage — skip D updates while E[D(fake)]
        # exceeds the margin (see train_pigan.make_gan_steps docstring)
        **({} if margin is None else {"d_skip_margin": margin}),
        # --aug "color,translation,cutout": DiffAugment on real+fake
        # before D (train/diff_augment.py)
        **({} if not augment else {"diff_augment": augment}),
        # --nonsat: non-saturating G loss (see train_pigan.make_gan_steps
        # docstring) — the r5 response to the flagship post-mortem (D
        # dominance x the saturating loss's vanishing G-gradient)
        **({"g_nonsat": True} if nonsat else {}),
        **schedule,
        # the reference's D lr is 8x G's (4e-4 vs 5e-5, tuned for CelebA);
        # on easy synthetic data that ratio lets D saturate — --dlr scales
        # it down (end-lr kept at the reference's 4:1 start:end ratio)
        **({} if dlr is None else {"discriminator_lr": dlr,
                                   "discriminator_lr_end": dlr / 4.0}),
    }, PIGAN_TRAIN_DEFAULTS)

    # Auto-resume must not silently mix hyperparameters (ADVICE r4, low):
    # relaunching the same experiment name with different --noise/--dlr/...
    # would continue the old run under the new config and the gates would
    # score a mixed-config run.  Compare against the saved resolved config
    # and warn LOUDLY on any drift (iterations may legitimately extend).
    if resume:
        saved_cfg_path = os.path.join(base, name, "config.json")
        if os.path.exists(saved_cfg_path):
            import json
            with open(saved_cfg_path) as f:
                saved = json.load(f)
            drift = {k: (saved.get(k), dict(cfg).get(k))
                     for k in set(saved) | set(dict(cfg))
                     if saved.get(k) != dict(cfg).get(k)}
            if drift:
                print("[validate] *** WARNING: resuming with a DIFFERENT "
                      "config than the saved run ***")
                for k, (old, new) in sorted(drift.items()):
                    print(f"[validate] ***   {k}: saved {old!r} -> "
                          f"relaunch {new!r}")
                print("[validate] *** gates will score a mixed-config run; "
                      "use --fresh or a new experiment name if unintended")

    # Device phases OUTSIDE train() (backend init, the untrained baseline
    # sample, post-train eval) get their own watchdog: a tunnel wedge here
    # exits 17 and the supervisor restart resumes straight past completed
    # training (observed in practice — a wedge hit exactly this phase).
    from msra_practice_project_tpu.core.diagnostics import Watchdog

    # untrained reference point
    from msra_practice_project_tpu.models import pigan
    gen_cfg = pigan.GeneratorConfig(
        z_dim=zdim, resolution=res, near=cfg.render_near, far=cfg.render_far,
        coarse_samples=8, fine_samples=16)
    # 1800 s: backend init alone has been observed to take ~15 min under
    # service load (r5 flagship attempts 2/3 — attempt 3 was killed at
    # exactly 900 s mid-init and had to pay the whole init again); inits
    # here are slow-but-completing, so a generous leash beats a retry loop
    dog = Watchdog(1800.0)
    g0 = pigan.Generator(gen_cfg)
    p0 = g0.init(jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(42)
    samples0, _ = sample(g0, p0, key, 32, res)
    dog.stop()

    out = train_pigan.train(cfg)   # train loop runs its own watchdog
    generator = out["generator"]
    g_params = out["g_state"]["params"]
    dog = Watchdog(900.0)
    samples1, film = sample(generator, g_params, key, 32, res)

    # dataset histogram at the final-stage resolution
    from msra_practice_project_tpu.data.image_folder import ImageFolder
    ds = ImageFolder(os.path.join(base, name, "_synthetic_faces"), 64,
                     resize=res / 64.0)
    _, _, real = ds.get()
    h_real = color_hist(np.asarray(real))
    d0 = np.abs(color_hist(samples0) - h_real).mean()
    d1 = np.abs(color_hist(samples1) - h_real).mean()
    diversity = samples1.std(axis=0).mean()
    # feature-space distribution distance (random-conv Fréchet — the
    # weight-free FID stand-in, VERDICT r2 weak #6): a generator that only
    # matches colour statistics but not spatial structure won't close this.
    from msra_practice_project_tpu.core.metrics import (feature_distance,
                                                        frechet_from_features)
    real_np = np.asarray(real)
    f0 = feature_distance(samples0, real_np)
    f1 = feature_distance(samples1, real_np)
    # Trained-D feature Fréchet (VERDICT r3 #5): the random-conv space was
    # satisfied by background statistics alone in the r3 collapse forensics
    # (best-ever rf-Fréchet 0.079 on a flat-field run).  Features the
    # discriminator LEARNED while separating real from fake don't have that
    # blind spot — embed real + samples with the trained D and gate on the
    # same improvement ratio.
    d_model = out["discriminator"]
    d_params = out["d_state"]["params"]

    def d_embed(imgs):
        x = jnp.transpose(jnp.asarray(imgs), (0, 3, 1, 2))
        return d_model.apply_features(d_params, x, res)

    ef_real = d_embed(real_np[:64])
    fd0 = frechet_from_features(d_embed(samples0), ef_real)
    fd1 = frechet_from_features(d_embed(samples1), ef_real)
    # r5: held-out real-vs-real SANITY FLOOR under the same embedding (the
    # scale anchor the r4 gate lacked — flagship mining measured the failed
    # run at 115-147x this floor at every ckpt while still "improving" on
    # some relative metrics).  A disjoint real batch -> fd_floor; the gate
    # adds an absolute bar at 30x it.
    real_heldout = np.asarray(real)[64:128]
    if len(real_heldout) < 8:  # tiny smoke datasets: reuse a shifted slice
        real_heldout = np.asarray(real)[max(len(real) // 2, 1):]
    fd_floor = frechet_from_features(d_embed(real_heldout), ef_real)
    # Per-image spatial structure: std over (H, W) within each sample,
    # averaged over batch+channels.  Catches the flat-field collapse the
    # 30k batch-64 run exhibited — per-sample flat colour fields keep
    # cross-sample diversity AND shrink the colour-histogram/Fréchet
    # distances, so none of the other gates fire on it.
    spatial_real = float(real_np.std(axis=(1, 2)).mean())
    spatial0 = float(samples0.std(axis=(1, 2)).mean())
    spatial1 = float(samples1.std(axis=(1, 2)).mean())
    # ... and its low-frequency (speckle-proof) form, which is what gates.
    lf_real = lowfreq_spatial_std(real_np)
    lf1 = lowfreq_spatial_std(samples1)
    # Visual evidence beside the numbers: trained samples vs the dataset,
    # same grid layout (the queue item this run answers was flagged off a
    # VISUAL flat-field collapse that the numeric gates then learned to
    # catch — keep both forms of evidence).
    from msra_practice_project_tpu.core import image_io
    from msra_practice_project_tpu.eval.pigan_demo import _grid, save_demo
    image_io.imwrite(os.path.join(base, name, "samples_final.png"),
                     _grid(samples1[:32].reshape(4, 8, res, res, 3)))
    image_io.imwrite(os.path.join(base, name, "samples_real.png"),
                     _grid(real_np[:32].reshape(4, 8, res, res, 3)))
    # high-res visual evidence: the reference's demo-mode-0 grid at 128^2
    # with dense sampling, straight off the final params
    save_demo(generator, g_params, jax.random.fold_in(key, 77),
              os.path.join(base, name, "demo_128.png"), rows=4, columns=8,
              resolution=128, beat=dog.beat)
    stage_txt = (f"two-stage 32^2 -> fade {fade} -> 64^2"
                 if two_stage else "single stage 32^2")
    print(f"[validate] schedule: {stage_txt}; gates at {res}^2")
    print(f"[validate] hist distance untrained {d0:.4f} -> trained {d1:.4f}")
    print(f"[validate] feature (rf-frechet) untrained {f0:.4f} -> "
          f"trained {f1:.4f}")
    print(f"[validate] trained-D feature frechet untrained {fd0:.4f} -> "
          f"trained {fd1:.4f} (real-vs-real floor {fd_floor:.4g}; "
          f"trained = {fd1 / max(fd_floor, 1e-9):.1f}x floor, bar 30x)")
    print(f"[validate] sample diversity (std across batch): {diversity:.4f}")
    print(f"[validate] within-image spatial std: real {spatial_real:.4f}, "
          f"untrained {spatial0:.4f} -> trained {spatial1:.4f} "
          "(flat-field collapse if << real)")
    print(f"[validate] LOW-FREQ spatial std (4x pooled): real {lf_real:.4f}"
          f" -> trained {lf1:.4f} (speckle scores ~0 here)")
    cc_ok = True
    if variant in ("face", "bigface"):
        cc_real = center_corner_contrast(real_np)
        cc1 = center_corner_contrast(samples1)
        # GATED since r4; bar RECALIBRATED in r5 from the completed-flagship
        # mining (tools/mine_flagship.py, runs/.../mine_flagship.json): the
        # structureless colour-gradient fields of the failed 100k run
        # plateau at 26-33% of real from 35k on — so the old 25% bar was
        # scrapeable by headless images (it PASSED the visual FAIL).
        # Genuine head formation measures 78-94% (the r5 MSE-reconstruction
        # bisect, BASELINE bisect row).  Bar 50%: above the measured
        # structureless ceiling, well under genuine heads.
        cc_ok = bool(cc1 > 0.50 * cc_real)
        print(f"[validate] center-corner contrast (head formation): real "
              f"{cc_real:.4f} -> trained {cc1:.4f} (fog scores ~0; "
              f"gate >50% of real: {'ok' if cc_ok else 'FAIL'})")
        # Corner-background formation (r5, from the flagship mining +
        # measured separation on its final artifacts): a generator that
        # forms heads must also form the background behind them.  bg =
        # median of the real batch's corner pixels; flagship-final reads
        # 3.5x real's error.  Bar 2x.
        bg = float(np.median(corner_patches(real_np)))
        cbe_real = corner_background_error(real_np, bg)
        cbe1 = corner_background_error(samples1, bg)
        cbe_ok = bool(cbe1 < 2.0 * cbe_real)
        cc_ok = cc_ok and cbe_ok
        print(f"[validate] corner-background formation error (bg "
              f"{bg:.3f}): real {cbe_real:.4f} -> trained {cbe1:.4f} "
              f"(gate <2x real: {'ok' if cbe_ok else 'FAIL'})")

    # Long-horizon stability (VERDICT r2 next-round #3): the loss curves
    # must stay finite with no late divergence, and the sample-diversity
    # trajectory across the saved checkpoints must never collapse (mode
    # collapse shows up as diversity -> 0 partway through training).
    loss_log = out["loss_log"]
    g_arr, d_arr = np.asarray(loss_log["g_loss"]), \
        np.asarray(loss_log["d_loss"])
    finite = bool(np.isfinite(g_arr).all() and np.isfinite(d_arr).all())
    tail_ok = bool(np.abs(g_arr[-max(total // 10, 1):]).mean() < 50.0)
    print(f"[validate] losses finite: {finite}; "
          f"|g_loss| tail mean {np.abs(g_arr[-max(total // 10, 1):]).mean():.2f}")

    from msra_practice_project_tpu.core import ckpt as ckpt_lib
    log_path = os.path.join(base, name)
    steps = [s for s, _ in ckpt_lib.list_checkpoints(log_path)]
    template = {"g": jax.tree.map(lambda x: x, out["g_state"]),
                "d": out["d_state"], "step": 0}
    div_traj = []
    evo_rows = []
    for s in steps:
        dog.beat(f"ckpt {s}")
        restored = ckpt_lib.restore(ckpt_lib.ckpt_path(log_path, s),
                                    template)
        # mid-run ckpts may be from an earlier stage; sample at final res
        samp, _ = sample(generator, restored["g"]["params"],
                         jax.random.fold_in(key, 100 + s), 16, res)
        div_traj.append(float(samp.std(axis=0).mean()))
        evo_rows.append(samp[:8])
    # Mode collapse is a LATE-phase failure: gate the second half of the
    # trajectory (plus the final state via `diversity`), not the burn-in —
    # the documented transient white-field dips at ~20-40% of a short run
    # (instance-noise A/B row, this 2k smoke) fully recover and are not
    # collapse.  The full trajectory is still printed for the record.
    late = div_traj[len(div_traj) // 2:]
    no_collapse = bool(min(late) > 0.02) if late else True
    print(f"[validate] diversity trajectory over ckpts {steps}: "
          f"{[round(v, 3) for v in div_traj]} "
          f"(no LATE collapse over the final {len(late)}: {no_collapse})")
    if evo_rows:
        # one row of 8 samples per checkpoint, top -> bottom chronological:
        # the moment structure appears (or collapses) is visible at a glance
        image_io.imwrite(os.path.join(log_path, "ckpt_evolution.png"),
                         _grid(np.stack(evo_rows)))

    # loss-curve plots through the diagnostics harness (pi_GAN/test.py:78-85)
    from msra_practice_project_tpu.eval import pigan_test
    pigan_test.plot_loss_curves(
        loss_log, os.path.join(log_path, "loss_curves.png"))
    print(f"[validate] loss curves -> {log_path}/loss_curves.png")

    # 3D consistency: same identity, two nearby yaws
    th = jnp.array([0.0, 0.25])
    ph = jnp.zeros((2,))
    pair = np.asarray(generator.render_film(
        g_params, jax.random.fold_in(key, 9), film[:1].repeat(2, 0), th, ph,
        resolution=res))
    delta = np.abs(pair[0] - pair[1]).mean()
    dog.stop()
    print(f"[validate] yaw-shift mean pixel delta: {delta:.4f} "
          "(0 = 2D collapse, large = view-inconsistent)")

    # low-freq form: per-pixel speckle (which the raw std rewards) pools
    # away, so only genuine structure can clear the bar
    spatial_ok = lf1 > 0.4 * lf_real
    # trained-D Fréchet gate, r5 form: relative improvement AND an absolute
    # anchor against the real-vs-real floor (mining datum: the failed
    # flagship sat at 115-147x floor at every ckpt while some relative
    # metrics "improved"; genuine distribution match must land within low
    # tens of the floor).
    fd_ok = (fd1 < 0.5 * fd0) and (fd1 < 30.0 * fd_floor)
    ok = (d1 < 0.66 * d0) and (f1 < 0.5 * f0) and fd_ok \
        and diversity > 0.02 \
        and 1e-4 < delta < 0.3 and finite and tail_ok and no_collapse \
        and spatial_ok and cc_ok
    print("[validate]", "PASS" if ok else "FAIL",
          "(hist improves >=34%, rf-frechet improves >=50%, trained-D "
          "frechet improves >=50% AND <30x real-vs-real floor, diverse "
          "samples, LOW-FREQ spatial structure >=40% of real, head "
          "contrast >=50% of real + corner-background <2x real on face "
          "variants, view-consistent, losses stable, no collapse)")
    return ok


if __name__ == "__main__":
    raw = sys.argv[1:]
    noise = 0.0
    if "--noise" in raw:
        i = raw.index("--noise")
        noise = float(raw[i + 1])
        raw = raw[:i] + raw[i + 2:]
    dlr = None
    if "--dlr" in raw:
        i = raw.index("--dlr")
        dlr = float(raw[i + 1])
        raw = raw[:i] + raw[i + 2:]
    floor = 0.0
    if "--floor" in raw:
        i = raw.index("--floor")
        floor = float(raw[i + 1])
        raw = raw[:i] + raw[i + 2:]
    margin = None
    if "--margin" in raw:
        i = raw.index("--margin")
        margin = float(raw[i + 1])
        raw = raw[:i] + raw[i + 2:]
    augment = ""
    if "--aug" in raw:
        i = raw.index("--aug")
        augment = raw[i + 1]
        raw = raw[:i] + raw[i + 2:]
    zdim = 256
    if "--zdim" in raw:
        i = raw.index("--zdim")
        zdim = int(raw[i + 1])
        raw = raw[:i] + raw[i + 2:]
    exp_name = None
    if "--name" in raw:
        i = raw.index("--name")
        exp_name = raw[i + 1]
        raw = raw[:i] + raw[i + 2:]
    argv = [a for a in raw
            if a not in ("--resume", "--face", "--bigface", "--fresh",
                         "--nonsat")]
    resume = "--resume" in raw
    fresh = "--fresh" in raw
    nonsat = "--nonsat" in raw
    variant = ("bigface" if "--bigface" in raw
               else "face" if "--face" in raw else "shaded")
    its = int(argv[0]) if len(argv) > 0 else 1200
    s1 = int(argv[1]) if len(argv) > 1 else 0
    fade = int(argv[2]) if len(argv) > 2 else 200
    batch0 = int(argv[3]) if len(argv) > 3 else 16
    data_n = int(argv[4]) if len(argv) > 4 else 128
    ok = main(its, s1, fade, batch0, data_n, resume, variant, noise, dlr,
              floor, margin, augment, fresh, nonsat, zdim, exp_name)
    sys.exit(0 if ok else 1)
