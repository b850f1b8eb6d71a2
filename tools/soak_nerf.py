"""Reference-scale NeRF soak: the canonical long schedule through the REAL
CLI, with a mid-run kill + resume, then the full eval sweep + analysis plots.

Mirrors the reference's canonical experiment (nerf/train_nerf.py:31
iterations=200000 default, configs/lego.json, i_save 10000 / i_image 1000)
on the hard analytic scene at 400^2 frames (VERDICT r2 next-round #1).

Phases:
  A. train via `python -m msra_practice_project_tpu.train.train_nerf cfg`
     until the first checkpoint past `kill_frac * iterations`, then
     SIGKILL the process mid-epoch (no clean shutdown).
  B. relaunch the same CLI: it must resume from the latest checkpoint
     (exact-resume: replayed epoch permutations + intra-epoch cursor) and
     run to completion.  Steady-state throughput is measured over phase B.
  C. `eval.test_nerf` sweep over every train/val view (PSNR/SSIM/LPIPS ->
     test.json + test.jpg) and `eval.analysis_view` plots.

Run: python tools/soak_nerf.py [iterations] [size] [n_train]
     (defaults 200000 / 400 / 50 — the reference's exact eval geometry
     (resize 0.5 of 800^2); ~35-40 min of chip time at ~100k rays/s, and
     the phase-C sweep doubles as the 400^2 eval-timing measurement
     (VERDICT r2 next-round #9))
"""

from __future__ import annotations

import json
import os
import signal
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
# Durable root, not /tmp: host restarts wipe /tmp (BASELINE.md "RUN
# LOST" row); see core/artifacts.py.
from msra_practice_project_tpu.core.artifacts import run_dir
BASE = run_dir("nerf_soak")


def sh(args, **kw):
    print("[soak] $", " ".join(args), flush=True)
    return subprocess.run(args, cwd=REPO, **kw)


def latest_ckpt_step(log_dir):
    from msra_practice_project_tpu.core import ckpt as ckpt_lib
    last = ckpt_lib.latest(log_dir)
    return last[0] if last else 0


def main(iterations=200000, size=400, n_train=50, kill_frac=0.25):
    from tools.validate_nerf import make_dataset

    data_dir = os.path.join(BASE, f"data_hard_{size}")
    if not os.path.exists(os.path.join(data_dir, "transforms_train.json")):
        print(f"[soak] rendering hard analytic dataset at {size}^2, "
              f"{n_train} train views...")
        t0 = time.time()
        make_dataset(data_dir, size, n_train=n_train, n_val=8, n_test=8,
                     scene="hard")
        print(f"[soak] dataset done in {time.time() - t0:.0f}s")

    exp = f"soak_{iterations}"
    log_dir = os.path.join(BASE, exp)
    cfg = {
        "output_path": BASE, "experiment_name": exp,
        "data_path": data_dir, "data_resize": 1.0, "data_skip": 1,
        "iterations": iterations,
        # Hang detection for the hours-long run: a wedged tunnel dispatch
        # exits 17 after 15 min of silence instead of stalling forever
        # (core/diagnostics.Watchdog; restart via tools/supervise.py).
        "watchdog_timeout": 900,
        # everything else = NERF_TRAIN_DEFAULTS: batch 1024, 64+128 samples,
        # lr 5e-4 decay 500, start_up 500, i_print 100, i_save 10000,
        # i_image 1000, steps_per_call 10
    }
    cfg_file = os.path.join(BASE, f"{exp}_config.json")
    os.makedirs(BASE, exist_ok=True)
    with open(cfg_file, "w") as f:
        json.dump(cfg, f, indent=2)

    cli = [sys.executable, "-m",
           "msra_practice_project_tpu.train.train_nerf", cfg_file]
    kill_step = int(kill_frac * iterations)

    # Phase A: run until the first ckpt >= kill_step, then SIGKILL mid-epoch.
    # A watchdog exit (17 = wedged tunnel) is NOT a failure: relaunch after
    # the recovery cooldown and let ckpt auto-resume continue the phase.
    from tools.supervise import WATCHDOG_EXIT, supervise

    print(f"[soak] phase A: training until ckpt >= {kill_step}, then KILL")
    t_a = time.time()
    proc = subprocess.Popen(cli, cwd=REPO)
    try:
        while True:
            time.sleep(10)
            if proc.poll() is not None:
                if proc.returncode == WATCHDOG_EXIT:
                    print("[soak] phase A watchdog stall; restarting in "
                          "180s", flush=True)
                    time.sleep(180)
                    proc = subprocess.Popen(cli, cwd=REPO)
                    continue
                raise RuntimeError(f"phase A exited early rc={proc.returncode}")
            if latest_ckpt_step(log_dir) >= kill_step:
                time.sleep(20)  # land mid-epoch, well past the save
                break
    finally:
        if proc.poll() is None:
            proc.send_signal(signal.SIGKILL)
            proc.wait()
    resume_step = latest_ckpt_step(log_dir)
    wall_a = time.time() - t_a
    print(f"[soak] phase A killed after {wall_a:.0f}s at ckpt {resume_step}")

    # Phase B: relaunch; must resume and run to completion.  Driven through
    # the supervisor so mid-run watchdog exits restart onto ckpt auto-resume
    # instead of aborting the soak.
    print("[soak] phase B: resume to completion (supervised)")
    t_b = time.time()
    print("[soak] $", " ".join(cli), flush=True)
    os.chdir(REPO)
    rc = supervise(cli)
    wall_b = time.time() - t_b
    if rc != 0:
        raise RuntimeError(f"phase B failed rc={rc}")
    steps_b = iterations - resume_step
    rays_rate = steps_b * 1024 / wall_b
    print(f"[soak] phase B: {steps_b} steps in {wall_b:.0f}s wall "
          f"({rays_rate:,.0f} rays/s incl. init/compile/eval-renders)")

    # log continuity: the merged log.npy must span the WHOLE run
    import numpy as np
    log = np.load(os.path.join(log_dir, "log.npy"),
                  allow_pickle=True).item()
    n_log = len(log["loss"])
    assert n_log == iterations, (n_log, iterations)
    pre, post = log["psnr"][resume_step - 50:resume_step], \
        log["psnr"][resume_step:resume_step + 50]
    print(f"[soak] log spans {n_log} steps; psnr around the kill: "
          f"{np.mean(pre):.2f} -> {np.mean(post):.2f} dB (no reset)")

    # Phase C: full eval sweep + analysis plots.  The sweep inherits the
    # experiment's watchdog (eval/test_nerf.py) and is idempotent, so it is
    # supervised too: a wedge re-runs it instead of killing the soak.
    print("[soak] phase C: eval sweep over all views (supervised)")
    t_c = time.time()
    rc = supervise([sys.executable, "-m",
                    "msra_practice_project_tpu.eval.test_nerf",
                    log_dir, str(iterations)])
    wall_c = time.time() - t_c
    if rc != 0:
        raise RuntimeError("test_nerf sweep failed")
    r = sh([sys.executable, "-m",
            "msra_practice_project_tpu.eval.analysis_view",
            os.path.join(log_dir, "analysis"), log_dir])
    if r.returncode != 0:
        raise RuntimeError("analysis_view failed")

    test = json.load(open(os.path.join(log_dir, "test.json")))
    summary = {}
    for split in ("train", "in", "ex"):
        ps = test["psnr"][split]
        if ps:
            summary[split] = (float(np.mean(ps)),
                              float(np.mean(test["ssim"][split])))
    print("[soak] ===== SUMMARY =====")
    print(f"[soak] schedule: {iterations} iters, {size}^2 frames, "
          f"{n_train} train views, batch 1024, 64+128 samples")
    print(f"[soak] wall: phase A {wall_a:.0f}s (to step {resume_step}) + "
          f"phase B {wall_b:.0f}s + eval sweep {wall_c:.0f}s")
    print(f"[soak] steady-state incl. overheads: {rays_rate:,.0f} rays/s")
    for split, (p, s) in summary.items():
        print(f"[soak] {split}: PSNR {p:.2f} dB SSIM {s:.4f}")
    print(f"[soak] artifacts: {log_dir}/test.json, test.jpg, "
          f"analysis_*.png, log.npy ({n_log} steps), "
          f"{iterations // 10000} checkpoints")
    ok = summary.get("in", summary.get("train"))[0] > 28.0
    print("[soak]", "PASS" if ok else "FAIL", "(novel-view PSNR > 28 dB)")
    return summary


if __name__ == "__main__":
    its = int(sys.argv[1]) if len(sys.argv) > 1 else 200000
    size = int(sys.argv[2]) if len(sys.argv) > 2 else 400
    n_train = int(sys.argv[3]) if len(sys.argv) > 3 else 50
    main(its, size, n_train)
