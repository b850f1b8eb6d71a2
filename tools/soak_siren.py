"""Reference-schedule SIREN soaks through the REAL CLI on real data.

The quality gates (tools/validate_img.py / validate_sdf.py) run 3-4k
iterations at reduced batch; the reference's own schedules are larger:

  * image fit: 10,000 iters, batch 65,536 (siren/configs/siren_img.json)
  * SDF fit:  100,000 iters, batch 65,536 on + 65,536 off-surface points
              with 100 periodic mesh extractions (siren_sdf_1.json)

This driver runs BOTH schedules verbatim (the reference config files
themselves, only data/output paths overridden) on the offline real
datasets — grace_hopper.jpg for the image, the USGS Jacksboro Fault DEM
solid for the SDF — with a mid-run SIGKILL + auto-resume on the long SDF
run, then gates the results at the same physical accuracy bars as the
short gates.

Run: python tools/soak_siren.py [img_iters] [sdf_iters]   (defaults = the
     reference schedules: 10000 / 100000)
"""

from __future__ import annotations

import os
import signal
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
# Durable root, not /tmp: host restarts wipe /tmp (BASELINE.md "RUN
# LOST" row); see core/artifacts.py.
from msra_practice_project_tpu.core.artifacts import run_dir
BASE = run_dir("siren_soak")
CFG_DIR = os.path.join(REPO, "msra_practice_project_tpu", "configs", "siren")


def latest_ckpt_step(log_dir):
    from msra_practice_project_tpu.core import ckpt as ckpt_lib
    last = ckpt_lib.latest(log_dir)
    return last[0] if last else 0


def soak_img(iterations: int) -> bool:
    """The reference image-fit schedule on a real photograph."""
    from tools.validate_img import real_photo_path
    from tools.supervise import supervise

    photo = real_photo_path()
    log_dir = os.path.join(BASE, "img")
    import shutil
    shutil.rmtree(log_dir, ignore_errors=True)
    cli = [sys.executable, "-m", "msra_practice_project_tpu.train.train_img",
           os.path.join(CFG_DIR, "siren_img.json"),
           f"data_path={photo}", f"output_path={BASE}",
           "experiment_name=img", f"iterations={iterations}",
           "watchdog_timeout=900"]
    print("[soak-img] $", " ".join(cli), flush=True)
    t0 = time.time()
    os.chdir(REPO)
    rc = supervise(cli)
    wall = time.time() - t0
    if rc != 0:
        raise RuntimeError(f"img soak failed rc={rc}")

    # log continuity + full-grid reconstruction PSNR from the final ckpt
    log = np.load(os.path.join(log_dir, "log.npy"), allow_pickle=True).item()
    assert len(log["loss"]) == iterations, (len(log["loss"]), iterations)
    import jax
    from msra_practice_project_tpu.core import ckpt as ckpt_lib
    from msra_practice_project_tpu.data import image as image_data
    from msra_practice_project_tpu.models.siren_mlp import img_model
    from msra_practice_project_tpu.train import common
    from msra_practice_project_tpu.train.train_img import render_grid

    img = image_data.load_image_grayscale(photo)
    model = img_model("siren")
    state = common.init_state(model.init(jax.random.PRNGKey(0)),
                              common.adam(1e-4))
    step, state = common.resume(log_dir, state)
    assert step == iterations, step
    recon = np.asarray(render_grid(
        state["params"], apply_fn=jax.tree_util.Partial(model.apply),
        width=img.shape[1], height=img.shape[0]))
    psnr = -10.0 * np.log10(np.mean((recon - img[..., 0]) ** 2))
    print(f"[soak-img] {iterations} iters batch 65536 in {wall:.0f}s wall "
          f"({iterations / wall:,.0f} steps/s incl. init/compile/renders)")
    print(f"[soak-img] full-grid PSNR vs grace_hopper: {psnr:.2f} dB "
          f"(short gate at 3k/16384 measured 29.4)")
    ok = psnr > 29.0
    print("[soak-img]", "PASS" if ok else "FAIL", "(>29 dB)")
    return ok


def soak_sdf(iterations: int, kill_frac: float = 0.25) -> bool:
    """The reference SDF schedule (100k iters, batch 65,536, i_mesh 1000)
    on the real-terrain solid, with a mid-run SIGKILL + auto-resume."""
    from msra_practice_project_tpu.data.pointcloud import (
        load_dem_heightfield, make_dem_cloud)
    from tools.supervise import WATCHDOG_EXIT, supervise

    extent, z_bottom = 0.7, -0.35
    log_dir = os.path.join(BASE, "sdf")
    import shutil
    shutil.rmtree(log_dir, ignore_errors=True)
    os.makedirs(BASE, exist_ok=True)
    cloud_path = os.path.join(BASE, "dem_cloud.npz")
    np.savez(cloud_path, p=make_dem_cloud(n=100000, extent=extent,
                                          closed=True, z_bottom=z_bottom))
    cli = [sys.executable, "-m", "msra_practice_project_tpu.train.train_sdf",
           os.path.join(CFG_DIR, "siren_sdf_1.json"),
           f"data_path={cloud_path}", f"output_path={BASE}",
           "experiment_name=sdf", f"iterations={iterations}",
           "watchdog_timeout=900"]
    kill_step = max(int(kill_frac * iterations), 1)

    # Phase A: train until the first ckpt past kill_step, then SIGKILL.
    print(f"[soak-sdf] phase A: to ckpt >= {kill_step}, then KILL", flush=True)
    print("[soak-sdf] $", " ".join(cli), flush=True)
    t_a = time.time()
    proc = subprocess.Popen(cli, cwd=REPO)
    try:
        while True:
            time.sleep(10)
            if proc.poll() is not None:
                if proc.returncode == WATCHDOG_EXIT:
                    print("[soak-sdf] phase A stall; restart in 180s",
                          flush=True)
                    time.sleep(180)
                    proc = subprocess.Popen(cli, cwd=REPO)
                    continue
                raise RuntimeError(f"phase A rc={proc.returncode}")
            if latest_ckpt_step(log_dir) >= kill_step:
                time.sleep(5)  # land mid-interval, past the save
                break
    finally:
        if proc.poll() is None:
            proc.send_signal(signal.SIGKILL)
            proc.wait()
    resume_step = latest_ckpt_step(log_dir)
    wall_a = time.time() - t_a
    print(f"[soak-sdf] killed after {wall_a:.0f}s at ckpt {resume_step}")

    # Phase B: resume to completion under the supervisor.
    t_b = time.time()
    os.chdir(REPO)
    rc = supervise(cli)
    wall_b = time.time() - t_b
    if rc != 0:
        raise RuntimeError(f"phase B rc={rc}")
    steps_b = iterations - resume_step
    print(f"[soak-sdf] phase B: {steps_b} steps in {wall_b:.0f}s wall "
          f"({steps_b / wall_b:,.0f} steps/s incl. {steps_b // 1000} mesh "
          f"extractions + init/compile)")

    log = np.load(os.path.join(log_dir, "log.npy"), allow_pickle=True).item()
    assert len(log["loss"]) == iterations, (len(log["loss"]), iterations)
    print(f"[soak-sdf] log spans {len(log['loss'])} steps across the kill; "
          f"loss {log['loss'][0]:.1f} -> {np.mean(log['loss'][-100:]):.2f}")

    # Gate the FINAL high-res mesh (N=512, test.ply) against the DEM at the
    # same PHYSICAL bars as the short gate (which ran N=128): mean |z error|
    # < 2/127, p95 < 3 * 2/127 — resolution-independent surface accuracy.
    from scipy.interpolate import RegularGridInterpolator

    from msra_practice_project_tpu.core.mesh import read_ply

    height, x_lin, y_lin = load_dem_heightfield(extent)
    interp = RegularGridInterpolator((y_lin, x_lin), height)
    verts, faces = read_ply(os.path.join(log_dir, "test.ply"))
    inside = (np.abs(verts[:, 0]) <= 0.9 * extent) & \
        (np.abs(verts[:, 1]) <= 0.9 * extent) & \
        (verts[:, 2] >= z_bottom + 0.07)
    v = verts[inside]
    z_true = interp(np.stack([v[:, 1], v[:, 0]], axis=1))
    err = np.abs(v[:, 2] - z_true)
    bar = 2.0 / 127
    print(f"[soak-sdf] final mesh (N=512): {verts.shape[0]} verts "
          f"({v.shape[0]} in-region), {faces.shape[0]} faces")
    print(f"[soak-sdf] |z - DEM|: mean {err.mean():.4f}, "
          f"p95 {np.percentile(err, 95):.4f} (bars {bar:.4f} / {3 * bar:.4f})")
    ok = v.shape[0] > 5000 and err.mean() < bar \
        and np.percentile(err, 95) < 3 * bar
    print("[soak-sdf]", "PASS" if ok else "FAIL",
          "(same physical bars as the 4k-iter gate)")
    return ok


def main(img_iters=10000, sdf_iters=100000):
    ok_img = soak_img(img_iters)
    ok_sdf = soak_sdf(sdf_iters)
    print(f"[soak] SUMMARY: img {'PASS' if ok_img else 'FAIL'}, "
          f"sdf {'PASS' if ok_sdf else 'FAIL'}")
    return ok_img and ok_sdf


if __name__ == "__main__":
    img_iters = int(sys.argv[1]) if len(sys.argv) > 1 else 10000
    sdf_iters = int(sys.argv[2]) if len(sys.argv) > 2 else 100000
    sys.exit(0 if main(img_iters, sdf_iters) else 1)
