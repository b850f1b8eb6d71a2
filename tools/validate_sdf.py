"""End-to-end SDF quality validation: fit a known shape, measure the mesh.

Trains the SIREN SDF pipeline on an analytic sphere point cloud (radius 0.6)
and checks the extracted isosurface against ground truth — mean |radius-0.6|
and spread.  A correct eikonal-regularised fit recovers the surface to well
under a voxel.

Run: python tools/validate_sdf.py [iterations]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from msra_practice_project_tpu.core.config import SIREN_SDF_DEFAULTS, resolve
from msra_practice_project_tpu.core.mesh import read_ply
from msra_practice_project_tpu.train import train_sdf

RADIUS = 0.6


def main(iterations=4000):
    # fresh run every time — a stale ckpt at `iterations` would resume into
    # a 0-step no-op and silently validate the previous build
    import shutil
    shutil.rmtree("/tmp/sdf_validate/exp", ignore_errors=True)
    cfg = resolve({
        "output_path": "/tmp/sdf_validate", "experiment_name": "exp",
        "data_path": "", "iterations": iterations, "batch_size": 8192,
        "model_type": "siren", "i_print": max(iterations // 8, 1),
        "i_save": iterations, "i_mesh": iterations,
        "mesh_n": 128, "final_mesh_n": 128, "data_points": 60000,
    }, SIREN_SDF_DEFAULTS)
    out = train_sdf.train(cfg)
    losses = out["log"]["loss"]
    print(f"[validate] loss {losses[0]:.1f} -> {np.mean(losses[-50:]):.2f}")

    verts, faces = read_ply("/tmp/sdf_validate/exp/test.ply")
    r = np.linalg.norm(verts, axis=-1)
    err = np.abs(r - RADIUS)
    voxel = 2.0 / 127
    print(f"[validate] mesh: {verts.shape[0]} verts, {faces.shape[0]} faces")
    print(f"[validate] radius {r.mean():.4f} (target {RADIUS}), "
          f"mean |err| {err.mean():.4f}, p95 {np.percentile(err, 95):.4f}, "
          f"voxel {voxel:.4f}")
    ok = err.mean() < voxel and np.percentile(err, 95) < 3 * voxel
    print("[validate]", "PASS" if ok else "FAIL",
          "(mean error < 1 voxel, p95 < 3 voxels)")
    return ok


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 4000)
