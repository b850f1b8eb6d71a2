"""Restart-durability of long runs (VERDICT r3 missing #2).

Host restarts wipe /tmp and ~/.cache; only the repo volume survives.  These
tests pin the three mechanisms that make a multi-hour run survive one:

  1. the durable artifact root (core/artifacts.py) resolves under the repo
     (or MSRA_TPU_RUN_ROOT) — never /tmp;
  2. the persistent XLA compile cache lives under that root and adopts any
     surviving legacy ~/.cache entries;
  3. a bare relaunch of a long-run tool (no --resume flag, SUPERVISE_ATTEMPT
     reset to 1 — exactly the post-restart state) RESUMES from the durable
     checkpoints instead of wiping them, and the merged log spans the whole
     run.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from msra_practice_project_tpu.core import artifacts


def test_durable_root_env_override(tmp_path, monkeypatch):
    monkeypatch.setenv("MSRA_TPU_RUN_ROOT", str(tmp_path / "custom"))
    assert artifacts.durable_root() == str(tmp_path / "custom")
    d = artifacts.run_dir("family")
    assert d == str(tmp_path / "custom" / "family")
    assert os.path.isdir(d)


def test_durable_root_default_under_repo(monkeypatch):
    monkeypatch.delenv("MSRA_TPU_RUN_ROOT", raising=False)
    root = artifacts.durable_root()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    assert root == os.path.join(repo, "runs")
    assert not root.startswith("/tmp")


def test_compile_cache_default_under_durable_root(tmp_path, monkeypatch):
    from msra_practice_project_tpu.core import compile_cache

    monkeypatch.setenv("MSRA_TPU_RUN_ROOT", str(tmp_path))
    assert compile_cache._default_dir() == str(tmp_path / ".xla_cache")


def test_compile_cache_adopts_legacy_entries(tmp_path, monkeypatch):
    from msra_practice_project_tpu.core import compile_cache

    legacy = tmp_path / "legacy"
    legacy.mkdir()
    (legacy / "entry_a").write_bytes(b"compiled-blob")
    monkeypatch.setattr(compile_cache, "_LEGACY_DIR", str(legacy))
    dst = tmp_path / "durable"
    dst.mkdir()
    compile_cache._adopt_legacy_entries(str(dst))
    assert (dst / "entry_a").read_bytes() == b"compiled-blob"
    # idempotent — a second adoption must not fail on existing links
    compile_cache._adopt_legacy_entries(str(dst))


def test_decide_resume_post_host_restart(tmp_path, monkeypatch):
    """The post-restart state: no --resume flag, SUPERVISE_ATTEMPT unset —
    checkpoints in the durable dir must still force a resume."""
    from tools.validate_pigan import decide_resume

    monkeypatch.delenv("SUPERVISE_ATTEMPT", raising=False)
    exp = tmp_path / "exp"
    # empty / missing dir -> fresh start
    assert decide_resume(str(exp)) is False
    exp.mkdir()
    assert decide_resume(str(exp)) is False
    # a durable checkpoint flips the decision with NO other signal
    (exp / "000500.ckpt").write_bytes(b"x")
    assert decide_resume(str(exp)) is True
    # --fresh overrides everything
    assert decide_resume(str(exp), fresh=True) is False
    # watchdog restart (supervise sets attempt>1) resumes even without ckpts
    monkeypatch.setenv("SUPERVISE_ATTEMPT", "2")
    assert decide_resume(str(tmp_path / "other")) is True


def test_host_restart_simulation_end_to_end(tmp_path, monkeypatch):
    """Simulated host restart around a real (tiny) pi-GAN training run.

    Phase 1 trains to step 6 with artifacts under the durable root and
    scratch state in a fake /tmp.  The "restart" wipes the fake /tmp and
    resets the process-level signals (SUPERVISE_ATTEMPT, argv flags).
    Phase 2 relaunches the same config; it must resume from the durable
    checkpoint — the merged loss log spans all 12 steps with the phase-1
    prefix intact (ref recovery mechanism being extended:
    nerf/train_nerf.py:101-114)."""
    from msra_practice_project_tpu.core.config import (PIGAN_TRAIN_DEFAULTS,
                                                       resolve)
    from msra_practice_project_tpu.train import train_pigan
    from tools.validate_pigan import decide_resume

    monkeypatch.delenv("SUPERVISE_ATTEMPT", raising=False)
    durable = tmp_path / "durable"
    fake_tmp = tmp_path / "fake_tmp"
    fake_tmp.mkdir()
    (fake_tmp / "scratch.bin").write_bytes(b"dies with the host")

    def cfg(iters):
        return resolve({
            "output_path": str(durable), "experiment_name": "exp",
            "data_path": "/nonexistent", "z_dim": 32,
            "render_coarse_sample_num": 2, "render_fine_sample_num": 2,
            "iterations": [iters], "fade_in_itrs": [0], "batch_size": [4],
            "resolution": [16], "data_n": 8, "hidden_dim": 32,
            "mapping_hidden_dim": 32, "i_print": 100, "i_save": 6,
            "i_image": 1000,
        }, PIGAN_TRAIN_DEFAULTS)

    first = train_pigan.train(cfg(6))
    exp_dir = str(durable / "exp")
    assert os.path.exists(os.path.join(exp_dir, "000006.ckpt"))

    # ---- the host restart ----
    for f in fake_tmp.iterdir():
        f.unlink()
    # process signals are gone; only the durable dir remains.  The tool's
    # relaunch decision must come out "resume".
    assert decide_resume(exp_dir) is True

    out = train_pigan.train(cfg(12))
    g = np.asarray(out["loss_log"]["g_loss"])
    assert len(g) == 12, "merged log must span the whole run"
    np.testing.assert_allclose(
        g[:6], np.asarray(first["loss_log"]["g_loss"]), rtol=1e-6)
    assert int(out["g_state"]["step"]) == 12
