"""Eval/demo suite tests on tiny trained experiments (virtual CPU backend)."""

import json
import os

import jax
import numpy as np
import pytest

from msra_practice_project_tpu.core.config import (
    NERF_TRAIN_DEFAULTS, PIGAN_TRAIN_DEFAULTS, resolve,
)


@pytest.fixture(scope="module")
def nerf_exp(tmp_path_factory):
    from msra_practice_project_tpu.train import train_nerf

    tmp_path = tmp_path_factory.mktemp("nerf_eval")
    cfg = resolve({
        "output_path": str(tmp_path), "experiment_name": "exp",
        "data_path": "/nonexistent", "iterations": 8, "batch_size": 32,
        "start_up_itrs": 0, "render_coarse_sample_num": 4,
        "render_fine_sample_num": 4, "i_print": 100, "i_save": 8,
        "i_image": 100, "data_size": 12,
    }, NERF_TRAIN_DEFAULTS)
    train_nerf.train(cfg)
    return str(tmp_path / "exp")


def test_test_nerf_sweep(nerf_exp):
    from msra_practice_project_tpu.eval import test_nerf

    data = test_nerf.run(nerf_exp, 8, max_views=2)
    assert os.path.exists(os.path.join(nerf_exp, "test.json"))
    assert os.path.exists(os.path.join(nerf_exp, "test.jpg"))
    loaded = json.load(open(os.path.join(nerf_exp, "test.json")))
    assert len(loaded["psnr"]["train"]) > 0
    assert all(np.isfinite(v) for v in loaded["psnr"]["train"])
    assert all(0 <= v <= 1 for v in loaded["ssim"]["train"])
    # perceptual score must be non-null with provenance recorded
    # (1-msssim fallback in a no-weights environment)
    assert loaded["perceptual_metric"] == "1-msssim"
    assert all(v is not None and np.isfinite(v)
               for v in loaded["perceptual"]["train"])


def test_show_nerf_orbit(nerf_exp):
    from msra_practice_project_tpu.eval import show_nerf

    show_nerf.run(nerf_exp, None, width=12, height=12, n_frames=3)
    gifs = [f for f in os.listdir(nerf_exp) if f.endswith(".gif")]
    assert len(gifs) == 2  # rgb + alpha


def test_demo_view(nerf_exp):
    from msra_practice_project_tpu.eval import demo_view

    demo_view.run(nerf_exp)
    assert os.path.exists(os.path.join(nerf_exp, "demo.jpg"))


def test_demo_param_and_analysis(nerf_exp, tmp_path):
    from msra_practice_project_tpu.eval import analysis_param, analysis_view, demo_param

    out = str(tmp_path / "grid.jpg")
    demo_param.run(out, [nerf_exp], n_views=2)
    assert os.path.exists(out)

    prefix = str(tmp_path / "view")
    analysis_view.run(prefix, [nerf_exp])
    assert os.path.exists(prefix + "_psnr.png")

    prefix2 = str(tmp_path / "param")
    analysis_param.run(prefix2, [(0.1, nerf_exp), (0.2, nerf_exp)])
    assert os.path.exists(prefix2 + "_psnr.png")


# ---------------------------------------------------------------------------
# pi-GAN demos / mesh / synthesis / diagnostics on a fresh tiny G
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def pigan_exp(tmp_path_factory):
    from msra_practice_project_tpu.train.train_pigan import train

    tmp_path = tmp_path_factory.mktemp("pigan_eval")
    cfg = resolve({
        "output_path": str(tmp_path), "experiment_name": "exp",
        "data_path": "/nonexistent", "z_dim": 16,
        "render_coarse_sample_num": 2, "render_fine_sample_num": 2,
        "iterations": [4], "fade_in_itrs": [0], "batch_size": [2],
        "resolution": [8], "i_print": 100, "i_save": 4, "i_image": 100,
        "data_n": 4,
    }, PIGAN_TRAIN_DEFAULTS)
    train(cfg)
    return cfg, str(tmp_path / "exp")


def test_pigan_demo_modes(pigan_exp, tmp_path):
    from msra_practice_project_tpu.eval import pigan_demo

    cfg, log = pigan_exp
    generator, _, state, _ = pigan_demo.load_generator(cfg)
    gp = state["g"]["params"]
    key = jax.random.PRNGKey(0)
    kw = dict(resolution=8, coarse=2, fine=2)

    pigan_demo.save_demo(generator, gp, key, str(tmp_path / "g.png"),
                         rows=2, columns=2, resolution=8, coarse=2, fine=2)
    pigan_demo.demo_multiview(generator, gp, key, str(tmp_path / "mv.png"),
                              [(0.0, 0.0), (0.3, 0.0)], rows=2, **kw)
    pigan_demo.demo_video(generator, gp, key, str(tmp_path / "v.gif"),
                          [(0.0, 0.0), (0.3, 0.0)], **kw)
    pigan_demo.demo_interpolate(generator, gp, key,
                                str(tmp_path / "i.png"), cols=3, **kw)
    pigan_demo.demo_style_mix(generator, gp, key, str(tmp_path / "s.png"),
                              rows=1, **kw)
    for f in ["g.png", "mv.png", "v.gif", "i.png", "s.png"]:
        assert (tmp_path / f).exists(), f


def test_pigan_fov_poses(pigan_exp, tmp_path):
    """3-tuple poses carry a per-view fov (demo mode 3)."""
    from msra_practice_project_tpu.eval import pigan_demo

    cfg, _ = pigan_exp
    generator, _, state, _ = pigan_demo.load_generator(cfg)
    gp = state["g"]["params"]
    film = generator.get_mapping(
        gp, jax.random.normal(jax.random.PRNGKey(1), (1, 16)))
    imgs = pigan_demo.render_films(
        generator, gp, jax.random.PRNGKey(2), film,
        [(0.0, 0.0, 6.0), (0.0, 0.0, 30.0)], resolution=8, coarse=2, fine=2)
    assert imgs.shape == (1, 2, 8, 8, 3)
    # wider fov sees more background -> images differ
    assert not np.allclose(imgs[0, 0], imgs[0, 1])


def test_pigan_extract_mesh(pigan_exp, tmp_path):
    from msra_practice_project_tpu.eval import extract_mesh, pigan_demo

    cfg, _ = pigan_exp
    generator, _, state, _ = pigan_demo.load_generator(cfg)
    out = str(tmp_path / "mesh")
    verts, faces = extract_mesh.extract_mesh(
        generator, state["g"]["params"], jax.random.PRNGKey(0), out, n=16)
    # untrained density may or may not cross level -20; just check types+file
    assert verts.shape[1] == 3 and faces.shape[1] == 3
    assert os.path.exists(out + ".ply")


def test_pigan_synthesis(pigan_exp, monkeypatch):
    from msra_practice_project_tpu.train import synthesis

    cfg, log = pigan_exp
    cfg = dict(cfg)
    cfg["syn_iterations"] = 3
    # monkeypatch module constants for a tiny run (auto-restored)
    for name, val in (("RESOLUTION", 8), ("COARSE", 2), ("FINE", 2),
                      ("FINAL_RES", 8), ("FINAL_COARSE", 2),
                      ("FINAL_FINE", 2), ("I_IMAGE", 1000),
                      ("I_SAVE", 1000)):
        monkeypatch.setattr(synthesis, name, val)
    from msra_practice_project_tpu.core.config import Config
    out = synthesis.synthesize(Config(cfg))
    assert np.isfinite(out["loss_log"]).all()
    assert out["film"].shape == (9, 512)
    assert os.path.exists(log + "_syn/demo.png")
    assert os.path.exists(log + "_syn/demo.gif")


def test_pigan_test_diagnostics(pigan_exp, capsys):
    from msra_practice_project_tpu.eval import pigan_test

    cfg, log = pigan_exp
    pigan_test.run(cfg, n=2, resolution=8)
    captured = capsys.readouterr().out
    assert "D logits (generated):" in captured
    assert os.path.exists(os.path.join(log, "loss_curves.png"))


def test_pose_prior_scatter(pigan_exp, tmp_path):
    from msra_practice_project_tpu.eval import pigan_demo

    cfg, _ = pigan_exp
    generator, _, state, _ = pigan_demo.load_generator(cfg)
    out = str(tmp_path / "poses.png")
    pigan_demo.show_pose_distribution(generator, jax.random.PRNGKey(0),
                                      n=100, save_path=out)
    assert os.path.exists(out)


def test_pigan_synthesis_multistep_matches_single(pigan_exp, monkeypatch):
    """steps_per_call>1 (scan dispatch) must reproduce the single-step
    loss history exactly (same per-step RNG keys, same update order)."""
    import shutil

    from msra_practice_project_tpu.core.config import Config
    from msra_practice_project_tpu.train import synthesis

    cfg, log = pigan_exp
    for name, val in (("RESOLUTION", 8), ("COARSE", 2), ("FINE", 2),
                      ("FINAL_RES", 8), ("FINAL_COARSE", 2),
                      ("FINAL_FINE", 2), ("I_IMAGE", 1000), ("I_SAVE", 1000)):
        monkeypatch.setattr(synthesis, name, val)
    outs = {}
    for k in (1, 4):
        shutil.rmtree(log + "_syn", ignore_errors=True)  # fresh resume state
        c = dict(cfg)
        c["syn_iterations"] = 6
        c["steps_per_call"] = k
        outs[k] = synthesis.synthesize(Config(c))["loss_log"]
    np.testing.assert_allclose(outs[1], outs[4], rtol=1e-6)


def test_test_nerf_sweep_with_watchdog(tmp_path):
    """A config carrying watchdog_timeout must arm (and cleanly disarm) the
    eval sweep's per-view watchdog — the soak's phase C runs exactly this
    configuration under the supervisor."""
    from msra_practice_project_tpu.eval import test_nerf
    from msra_practice_project_tpu.train import train_nerf

    cfg = resolve({
        "output_path": str(tmp_path), "experiment_name": "exp",
        "data_path": "/nonexistent", "iterations": 4, "batch_size": 32,
        "start_up_itrs": 0, "render_coarse_sample_num": 4,
        "render_fine_sample_num": 4, "i_print": 100, "i_save": 4,
        "i_image": 100, "data_size": 12, "watchdog_timeout": 600,
    }, NERF_TRAIN_DEFAULTS)
    train_nerf.train(cfg)
    data = test_nerf.run(str(tmp_path / "exp"), 4, max_views=1)
    assert np.isfinite(data["psnr"]["train"]).all()
