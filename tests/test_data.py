"""Data-layer tests: blender loader filter semantics, image folder, clouds."""

import json
import os

import numpy as np
import pytest

from msra_practice_project_tpu.data import blender, image, image_folder, pointcloud
from msra_practice_project_tpu.ops import rays as ray_ops


@pytest.fixture(scope="module")
def blender_dir(tmp_path_factory):
    """Synthetic scene with CONTROLLED camera angles for filter tests."""
    tmp = str(tmp_path_factory.mktemp("blender"))
    thetas = [0.0, 20.0, 100.0, -100.0, 170.0]  # train/val angles
    phis = [-10.0, -20.0, -10.0, -30.0, -15.0]
    from PIL import Image

    for split in ["train", "val", "test"]:
        frames = []
        os.makedirs(os.path.join(tmp, split), exist_ok=True)
        for i, (th, ph) in enumerate(zip(thetas, phis)):
            c2w = np.asarray(ray_ops.camera_pose_deg(4.0, th, ph))
            m = np.linalg.inv(blender.BLENDER_COORD) @ c2w
            img = np.full((8, 8, 4), 128, np.uint8)
            rel = f"./{split}/r_{i}"
            Image.fromarray(img, "RGBA").save(os.path.join(tmp, rel + ".png"))
            frames.append({"file_path": rel, "transform_matrix": m.tolist()})
        with open(os.path.join(tmp, f"transforms_{split}.json"), "w") as f:
            json.dump({"camera_angle_x": 0.6911, "frames": frames}, f)
    return tmp


def test_loader_no_filter(blender_dir):
    images, poses, w, h, focal, idx = blender.load_blender_data(blender_dir)
    assert images["train"].shape == (5, 8, 8, 4)
    assert images["val"]["in"].shape[0] == 5     # all in-range
    assert images["val"]["ex"].shape[0] == 0
    assert idx == [0, 1, 2, 3, 4]
    assert w == h == 8
    assert focal == pytest.approx(0.5 * 8 / np.tan(0.5 * 0.6911), rel=1e-5)


def test_loader_view_range_window(blender_dir):
    """Single window [-30,30]x[-25,0]: keeps theta 0,20 with phi > -25."""
    rng = [[-30, 30, -25, 0]]
    images, poses, *_ , idx = blender.load_blender_data(
        blender_dir, view_dir_range=rng)
    assert idx == [0, 1]                      # thetas 0, 20 (phis -10,-20)
    # val split: in-range go to 'in', rest to 'ex'
    assert images["val"]["in"].shape[0] == 2
    assert images["val"]["ex"].shape[0] == 3


def test_loader_multi_window(blender_dir):
    rng = [[-30, 30, -25, 0], [90, 110, -40, 0]]
    _, _, *_ , idx = blender.load_blender_data(blender_dir,
                                               view_dir_range=rng)
    assert idx == [0, 1, 2]                   # adds theta=100


def test_loader_explicit_train_idx(blender_dir):
    images, _, *_ , idx = blender.load_blender_data(blender_dir,
                                                    train_idx=[1, 3])
    assert idx == [1, 3]
    assert images["train"].shape[0] == 2


def test_loader_target_num(blender_dir):
    rng = np.random.default_rng(0)
    images, _, *_ , idx = blender.load_blender_data(blender_dir,
                                                    target_num=3, rng=rng)
    assert images["train"].shape[0] == 3
    assert len(idx) == 3


def test_loader_test_skip(blender_dir):
    images, *_ = blender.load_blender_data(blender_dir, test_skip=2)
    assert images["test"].shape[0] == 3       # every 2nd of 5


def test_premultiply_white():
    images = {"train": np.zeros((1, 2, 2, 4), np.float32),
              "val": {"in": np.zeros((0, 2, 2, 4), np.float32),
                      "ex": np.zeros((0, 2, 2, 4), np.float32)}}
    images["train"][..., :3] = 0.5
    images["train"][0, 0, 0, 3] = 1.0         # opaque pixel
    images["train"][0, 1, 1, 3] = 0.0         # transparent pixel
    blender.premultiply_white(images)
    np.testing.assert_allclose(images["train"][0, 0, 0, :3], 0.5)
    np.testing.assert_allclose(images["train"][0, 1, 1, :3], 1.0)  # white


def test_image_folder_epochs(tmp_path):
    image_folder.make_synthetic_faces(str(tmp_path), n=10, size=8)
    ds = image_folder.ImageFolder(str(tmp_path), batch_size=4)
    assert len(ds) == 10
    assert ds.batch_num == 2                  # keep_full drops ragged tail
    seen = []
    for _ in range(4):
        epoch, bidx, batch = ds.get()
        assert batch.shape == (4, 8, 8, 3)
        seen.append((epoch, bidx))
    assert seen == [(0, 0), (0, 1), (1, 0), (1, 1)]


def test_image_folder_prefetch_stream_identical(tmp_path):
    """The threaded-prefetch streaming path must yield the exact same
    (epoch, batch, contents) sequence as the synchronous one."""
    image_folder.make_synthetic_faces(str(tmp_path), n=10, size=8)
    sync = image_folder.ImageFolder(str(tmp_path), batch_size=4,
                                    preload=False, prefetch=False, seed=3)
    pre = image_folder.ImageFolder(str(tmp_path), batch_size=4,
                                   preload=False, prefetch=True, seed=3)
    try:
        for _ in range(6):  # spans two epoch reshuffles
            es, bs, xs = sync.get()
            ep, bp, xp = pre.get()
            assert (es, bs) == (ep, bp)
            np.testing.assert_array_equal(np.asarray(xs), np.asarray(xp))
    finally:
        pre.close()
    assert pre._worker is None  # close() joined the thread


def test_image_folder_prefetch_worker_error_surfaces(tmp_path):
    """A corrupt image must raise in get(), not hang the consumer on a dead
    worker thread (ADVICE r2 medium)."""
    import pytest

    image_folder.make_synthetic_faces(str(tmp_path), n=4, size=8)
    # corrupt one file so the worker's PIL decode raises
    with open(tmp_path / "00002.png", "wb") as f:
        f.write(b"not a png at all")
    ds = image_folder.ImageFolder(str(tmp_path), batch_size=4,
                                  preload=False, prefetch=True, seed=0)
    try:
        with pytest.raises(RuntimeError, match="prefetch worker failed"):
            ds.get()
    finally:
        ds.close()


def test_image_folder_resize(tmp_path):
    image_folder.make_synthetic_faces(str(tmp_path), n=4, size=64)
    ds = image_folder.ImageFolder(str(tmp_path), batch_size=2, resize=0.5)
    _, _, batch = ds.get()
    assert batch.shape == (2, 32, 32, 3)


def test_image_to_coords_convention():
    img = np.arange(6, dtype=np.float32).reshape(2, 3, 1) / 6.0
    pv = image.image_to_coords(img, shuffle=False)
    assert pv.shape == (6, 3)
    # first row: x=-1 (left), y=-1 (top), value img[0,0]
    np.testing.assert_allclose(pv[0], [-1, -1, 0.0], atol=1e-6)
    # last row: x=+1, y=+1, value img[1,2]
    np.testing.assert_allclose(pv[-1], [1, 1, 5 / 6.0], atol=1e-6)


def test_point_cloud_roundtrip(tmp_path):
    cloud = pointcloud.make_synthetic_sphere_cloud(100, radius=0.5)
    assert cloud.shape == (100, 6)
    np.testing.assert_allclose(np.linalg.norm(cloud[:, :3], axis=1), 0.5,
                               atol=1e-5)
    # normals are unit + radial
    np.testing.assert_allclose(np.linalg.norm(cloud[:, 3:], axis=1), 1.0,
                               atol=1e-5)
    p = str(tmp_path / "c.npy")
    np.save(p, cloud)
    back = pointcloud.load_point_cloud(p)
    np.testing.assert_allclose(back, cloud)

    import scipy.io
    pm = str(tmp_path / "c.mat")
    scipy.io.savemat(pm, {"p": cloud})
    back = pointcloud.load_point_cloud(pm)
    np.testing.assert_allclose(back, cloud, atol=1e-6)


def test_dem_cloud_real_terrain():
    """make_dem_cloud samples the REAL bundled Jacksboro Fault DEM: points
    must lie exactly on the (bilinear) heightfield, normals unit-length and
    consistent with the height gradient (upward-facing), and the whole
    cloud loadable through the standard .npz data_path pipeline."""
    from scipy.interpolate import RegularGridInterpolator

    cloud = pointcloud.make_dem_cloud(n=5000, extent=0.7, z_scale=0.2)
    assert cloud.shape == (5000, 6) and cloud.dtype == np.float32
    pos, nrm = cloud[:, :3], cloud[:, 3:]
    assert np.abs(pos[:, 0]).max() <= 0.7 + 1e-6
    assert np.abs(pos[:, 1]).max() <= 0.7 + 1e-6
    assert np.abs(pos[:, 2]).max() <= 0.2 + 1e-6
    np.testing.assert_allclose(np.linalg.norm(nrm, axis=1), 1.0, rtol=1e-5)
    assert (nrm[:, 2] > 0).all()  # heightfield normals face up
    height, x_lin, y_lin = pointcloud.load_dem_heightfield(0.7, 0.2)
    interp = RegularGridInterpolator((y_lin, x_lin), height)
    z_true = interp(np.stack([pos[:, 1], pos[:, 0]], axis=1))
    np.testing.assert_allclose(pos[:, 2], z_true, atol=2e-6)


def test_dem_cloud_closed_solid():
    """closed=True closes the heightfield into a watertight solid block:
    every point lies on exactly one of the six faces (DEM top, flat bottom,
    four skirt sides), normals are unit-length and outward, and all faces
    are populated (area-proportional sampling)."""
    extent, z_bottom = 0.7, -0.35
    cloud = pointcloud.make_dem_cloud(n=8000, extent=extent, z_scale=0.2,
                                      closed=True, z_bottom=z_bottom)
    assert cloud.shape == (8000, 6) and cloud.dtype == np.float32
    pos, nrm = cloud[:, :3], cloud[:, 3:]
    np.testing.assert_allclose(np.linalg.norm(nrm, axis=1), 1.0, rtol=1e-5)
    eps = 1e-6
    on_bottom = np.abs(pos[:, 2] - z_bottom) <= eps
    on_side = (np.abs(np.abs(pos[:, 0]) - extent) <= eps) | \
        (np.abs(np.abs(pos[:, 1]) - extent) <= eps)
    on_top = ~on_bottom & ~on_side
    # every point on exactly one face class; all classes populated
    assert (on_bottom | on_side | on_top).all()
    assert on_bottom.sum() > 500 and on_side.sum() > 500 \
        and on_top.sum() > 2000
    # outward normals: bottom -z, sides point away from the axis, top +z
    assert np.abs(nrm[on_bottom] - np.array([0.0, 0.0, -1.0])).max() <= eps
    assert (nrm[on_top][:, 2] > 0).all()
    side_dot = np.sum(nrm[on_side][:, :2] * np.sign(pos[on_side][:, :2]),
                      axis=1)
    assert (side_dot > 1 - 1e-5).all()
    # top points still lie on the true heightfield
    from scipy.interpolate import RegularGridInterpolator
    height, x_lin, y_lin = pointcloud.load_dem_heightfield(extent, 0.2)
    interp = RegularGridInterpolator((y_lin, x_lin), height)
    t = pos[on_top]
    np.testing.assert_allclose(
        t[:, 2], interp(np.stack([t[:, 1], t[:, 0]], axis=1)), atol=2e-6)
    # side z stays within [z_bottom, edge height]
    s = pos[on_side]
    assert s[:, 2].min() >= z_bottom - eps
    assert s[:, 2].max() <= height.max() + 1e-5


def test_dem_cloud_loads_via_npz(tmp_path):
    cloud = pointcloud.make_dem_cloud(n=100)
    p = tmp_path / "dem.npz"
    np.savez(p, p=cloud)
    loaded = pointcloud.load_point_cloud(str(p))
    np.testing.assert_array_equal(loaded, cloud)


def test_synthetic_faces_variants(tmp_path):
    """All three dataset variants render; the face variant adds dark
    eye/mouth albedo features (deterministic per seed) on top of the shaded
    head, keeping the soft silhouette."""
    from PIL import Image

    arrs = {}
    for v in ("blobs", "shaded", "face"):
        d = tmp_path / v
        image_folder.make_synthetic_faces(str(d), n=4, size=32, seed=5,
                                          variant=v)
        arrs[v] = np.stack([
            np.asarray(Image.open(d / f"{i:05d}.png"), np.float32) / 255.0
            for i in range(4)])
    for v, a in arrs.items():
        assert a.shape == (4, 32, 32, 3) and np.isfinite(a).all()
    # the first image shares its pose/colour draws with the shaded variant
    # (feature params are drawn after them), so the features can only
    # DARKEN it — and substantially
    diff = arrs["shaded"][0] - arrs["face"][0]
    assert diff.min() >= -0.005          # face only removes light
    assert diff.max() > 0.1              # ...and does so substantially
    # determinism
    d2 = tmp_path / "face2"
    image_folder.make_synthetic_faces(str(d2), n=4, size=32, seed=5,
                                      variant="face")
    again = np.stack([
        np.asarray(Image.open(d2 / f"{i:05d}.png"), np.float32) / 255.0
        for i in range(4)])
    np.testing.assert_array_equal(again, arrs["face"])


def test_synthetic_bigface_fills_frame(tmp_path):
    """The bigface variant is CelebA's regime: foreground covers most of
    the frame (the small-blob variants are ~85% flat background — the
    measured flat-field attractor for long-horizon GAN training)."""
    from PIL import Image

    cover = {}
    for v in ("face", "bigface"):
        d = tmp_path / v
        image_folder.make_synthetic_faces(str(d), n=6, size=32, seed=3,
                                          variant=v)
        a = np.stack([
            np.asarray(Image.open(d / f"{i:05d}.png"), np.float32) / 255.0
            for i in range(6)])
        assert np.isfinite(a).all()
        # foreground = pixels that deviate from the 0.9-gray background
        fg = (np.abs(a - 0.9).max(axis=-1) > 0.05).mean()
        cover[v] = fg
    assert cover["bigface"] > 0.5
    assert cover["bigface"] > 2 * cover["face"]
