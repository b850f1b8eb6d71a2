"""Oriented point-cloud loading for SDF fitting.

The reference loads a .mat file with an N x 6 array 'p' of (position, normal)
rows (siren/train_sdf.py:32).  We accept .mat, .npy or .npz.
"""

from __future__ import annotations

import numpy as np


def load_point_cloud(path: str, key: str = "p") -> np.ndarray:
    """Returns [N, 6] float32 (xyz, normal)."""
    if path.endswith(".mat"):
        import scipy.io
        data = scipy.io.loadmat(path)[key]
    elif path.endswith(".npz"):
        data = np.load(path)[key]
    else:
        data = np.load(path)
    data = np.asarray(data, dtype=np.float32)
    if data.ndim != 2 or data.shape[1] != 6:
        raise ValueError(f"expected [N, 6] point cloud, got {data.shape}")
    return data


def make_synthetic_sphere_cloud(n: int = 20000, radius: float = 0.6,
                                seed: int = 0) -> np.ndarray:
    """Unit-sphere surface samples with outward normals (tests/smoke)."""
    rng = np.random.default_rng(seed)
    v = rng.normal(size=(n, 3))
    v /= np.linalg.norm(v, axis=-1, keepdims=True)
    return np.concatenate([radius * v, v], axis=1).astype(np.float32)
