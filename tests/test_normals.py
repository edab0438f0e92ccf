import numpy as np
import jax.numpy as jnp

from tpu3d import oracle
from tpu3d.ops.normals import estimate_normals
from tpu3d.types import PointCloud


def test_normals_match_oracle(rng):
    # Noisy curved surface well away from the origin so the viewpoint flip
    # (n·(-p) < 0) is decisive for every point.
    n = 150
    xy = rng.uniform(-0.2, 0.2, size=(n, 2)).astype(np.float32)
    z = 0.8 + 0.1 * (xy[:, 0] ** 2 + 0.5 * xy[:, 1] ** 2)
    pts = np.column_stack([xy, z]).astype(np.float32)

    exp = oracle.estimate_normals(pts, k=30)
    cloud = PointCloud.from_numpy(pts, capacity=256)
    out = estimate_normals(cloud, k=30, chunk=64)
    got = out.to_numpy()["normals"]

    dots = np.sum(got * exp, axis=1)
    assert np.all(dots > 0.999), f"min normal agreement {dots.min()}"


def test_normals_plane_is_z(rng):
    pts = np.column_stack(
        [
            rng.uniform(-0.1, 0.1, size=(100, 2)).astype(np.float32),
            np.full(100, 0.5, np.float32),
        ]
    )
    cloud = PointCloud.from_numpy(pts)
    out = estimate_normals(cloud, k=10)
    got = out.to_numpy()["normals"]
    # Plane at z=0.5 viewed from origin: normals oriented toward viewpoint
    # means n·(-p) >= 0 → n_z < 0.
    np.testing.assert_allclose(np.abs(got[:, 2]), 1.0, atol=1e-4)
    assert np.all(got[:, 2] < 0)


def test_normals_padding_rows_zero(rng):
    pts = rng.normal(size=(50, 3)).astype(np.float32) + 2.0
    cloud = PointCloud.from_numpy(pts, capacity=128)
    out = estimate_normals(cloud, k=5)
    normals = np.asarray(out.normals)
    assert np.all(normals[50:] == 0)
