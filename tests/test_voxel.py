import numpy as np
import jax.numpy as jnp

from tpu3d import oracle
from tpu3d.ops.voxel import compact, voxel_downsample
from tpu3d.types import PointCloud


def _key_sorted(pts, voxel):
    keys = np.floor(pts / voxel).astype(np.int64)
    order = np.lexsort((keys[:, 2], keys[:, 1], keys[:, 0]))
    return pts[order]


def test_voxel_matches_oracle(rng):
    pts = rng.uniform(-0.3, 0.3, size=(400, 3)).astype(np.float32)
    cols = rng.uniform(0, 1, size=(400, 3)).astype(np.float32)
    voxel = 0.05

    exp_p, exp_c = oracle.voxel_downsample(pts, cols, voxel)

    cloud = PointCloud.from_numpy(pts, colors=cols)
    out = voxel_downsample(cloud, jnp.float32(voxel))
    got = out.to_numpy()

    assert len(got["points"]) == len(exp_p)
    np.testing.assert_allclose(
        _key_sorted(got["points"], voxel), exp_p, atol=1e-5
    )
    # Colors follow the same segment order as points.
    order_got = np.lexsort(
        np.floor(got["points"] / voxel).astype(np.int64).T[::-1]
    )
    np.testing.assert_allclose(got["colors"][order_got], exp_c, atol=1e-5)


def test_voxel_negative_coords_floor(rng):
    # int-floor (not trunc-toward-zero) on negatives: -0.3/0.25 → voxel -2.
    pts = np.array([[-0.30, 0.0, 0.0], [-0.26, 0.0, 0.0], [-0.24, 0.0, 0.0]],
                   np.float32)
    cloud = PointCloud.from_numpy(pts)
    out = voxel_downsample(cloud, jnp.float32(0.25)).to_numpy()
    # First two share voxel -2, third is voxel -1.
    assert len(out["points"]) == 2
    np.testing.assert_allclose(
        sorted(out["points"][:, 0]), [-0.28, -0.24], atol=1e-6
    )


def test_voxel_respects_mask(rng):
    pts = rng.uniform(0, 1, size=(100, 3)).astype(np.float32)
    cloud = PointCloud.from_numpy(pts, capacity=256)  # 156 padding rows
    out = voxel_downsample(cloud, jnp.float32(0.2))
    got = out.to_numpy()["points"]
    exp_p, _ = oracle.voxel_downsample(pts, None, 0.2)
    assert len(got) == len(exp_p)


def test_compact_preserves_order(rng):
    pts = rng.normal(size=(64, 3)).astype(np.float32)
    mask = rng.uniform(size=64) < 0.5
    cloud = PointCloud(points=jnp.asarray(pts), mask=jnp.asarray(mask))
    out = compact(cloud, 32)
    got = out.to_numpy()["points"]
    np.testing.assert_allclose(got, pts[mask][:32], atol=0)
