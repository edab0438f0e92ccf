"""Coarse-to-fine registration (capability beyond the reference)."""

import numpy as np
import jax.numpy as jnp

from tpu3d.config import RegistrationConfig
from tpu3d.registration import register_pair, register_pair_multiscale
from tpu3d.types import PointCloud


def _surface(rng, n=4000):
    xy = rng.uniform(-0.2, 0.2, size=(n, 2)).astype(np.float32)
    z = 0.7 + 0.02 * np.sin(50 * xy[:, 0]) * np.cos(45 * xy[:, 1]) + \
        0.04 * np.sin(12 * xy[:, 0] + 0.7)
    return np.column_stack([xy, z]).astype(np.float32)


def test_multiscale_recovers_large_offset(rng):
    tgt = _surface(rng)
    aa = np.array([0.25, -0.2, 0.3])
    th = np.linalg.norm(aa)
    k = aa / th
    K = np.array([[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]])
    R = (np.eye(3) + np.sin(th) * K + (1 - np.cos(th)) * K @ K).astype(
        np.float32
    )
    t = np.array([0.05, -0.04, 0.06], np.float32)
    src = ((tgt - t) @ R).astype(np.float32)

    cfg = RegistrationConfig(
        voxel_size=0.004, ransac_max_iterations=4096, icp_max_iterations=30
    )
    refined, coarse = register_pair_multiscale(
        PointCloud.from_numpy(src), PointCloud.from_numpy(tgt), cfg,
        levels=2, scale_step=3.0,
    )
    T = np.asarray(refined.transformation)
    assert float(refined.fitness) > 0.6, float(refined.fitness)
    np.testing.assert_allclose(T[:3, :3], R, atol=0.02)
    np.testing.assert_allclose(T[:3, 3], t, atol=0.01)


def test_multiscale_matches_single_scale_on_easy_case(rng):
    tgt = _surface(rng, 2000)
    R = np.array([[0.995, 0.0998, 0], [-0.0998, 0.995, 0], [0, 0, 1]],
                 np.float32)
    t = np.array([0.01, -0.02, 0.015], np.float32)
    src = ((tgt - t) @ R).astype(np.float32)
    cfg = RegistrationConfig(
        voxel_size=0.005, ransac_max_iterations=4096, icp_max_iterations=30
    )
    a, _ = register_pair(PointCloud.from_numpy(src),
                         PointCloud.from_numpy(tgt), cfg)
    b, _ = register_pair_multiscale(PointCloud.from_numpy(src),
                                    PointCloud.from_numpy(tgt), cfg)
    np.testing.assert_allclose(np.asarray(a.transformation)[:3, 3],
                               np.asarray(b.transformation)[:3, 3], atol=5e-3)
