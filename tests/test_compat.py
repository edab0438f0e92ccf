"""The reference-shaped facade (tpu3d/compat.py) end to end."""

import numpy as np
import jax.numpy as jnp

from tpu3d.compat import Registration
from tpu3d.types import PointCloud


def test_reference_api_surface_roundtrip(rng, tmp_path):
    xy = rng.uniform(-0.15, 0.15, size=(300, 2)).astype(np.float32)
    z = 0.7 + 0.05 * np.sin(15 * xy[:, 0]) * np.cos(12 * xy[:, 1])
    tgt_pts = np.column_stack([xy, z]).astype(np.float32)
    R = np.array([[0.995, 0.0998, 0], [-0.0998, 0.995, 0], [0, 0, 1]],
                 np.float32)
    t = np.array([0.01, -0.02, 0.01], np.float32)
    src_pts = ((tgt_pts - t) @ R).astype(np.float32)

    voxel = 0.01
    src = Registration.voxelDownsample(PointCloud.from_numpy(src_pts), voxel)
    tgt = Registration.voxelDownsample(PointCloud.from_numpy(tgt_pts), voxel)
    src = Registration.estimateNormals(src, 30)
    tgt = Registration.estimateNormals(tgt, 30)
    sf = Registration.computeFPFH(src, voxel * 5)
    tf = Registration.computeFPFH(tgt, voxel * 5)
    coarse = Registration.ransacRegistration(src, tgt, sf, tf, voxel,
                                             max_iterations=4096)
    refined = Registration.icpRefine(src, tgt, coarse.transformation,
                                     voxel * 2.0, max_iterations=30)
    T = np.asarray(refined.transformation)
    assert float(refined.fitness) > 0.7
    np.testing.assert_allclose(T[:3, :3], R, atol=0.03)
    np.testing.assert_allclose(T[:3, 3], t, atol=0.015)


def test_load_reference_model_missing():
    cloud = Registration.loadReferenceModel("/nonexistent/m.ply")
    assert cloud.capacity == 0
