"""Product-surface multi-chip routing (VERDICT r4 item 1): the sharded
stack must be reachable from `register_pair(mesh=...)` and from the YAML
`parallel:` block alone — not just from the driver dryrun."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tpu3d.config import ParallelConfig, PipelineConfig
from tpu3d.parallel import make_mesh
from tpu3d.parallel.register_sharded import (
    pad_cloud_to_multiple,
    parallel_mesh,
    register_pair_sharded,
)
from tpu3d.registration import register_pair
from tpu3d.types import PointCloud


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual CPU mesh (conftest default)")
    return make_mesh(("shard",))


def _pair(n, seed=0, voxel=0.004):
    """Bumpy surface pair with known relative pose (rotation + translation).

    FPFH discriminativeness needs curvature that varies at the descriptor
    radius scale (r5 = 5·voxel): frequencies are tuned so w·r5 ≈ 1 rad per
    neighborhood (a low-frequency sheet is locally planar at every point →
    descriptor plateaus → RANSAC starves). The two phase-shifted components
    also break the 180°-flip symmetry a plain sin·cos sheet has."""
    rng = np.random.default_rng(seed)
    xy = rng.uniform(-0.15, 0.15, size=(n, 2)).astype(np.float32)
    r5 = 5.0 * voxel
    w1, w2 = 1.2 / r5, 0.45 / r5
    z = (
        0.7
        + 2.5 * voxel * np.sin(w1 * xy[:, 0]) * np.cos(0.8 * w1 * xy[:, 1])
        + 6.0 * voxel * np.cos(w2 * xy[:, 0]) * np.cos(1.1 * w2 * xy[:, 1])
    )
    tgt = np.column_stack([xy, z]).astype(np.float32)
    aa = np.array([0.12, -0.08, 0.15])
    th = np.linalg.norm(aa)
    k = aa / th
    K = np.array([[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]])
    R = (np.eye(3) + np.sin(th) * K + (1 - np.cos(th)) * K @ K).astype(
        np.float32
    )
    t = np.array([0.02, -0.01, 0.015], np.float32)
    src = ((tgt - t) @ R).astype(np.float32)
    return src, tgt, R, t


def test_parallel_mesh_resolution():
    assert parallel_mesh(None) is None
    assert parallel_mesh(ParallelConfig(mode="off")) is None
    m = parallel_mesh(ParallelConfig(mode="on"))
    assert m is not None and m.devices.size == len(jax.devices())
    m4 = parallel_mesh(ParallelConfig(mode="on", devices=4))
    assert m4 is not None and m4.devices.size == 4
    auto = parallel_mesh(ParallelConfig(mode="auto"))
    assert (auto is not None) == (len(jax.devices()) >= 2)


def test_pad_cloud_to_multiple():
    c = PointCloud.from_numpy(np.random.rand(100, 3).astype(np.float32))
    assert c.capacity == 128
    padded, _ = pad_cloud_to_multiple(c, None, 3)
    assert padded.capacity % 3 == 0
    assert int(padded.count()) == 100
    same, _ = pad_cloud_to_multiple(c, None, 8)
    assert same.capacity == 128  # already divisible — untouched


def test_register_pair_mesh_matches_single_device(mesh):
    """register_pair(mesh=...) — the public multi-chip entry — recovers the
    same pose as the single-device path on a clean fixture. RANSAC draw
    streams differ by design (chunk/shard keying), so the gate is the
    ICP-converged pose, not the coarse sample sequence."""
    from tpu3d.config import RegistrationConfig

    src_np, tgt_np, R, t = _pair(3000)
    src = PointCloud.from_numpy(src_np)
    tgt = PointCloud.from_numpy(tgt_np)
    cfg = RegistrationConfig(
        voxel_size=0.004, ransac_max_iterations=4000, icp_max_iterations=40
    )

    ref1, _ = register_pair(src, tgt, cfg)
    refN, coarseN = register_pair(src, tgt, cfg, mesh=mesh)

    T1 = np.asarray(ref1.transformation)
    TN = np.asarray(refN.transformation)
    # Both must recover the true pose…
    np.testing.assert_allclose(TN[:3, :3], R, atol=5e-3)
    np.testing.assert_allclose(TN[:3, 3], t, atol=2e-3)
    # …and agree with each other to ICP-convergence precision.
    np.testing.assert_allclose(TN, T1, atol=5e-3)
    assert float(refN.fitness) > 0.9
    assert float(coarseN.fitness) > 0.25


def test_register_pair_sharded_defaults_build_mesh(mesh):
    """register_pair_sharded with no mesh builds one over all devices."""
    src_np, tgt_np, R, t = _pair(1500, seed=3)
    from tpu3d.config import RegistrationConfig

    cfg = RegistrationConfig(
        voxel_size=0.005, ransac_max_iterations=2000, icp_max_iterations=30
    )
    refined, _ = register_pair_sharded(
        PointCloud.from_numpy(src_np), PointCloud.from_numpy(tgt_np), cfg
    )
    TN = np.asarray(refined.transformation)
    np.testing.assert_allclose(TN[:3, 3], t, atol=3e-3)


def test_prepare_sharded_default_halo_is_radius_aware(mesh):
    """A dense cloud whose 3·radius span exceeds the row-count default
    halo must STILL distribute: prepare_features_sharded estimates the
    needed strip from rows-per-x (regression: the radius-blind default
    always fell back single-device on dense+wide fixtures)."""
    from tpu3d.config import RegistrationConfig
    from tpu3d.parallel.register_sharded import prepare_features_sharded

    rng = np.random.default_rng(7)
    # Tuned so 3·r5 (0.0105 in x) exceeds the 1024-row count-based halo
    # (~0.0094) but fits the radius-aware estimate (~1835 rows ≈ 0.0168)
    # within one 2048-row shard — the regime the fix exists for.
    n, voxel = 16384, 7e-4
    r5 = 5.0 * voxel
    xy = rng.uniform(-0.075, 0.075, size=(n, 2)).astype(np.float32)
    w = 1.1 / r5
    z = 0.7 + 1.2 * r5 * np.sin(w * xy[:, 0]) * np.cos(0.8 * w * xy[:, 1])
    cloud = PointCloud.from_numpy(
        np.column_stack([xy, z]).astype(np.float32), capacity=n
    )
    cfg = RegistrationConfig(voxel_size=voxel)
    out, feat, distributed = prepare_features_sharded(cloud, cfg, mesh)
    assert distributed, "radius-aware default halo must span 3r here"
    v = np.asarray(out.mask)
    assert np.isfinite(np.asarray(out.normals)[v]).all()
    assert np.asarray(feat.descriptors)[v].sum() > 0


def test_pipeline_parallel_from_config(mesh):
    """The demo pipeline runs distributed from config alone: a `parallel:`
    block is the only change vs the stock demo config."""
    from tpu3d.pipeline.pipeline import Pipeline

    cfg = PipelineConfig()
    cfg.use_camera = False
    cfg.use_robot = False
    cfg.visualization = "none"
    cfg.camera.width = 320
    cfg.camera.height = 240
    cfg.registration.voxel_size = 0.005
    cfg.registration.ransac_max_iterations = 2000
    cfg.registration.icp_max_iterations = 30
    cfg.parallel.mode = "on"

    pipe = Pipeline(cfg, sleep_fn=lambda s: None)
    assert pipe._mesh is not None
    assert pipe._mesh.devices.size == len(jax.devices())
    waypoints = pipe.run()
    assert len(waypoints) == 1
    assert pipe._sharded_registrations == 1
    assert 0.0 <= pipe.instance_results[0]["fitness"] <= 1.0


def test_pipeline_sharded_sparse_escalation(mesh, capsys):
    """The sparse-arm loud-failure escalation must also be reachable on
    the SHARDED pipeline path (mesh active + prepare_mode='sparse'): a
    forced always-escalate threshold re-runs the instance through the
    full-prepare sharded arm, keep-better semantics."""
    import numpy as np

    from tpu3d.pipeline.pipeline import Pipeline
    from tpu3d.registration import downsample_bucketed, prepare_features

    rng = np.random.default_rng(7)
    xy = rng.uniform(-0.1, 0.1, size=(4000, 2)).astype(np.float32)
    z = 0.01 * np.sin(40 * xy[:, :1]) * np.cos(40 * xy[:, 1:2])
    pts = np.concatenate([xy, z], axis=1).astype(np.float32)

    cfg = PipelineConfig()
    cfg.use_camera = False
    cfg.use_robot = False
    cfg.visualization = "none"
    cfg.registration.voxel_size = 0.004
    cfg.registration.prepare_mode = "sparse"
    cfg.registration.sparse_escalate_fitness = 2.0  # always escalate
    cfg.registration.ransac_max_iterations = 2000
    cfg.registration.icp_max_iterations = 20
    cfg.parallel.mode = "on"
    pipe = Pipeline(cfg, sleep_fn=lambda s: None)
    assert pipe._mesh is not None
    pipe._neighbor_mode = "fused"

    down = downsample_bucketed(
        PointCloud.from_numpy(pts), cfg.registration
    )
    ref_cloud, ref_features = prepare_features(
        down, cfg.registration, "fused"
    )
    import time as _time

    pose = pipe._register_instance_inner(
        down, None, ref_cloud, ref_features, 0, _time.perf_counter()
    )
    assert pose is not None and np.all(np.isfinite(pose))
    out = capsys.readouterr().out
    assert "sparse sharded fitness" in out
    # Self-registration: identity survives the escalated sharded arm.
    T = pipe.instance_results[-1]["T_world_object"]
    np.testing.assert_allclose(T[:3, :3], np.eye(3), atol=0.05)


def test_parallel_yaml_block(tmp_path):
    """YAML `parallel:` keys parse into ParallelConfig."""
    from tpu3d.config import load_config

    p = tmp_path / "cfg.yaml"
    p.write_text(
        "parallel:\n  mode: auto\n  devices: 4\n  halo: 512\n"
        "use_camera: false\n"
    )
    cfg = load_config(str(p))
    assert cfg.parallel.mode == "auto"
    assert cfg.parallel.devices == 4
    assert cfg.parallel.halo == 512
    # Default stays off.
    assert PipelineConfig().parallel.mode == "off"
