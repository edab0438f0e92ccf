"""Sharded-RANSAC feature-parity gates on the virtual 8-device mesh
(VERDICT r3 item 2): the distributed path must carry the single-chip
path's cost engineering — chunked early exit with the GLOBAL prefix
cutoff, gather-free rotation sampling, est+exact rescore — not just its
correctness. Two gates:

  * **Cost profile**: dispatched iteration ids, counted via
    ``return_consumed``. An easy scene (fitness > confidence in round 1)
    must consume ONE round (== the single-chip chunk budget, so the
    sharded/single dispatched-work ratio is 1.0 — well inside the 1.5x
    parity bound); a no-overlap scene must consume the full budget.
  * **Multi-seed AB**: across seeds, the sharded arm recovers the true
    pose within the same envelope as the single-chip arm and their exact
    (direct-rescore) fitnesses agree — hypothesis streams differ by
    construction (reseeding-class delta), so the gate is statistical,
    matching benchmarks/ab_stats.py's design.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tpu3d.ops.fpfh import compute_fpfh
from tpu3d.ops.normals import estimate_normals
from tpu3d.ops.ransac import ransac_registration
from tpu3d.parallel import make_mesh
from tpu3d.parallel.ransac_sharded import ransac_registration_sharded
from tpu3d.types import PointCloud


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual CPU mesh (conftest default)")
    return make_mesh(("shard",))


VOXEL = 0.004
N = 4096  # >= 2048 -> rotation sampling; >= 2*est_cap -> est scoring


def _scene(seed, noise=0.0):
    """Bumpy surface + a known rigid transform (+ optional noise on the
    source), with normals/FPFH prepared on both sides. n=4096 engages
    the rotation sampler AND the est+exact rescore in both arms."""
    rng = np.random.default_rng(seed)
    xy = rng.uniform(-0.15, 0.15, size=(N, 2)).astype(np.float32)
    z = 0.7 + 0.02 * np.sin(55 * xy[:, 0]) * np.cos(45 * xy[:, 1])
    tgt_pts = np.column_stack([xy, z]).astype(np.float32)

    aa = rng.uniform(-0.06, 0.06, size=3)
    th = float(np.linalg.norm(aa))
    k = aa / max(th, 1e-12)
    K = np.array([[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]])
    R = (np.eye(3) + np.sin(th) * K + (1 - np.cos(th)) * K @ K).astype(
        np.float32
    )
    t = rng.uniform(-0.012, 0.012, size=3).astype(np.float32)
    src_pts = ((tgt_pts - t) @ R).astype(np.float32)
    if noise:
        src_pts = src_pts + rng.normal(
            scale=noise * VOXEL, size=src_pts.shape
        ).astype(np.float32)

    tgt = estimate_normals(PointCloud.from_numpy(tgt_pts, capacity=N), k=15)
    src = estimate_normals(PointCloud.from_numpy(src_pts, capacity=N), k=15)
    tf = compute_fpfh(tgt, jnp.float32(VOXEL * 5))
    sf = compute_fpfh(src, jnp.float32(VOXEL * 5))
    return src, tgt, sf, tf, R, t


def test_sharded_cost_profile_early_exit(mesh):
    """Easy scene: the global cutoff lands in round 1, so consumed ids ==
    one round (== the single-chip hyp_chunk='auto' chunk of 25600 at a
    100k budget — dispatched-work ratio 1.0). No-overlap scene: the full
    budget is consumed, exactly."""
    src, tgt, sf, tf, _, _ = _scene(0)
    # confidence=0.99: the fixture's true correspondence-inlier fraction
    # is ~0.9985 (a few FPFH NNs land on wrong-but-nearby rows), so the
    # default 0.999 cutoff is unreachable BY CONSTRUCTION on any arm —
    # the gate here is the early-exit machinery, not the scene.
    _, consumed = ransac_registration_sharded(
        src, tgt, sf, tf, VOXEL, mesh=mesh, max_iterations=100000,
        confidence=0.99, return_consumed=True,
    )
    # auto hyp_chunk at 100k = 25600 global per round.
    assert int(consumed) == 25600, int(consumed)

    # No overlap: an unrelated source can never exceed confidence.
    rng = np.random.default_rng(99)
    far = rng.uniform(2.0, 3.0, size=(N, 3)).astype(np.float32)
    src_far = estimate_normals(PointCloud.from_numpy(far, capacity=N), k=15)
    sf_far = compute_fpfh(src_far, jnp.float32(VOXEL * 5))
    _, consumed_hard = ransac_registration_sharded(
        src_far, tgt, sf_far, tf, VOXEL, mesh=mesh, max_iterations=100000,
        return_consumed=True,
    )
    assert int(consumed_hard) == 100000, int(consumed_hard)


def test_sharded_multi_seed_ab(mesh):
    """Across seeds (clean + 0.1-voxel noise), the sharded arm's coarse
    pose error envelope matches the single-chip arm's, and both exact
    fitnesses are high (direct winner rescore). Pose errors are gated
    ABSOLUTELY (3-point coarse envelope) and RELATIVELY (sharded may not
    be systematically worse)."""
    rows = []
    for seed in range(6):
        noise = 0.1 if seed >= 3 else 0.0
        src, tgt, sf, tf, R, t = _scene(seed, noise=noise)
        res_s = ransac_registration_sharded(
            src, tgt, sf, tf, VOXEL, mesh=mesh, max_iterations=16384,
            seed=seed,
        )
        res_1 = ransac_registration(
            src, tgt, sf, tf, VOXEL, max_iterations=16384, seed=seed,
        )
        for res, arm in ((res_s, "sharded"), (res_1, "single")):
            T = np.asarray(res.transformation)
            rot_err = float(np.abs(T[:3, :3] - R).max())
            trn_err = float(np.abs(T[:3, 3] - t).max())
            rows.append(
                dict(arm=arm, seed=seed, noisy=bool(noise),
                     rot=rot_err, trn=trn_err, fit=float(res.fitness))
            )
    sh = [r for r in rows if r["arm"] == "sharded"]
    sg = [r for r in rows if r["arm"] == "single"]
    # Every seed must register (coarse envelope: 3-point sample class).
    # Fitness is the correspondence-inlier fraction: ~1 on clean scenes,
    # but 0.1-voxel descriptor noise degrades FPFH matching on BOTH arms
    # (observed ~0.3 at a near-exact pose) — pose error is the real gate
    # there, fitness only needs to clear the won-at-all bar.
    for r in rows:
        assert r["fit"] > (0.15 if r["noisy"] else 0.8), r
        assert r["rot"] < 0.08, r
        assert r["trn"] < 0.04, r
    # Statistical parity: mean errors within 2x + 1 coarse sigma of each
    # other (streams differ; neither arm may be systematically worse).
    m_rot_s = np.mean([r["rot"] for r in sh])
    m_rot_1 = np.mean([r["rot"] for r in sg])
    assert m_rot_s < 2.0 * m_rot_1 + 0.01, (m_rot_s, m_rot_1)
    m_fit_s = np.mean([r["fit"] for r in sh])
    m_fit_1 = np.mean([r["fit"] for r in sg])
    assert abs(m_fit_s - m_fit_1) < 0.05, (m_fit_s, m_fit_1)
