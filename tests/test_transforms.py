import numpy as np
import jax.numpy as jnp

from tpu3d import oracle
from tpu3d.ops import transforms


def _random_rotation(rng):
    q = rng.normal(size=4)
    q /= np.linalg.norm(q)
    w, x, y, z = q
    return np.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ]
    )


def test_make_invert_roundtrip(rng):
    R = _random_rotation(rng).astype(np.float32)
    t = rng.normal(size=3).astype(np.float32)
    T = transforms.make_transform(jnp.asarray(R), jnp.asarray(t))
    Tinv = transforms.invert_transform(T)
    np.testing.assert_allclose(np.asarray(T @ Tinv), np.eye(4), atol=1e-5)


def test_transform_points(rng):
    R = _random_rotation(rng).astype(np.float32)
    t = rng.normal(size=3).astype(np.float32)
    pts = rng.normal(size=(50, 3)).astype(np.float32)
    T = transforms.make_transform(jnp.asarray(R), jnp.asarray(t))
    got = np.asarray(transforms.transform_points(T, jnp.asarray(pts)))
    np.testing.assert_allclose(got, pts @ R.T + t, atol=1e-5)


def test_euler_xyz_matches_oracle_composition(rng):
    angles = rng.normal(size=3).astype(np.float32)

    def rx(a):
        c, s = np.cos(a), np.sin(a)
        return np.array([[1, 0, 0], [0, c, -s], [0, s, c]])

    def ry(a):
        c, s = np.cos(a), np.sin(a)
        return np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])

    def rz(a):
        c, s = np.cos(a), np.sin(a)
        return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])

    expected = rx(angles[0]) @ ry(angles[1]) @ rz(angles[2])
    got = np.asarray(transforms.euler_xyz_to_matrix(jnp.asarray(angles)))
    np.testing.assert_allclose(got, expected, atol=1e-6)


def test_kabsch_recovers_rigid_transform(rng):
    R = _random_rotation(rng)
    t = rng.normal(size=3)
    src = rng.normal(size=(40, 3))
    tgt = src @ R.T + t
    R_got, t_got = transforms.kabsch(jnp.asarray(src, jnp.float32),
                                     jnp.asarray(tgt, jnp.float32))
    np.testing.assert_allclose(np.asarray(R_got), R, atol=1e-4)
    np.testing.assert_allclose(np.asarray(t_got), t, atol=1e-4)


def test_kabsch_matches_oracle_3pt(rng):
    src = rng.normal(size=(3, 3)).astype(np.float32)
    R_true = _random_rotation(rng)
    tgt = (src @ R_true.T + rng.normal(size=3)).astype(np.float32)
    R_o, t_o = oracle.kabsch(src, tgt)
    R_j, t_j = transforms.kabsch(jnp.asarray(src), jnp.asarray(tgt))
    np.testing.assert_allclose(np.asarray(R_j), R_o, atol=1e-4)
    np.testing.assert_allclose(np.asarray(t_j), t_o, atol=1e-4)


def test_kabsch_reflection_fix(rng):
    # Degenerate correspondences that would yield a reflection without the
    # det fix (registration.cpp:258-262).
    src = np.array([[1, 0, 0], [0, 1, 0], [0, 0, 1.0]], np.float32)
    tgt = np.array([[1, 0, 0], [0, 1, 0], [0, 0, -1.0]], np.float32)
    R, _ = transforms.kabsch(jnp.asarray(src), jnp.asarray(tgt))
    assert np.linalg.det(np.asarray(R)) > 0.99


def test_rpy_zyx_matches_robot_convention(rng):
    R = _random_rotation(rng).astype(np.float32)
    rpy = np.asarray(transforms.matrix_to_rpy_zyx(jnp.asarray(R)))
    # oracle per robot.cpp:42-52
    pitch = np.arcsin(-R[2, 0])
    roll = np.arctan2(R[2, 1], R[2, 2])
    yaw = np.arctan2(R[1, 0], R[0, 0])
    np.testing.assert_allclose(rpy, [roll, pitch, yaw], atol=1e-5)


def test_rpy_zyx_gimbal_lock():
    # pitch = +90°: R[2,0] = -1 exactly.
    R = np.array([[0, 0, 1], [0, 1, 0], [-1, 0, 0]], np.float32)
    rpy = np.asarray(transforms.matrix_to_rpy_zyx(jnp.asarray(R)))
    assert abs(rpy[1] - np.pi / 2) < 1e-5
    assert rpy[2] == 0.0


def test_kabsch3_planes_matches_kabsch_quat():
    """The plane-layout 3-point solver shares the QCP core with
    kabsch_quat — same rotations/translations for random triples."""
    import numpy as np
    import jax.numpy as jnp

    from tpu3d.ops.transforms import kabsch3_planes, kabsch_quat

    rng = np.random.default_rng(7)
    h = 64
    src = rng.normal(size=(h, 3, 3)).astype(np.float32)
    aa = rng.normal(size=3)
    th = np.linalg.norm(aa)
    k = aa / th
    K = np.array([[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]])
    R = (np.eye(3) + np.sin(th) * K + (1 - np.cos(th)) * K @ K).astype(
        np.float32
    )
    t = np.float32([0.1, -0.2, 0.05])
    tgt = src @ R.T + t

    Rq, tq = kabsch_quat(jnp.asarray(src), jnp.asarray(tgt))
    ps = tuple(
        tuple(jnp.asarray(src[:, k_, c]) for c in range(3)) for k_ in range(3)
    )
    qs = tuple(
        tuple(jnp.asarray(tgt[:, k_, c]) for c in range(3)) for k_ in range(3)
    )
    rp, tp = kabsch3_planes(ps, qs)
    Rp = np.stack([np.asarray(x) for x in rp], axis=1).reshape(h, 3, 3)
    Tp = np.stack([np.asarray(x) for x in tp], axis=1)
    np.testing.assert_allclose(np.asarray(Rq), Rp, atol=1e-4)
    np.testing.assert_allclose(np.asarray(tq), Tp, atol=1e-4)
    # Both recover the ground-truth rigid motion on exact data (f32 QCP
    # Newton precision on random triples is ~1e-4).
    np.testing.assert_allclose(Rp, np.broadcast_to(R, (h, 3, 3)), atol=1e-3)


def test_kabsch_quat_degenerate_triples_stay_orthonormal(rng):
    """Near-collinear / tiny-extent 3-point samples must yield ORTHONORMAL
    rotations (regression: the QCP adjugate-column norm is built from raw
    3x3 cofactors, which underflow f32 for ~1e-4 m triples — the
    'normalized' quaternion came out with ||q|| = 1.0044 (or NaN), i.e. a
    SCALED rotation, and one such sample scored fitness 1.0 in RANSAC's
    rank-16 expansion and hijacked the winner; caught by the ab_stats
    gate on the real chip, reproduced hermetically here)."""
    from tpu3d.ops.transforms import kabsch_quat

    R_ref = _random_rotation(np.random.default_rng(3)).astype(np.float32)
    t_ref = np.array([0.02, -0.015, 0.01], np.float32)
    eye = np.eye(3, dtype=np.float32)
    for scale in (1.0, 1e-2, 1e-3, 3e-4, 1e-4, 3e-5, 1e-6, 0.0):
        # Nearly-collinear triple of `scale` extent sitting 0.7 m from the
        # origin (a realistic adjacent-points FPFH-correspondence draw).
        p = np.array(
            [[0, 0, 0.7], [1, 0.03, 0.7], [2.1, -0.02, 0.701]], np.float32
        )
        p[:, :2] *= scale
        p[:, 2] += rng.normal(0, scale * 0.01, 3).astype(np.float32)
        q = p @ R_ref.T + t_ref
        R, t = kabsch_quat(jnp.asarray(p)[None], jnp.asarray(q)[None])
        Rn = np.asarray(R)[0]
        assert np.isfinite(Rn).all(), f"scale={scale}: non-finite R"
        err = np.abs(Rn @ Rn.T - eye).max()
        assert err < 1e-5, f"scale={scale}: |RR^T - I| = {err:.3e}"
        # Non-degenerate scales must still FIT the sample exactly (the
        # triple is deliberately near-collinear, so the pose about the
        # line axis is underdetermined — residuals are the right check).
        if scale >= 1e-3:
            res = np.abs(p @ Rn.T + np.asarray(t)[0] - q).max()
            assert res < 1e-5 * max(scale, 0.1), f"scale={scale}: {res:.2e}"
