"""SE(3) helpers and batched Kabsch alignment.

All functions are pure jnp and batch-friendly; they are traced into the
surrounding jit (RANSAC hypothesis batches, ICP updates).

Reference parity:
  - Kabsch with reflection fix ↔ src/registration.cpp:254-264 (RANSAC) and
    :383-396 (point-to-point ICP update).
  - Euler XYZ composition for the point-to-plane update ↔
    src/registration.cpp:368-372 (AngleAxis X * Y * Z, full trig — not the
    small-angle approximation).
  - ZYX RPY extraction with the gimbal-lock branch ↔ src/robot.cpp:38-56.
"""

from __future__ import annotations

import jax.numpy as jnp


def make_transform(R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """Assemble 4x4 homogeneous transforms from (..., 3, 3) and (..., 3)."""
    batch = R.shape[:-2]
    T = jnp.zeros(batch + (4, 4), dtype=R.dtype)
    T = T.at[..., :3, :3].set(R)
    T = T.at[..., :3, 3].set(t)
    T = T.at[..., 3, 3].set(1.0)
    return T


def transform_points(T: jnp.ndarray, points: jnp.ndarray) -> jnp.ndarray:
    """Apply (..., 4, 4) transform(s) to (..., N, 3) points."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    return points @ jnp.swapaxes(R, -1, -2) + t[..., None, :]


def invert_transform(T: jnp.ndarray) -> jnp.ndarray:
    """Closed-form SE(3) inverse: [Rᵀ, -Rᵀt] (cheaper + stabler than LU)."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    Rt = jnp.swapaxes(R, -1, -2)
    return make_transform(Rt, -(Rt @ t[..., None])[..., 0])


def euler_xyz_to_matrix(angles: jnp.ndarray) -> jnp.ndarray:
    """R = Rx(a) @ Ry(b) @ Rz(g) for angles (..., 3).

    Matches the reference's point-to-plane delta-rotation convention
    (src/registration.cpp:369-371): exact AngleAxis products, full trig.
    """
    a, b, g = angles[..., 0], angles[..., 1], angles[..., 2]
    ca, sa = jnp.cos(a), jnp.sin(a)
    cb, sb = jnp.cos(b), jnp.sin(b)
    cg, sg = jnp.cos(g), jnp.sin(g)
    row0 = jnp.stack([cb * cg, -cb * sg, sb], axis=-1)
    row1 = jnp.stack(
        [ca * sg + sa * sb * cg, ca * cg - sa * sb * sg, -sa * cb], axis=-1
    )
    row2 = jnp.stack(
        [sa * sg - ca * sb * cg, sa * cg + ca * sb * sg, ca * cb], axis=-1
    )
    return jnp.stack([row0, row1, row2], axis=-2)


def matrix_to_rpy_zyx(R: jnp.ndarray) -> jnp.ndarray:
    """Extract (roll, pitch, yaw) in radians, ZYX convention with the
    reference's gimbal-lock branch (src/robot.cpp:42-52)."""
    pitch = jnp.arcsin(jnp.clip(-R[..., 2, 0], -1.0, 1.0))
    regular = jnp.abs(R[..., 2, 0]) < 0.999
    roll = jnp.where(
        regular,
        jnp.arctan2(R[..., 2, 1], R[..., 2, 2]),
        jnp.arctan2(-R[..., 1, 2], R[..., 1, 1]),
    )
    yaw = jnp.where(regular, jnp.arctan2(R[..., 1, 0], R[..., 0, 0]), 0.0)
    return jnp.stack([roll, pitch, yaw], axis=-1)


def kabsch(
    src: jnp.ndarray,
    tgt: jnp.ndarray,
    weights: jnp.ndarray | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Weighted Kabsch: find (R, t) minimising Σ w_i ||R src_i + t - tgt_i||².

    Batched over leading axes: src/tgt (..., N, 3), weights (..., N).
    Reflection fix flips the last singular direction exactly like the
    reference (src/registration.cpp:258-262: V.col(2) *= -1 when det < 0 —
    valid because SVD returns singular values in descending order, so column
    2 is the smallest).
    """
    if weights is None:
        weights = jnp.ones(src.shape[:-1], dtype=src.dtype)
    w = weights[..., None]
    wsum = jnp.maximum(jnp.sum(w, axis=-2, keepdims=True), 1e-12)
    src_mean = jnp.sum(src * w, axis=-2, keepdims=True) / wsum
    tgt_mean = jnp.sum(tgt * w, axis=-2, keepdims=True) / wsum
    src_c = (src - src_mean) * w
    tgt_c = tgt - tgt_mean
    # H = Σ w (src - s̄)(tgt - t̄)ᵀ  (3x3), matching registration.cpp:254/383.
    H = jnp.swapaxes(src_c, -1, -2) @ tgt_c
    U, _, Vt = jnp.linalg.svd(H)
    V = jnp.swapaxes(Vt, -1, -2)
    R = V @ jnp.swapaxes(U, -1, -2)
    det = jnp.linalg.det(R)
    V_fixed = V.at[..., :, 2].multiply(jnp.where(det < 0, -1.0, 1.0)[..., None])
    R = V_fixed @ jnp.swapaxes(U, -1, -2)
    t = tgt_mean[..., 0, :] - (R @ src_mean[..., 0, :, None])[..., 0]
    return R, t
