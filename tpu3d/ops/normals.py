"""Normal estimation: k-NN covariance + batched 3x3 eigendecomposition.

Reference semantics (src/registration.cpp:105-130): for every point, take
its k=30 nearest neighbors (self included — findKNN scans the whole cloud,
registration.cpp:63-81), form the covariance of the neighborhood, take the
eigenvector of the smallest eigenvalue, and orient it toward the viewpoint
(origin): flip when ``n · (-p) < 0`` (registration.cpp:125-127).

TPU formulation: chunked pairwise-distance top-k (MXU matmul + ``top_k``),
then one *batched* ``jnp.linalg.eigh`` over all N covariance matrices — no
per-point host loop. Eigenvector sign is arbitrary out of eigh (as it is out
of Eigen); the viewpoint flip makes it deterministic wherever ``n·p ≠ 0``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from tpu3d.ops.neighbors import knn
from tpu3d.types import PointCloud


def smallest_eigvec_3x3(A: jnp.ndarray) -> jnp.ndarray:
    """Unit eigenvector of the smallest eigenvalue of batched symmetric 3x3
    matrices — closed form (Cardano eigenvalues + spectral projector), pure
    elementwise math. Replaces batched ``jnp.linalg.eigh`` (iterative, the
    cost center of normal estimation at 100k points). Sign is arbitrary,
    like eigh/Eigen; callers orient it. Degenerate inputs (λ1 ≈ λ2) return
    some vector in the eigenspace — the same ambiguity eigh has.
    """
    # Scale-normalize for f32 conditioning (eigenvectors are scale-free).
    scale = jnp.maximum(
        jnp.max(jnp.abs(A), axis=(-2, -1), keepdims=True), 1e-30
    )
    A = A / scale

    q = jnp.trace(A, axis1=-2, axis2=-1) / 3.0
    a00, a01, a02 = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
    a11, a12, a22 = A[..., 1, 1], A[..., 1, 2], A[..., 2, 2]
    p1 = a01 * a01 + a02 * a02 + a12 * a12
    p2 = (
        (a00 - q) ** 2 + (a11 - q) ** 2 + (a22 - q) ** 2 + 2.0 * p1
    )
    p = jnp.sqrt(jnp.maximum(p2 / 6.0, 1e-30))
    eye = jnp.eye(3, dtype=A.dtype)
    B = (A - q[..., None, None] * eye) / p[..., None, None]
    detB = (
        B[..., 0, 0] * (B[..., 1, 1] * B[..., 2, 2] - B[..., 1, 2] ** 2)
        - B[..., 0, 1]
        * (B[..., 0, 1] * B[..., 2, 2] - B[..., 1, 2] * B[..., 0, 2])
        + B[..., 0, 2]
        * (B[..., 0, 1] * B[..., 1, 2] - B[..., 1, 1] * B[..., 0, 2])
    )
    r = jnp.clip(detB / 2.0, -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0
    lam3 = q + 2.0 * p * jnp.cos(phi)  # largest
    lam1 = q + 2.0 * p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)  # smallest
    lam2 = 3.0 * q - lam1 - lam3

    # Spectral projector onto the λ1 eigenspace: (A−λ2 I)(A−λ3 I).
    P = (A - lam2[..., None, None] * eye) @ (A - lam3[..., None, None] * eye)
    norms = jnp.sum(P * P, axis=-2)  # column norms (..., 3)
    best = jnp.argmax(norms, axis=-1)
    v = jnp.take_along_axis(
        P, best[..., None, None].repeat(3, -2), axis=-1
    )[..., 0]
    # Fully-degenerate fallback (A ∝ I): projector vanishes — use e_z.
    vnorm = jnp.linalg.norm(v, axis=-1, keepdims=True)
    ez = jnp.zeros_like(v).at[..., 2].set(1.0)
    v = jnp.where(vnorm > 1e-20, v / jnp.maximum(vnorm, 1e-30), ez)
    return v


@functools.partial(
    jax.jit, static_argnames=("k", "chunk", "method", "eig_method")
)
def estimate_normals(
    cloud: PointCloud,
    k: int = 30,
    chunk: int = 1024,
    method: str = "auto",
    neighbors: tuple[jnp.ndarray, jnp.ndarray] | None = None,
    eig_method: str = "analytic",
) -> PointCloud:
    """``neighbors``: optional precomputed (idx, d2) self-kNN with ≥ k
    columns, sorted ascending — lets the pipeline run ONE neighbor search
    shared between normals (first k columns) and FPFH (all 100)."""
    pts = cloud.points
    if neighbors is not None:
        idx, d2 = neighbors[0][:, :k], neighbors[1][:, :k]
    else:
        idx, d2 = knn(pts, pts, cloud.mask, k=k, chunk=chunk, method=method)
    # Neighbors beyond the valid count come back at +inf distance; weight
    # them out (reference uses min(k, n) neighbors, registration.cpp:74-78).
    w = (d2 < 1e29).astype(jnp.float32)  # (N, k)

    nb = pts[idx]  # (N, k, 3)
    wsum = jnp.maximum(jnp.sum(w, axis=1, keepdims=True), 1.0)  # (N, 1)
    centroid = jnp.sum(nb * w[..., None], axis=1) / wsum  # (N, 3)
    diff = (nb - centroid[:, None, :]) * w[..., None]  # weighted once…
    diff_u = nb - centroid[:, None, :]
    # cov = Σ w (p-c)(p-c)ᵀ / Σ w  — scaling matches registration.cpp:120
    cov = jnp.einsum("nki,nkj->nij", diff, diff_u) / wsum[..., None]

    if eig_method == "eigh":
        _, eigvecs = jnp.linalg.eigh(cov)
        normals = eigvecs[..., :, 0]  # smallest-eigenvalue eigenvector
    else:
        normals = smallest_eigvec_3x3(cov)
    # Orient toward the viewpoint/origin: flip when n·(-p) < 0.
    flip = jnp.sum(normals * (-pts), axis=-1) < 0
    normals = jnp.where(flip[:, None], -normals, normals)
    normals = jnp.where(cloud.mask[:, None], normals, 0.0)

    return cloud._replace(normals=normals)
