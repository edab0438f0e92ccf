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


@functools.partial(jax.jit, static_argnames=("k", "chunk", "method"))
def estimate_normals(
    cloud: PointCloud,
    k: int = 30,
    chunk: int = 1024,
    method: str = "auto",
    neighbors: tuple[jnp.ndarray, jnp.ndarray] | None = None,
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

    eigvals, eigvecs = jnp.linalg.eigh(cov)
    normals = eigvecs[..., :, 0]  # smallest-eigenvalue eigenvector
    # Orient toward the viewpoint/origin: flip when n·(-p) < 0.
    flip = jnp.sum(normals * (-pts), axis=-1) < 0
    normals = jnp.where(flip[:, None], -normals, normals)
    normals = jnp.where(cloud.mask[:, None], normals, 0.0)

    return cloud._replace(normals=normals)
