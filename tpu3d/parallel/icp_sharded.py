"""ICP with the target cloud sharded across a device mesh.

Completes BASELINE.json configs[4]: at 1M+ points the target cloud no longer
fits one chip's working set comfortably — shard its rows over a mesh axis
and run the per-iteration correspondence search distributed
(parallel/sharded_nn.py: local top-1 per shard, global argmin over an
all_gather that moves only (n_shards × queries) scalars across ICI). The
6x6 normal equations, solve and convergence logic are identical to the
single-chip ``ops/icp.py`` — only the NN source changes, so the result
matches single-chip ICP bit-for-near (tie order may differ at float ties).

Gathers of matched target points/normals (rows live on other shards) are
done on the replicated copies of ``points``/``normals`` that XLA keeps
addressable through the sharded arrays — at these scales the per-iteration
gather of (N, 3) rows is ICI-cheap relative to the distance scan it avoids.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from tpu3d.ops.transforms import (
    euler_xyz_to_matrix,
    kabsch,
    make_transform,
    transform_points,
)
from tpu3d.parallel.sharded_nn import nearest_neighbor_sharded
from tpu3d.types import PointCloud, RegistrationResult


@functools.partial(
    jax.jit,
    static_argnames=("max_iterations", "point_to_plane", "mesh", "axis"),
)
def icp_refine_sharded(
    source: PointCloud,
    target: PointCloud,
    initial_transform: jnp.ndarray,
    distance_threshold,
    mesh: Mesh,
    axis: str = "shard",
    max_iterations: int = 200,
    point_to_plane: bool = True,
) -> RegistrationResult:
    """Same semantics as ops.icp.icp_refine; target rows sharded over
    ``axis`` (row count must divide the axis size — pad with masked rows)."""
    thr = jnp.asarray(distance_threshold, jnp.float32)
    use_p2l = point_to_plane and target.normals is not None
    n_valid = jnp.maximum(jnp.sum(source.mask.astype(jnp.float32)), 1.0)
    src_pts = source.points.astype(jnp.float32)
    smask = source.mask

    def body(state):
        T, fitness, rmse, it, done = state
        P = transform_points(T, src_pts)
        idx, d2 = nearest_neighbor_sharded(
            P, target.points, target.mask, mesh, axis=axis
        )
        keep = smask & (jnp.sqrt(d2) <= thr)
        wf = keep.astype(jnp.float32)
        n_corr = jnp.sum(wf)
        q = target.points[idx]

        if use_p2l:
            nrm = target.normals[idx]
            cross = jnp.cross(P, nrm)
            J = jnp.concatenate([cross, nrm], axis=1)
            r = jnp.sum((P - q) * nrm, axis=1)
            Jw = J * wf[:, None]
            ATA = Jw.T @ J
            ATb = Jw.T @ r[:, None]
            x = jnp.linalg.solve(ATA, -ATb)[:, 0]
            delta = make_transform(euler_xyz_to_matrix(x[:3]), x[3:])
        else:
            R, t = kabsch(P, q, weights=wf)
            delta = make_transform(R, t)

        newT = delta @ T
        new_rmse = jnp.sqrt(jnp.sum(d2 * wf) / jnp.maximum(n_corr, 1.0))
        new_fit = n_corr / n_valid
        abort = n_corr < 3.0
        converged = (it > 0) & (jnp.abs(rmse - new_rmse) < 1e-6)
        return (
            jnp.where(abort, T, newT),
            jnp.where(abort, fitness, new_fit),
            jnp.where(abort, rmse, new_rmse),
            it + 1,
            abort | converged,
        )

    def cond(state):
        _, _, _, it, done = state
        return (it < max_iterations) & jnp.logical_not(done)

    init = (
        initial_transform.astype(jnp.float32),
        jnp.float32(0.0),
        jnp.float32(0.0),
        jnp.int32(0),
        jnp.bool_(False),
    )
    T, fitness, rmse, _, _ = jax.lax.while_loop(cond, body, init)
    return RegistrationResult(transformation=T, fitness=fitness, rmse=rmse)
