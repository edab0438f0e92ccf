"""ICP fine registration — fully on-device iteration.

Reference semantics (CPU path, src/registration.cpp:297-414 — which the
survey designates as the behavioral oracle; the CUDA variant's
untransformed-Jacobian quirk at icp.cu:109-111 is deliberately NOT copied):

  per iteration with current transform T:
    - correspondences: nearest target per *transformed* source point,
      rejected when distance > threshold (inclusive keep, :337-338);
    - break (without updating) when fewer than 3 correspondences (:361);
    - point-to-plane: J = [p×n | n] with TRANSFORMED p, residual (p−q)·n,
      solve ATA·x = −ATb, delta = Rx(a)Ry(b)Rz(g) exact trig + translation
      (:343-372); point-to-point: Kabsch over the correspondence set
      (:373-397);
    - T ← delta·T (:399); rmse over correspondence distances, fitness =
      n_corr/N (:401-404) — note both describe the PRE-update transform
      while the returned transformation is POST-update, faithfully kept;
    - converge when iter > 0 and |Δrmse| < 1e-6 (:406-409).

TPU formulation: one ``lax.while_loop`` whose body runs the Pallas tiled
top-1 NN kernel, builds the 6x6 normal equations with masked einsums
(deterministic — replaces cuda/icp.cu:84-141's warp-shuffle + atomicAdd
reductions), and solves on device. The host is never touched between
iterations (the reference's per-iteration D2H of full correspondence arrays,
gpu_impl.cpp:225-242, has no analog here).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from tpu3d.ops.grid import build_grid, grid_top1
from tpu3d.ops.nn_pallas import nearest_neighbor
from tpu3d.ops.slab import build_slab, slab_top1
from tpu3d.ops.transforms import (
    euler_xyz_to_matrix,
    kabsch,
    make_transform,
    transform_points,
)
from tpu3d.types import PointCloud, RegistrationResult


@functools.partial(
    jax.jit,
    static_argnames=("max_iterations", "point_to_plane", "nn_mode",
                     "cell_capacity", "slice_cap"),
)
def icp_refine(
    source: PointCloud,
    target: PointCloud,
    initial_transform: jnp.ndarray,
    distance_threshold,
    max_iterations: int = 200,
    point_to_plane: bool = True,
    nn_mode: str = "auto",
    cell_capacity: int = 16,
    slice_cap: int = 4096,
) -> RegistrationResult:
    """``nn_mode`` selects the correspondence search, all EXACT for ICP's
    semantics (matches beyond the threshold are rejected anyway,
    registration.cpp:337-338):
      'slab'  — x-sorted target + contiguous per-block slices (ops/slab.py);
                O(N·L) per iteration, the fast path at scale. If a query
                block's candidate slice overflows ``slice_cap`` a device-side
                warning is printed and the result may drop far matches.
      'grid'  — 27-cell bucket scan (ops/grid.py); exact, gather-heavy.
      'brute' — tiled full scan (Pallas kernel on TPU).
      'auto'  — slab for targets ≥ 4096 points, brute below."""
    thr = jnp.asarray(distance_threshold, jnp.float32)
    use_p2l = point_to_plane and target.normals is not None  # trace-time, like
    # the reference's `point_to_plane && target.hasNormals()` (:343, :365)
    n_valid = jnp.maximum(jnp.sum(source.mask.astype(jnp.float32)), 1.0)
    src_pts = source.points.astype(jnp.float32)
    smask = source.mask

    if nn_mode == "auto":
        nn_mode = "slab" if target.capacity >= 4096 else "brute"
    # Structures are built ONCE and reused every iteration (the target
    # never moves; only the source transform changes).
    grid = build_grid(target.points, target.mask, thr) if nn_mode == "grid" else None
    slab = build_slab(target.points, target.mask) if nn_mode == "slab" else None
    if nn_mode == "slab":
        # Re-order the source once by initial-transformed x so slab query
        # blocks stay coherent for any input row order. Every ICP reduction
        # (JtJ, Kabsch, fitness, rmse) is permutation-invariant, so no
        # un-sorting is needed; ICP's refinements keep the order coherent.
        x0 = transform_points(initial_transform.astype(jnp.float32), src_pts)[
            :, 0
        ]
        order = jnp.argsort(jnp.where(smask, x0, jnp.float32(3e4)))
        src_pts = src_pts[order]
        smask = smask[order]

    def body(state):
        T, fitness, rmse, it, done = state
        P = transform_points(T, src_pts)  # (N, 3)
        if nn_mode == "slab":
            # Overflow (slice_cap exceeded) silently drops the farthest-x
            # candidates; callers needing a guarantee use the slab API
            # directly and check the returned flag (device-side printing is
            # not available on all PJRT platforms).
            idx, d2, _overflow = slab_top1(slab, P, thr, slice_cap=slice_cap)
        elif nn_mode == "grid":
            idx, d2 = grid_top1(grid, P, cell_capacity=cell_capacity)
        else:
            idx, d2 = nearest_neighbor(P, target.points, target.mask)
        keep = smask & (jnp.sqrt(d2) <= thr)  # inclusive, :337-338
        wf = keep.astype(jnp.float32)
        n_corr = jnp.sum(wf)
        q = target.points[idx]

        if use_p2l:
            nrm = target.normals[idx]
            cross = jnp.cross(P, nrm)
            J = jnp.concatenate([cross, nrm], axis=1)  # (N, 6)
            r = jnp.sum((P - q) * nrm, axis=1)  # (N,)
            Jw = J * wf[:, None]
            ATA = Jw.T @ J  # (6, 6) — deterministic matmul reduction
            ATb = Jw.T @ r[:, None]
            x = jnp.linalg.solve(ATA, -ATb)[:, 0]
            delta = make_transform(euler_xyz_to_matrix(x[:3]), x[3:])
        else:
            R, t = kabsch(P, q, weights=wf)
            delta = make_transform(R, t)

        newT = delta @ T
        new_rmse = jnp.sqrt(jnp.sum(d2 * wf) / jnp.maximum(n_corr, 1.0))
        new_fit = n_corr / n_valid

        abort = n_corr < 3.0  # break BEFORE updating anything (:361)
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
        jnp.float32(0.0),  # RegistrationResult default rmse (hpp:29)
        jnp.int32(0),
        jnp.bool_(False),
    )
    T, fitness, rmse, _, _ = jax.lax.while_loop(cond, body, init)
    return RegistrationResult(transformation=T, fitness=fitness, rmse=rmse)
