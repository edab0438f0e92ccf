"""RANSAC coarse registration as one batch of parallel hypotheses.

Reference semantics (src/registration.cpp:204-295):
  - one-time nearest-neighbor correspondences in 33-D FPFH space
    (brute force, registration.cpp:216-232) — here a single (N,33)x(33,M)
    MXU matmul + argmin;
  - per hypothesis: 3 random source indices (duplicates rejected,
    registration.cpp:239-240), Kabsch/SVD with reflection fix (:254-262),
    inliers at ``err < 1.5 * voxel_size`` (:213, :275), fitness =
    inliers/N, rmse over inliers (999 if none), keep best fitness
    (strict >, so earliest of equals), stop once fitness > confidence
    (:284-290);
  - fixed seed: std::mt19937(42) (:235) — here a counter-based
    ``jax.random`` key (default seed 42). Bit-identical sampling with
    mt19937 is impossible and not a goal; fidelity is gated on inlier sets
    and pose error (BASELINE.md).

TPU formulation: ALL hypotheses are generated, solved (batched 3x3 SVD) and
scored at once. Scoring is a single fused matmul per hypothesis chunk:
||R·p + t − q||² expands to a rank-15 product

  err²[n,h] = F_n · W_h + (||p_n||² + ||q_n||²) + ||t_h||²
  F_n = [2p, −2q, −2(q⊗p)]   (n,15)     W_h = [Rᵀt, t, vec(R)]   (h,15)

so the (n × h) inlier-count plane rides the MXU. The reference's sequential
early-exit is emulated exactly at the semantic level: the returned result is
the best hypothesis in the prefix ending at the first one whose fitness
exceeds ``confidence`` (same rule as the break at registration.cpp:290).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from tpu3d.ops.neighbors import nearest_neighbor_xla
from tpu3d.ops.transforms import kabsch_quat, make_transform
from tpu3d.types import FPFHFeatures, PointCloud, RegistrationResult


def feature_correspondences(
    source_features: FPFHFeatures, target_features: FPFHFeatures
) -> jnp.ndarray:
    """Nearest target index in 33-D descriptor space per source point
    (registration.cpp:216-232). Ties → lowest index, like the reference."""
    idx, _ = nearest_neighbor_xla(
        source_features.descriptors,
        target_features.descriptors,
        target_features.mask,
    )
    return idx


@functools.partial(
    jax.jit,
    static_argnames=("max_iterations", "chunk"),
)
def ransac_registration(
    source: PointCloud,
    target: PointCloud,
    source_features: FPFHFeatures,
    target_features: FPFHFeatures,
    voxel_size,
    max_iterations: int = 100000,
    confidence: float = 0.999,
    seed: int = 42,
    chunk: int = 512,
) -> RegistrationResult:
    voxel_size = jnp.asarray(voxel_size, jnp.float32)
    thr2 = (voxel_size * 1.5) ** 2  # registration.cpp:213, strict < on err
    n = source.capacity
    n_valid = jnp.sum(source.mask.astype(jnp.float32))

    corr = feature_correspondences(source_features, target_features)  # (N,)
    p = source.points.astype(jnp.float32)
    q = target.points[corr].astype(jnp.float32)

    # --- hypothesis sampling (valid indices only) ---------------------------
    h_total = -(-max_iterations // chunk) * chunk  # pad to chunk multiple
    key = jax.random.PRNGKey(seed)
    perm = jnp.argsort(~source.mask, stable=True)  # valid rows first
    count = jnp.maximum(jnp.sum(source.mask.astype(jnp.int32)), 1)
    draws = jax.random.randint(key, (h_total, 3), 0, count)
    dup = (
        (draws[:, 0] == draws[:, 1])
        | (draws[:, 1] == draws[:, 2])
        | (draws[:, 0] == draws[:, 2])
    )
    sample_idx = perm[draws]  # (H, 3) indices into capacity rows
    # Hypotheses past max_iterations (chunk padding) are disabled like
    # duplicate-sample ones.
    h_ids = jnp.arange(h_total)
    disabled = dup | (h_ids >= max_iterations)

    src3 = p[sample_idx]  # (H, 3, 3)
    tgt3 = q[sample_idx]  # correspondences of the sampled source points

    # --- score constants -----------------------------------------------------
    pq_norm = jnp.sum(p * p, axis=1) + jnp.sum(q * q, axis=1)  # (N,)
    feat = jnp.concatenate(
        [
            2.0 * p,
            -2.0 * q,
            -2.0 * (q[:, :, None] * p[:, None, :]).reshape(n, 9),
        ],
        axis=1,
    )  # (N, 15)
    smask = source.mask.astype(jnp.float32)

    def score_chunk(args):
        s3, t3, bad = args  # (C,3,3), (C,3,3), (C,)
        R, t = kabsch_quat(s3, t3)  # closed-form QCP — no batched SVD
        u = jnp.einsum("hij,hi->hj", R, t)  # Rᵀ t
        w15 = jnp.concatenate([u, t, R.reshape(-1, 9)], axis=1)  # (C, 15)
        err2 = (
            feat @ w15.T + pq_norm[:, None] + jnp.sum(t * t, axis=1)[None, :]
        )  # (N, C)
        inlier = (err2 < thr2) & (smask[:, None] > 0)
        cnt = jnp.sum(inlier.astype(jnp.float32), axis=0)  # (C,)
        errsum = jnp.sum(jnp.where(inlier, jnp.maximum(err2, 0.0), 0.0), axis=0)
        fitness = jnp.where(bad, -1.0, cnt / jnp.maximum(n_valid, 1.0))
        rmse = jnp.where(cnt > 0, jnp.sqrt(errsum / jnp.maximum(cnt, 1.0)), 999.0)
        return fitness, rmse, R, t

    n_chunks = h_total // chunk
    fitness, rmse, Rs, ts = jax.lax.map(
        score_chunk,
        (
            src3.reshape(n_chunks, chunk, 3, 3),
            tgt3.reshape(n_chunks, chunk, 3, 3),
            disabled.reshape(n_chunks, chunk),
        ),
    )
    fitness = fitness.reshape(-1)
    rmse = rmse.reshape(-1)
    Rs = Rs.reshape(-1, 3, 3)
    ts = ts.reshape(-1, 3)

    # --- early-exit prefix semantics (registration.cpp:284-290) -------------
    exceed = fitness > confidence
    any_exceed = jnp.any(exceed)
    first_exceed = jnp.argmax(exceed)  # first True (0 if none — guarded)
    cutoff = jnp.where(any_exceed, first_exceed, h_total - 1)
    allowed = h_ids <= cutoff
    masked_fitness = jnp.where(allowed, fitness, -2.0)
    best = jnp.argmax(masked_fitness)  # first of equals == reference strict >

    best_fitness = fitness[best]
    won = best_fitness > 0.0  # reference: must beat the 0-fitness default
    T = make_transform(Rs[best], ts[best])
    return RegistrationResult(
        transformation=jnp.where(won, T, jnp.eye(4, dtype=jnp.float32)),
        fitness=jnp.where(won, best_fitness, 0.0),
        rmse=jnp.where(won, rmse[best], 0.0),
    )
