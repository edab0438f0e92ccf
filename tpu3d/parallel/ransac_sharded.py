"""RANSAC distributed over a device mesh: sharded feature NN + sharded
hypothesis evaluation.

Two independent axes of the coarse-registration work distribute naturally
over ICI (BASELINE.json configs[4]; the reference is single-GPU —
registration.cpp:204-295 — so this is capability beyond it, built
TPU-first):

  1. **Feature correspondences** (the O(N·M·33) descriptor argmin,
     registration.cpp:216-232): the TARGET descriptor matrix is row-sharded
     — each chip scans its shard with the tiled MXU top-1 kernel, and the
     global winner is a (n_shards, Q) argmin over an ``all_gather`` of
     per-shard (distance, index) pairs. Bandwidth ∝ queries, not targets.

  2. **Hypotheses** (the 100k-iteration loop, registration.cpp:238-291):
     embarrassingly parallel — each chip draws/solves/scores its slice of
     the hypothesis ids against the replicated correspondence factors, and
     the reference's sequential-prefix early-exit semantics are restored
     globally with two scalar collectives: the global cutoff is the MIN
     over shards of the first confidence-exceeding id, and the winner is
     the best fitness among ids ≤ cutoff with earliest-id tie-break
     (exactly the strict-``>`` update order of the sequential loop).

The hypothesis stream is the same counter-based ``jax.random`` scheme as
the single-chip path, keyed by global hypothesis-slice id — the same
reseeding-class delta as any chunking of the draw stream.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from tpu3d.ops.ransac import (
    build_scoring_factors,
    decimation_stride,
    pack_hypotheses,
    score_w16,
)
from tpu3d.ops.transforms import kabsch_quat, make_transform
from tpu3d.types import FPFHFeatures, PointCloud, RegistrationResult

from tpu3d.utils.platform import on_tpu

_INT_MAX = jnp.int32(2**31 - 1)


def feature_correspondences_sharded(
    source_features: FPFHFeatures,
    target_features: FPFHFeatures,
    mesh: Mesh,
    axis: str = "shard",
) -> jnp.ndarray:
    """Nearest 33-D target descriptor per source row, targets row-sharded.

    Same semantics as ops.ransac.feature_correspondences (ties → lowest
    global index whenever the minimum is unique; exact-tie order is
    lowest-shard-first). Returns GLOBAL target rows, i32[Q]."""
    from tpu3d.ops.nn_pallas import nearest_neighbor

    n_shards = mesh.shape[axis]
    m = target_features.descriptors.shape[0]
    if m % n_shards:
        raise ValueError(f"target rows {m} % {n_shards} shards != 0")
    shard_rows = m // n_shards
    kwargs = (
        {"precision": "fast3"} if on_tpu() else {}
    )

    def local(qd, td, tm):
        idx, d2 = nearest_neighbor(qd, td, tm, **kwargs)
        offset = jax.lax.axis_index(axis) * shard_rows
        gath_d = jax.lax.all_gather(d2, axis)  # (n_shards, Q)
        gath_i = jax.lax.all_gather(idx + offset, axis)
        win = jnp.argmin(gath_d, axis=0)
        return gath_i[win, jnp.arange(d2.shape[0])]

    fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(axis), P(axis)),
        out_specs=P(),
        check_vma=False,  # replicated by construction
    )
    return fn(
        source_features.descriptors,
        target_features.descriptors,
        target_features.mask,
    )


@functools.partial(
    jax.jit,
    static_argnames=("max_iterations", "mesh", "axis", "corr_cap",
                     "corr_mode"),
)
def ransac_registration_sharded(
    source: PointCloud,
    target: PointCloud,
    source_features: FPFHFeatures,
    target_features: FPFHFeatures,
    voxel_size,
    mesh: Mesh,
    axis: str = "shard",
    max_iterations: int = 100000,
    confidence: float = 0.999,
    seed: int = 42,
    corr_cap: int = 8192,
    corr_mode: str = "auto",
) -> RegistrationResult:
    """Distributed analog of ops.ransac.ransac_registration (one-shot
    semantics): sharded feature NN, then each shard evaluates
    ``max_iterations / n_shards`` hypotheses EXACTLY and the global
    prefix/early-exit winner is reduced over ICI. Scoring is exact on the
    correspondence set (the ``corr_mode`` strided subset at scale, as on
    one chip)."""
    voxel_size = jnp.asarray(voxel_size, jnp.float32)
    thr2 = (voxel_size * 1.5) ** 2
    n_shards = mesh.shape[axis]
    h_local = -(-max_iterations // n_shards)

    src_pts = source.points
    src_mask = source.mask
    src_desc = source_features.descriptors
    n = src_pts.shape[0]
    if corr_mode in ("subsample", "auto") and n >= 2 * corr_cap:
        stride = decimation_stride(n, corr_cap)
        take = stride * corr_cap
        src_pts = src_pts[:take].reshape(corr_cap, stride, 3)[:, 0, :]
        src_mask = src_mask[:take].reshape(corr_cap, stride)[:, 0]
        src_desc = src_desc[:take].reshape(
            corr_cap, stride, src_desc.shape[1]
        )[:, 0, :]
        n = corr_cap

    corr = feature_correspondences_sharded(
        FPFHFeatures(descriptors=src_desc, mask=src_mask),
        target_features, mesh, axis,
    )
    p = src_pts.astype(jnp.float32)
    q = target.points[corr].astype(jnp.float32)
    n_valid = jnp.maximum(jnp.sum(src_mask.astype(jnp.float32)), 1.0)
    feat_t, pq_norm = build_scoring_factors(p, q, src_mask)
    perm = jnp.argsort(~src_mask, stable=True)  # valid rows first
    count = jnp.maximum(jnp.sum(src_mask.astype(jnp.int32)), 1)
    key = jax.random.PRNGKey(seed)

    def local(feat_l, pq_l, p_l, q_l, perm_l, count_l, nv_l):
        sid = jax.lax.axis_index(axis)
        kc = jax.random.fold_in(jax.random.fold_in(key, 7), sid)
        draws = jax.random.randint(kc, (h_local, 3), 0, count_l)
        dup = (
            (draws[:, 0] == draws[:, 1])
            | (draws[:, 1] == draws[:, 2])
            | (draws[:, 0] == draws[:, 2])
        )
        ids = sid * h_local + jnp.arange(h_local)
        disabled = dup | (ids >= max_iterations)
        sample_idx = perm_l[draws]
        Rs, ts = kabsch_quat(p_l[sample_idx], q_l[sample_idx])
        w16t, t_norm = pack_hypotheses(Rs, ts)
        cnt, errsum = score_w16(feat_l, pq_l, w16t, t_norm, thr2)
        fitness = jnp.where(disabled, -1.0, cnt / nv_l)
        # Global early-exit prefix (registration.cpp:284-290): the cutoff
        # is the FIRST exceeding global id anywhere.
        exceed = fitness > confidence
        local_first = jnp.where(
            jnp.any(exceed), ids[jnp.argmax(exceed)], _INT_MAX
        )
        cutoff = jnp.min(
            jax.lax.all_gather(local_first, axis)
        )  # INT_MAX if none
        allowed = ids <= jnp.maximum(cutoff, 0)
        mf = jnp.where(allowed & (ids < max_iterations), fitness, -2.0)
        # Per-shard champion, then global argmax with earliest-id ties
        # (strict > keeps the earliest — the reference's update order).
        lb = jnp.argmax(mf)
        champs_f = jax.lax.all_gather(mf[lb], axis)  # (n_shards,)
        champs_id = jax.lax.all_gather(ids[lb], axis)
        order = jnp.lexsort((champs_id, -champs_f))
        win_shard = order[0]
        # Winner payload lives on one shard: indicator-sum it across.
        is_winner = (sid == win_shard).astype(jnp.float32)
        wR = jax.lax.psum(Rs[lb] * is_winner, axis)
        wt = jax.lax.psum(ts[lb] * is_winner, axis)
        wf = jax.lax.psum(mf[lb] * is_winner, axis)
        wc = jax.lax.psum(cnt[lb] * is_winner, axis)
        we = jax.lax.psum(errsum[lb] * is_winner, axis)
        return wR, wt, wf, wc, we

    fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(), P(), P(), P()),
        out_specs=(P(), P(), P(), P(), P()),
        check_vma=False,  # psum/all_gather results are replicated
    )
    bR, bt, best_fitness, best_cnt, best_err = fn(
        feat_t, pq_norm, p, q, perm, count, n_valid
    )
    best_rmse = jnp.where(
        best_cnt > 0,
        jnp.sqrt(best_err / jnp.maximum(best_cnt, 1.0)),
        999.0,
    )
    won = best_fitness > 0.0
    T = make_transform(bR, bt)
    return RegistrationResult(
        transformation=jnp.where(won, T, jnp.eye(4, dtype=jnp.float32)),
        fitness=jnp.where(won, best_fitness, 0.0),
        rmse=jnp.where(won, best_rmse, 0.0),
    )
