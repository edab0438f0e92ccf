"""Prefix profile INSIDE the RANSAC stage at the bench shape.

bench_stages.py puts the whole ransac_registration call at ~3.0 ms/pair
while its arithmetic (one 25.6k-hypothesis chunk solved and exact-scored
on 2048 rows) is worth well under 1 ms of MXU/VPU time — the rest is
structure: the internal feature NN, the compaction/table build, the
unrolled epoch slices, scoring, selection, the while_loop carry, the
direct winner rescore. This times nested PREFIXES of that structure with
the K-loop methodology (same fori_loop, jittered inputs); adjacent
deltas localize the cost.

Run on the TPU:  python benchmarks/profile_ransac.py
"""

from __future__ import annotations

import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from bench import bench_caps, make_pair  # noqa: E402
from tpu3d.ops.fused_features import (  # noqa: E402
    fused_prepare_features,
    fused_prepare_sparse,
)
from tpu3d.ops.ransac import (  # noqa: E402
    build_rotation_table,
    build_scoring_factors,
    feature_correspondences,
    ransac_registration,
    score_w16,
    solve_rotation_chunk,
)
from tpu3d.types import FPFHFeatures, PointCloud  # noqa: E402
from tpu3d.utils.timing import roundtrip_ms  # noqa: E402


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    n = int(os.environ.get("TPU3D_BENCH_N", "100352"))
    K = int(os.environ.get("TPU3D_BENCH_K", "10"))
    ransac_iters = 100000
    corr_cap, _ = bench_caps()
    hyp_chunk = max(16384, (-(-ransac_iters // 4) + 1023) // 1024 * 1024)
    voxel = 0.002
    thr2 = jnp.float32((voxel * 1.5) ** 2)
    src_np, tgt_np, _, _ = make_pair(n)
    tgt, tgt_feat = fused_prepare_features(
        PointCloud.from_numpy(tgt_np, capacity=n), jnp.float32(voxel * 5)
    )
    src = PointCloud.from_numpy(src_np, capacity=n)
    # Fixed sparse prep OUTSIDE the timed region — this profiles RANSAC.
    from tpu3d.utils.platform import on_tpu

    sub_c, sub_f, _ = jax.jit(
        lambda s: fused_prepare_sparse(
            s, jnp.float32(voxel * 5), corr_cap=corr_cap,
            interpret=not on_tpu(),  # CPU shakeout only
        )
    )(src)
    sub_pts = jax.device_get(sub_c.points)
    sub_mask = jax.device_get(sub_c.mask)
    sub_desc = jax.device_get(sub_f.descriptors)
    sub_pts = jnp.asarray(sub_pts)
    sub_mask = jnp.asarray(sub_mask)
    sub_desc = jnp.asarray(sub_desc)
    key = jax.random.PRNGKey(42)
    hyp_key = jax.random.fold_in(key, 7)

    def stage_fn(stage):
        def fn(pts_in):
            src_pts = pts_in
            src_mask = sub_mask
            feats = FPFHFeatures(descriptors=sub_desc, mask=src_mask)
            corr = feature_correspondences(feats, tgt_feat)
            p = src_pts.astype(jnp.float32)
            q = tgt.points[corr].astype(jnp.float32)
            if stage == "nn+gather":
                return jnp.sum(q) + jnp.sum(p)
            feat_t, pq_norm = build_scoring_factors(p, q, src_mask)
            perm = jnp.argsort(~src_mask, stable=True)
            count = jnp.maximum(jnp.sum(src_mask.astype(jnp.int32)), 1)
            pq_packed = jnp.concatenate([p, q], axis=1)
            pq2p = build_rotation_table(pq_packed, perm, count)
            if stage == "factors+table":
                return jnp.sum(feat_t) + jnp.sum(pq2p)
            w16t, t_norm, disabled, _, n_cons = solve_rotation_chunk(
                jax.random.fold_in(hyp_key, 0), hyp_chunk, jnp.int32(0),
                pq2p, count, ransac_iters,
            )
            if stage == "solve":
                return jnp.sum(w16t) + jnp.sum(t_norm)
            cnt, errsum = score_w16(feat_t, pq_norm, w16t, t_norm, thr2)
            if stage == "score":
                return jnp.sum(cnt) + jnp.sum(errsum)
            n_valid = jnp.maximum(jnp.sum(src_mask.astype(jnp.float32)), 1.0)
            fitness = jnp.where(disabled, -1.0, cnt / n_valid)
            exceed = fitness > 0.999
            any_ex = jnp.any(exceed)
            cutoff = jnp.where(any_ex, jnp.argmax(exceed), hyp_chunk - 1)
            mf = jnp.where(jnp.arange(hyp_chunk) <= cutoff, fitness, -2.0)
            lb = jnp.argmax(mf)
            bw = w16t[:, lb]
            best_R = bw[6:15].reshape(3, 3)
            best_t = bw[3:6]
            dr = p @ best_R.T + best_t - q
            err2_d = jnp.sum(dr * dr, axis=1)
            if stage == "select+rescore":
                return jnp.sum(err2_d) + mf[lb]
            res = ransac_registration(
                PointCloud(points=src_pts, mask=src_mask), tgt,
                feats, tgt_feat, voxel,
                max_iterations=ransac_iters, corr_mode="exact",
            )
            return jnp.sum(res.transformation) + res.fitness

        def k_loop(p_, rep_jitter):
            def body(i, acc):
                pi = p_ + (jnp.float32(1e-7) * (i + 1) + rep_jitter)
                return acc + fn(pi)

            return jax.lax.fori_loop(0, K, body, jnp.float32(0.0))

        return jax.jit(k_loop)

    rt = roundtrip_ms() / 1000.0
    log(f"roundtrip {rt * 1000:.1f} ms, hyp_chunk={hyp_chunk}, K={K}")
    prev = 0.0
    for stage in (
        "nn+gather", "factors+table", "solve", "score",
        "select+rescore", "full",
    ):
        f = stage_fn(stage)
        float(f(sub_pts, jnp.float32(0.0)))  # compile
        ts = []
        for r in range(3):
            t0 = time.perf_counter()
            float(f(sub_pts, jnp.float32(1e-7 * (r + 1) * K)))
            ts.append(time.perf_counter() - t0)
        ms = max((min(ts) - rt) / K, 0.0) * 1000.0
        log(f"thru {stage:15s} {ms:7.2f} ms  (delta {ms - prev:+6.2f})")
        prev = ms


if __name__ == "__main__":
    main()
