"""Stage decomposition of the EXACT envelope (bench.py's exact_pair):
dense prepare + corr_mode='exact' + single-stage scoring + src_mode=
'exact' ICP — the zero-statistical-shortcut configuration (PARITY.md
"exactness knobs", VERDICT r3 item 9).

Same methodology as bench_stages.py: stage PREFIXES inside one
K-iteration fori_loop with per-iteration input perturbation (the tunnel
caches identical program+args executions); adjacent deltas are the
in-context stage costs. Run on the TPU:
  python benchmarks/bench_stages_exact.py   (TPU3D_BENCH_K to override K)
"""

from __future__ import annotations

import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from bench import make_pair  # noqa: E402
from tpu3d.ops.fused_features import fused_prepare_features  # noqa: E402
from tpu3d.ops.icp import build_icp_target, icp_refine  # noqa: E402
from tpu3d.ops.ransac import (  # noqa: E402
    feature_correspondences,
    ransac_registration,
)
from tpu3d.types import PointCloud  # noqa: E402
from tpu3d.utils.timing import roundtrip_ms  # noqa: E402


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    n = int(os.environ.get("TPU3D_BENCH_N", "100352"))
    K = int(os.environ.get("TPU3D_BENCH_K", "5"))
    ransac_iters = 100000
    voxel = 0.002
    src_np, tgt_np, _, _ = make_pair(n)
    tgt, tgt_feat = fused_prepare_features(
        PointCloud.from_numpy(tgt_np, capacity=n), jnp.float32(voxel * 5)
    )
    tgt_index = jax.jit(build_icp_target)(tgt)
    src = PointCloud.from_numpy(src_np, capacity=n)

    def stage_fn(stage):
        def fn(src_pts, src_mask):
            source = PointCloud(points=src_pts, mask=src_mask)
            source, sfeat = fused_prepare_features(
                source, jnp.float32(voxel * 5)
            )
            if stage == "prepare":
                return jnp.sum(sfeat.descriptors) + jnp.sum(source.points)
            if stage == "nn":
                # The full-row descriptor NN ransac_registration performs
                # internally under corr_mode='exact' (its dominant term).
                corr = feature_correspondences(sfeat, tgt_feat)
                return jnp.sum(corr.astype(jnp.float32))
            coarse = ransac_registration(
                source, tgt, sfeat, tgt_feat, voxel,
                max_iterations=ransac_iters, corr_mode="exact",
                two_stage=False,
            )
            if stage == "ransac":
                return jnp.sum(coarse.transformation) + coarse.fitness
            refined = icp_refine(
                source, tgt, coarse.transformation, voxel * 0.4,
                max_iterations=200, point_to_plane=True,
                target_index=tgt_index, src_mode="exact",
            )
            return jnp.sum(refined.transformation) + refined.fitness

        def k_loop(p, m, rep_jitter):
            def body(i, acc):
                pi = p + (jnp.float32(1e-7) * (i + 1) + rep_jitter)
                return acc + fn(pi, m)

            return jax.lax.fori_loop(0, K, body, jnp.float32(0.0))

        return jax.jit(k_loop)

    rt = roundtrip_ms() / 1000.0
    prev = 0.0
    for stage in ("prepare", "nn", "ransac", "icp"):
        f = stage_fn(stage)
        t0 = time.perf_counter()
        float(f(src.points, src.mask, jnp.float32(0.0)))  # compile
        log(f"[compile {stage}: {time.perf_counter() - t0:.1f}s]")
        ts = []
        for r in range(3):
            t0 = time.perf_counter()
            float(f(src.points, src.mask, jnp.float32(1e-7 * (r + 1) * K)))
            ts.append(time.perf_counter() - t0)
        ms = max((min(ts) - rt) / K, 0.0) * 1000.0
        log(f"thru {stage:8s} {ms:7.2f} ms/pair  (delta {ms - prev:+6.2f})")
        prev = ms


if __name__ == "__main__":
    main()
