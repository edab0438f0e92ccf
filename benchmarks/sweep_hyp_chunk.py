"""K-loop sweep of the RANSAC hyp_chunk at the bench shape.

The bench scene exceeds the 0.999 confidence in chunk 1, so the chunked
early exit pays for exactly ONE chunk — a smaller chunk is then pure
savings on easy scenes, at the price of more while_loop iterations on
exhaustive scenes (BENCH_NOTES: 7x16k = 9.6 ms vs 2x50k = 5.8 ms when
ALL chunks run). This measures the full pair at several chunk sizes with
the headline methodology. Run on the TPU:
  python benchmarks/sweep_hyp_chunk.py
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
from tpu3d.ops.icp import build_icp_target, icp_refine  # noqa: E402
from tpu3d.ops.ransac import ransac_registration  # noqa: E402
from tpu3d.types import PointCloud  # noqa: E402
from tpu3d.utils.timing import roundtrip_ms  # noqa: E402


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    n = int(os.environ.get("TPU3D_BENCH_N", "100352"))
    K = int(os.environ.get("TPU3D_BENCH_K", "10"))
    corr_cap, src_cap = bench_caps()
    voxel = 0.002
    src_np, tgt_np, _, _ = make_pair(n)
    tgt, tgt_feat = fused_prepare_features(
        PointCloud.from_numpy(tgt_np, capacity=n), jnp.float32(voxel * 5)
    )
    tgt_index = jax.jit(build_icp_target)(tgt)
    src = PointCloud.from_numpy(src_np, capacity=n)
    rt = roundtrip_ms() / 1000.0
    log(f"backend={jax.default_backend()} n={n} caps={corr_cap}/{src_cap}"
        f" K={K}")

    for hyp_chunk in (50176, 25088, 12544, 6272):
        def k_loop(p, m, rep_jitter, hyp_chunk=hyp_chunk):
            def body(i, acc):
                pi = p + (jnp.float32(1e-7) * (i + 1) + rep_jitter)
                source = PointCloud(points=pi, mask=m)
                sub_c, sub_f, _ = fused_prepare_sparse(
                    source, jnp.float32(voxel * 5), corr_cap=corr_cap
                )
                coarse = ransac_registration(
                    sub_c, tgt, sub_f, tgt_feat, voxel,
                    max_iterations=100000, corr_mode="exact",
                    hyp_chunk=hyp_chunk,
                )
                refined = icp_refine(
                    source, tgt, coarse.transformation, voxel * 0.4,
                    max_iterations=200, point_to_plane=True,
                    target_index=tgt_index, src_cap=src_cap,
                )
                return (
                    acc + jnp.sum(refined.transformation) + refined.fitness
                )

            return jax.lax.fori_loop(0, K, body, jnp.float32(0.0))

        jf = jax.jit(k_loop)
        float(jf(src.points, src.mask, jnp.float32(0.0)))
        ts = []
        for r in range(3):
            # vary args per rep — the tunnel caches identical
            # program+args executions (BENCH_NOTES)
            t0 = time.perf_counter()
            float(jf(src.points, src.mask, jnp.float32(1e-7 * (r + 1) * K)))
            ts.append(time.perf_counter() - t0)
        ms = max((min(ts) - rt) / K, 0.0) * 1000.0
        log(f"hyp_chunk={hyp_chunk:6d}  {ms:7.2f} ms/pair")


if __name__ == "__main__":
    main()
