"""Schedule sweep for the fused slab-sweep ICP at the EXACT-envelope
shape (src_mode='exact', 100k source rows, ~8 iterations to converge —
the 6.7-7.4 ms/pair term of bench.py's exact configuration).

(block, sub) only move the query-tile width and candidate sub-tile width
of the p2plane stats kernel — results are exact for any schedule (the
window own-mask trims tiles; argmin tie-breaks are lowest-row at every
sub). K-dispatch methodology. Run on TPU:
  python benchmarks/sweep_icp_blocks.py
Prints one JSON object on stdout; progress on stderr.
"""

from __future__ import annotations

import json
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
from tpu3d.types import PointCloud  # noqa: E402
from tpu3d.utils.timing import roundtrip_ms  # noqa: E402


def log(*a):
    print(*a, file=sys.stderr, flush=True)


GRID = [
    (128, 512),   # shipping default (p2plane Pallas backend)
    (128, 256),
    (128, 1024),
    (256, 512),
    (256, 256),
]


def main():
    n = int(os.environ.get("TPU3D_BENCH_N", "100352"))
    K = int(os.environ.get("TPU3D_BENCH_K", "5"))
    voxel = 0.002
    src_np, tgt_np, _, _ = make_pair(n)
    # Normals on the target (p2plane); start ICP from a small offset so it
    # does real work every iteration.
    tgt, _ = fused_prepare_features(
        PointCloud.from_numpy(tgt_np, capacity=n), jnp.float32(voxel * 5)
    )
    tgt_index = jax.jit(build_icp_target)(tgt)
    src = PointCloud.from_numpy(src_np, capacity=n)
    init = jnp.eye(4, dtype=jnp.float32).at[0, 3].add(jnp.float32(0.004))

    def icp_fn(block, sub):
        def fn(src_pts, src_mask):
            source = PointCloud(points=src_pts, mask=src_mask)
            r = icp_refine(
                source, tgt, init, voxel * 0.4, max_iterations=200,
                point_to_plane=True, target_index=tgt_index,
                src_mode="exact", block=block, sub=sub,
            )
            return jnp.sum(r.transformation) + r.fitness

        def k_loop(p, m, rep_jitter):
            def body(i, acc):
                pi = p + (jnp.float32(1e-7) * (i + 1) + rep_jitter)
                return acc + fn(pi, m)

            return jax.lax.fori_loop(0, K, body, jnp.float32(0.0))

        return jax.jit(k_loop)

    rt = roundtrip_ms() / 1000.0
    log(f"[roundtrip {rt * 1000:.1f} ms, n={n}, K={K}]")
    results = []
    ref_T = None
    for block, sub in GRID:
        f = icp_fn(block, sub)
        t0 = time.perf_counter()
        try:
            float(f(src.points, src.mask, jnp.float32(0.0)))  # compile
        except Exception as e:
            log(f"({block},{sub})  FAILED: {type(e).__name__}")
            results.append({"block": block, "sub": sub, "ms": None,
                            "error": type(e).__name__})
            continue
        log(f"[compile ({block},{sub}): {time.perf_counter() - t0:.1f}s]")
        ts = []
        for r in range(3):
            t0 = time.perf_counter()
            float(f(src.points, src.mask, jnp.float32(1e-7 * (r + 1) * K)))
            ts.append(time.perf_counter() - t0)
        ms = max((min(ts) - rt) / K, 0.0) * 1000.0
        # Pose agreement vs the default schedule.
        res = jax.jit(
            lambda p, m: icp_refine(
                PointCloud(points=p, mask=m), tgt, init, voxel * 0.4,
                max_iterations=200, point_to_plane=True,
                target_index=tgt_index, src_mode="exact",
                block=block, sub=sub,
            ).transformation
        )(src.points, src.mask)
        if ref_T is None:
            ref_T = res
        import numpy as np

        rot_e = float(np.abs(np.asarray(res)[:3, :3]
                             - np.asarray(ref_T)[:3, :3]).max())
        tr_e = float(np.abs(np.asarray(res)[:3, 3]
                            - np.asarray(ref_T)[:3, 3]).max())
        log(f"({block},{sub})  {ms:7.2f} ms/pair  pose-delta "
            f"{rot_e:.2e}/{tr_e:.2e}")
        results.append({"block": block, "sub": sub, "ms": round(ms, 2),
                        "rot_delta": rot_e, "trans_delta": tr_e})

    ok = [r for r in results if r["ms"] is not None]
    best = min(ok, key=lambda r: r["ms"]) if ok else None
    print(json.dumps({
        "n": n, "K": K, "roundtrip_ms": round(rt * 1000, 1),
        "results": results, "best": best,
    }))


if __name__ == "__main__":
    main()
