"""Schedule sweep for the DENSE fused prepare (the exact envelope's
largest stage: ~15.5 ms/pair at 100k of the 49.5 ms total).

Times `fused_prepare_features` (dense: every row swept) across a
(block, sub) grid with the K-dispatch methodology (one fori_loop, inputs
perturbed per iteration — the tunnel caches identical program+args).
VERDICT r4 item 2 asks either for exact-envelope ≤ 40 ms or a measured
schedule table that revises the ~35 ms floor estimate; this produces the
prepare rows of that table.

Run on the TPU:
  python benchmarks/sweep_dense_prepare.py        (TPU3D_BENCH_K, _N override)
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
from tpu3d.types import PointCloud  # noqa: E402
from tpu3d.utils.timing import roundtrip_ms  # noqa: E402


def log(*a):
    print(*a, file=sys.stderr, flush=True)


# (block, sub) schedules: block is the query-tile lane width (128 floor),
# sub the candidate sub-tile width. (128, 256) is the shipping default
# (chip-measured r3 on the DMA walk — re-measured here now that the dense
# 100k operands auto-resident in VMEM).
GRID = [
    (128, 128),
    (128, 256),
    (128, 384),
    (128, 512),
    (256, 128),
    (256, 256),
    (256, 512),
]


def main():
    n = int(os.environ.get("TPU3D_BENCH_N", "100352"))
    K = int(os.environ.get("TPU3D_BENCH_K", "5"))
    voxel = 0.002
    src_np, _, _, _ = make_pair(n)
    src = PointCloud.from_numpy(src_np, capacity=n)
    radius = jnp.float32(voxel * 5)

    def prepare_fn(block, sub):
        def fn(src_pts, src_mask):
            source = PointCloud(points=src_pts, mask=src_mask)
            source, sfeat = fused_prepare_features(
                source, radius, block=block, sub=sub
            )
            return jnp.sum(sfeat.descriptors) + jnp.sum(source.points)

        def k_loop(p, m, rep_jitter):
            def body(i, acc):
                pi = p + (jnp.float32(1e-7) * (i + 1) + rep_jitter)
                return acc + fn(pi, m)

            return jax.lax.fori_loop(0, K, body, jnp.float32(0.0))

        return jax.jit(k_loop)

    rt = roundtrip_ms() / 1000.0
    log(f"[roundtrip {rt * 1000:.1f} ms, n={n}, K={K}]")
    results = []
    for block, sub in GRID:
        f = prepare_fn(block, sub)
        t0 = time.perf_counter()
        try:
            float(f(src.points, src.mask, jnp.float32(0.0)))  # compile
        except Exception as e:  # e.g. VMEM OOM at wide schedules
            log(f"({block},{sub})  FAILED: {type(e).__name__}")
            results.append(
                {"block": block, "sub": sub, "ms": None,
                 "error": type(e).__name__}
            )
            continue
        log(f"[compile ({block},{sub}): {time.perf_counter() - t0:.1f}s]")
        ts = []
        for r in range(3):
            t0 = time.perf_counter()
            float(f(src.points, src.mask, jnp.float32(1e-7 * (r + 1) * K)))
            ts.append(time.perf_counter() - t0)
        ms = max((min(ts) - rt) / K, 0.0) * 1000.0
        log(f"({block},{sub})  {ms:7.2f} ms/pair")
        results.append({"block": block, "sub": sub, "ms": round(ms, 2)})

    ok = [r for r in results if r["ms"] is not None]
    best = min(ok, key=lambda r: r["ms"]) if ok else None
    print(json.dumps({
        "n": n, "K": K, "roundtrip_ms": round(rt * 1000, 1),
        "results": results, "best": best,
    }))


if __name__ == "__main__":
    main()
