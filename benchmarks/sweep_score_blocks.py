"""Block-schedule sweep for the fused RANSAC scoring kernel
(ops/ransac_pallas.py score_hypotheses_pallas) at the EXACT-envelope
shape: one 25,600-hypothesis chunk scored on all ~100k rows (the
dominant RANSAC term of bench.py's exact configuration).

K-dispatch methodology (fori_loop, per-iteration jitter). Run on TPU:
  python benchmarks/sweep_score_blocks.py
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
import numpy as np  # noqa: E402

from tpu3d.ops.ransac_pallas import score_hypotheses_pallas  # noqa: E402
from tpu3d.utils.timing import roundtrip_ms  # noqa: E402


def log(*a):
    print(*a, file=sys.stderr, flush=True)


# (block_n, block_h): the f32 err² tile is block_n × block_h × 4 B of
# VMEM (8 MB at (4096, 512)); (2048, 512) is the shipping default.
GRID = [
    (2048, 512),
    (2048, 1024),
    (4096, 512),
    (4096, 1024),
    (8192, 512),
    (1024, 1024),
]


def main():
    n = int(os.environ.get("TPU3D_BENCH_N", "100352"))
    h = int(os.environ.get("TPU3D_BENCH_H", "25600"))
    K = int(os.environ.get("TPU3D_BENCH_K", "5"))
    rng = np.random.default_rng(0)
    feat = jnp.asarray(rng.normal(size=(16, n)).astype(np.float32) * 0.01)
    pq = jnp.asarray(rng.uniform(0.0, 1e-4, size=(n,)).astype(np.float32))
    w16 = jnp.asarray(rng.normal(size=(16, h)).astype(np.float32) * 0.01)
    tn = jnp.asarray(rng.uniform(0.0, 1e-4, size=(h,)).astype(np.float32))
    thr2 = 1e-5

    rt = roundtrip_ms() / 1000.0
    log(f"[roundtrip {rt * 1000:.1f} ms, n={n}, h={h}, K={K}]")
    results = []
    ref = None
    for bn, bh in GRID:
        def k_loop(f, jit_s, bn=bn, bh=bh):
            def body(i, acc):
                fi = f + (jnp.float32(1e-9) * (i + 1) + jit_s)
                cnt, err = score_hypotheses_pallas(
                    fi, pq, w16, tn, thr2, block_n=bn, block_h=bh
                )
                return acc + jnp.sum(cnt) + jnp.sum(err)

            return jax.lax.fori_loop(0, K, body, jnp.float32(0.0))

        fj = jax.jit(k_loop)
        try:
            float(fj(feat, jnp.float32(0.0)))  # compile
        except Exception as e:  # VMEM OOM at wide schedules
            log(f"({bn},{bh})  FAILED: {type(e).__name__}")
            results.append({"block_n": bn, "block_h": bh, "ms": None,
                            "error": type(e).__name__})
            continue
        ts = []
        for r in range(3):
            t0 = time.perf_counter()
            float(fj(feat, jnp.float32(1e-9 * (r + 1) * K)))
            ts.append(time.perf_counter() - t0)
        ms = max((min(ts) - rt) / K, 0.0) * 1000.0
        # Exactness: counts must match the default schedule bit-for-bit.
        cnt, _ = jax.jit(
            lambda f: score_hypotheses_pallas(
                f, pq, w16, tn, thr2, block_n=bn, block_h=bh
            )
        )(feat)
        cnt = np.asarray(cnt)
        if ref is None:
            ref = cnt
        agree = bool((cnt == ref).all())
        log(f"({bn},{bh})  {ms:7.2f} ms/chunk  exact-agree {agree}")
        results.append({"block_n": bn, "block_h": bh, "ms": round(ms, 2),
                        "agree": agree})

    ok = [r for r in results if r["ms"] is not None]
    best = min(ok, key=lambda r: r["ms"]) if ok else None
    print(json.dumps({
        "n": n, "h": h, "K": K, "roundtrip_ms": round(rt * 1000, 1),
        "results": results, "best": best,
    }))


if __name__ == "__main__":
    main()
