"""Block-shape sweep for the exact descriptor-NN Pallas kernel.

The exact envelope's dominant term is the 100k x 100k x 33-D bf16x3
argmin (~17.7 ms in BENCH_NOTES' round-4 decomposition — within ~1.8x of
the K=99 MXU-pass roofline). Per-tile costs that DON'T ride the MXU are
the candidates for the residual: the running (min, argmin) epilogue runs
once per (query_tile, target_tile) and the target-side tnorm is
recomputed for every query tile. Larger tiles amortize both; VMEM bounds
the product (d2 tile = block_m x block_n f32).

Run on the TPU:  python benchmarks/sweep_nn_blocks.py
Prints ms per full 100k x 100k pass for each (block_n, block_m), K-loop
methodology (inputs jittered per rep; tunnel caches identical
executions, BENCH_NOTES).
"""

from __future__ import annotations

import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from tpu3d.ops.nn_pallas import nearest_neighbor_pallas  # noqa: E402
from tpu3d.utils.timing import roundtrip_ms  # noqa: E402


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    n = int(os.environ.get("TPU3D_BENCH_N", "100352"))
    K = int(os.environ.get("TPU3D_BENCH_K", "5"))
    d = 33
    rng = np.random.default_rng(0)
    q_np = rng.normal(size=(n, d)).astype(np.float32)
    t_np = rng.normal(size=(n, d)).astype(np.float32)
    q = jnp.asarray(q_np)
    t = jnp.asarray(t_np)
    mask = jnp.ones((n,), bool)
    rt = roundtrip_ms() / 1000.0
    log(f"roundtrip {rt * 1000:.1f} ms, n={n}, d={d}, K={K}")

    ref_idx = None
    for bn, bm in [
        (512, 1024),   # current default
        (512, 2048),
        (1024, 1024),
        (1024, 2048),
        (256, 2048),
        (2048, 1024),
    ]:
        def k_loop(qq, jit_s, bn=bn, bm=bm):
            def body(i, acc):
                qi = qq + (jnp.float32(1e-7) * (i + 1) + jit_s)
                idx, d2 = nearest_neighbor_pallas(
                    qi, t, mask, block_n=bn, block_m=bm, precision="fast3"
                )
                return acc + jnp.sum(d2) + jnp.sum(idx.astype(jnp.float32))

            return jax.lax.fori_loop(0, K, body, jnp.float32(0.0))

        f = jax.jit(k_loop)
        try:
            float(f(q, jnp.float32(0.0)))  # compile
        except Exception as e:  # noqa: BLE001 — lowering limits vary
            log(f"bn={bn:5d} bm={bm:5d}  FAILED: {type(e).__name__}")
            continue
        ts = []
        for r in range(3):
            t0 = time.perf_counter()
            float(f(q, jnp.float32(1e-7 * (r + 1) * K)))
            ts.append(time.perf_counter() - t0)
        ms = max((min(ts) - rt) / K, 0.0) * 1000.0
        # Exactness check vs the default block config (same packing).
        idx, _ = jax.jit(
            lambda a: nearest_neighbor_pallas(
                a, t, mask, block_n=bn, block_m=bm, precision="fast3"
            )
        )(q)
        idx = np.asarray(idx)
        if ref_idx is None:
            ref_idx = idx
            agree = 1.0
        else:
            agree = float((idx == ref_idx).mean())
        log(f"bn={bn:5d} bm={bm:5d}  {ms:7.2f} ms/pass  idx-agree {agree:.4f}")


if __name__ == "__main__":
    main()
