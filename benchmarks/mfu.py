"""Per-stage MFU (achieved vs peak FLOP utilization) — VERDICT r4 item 7.

Measures the bench configuration's in-context stage prefixes (the same
K-in-one-dispatch methodology as benchmarks/bench_stages.py — isolated
timings lie) and converts the MXU-bound stages to achieved FLOP/s against
the v5e peak using exact hardware-MAC models:

  - descriptor NN (default corr subset AND the exact 100k×100k envelope):
    the bf16x3 packed kernel issues ONE MXU pass over a 3×-widened
    contraction (ops/nn_pallas.py) — hardware MACs = Q·M·(3·33).
  - RANSAC hypothesis scoring: rank-16 factor matmul in bf16x3
    (ops/ransac_pallas.py) — hardware MACs = rows·16·H·3 (est-scoring off
    at the bench caps: every hypothesis scores the full corr subset).

The prepare sweeps and the ICP sweep are VPU/DMA-bound (BENCH_NOTES
rooflines: sweep B ~45 VPU ops/pair within ~2× of its block-union bound;
the walk is DMA-issue-bound) — an MXU MFU is not meaningful there, so the
report carries their measured ms with ``"bound": "vpu/dma"`` and null mfu.

Writes MFU_r{NN}.json (TPU3D_MFU_OUT overrides) and prints one JSON line.
Run on the chip:  python benchmarks/mfu.py       (~4 extra prefix compiles)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from bench import bench_caps, bench_est_cap, make_pair  # noqa: E402
from tpu3d.ops.fused_features import (  # noqa: E402
    fused_prepare_features,
    fused_prepare_sparse,
)
from tpu3d.ops.icp import build_icp_target, icp_refine  # noqa: E402
from tpu3d.ops.ransac import (  # noqa: E402
    feature_correspondences,
    ransac_registration,
)
from tpu3d.types import PointCloud  # noqa: E402
from tpu3d.utils.platform import on_tpu  # noqa: E402
from tpu3d.utils.timing import roundtrip_ms  # noqa: E402

# v5e TensorCore peak: 197 TFLOP/s bf16 on the MXUs (public spec). All
# models below count HARDWARE bf16 MACs (pass-expanded: bf16x3 = 3× the
# algorithmic MACs), so mfu = achieved/peak is true MXU occupancy.
V5E_MXU_BF16_FLOPS = 197e12


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def stage_flops_models(n: int, corr_cap: int, ransac_iters: int) -> dict:
    """Hardware-FLOP models for the MXU-bound stages at the bench config."""
    return {
        # bf16x3 packed NN: one pass, contraction width 3·33.
        "nn": 2.0 * corr_cap * n * 3 * 33,
        "nn_exact": 2.0 * n * n * 3 * 33,
        # Rank-16 scoring in bf16x3; est off at bench caps → all H
        # hypotheses score the corr_cap-row subset.
        "ransac_scoring": 2.0 * corr_cap * 16 * ransac_iters * 3,
    }


def measure_prefixes(n, K, ransac_iters, icp_iters, corr_cap, src_cap,
                     est_cap, voxel=0.002):
    """In-context prefix deltas of bench.py's full_pair (ms/pair)."""
    src_np, tgt_np, _, _ = make_pair(n)
    tgt, tgt_feat = fused_prepare_features(
        PointCloud.from_numpy(tgt_np, capacity=n), jnp.float32(voxel * 5)
    )
    tgt_index = jax.jit(build_icp_target)(tgt)
    src = PointCloud.from_numpy(src_np, capacity=n)

    def stage_fn(stage):
        def fn(src_pts, src_mask):
            source = PointCloud(points=src_pts, mask=src_mask)
            sub_c, sub_f, _ = fused_prepare_sparse(
                source, jnp.float32(voxel * 5), corr_cap=corr_cap,
                interpret=not on_tpu(),
            )
            if stage == "prepare":
                return jnp.sum(sub_f.descriptors) + jnp.sum(sub_c.points)
            if stage == "nn":
                corr = feature_correspondences(sub_f, tgt_feat)
                return jnp.sum(corr.astype(jnp.float32))
            coarse = ransac_registration(
                sub_c, tgt, sub_f, tgt_feat, voxel,
                max_iterations=ransac_iters, corr_mode="exact",
                est_cap=est_cap,
            )
            if stage == "ransac":
                return jnp.sum(coarse.transformation) + coarse.fitness
            refined = icp_refine(
                source, tgt, coarse.transformation, voxel * 0.4,
                max_iterations=icp_iters, point_to_plane=True,
                target_index=tgt_index, src_cap=src_cap,
            )
            return jnp.sum(refined.transformation) + refined.fitness

        def k_loop(p, m, rep_jitter):
            def body(i, acc):
                pi = p + (jnp.float32(1e-7) * (i + 1) + rep_jitter)
                return acc + fn(pi, m)

            return jax.lax.fori_loop(0, K, body, jnp.float32(0.0))

        return jax.jit(k_loop)

    rt = roundtrip_ms() / 1000.0
    thru = {}
    for stage in ("prepare", "nn", "ransac", "icp"):
        f = stage_fn(stage)
        t0 = time.perf_counter()
        float(f(src.points, src.mask, jnp.float32(0.0)))  # compile
        log(f"{stage}: compile+first {time.perf_counter() - t0:.1f}s")
        ts = []
        for r in range(3):
            t0 = time.perf_counter()
            float(f(src.points, src.mask, jnp.float32(1e-7 * (r + 1) * K)))
            ts.append(time.perf_counter() - t0)
        thru[stage] = max((min(ts) - rt) / K, 0.0) * 1000.0
        log(f"thru {stage:8s} {thru[stage]:7.2f} ms/pair")
    order = ("prepare", "nn", "ransac", "icp")
    deltas = {}
    prev = 0.0
    for s in order:
        deltas[s] = max(thru[s] - prev, 0.0)
        prev = thru[s]
    return deltas


def mfu_report(deltas_ms: dict, n: int, corr_cap: int, ransac_iters: int,
               exact_nn_ms: float | None = None) -> list[dict]:
    """Convert measured stage ms to per-stage achieved FLOP/s + MFU."""
    models = stage_flops_models(n, corr_cap, ransac_iters)
    rows = []

    def mxu_row(stage, ms, flops):
        ach = flops / (ms * 1e-3) if ms > 0 else 0.0
        return {
            "stage": stage,
            "ms_per_pair": round(ms, 3),
            "hw_flops": flops,
            "achieved_tflops": round(ach / 1e12, 2),
            "mfu_pct": round(100.0 * ach / V5E_MXU_BF16_FLOPS, 2),
            "bound": "mxu",
        }

    rows.append({
        "stage": "prepare",
        "ms_per_pair": round(deltas_ms.get("prepare", 0.0), 3),
        "bound": "vpu/dma",
        "mfu_pct": None,
        "note": "sweep-based (BENCH_NOTES roofline: ~45 VPU ops/pair, "
                "within ~2x of the block-union bound)",
    })
    rows.append(mxu_row("nn", deltas_ms.get("nn", 0.0), models["nn"]))
    rows.append(
        mxu_row("ransac_scoring", deltas_ms.get("ransac", 0.0),
                models["ransac_scoring"])
    )
    rows[-1]["note"] = (
        "model counts the scoring matmul only; the measured delta also "
        "contains hypothesis solve + table build, so mfu is a lower bound"
    )
    rows.append({
        "stage": "icp",
        "ms_per_pair": round(deltas_ms.get("icp", 0.0), 3),
        "bound": "vpu/dma",
        "mfu_pct": None,
        "note": "slab-sweep correspondence search dominates (data-"
                "dependent windows); JtJ matmuls are rank-6, MXU-trivial",
    })
    if exact_nn_ms is not None:
        rows.append(mxu_row("nn_exact_100k", exact_nn_ms,
                            models["nn_exact"]))
    return rows


def main():
    n = int(os.environ.get("TPU3D_BENCH_N", "100352"))
    K = int(os.environ.get("TPU3D_BENCH_K", "10"))
    ransac_iters = int(os.environ.get("TPU3D_BENCH_RANSAC", "100000"))
    icp_iters = int(os.environ.get("TPU3D_BENCH_ICP", "200"))
    corr_cap, src_cap = bench_caps()
    est_cap = bench_est_cap()
    log(f"backend={jax.default_backend()} n={n} K={K}")

    deltas = measure_prefixes(
        n, K, ransac_iters, icp_iters, corr_cap, src_cap, est_cap
    )

    # Exact-envelope descriptor NN (the 100k×100k bf16x3 three-pass) —
    # isolated here is fine: it IS one kernel, and the exact stage table
    # (bench_stages_exact.py) matches its isolated cost within noise.
    from tpu3d.ops.nn_pallas import nearest_neighbor

    import numpy as np

    rng = np.random.default_rng(0)
    qd = jnp.asarray(rng.random((n, 33), dtype=np.float32))
    td = jnp.asarray(rng.random((n, 33), dtype=np.float32))
    tm = jnp.ones((n,), bool)
    kwargs = {"precision": "fast3"} if on_tpu() else {}
    K_nn = 5

    def nn_loop(q, t, m, jit_s):
        def body(i, acc):
            qi = q + (jnp.float32(1e-6) * (i + 1) + jit_s)
            return acc + jnp.sum(nearest_neighbor(qi, t, m, **kwargs)[1])

        return jax.lax.fori_loop(0, K_nn, body, jnp.float32(0.0))

    g = jax.jit(nn_loop)
    float(g(qd, td, tm, jnp.float32(0.0)))
    rt = roundtrip_ms() / 1000.0
    ts = []
    for r in range(3):
        t0 = time.perf_counter()
        float(g(qd, td, tm, jnp.float32(1e-6 * (r + 1) * K_nn)))
        ts.append(time.perf_counter() - t0)
    exact_nn_ms = max((min(ts) - rt) / K_nn, 0.0) * 1000.0

    rows = mfu_report(deltas, n, corr_cap, ransac_iters, exact_nn_ms)
    out = {
        "n": n,
        "config": {"corr_cap": corr_cap, "src_cap": src_cap,
                   "est_cap": est_cap, "ransac_iters": ransac_iters},
        "backend": jax.default_backend(),
        "peak_tflops_bf16": V5E_MXU_BF16_FLOPS / 1e12,
        "stages": rows,
    }
    path = os.environ.get(
        "TPU3D_MFU_OUT",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "MFU_r05.json"),
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
