"""Characterize the K-dispatch vs single-shot methodology gap (VERDICT r3
item 4: BENCH_r03 recorded 8.5 ms/pair K-dispatch vs 7.6 ms single-shot —
89% agreement where TESTS_TPU_r03.md saw 99-102%).

Hypothesis under test: the single-shot number is `min(raw) - min(roundtrip)`
where raw ≈ 33 ms contains a ~25 ms tunnel roundtrip — so a ±1 ms drift in
the roundtrip estimate moves the net single-shot figure by ±1 ms (±13% at
an 8 ms denominator). The K-dispatch figure divides the same subtraction
error by K=10. The two methodologies therefore CANNOT agree better than the
roundtrip drift allows, and the disagreement should scale like
sigma(rt) / pair_ms, not like a real device-work difference.

Protocol (all interleaved, one chip session, same compiled programs as
bench.py): R rounds of [roundtrip x4, single-shot x2, K-dispatch x1], inputs
value-jittered per rep (the tunnel caches identical program+args). Reports
per-methodology distributions, the roundtrip spread, and the predicted vs
observed gap. Writes METHODOLOGY JSON to stdout; diagnostics to stderr.

Run: python benchmarks/methodology.py           (~3-6 min incl. compile)
Env: TPU3D_METH_ROUNDS (default 6), TPU3D_BENCH_* as bench.py.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

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
from tpu3d.utils.platform import on_tpu  # noqa: E402


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    n = int(os.environ.get("TPU3D_BENCH_N", "100352"))
    ransac_iters = int(os.environ.get("TPU3D_BENCH_RANSAC", "100000"))
    icp_iters = int(os.environ.get("TPU3D_BENCH_ICP", "200"))
    rounds = int(os.environ.get("TPU3D_METH_ROUNDS", "6"))
    K = int(os.environ.get("TPU3D_BENCH_K", "10"))
    corr_cap, src_cap = bench_caps()
    voxel = 0.002

    log(f"backend={jax.default_backend()} n={n} rounds={rounds} K={K}")

    # Artifact-minting gate (VERDICT r4 item 5): refuse to run in a
    # degraded-tunnel session — METHODOLOGY_r04 was minted in one and its
    # numbers never reconciled with the round's headline.
    from tpu3d.utils.timing import roundtrip_stats

    health = roundtrip_stats()
    log(f"tunnel health: {health}")
    if not health["healthy"] and os.environ.get("TPU3D_METH_FORCE") != "1":
        log("ABORT: roundtrip spread "
            f"{health['spread_ms']} ms > 3 ms — this session cannot mint a "
            "methodology artifact (TPU3D_METH_FORCE=1 overrides)")
        return 2

    src_np, tgt_np, _, _ = make_pair(n)
    tgt, tgt_feat = fused_prepare_features(
        PointCloud.from_numpy(tgt_np, capacity=n), jnp.float32(voxel * 5)
    )
    tgt_index = jax.jit(build_icp_target)(tgt)
    src = PointCloud.from_numpy(src_np, capacity=n)

    def full_pair(src_pts, src_mask):
        source = PointCloud(points=src_pts, mask=src_mask)
        # interpret only off-TPU (CPU smoke runs); the chip measurement is
        # the real Mosaic path — identical to bench.py's headline config.
        sub_c, sub_f, _ = fused_prepare_sparse(
            source, jnp.float32(voxel * 5), corr_cap=corr_cap,
            interpret=not on_tpu(),
        )
        coarse = ransac_registration(
            sub_c, tgt, sub_f, tgt_feat, voxel,
            max_iterations=ransac_iters, corr_mode="exact",
        )
        refined = icp_refine(
            source, tgt, coarse.transformation, voxel * 0.4,
            max_iterations=icp_iters, point_to_plane=True,
            target_index=tgt_index, src_cap=src_cap,
        )
        return refined.transformation, refined.fitness, refined.rmse

    single = jax.jit(lambda p, m: jnp.sum(full_pair(p, m)[0]))

    def k_pairs(p, m, rep_jitter):
        def body(i, acc):
            pi = p + (jnp.float32(1e-7) * (i + 1) + rep_jitter)
            T, fit, _ = full_pair(pi, m)
            return acc + jnp.sum(T) + fit

        return jax.lax.fori_loop(0, K, body, jnp.float32(0.0))

    kdisp = jax.jit(k_pairs)

    rt_probe = jax.jit(lambda v: v + 1.0)
    float(rt_probe(jnp.float32(1.0)))

    t0 = time.perf_counter()
    float(single(src.points, src.mask))
    log(f"single compile+run {time.perf_counter() - t0:.1f}s")
    t0 = time.perf_counter()
    float(kdisp(src.points, src.mask, jnp.float32(0.0)))
    log(f"K-dispatch compile+run {time.perf_counter() - t0:.1f}s")

    rts, singles, kdisps = [], [], []
    rep = 0
    for r in range(rounds):
        for _ in range(4):
            t0 = time.perf_counter()
            float(rt_probe(jnp.float32(1.0 + rep)))
            rts.append(time.perf_counter() - t0)
            rep += 1
        for _ in range(2):
            pk = src.points + jnp.float32(1e-7 * (rep + 1))
            t0 = time.perf_counter()
            float(single(pk, src.mask))
            singles.append(time.perf_counter() - t0)
            rep += 1
        t0 = time.perf_counter()
        float(kdisp(src.points, src.mask, jnp.float32(1e-7 * (rep + 1) * K)))
        kdisps.append(time.perf_counter() - t0)
        rep += 1
        log(
            f"round {r}: rt {1000 * np.min(rts[-4:]):.1f}/"
            f"{1000 * np.max(rts[-4:]):.1f} ms, single "
            f"{1000 * singles[-2]:.1f}/{1000 * singles[-1]:.1f} ms raw, "
            f"K {1000 * kdisps[-1]:.1f} ms raw"
        )

    rts, singles, kdisps = map(np.asarray, (rts, singles, kdisps))
    rt_min, rt_med, rt_max = np.min(rts), np.median(rts), np.max(rts)
    single_net = np.min(singles) - rt_min
    k_net = (np.min(kdisps) - rt_min) / K
    # Spread each methodology shows ACROSS rounds (how reproducible the
    # net number is run-to-run): net per-round minima.
    s_rounds = singles.reshape(rounds, 2).min(axis=1) - rt_min
    k_rounds = (kdisps - rt_min) / K
    out = {
        "n": n,
        "rounds": rounds,
        "K": K,
        "session_health": health,
        "roundtrip_ms": {
            "min": round(1e3 * rt_min, 3),
            "median": round(1e3 * rt_med, 3),
            "max": round(1e3 * rt_max, 3),
            "spread": round(1e3 * (rt_max - rt_min), 3),
        },
        "single_shot_ms": {
            "net": round(1e3 * single_net, 3),
            "raw_min": round(1e3 * np.min(singles), 3),
            "per_round_net_min": round(1e3 * s_rounds.min(), 3),
            "per_round_net_max": round(1e3 * s_rounds.max(), 3),
        },
        "k_dispatch_ms": {
            "net": round(1e3 * k_net, 3),
            "raw_min": round(1e3 * np.min(kdisps), 3),
            "per_round_net_min": round(1e3 * k_rounds.min(), 3),
            "per_round_net_max": round(1e3 * k_rounds.max(), 3),
        },
        "agreement_pct": round(100 * single_net / max(k_net, 1e-9), 1),
        # The rt-subtraction sensitivity: a d-ms roundtrip drift moves the
        # single-shot net by d but the K-dispatch net by d/K. If the
        # observed |gap| is within the rt spread, the gap IS the
        # subtraction error, not device work.
        "gap_ms": round(1e3 * (single_net - k_net), 3),
        "rt_spread_explains_gap": bool(
            abs(single_net - k_net) <= (rt_max - rt_min)
        ),
    }
    print(json.dumps(out), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
