"""Benchmark driver: full registration throughput on the current backend.

Prints exactly ONE JSON line to stdout:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
Diagnostics go to stderr.

Headline metric (BASELINE.json): registration pairs/sec at 100k points —
the full FPFH + RANSAC + ICP stack (reference workload defaults: 100k RANSAC
hypotheses, ICP to convergence capped at 200, k=30 normals, FPFH radius
5×voxel) on a synthetic bumpy-surface pair with a known rigid offset.

vs_baseline: speedup over the single-thread CPU reference path. The
reference binary needs OpenCV/GLFW/realsense and can't build here, so the
CPU denominator is *measured* from the NumPy oracle (a faithful
transliteration of registration.cpp, see tpu3d/oracle.py) at a reduced size
and extrapolated by the known O(N²)/O(H·N) scaling of each stage; the
measurement is cached in BASELINE_CPU.json with its derivation.

Env knobs: TPU3D_BENCH_N (default 100352), TPU3D_BENCH_RANSAC (default
100000), TPU3D_BENCH_ICP (default 200), TPU3D_BENCH_EST_CAP (default
2048), TPU3D_BENCH_CORR_CAP (default
4096), TPU3D_BENCH_SRC_CAP (default 8192).

The correspondence/ICP-source subset caps run TIGHTER here than the
library defaults (8192/16384): the bench caps are validated end to end by
benchmarks/ab_stats.py and benchmarks/robustness.py (which read the same
env knobs, so the checked-in AB_STATS/robustness artifacts cover exactly
this configuration) — estimate sigma grows ~sqrt(2) while pose error stays
at ICP's convergence floor. Library defaults stay the safer general-purpose
setting.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

_REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _REPO)
_CPU_BASELINE_PATH = os.path.join(_REPO, "BASELINE_CPU.json")


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def bench_caps() -> tuple[int, int]:
    """(corr_cap, src_cap) for the headline configuration — shared with
    benchmarks/ab_stats.py and benchmarks/robustness.py so the quality
    artifacts validate the exact caps the bench runs. Chip-measured cap
    ladder (ms/pair): 8192/16384 = 13.9, 4096/8192 = 12.7→10.9 (with the
    est gate), 4096/4096 = 10.4, 2048/4096 = 10.0 with the strata-
    CENTERED 4-run subset (AB_STATS 20 seeds + robustness pass at these
    caps; the earlier left-anchored 2-run layout covered only half the
    cloud's x-range and tripped the max-excess gate on one noisy seed).
    Library defaults stay 8192/16384 — these caps are the benchmark
    configuration, validated by the same artifacts that gate it."""
    return (
        int(os.environ.get("TPU3D_BENCH_CORR_CAP", "2048")),
        int(os.environ.get("TPU3D_BENCH_SRC_CAP", "4096")),
    )


def bench_est_cap() -> int:
    """RANSAC in-chunk estimate-scoring cap for the headline config
    (ops/ransac.py ``est_cap``; engages when corr rows >= 2*est_cap).
    At the current corr_cap=2048 the library default of 2048 keeps the
    estimate stage OFF (all 100k hypotheses exact-score the 2048-row
    subset); 1024 re-enables est-on-1024 + exact-top-32 rescore — the
    same two-stage move that took 12.4→10.9 ms at the 4096 caps.
    MEASURED (same-session chip A/B, K-dispatch): 1024 → 7.7 ms/pair vs
    2048 → 6.9 — a 0.8 ms REGRESSION; at a 2048-row scoring plane the
    estimate stage's extra factor build + finalist rescore outweigh the
    halved scoring matmul (the 4096-cap win does not extend down).
    Default stays 2048 (estimate stage off at bench caps). Shared with
    benchmarks/ab_stats.py (arm 4/5) and benchmarks/robustness.py so the
    quality artifacts validate the exact scoring configuration the bench
    runs."""
    return int(os.environ.get("TPU3D_BENCH_EST_CAP", "2048"))


def make_pair(n: int, seed: int = 0, voxel: float = 0.005):
    """Bumpy-surface pair with curvature at the FPFH-radius (5×voxel) scale
    so descriptors are discriminative — a flat/slowly-varying surface makes
    FPFH degenerate regardless of implementation (same failure as the
    reference's planar demo scene)."""
    rng = np.random.default_rng(seed)
    xy = rng.uniform(-0.5, 0.5, size=(n, 2)).astype(np.float32)
    r = 5.0 * voxel
    w1, w2, w3 = 1.2 / r, 0.9 / r, 0.35 / r
    z = (
        0.7
        + 2.5 * voxel * np.sin(w1 * xy[:, 0]) * np.cos(w1 * 0.8 * xy[:, 1])
        + 4.0 * voxel * np.sin(w2 * xy[:, 0] + 1.3) * np.sin(w2 * 0.7 * xy[:, 1])
        + 8.0 * voxel * np.cos(w3 * xy[:, 0] - 0.4) * np.cos(w3 * 1.1 * xy[:, 1])
    )
    tgt = np.column_stack([xy, z]).astype(np.float32)
    aa = np.array([0.08, -0.06, 0.1])
    th = np.linalg.norm(aa)
    k = aa / th
    K = np.array([[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]])
    R = (np.eye(3) + np.sin(th) * K + (1 - np.cos(th)) * K @ K).astype(np.float32)
    t = np.array([0.02, -0.015, 0.01], np.float32)
    src = ((tgt - t) @ R).astype(np.float32)
    return src, tgt, R, t


def measure_cpu_baseline(n_target: int, ransac_iters: int, icp_iters: int) -> dict:
    """Measure the oracle (CPU reference transliteration) at a small size and
    extrapolate to the benchmark size by each stage's complexity."""
    # Multi-entry cache keyed by (n_target, ransac_iters): the quick-bench
    # config must not clobber the 100k entry (it did in r4, forcing a
    # re-measure under concurrent pytest load that inflated the oracle 28%
    # and so the speedup claim). Legacy single-entry files are absorbed.
    entries = []
    if os.path.exists(_CPU_BASELINE_PATH):
        with open(_CPU_BASELINE_PATH) as f:
            cached = json.load(f)
        entries = cached["entries"] if "entries" in cached else [cached]
        for e in entries:
            if (
                e.get("n_target") == n_target
                and e.get("ransac_iters") == ransac_iters
            ):
                return e

    from tpu3d import oracle

    n_small = 1500
    src, tgt, _, _ = make_pair(n_small, seed=3)
    times = {}

    def best_of(fn, reps=3):
        """min-of-N timing — single-shot small-sample timings vary ~2x with
        host load, which would make vs_baseline noisy between runs."""
        best = float("inf")
        out = None
        for _ in range(reps):
            t0 = time.perf_counter()
            out = fn()
            best = min(best, time.perf_counter() - t0)
        return best, out

    times["normals_small_s"], normals = best_of(
        lambda: oracle.estimate_normals(tgt, k=30)
    )  # O(N²)

    times["fpfh_small_s"], _ = best_of(
        lambda: oracle.compute_fpfh(tgt[:400], normals[:400], 0.01)
    )  # O(N²) at n=400

    # RANSAC: per-iteration cost is O(N) scoring; feature NN is O(N·M·33).
    def score200():
        for _ in range(200):
            oracle.score_hypothesis(np.eye(3, dtype=np.float32),
                                    np.zeros(3, np.float32), src, tgt, 0.003)

    times["ransac_200score_small_s"], _ = best_of(score200)

    # ICP: one iteration is O(N·M) NN + solve.
    times["icp_2iter_small_s"], _ = best_of(
        lambda: oracle.icp_refine(src, tgt, normals,
                                  np.eye(4, dtype=np.float32), 0.05,
                                  max_iterations=2, point_to_plane=True)
    )

    s = n_target / n_small
    est = {
        "normals_s": times["normals_small_s"] * s * s,
        "fpfh_s": times["fpfh_small_s"] * (n_target / 400) ** 2,
        "ransac_s": times["ransac_200score_small_s"] / 200 * ransac_iters * s
        + 33 * n_target * n_target / 1e9,  # feature NN at ~1 GFLOP/s scalar C++
        "icp_s": times["icp_2iter_small_s"] / 2 * min(icp_iters, 30) * s * s,
    }
    # ×2: both clouds get normals+FPFH in the reference pipeline; we bench
    # one prepared target + one full source prep, matching register_pair's
    # per-instance cost (target prep is amortized) — use 1× here
    # (conservative in the CPU's favor).
    total = est["normals_s"] + est["fpfh_s"] + est["ransac_s"] + est["icp_s"]
    out = {
        "n_target": n_target,
        "ransac_iters": ransac_iters,
        "measured_small": times,
        "extrapolated": est,
        "cpu_pair_seconds": total,
        "method": (
            "NumPy-oracle transliteration of registration.cpp measured at "
            "n=1500 (n=400 for FPFH), extrapolated by stage complexity "
            "(normals/FPFH/ICP O(N^2), RANSAC O(H*N) + feature-NN O(N*M*33)); "
            "ICP capped at 30 effective iterations (observed convergence)."
        ),
    }
    entries.append(out)
    with open(_CPU_BASELINE_PATH, "w") as f:
        json.dump({"entries": entries}, f, indent=2)
    return out


def main():
    n = int(os.environ.get("TPU3D_BENCH_N", "100352"))
    ransac_iters = int(os.environ.get("TPU3D_BENCH_RANSAC", "100000"))
    icp_iters = int(os.environ.get("TPU3D_BENCH_ICP", "200"))
    corr_cap, src_cap = bench_caps()
    est_cap = bench_est_cap()

    import jax
    import jax.numpy as jnp

    from tpu3d.ops.icp import icp_refine
    from tpu3d.ops.ransac import ransac_registration
    from tpu3d.types import PointCloud
    from tpu3d.utils.timing import roundtrip_ms

    log(f"backend={jax.default_backend()} devices={jax.devices()}")
    log(f"pair size n={n}, ransac={ransac_iters}, icp<= {icp_iters}")

    # Tunnel-health gate (VERDICT r4 item 5): a session whose roundtrip
    # spread exceeds ~3 ms cannot produce trustworthy net timings — the
    # min-minus-min subtraction carries the drift. Default: loud warning
    # (the driver still needs its JSON line); TPU3D_BENCH_REQUIRE_HEALTHY=1
    # aborts instead (artifact-minting sessions should set it).
    from tpu3d.utils.timing import roundtrip_stats

    health = roundtrip_stats()
    log(f"tunnel health: rt min/med/max "
        f"{health['min_ms']}/{health['median_ms']}/{health['max_ms']} ms, "
        f"spread {health['spread_ms']} ms → "
        f"{'healthy' if health['healthy'] else 'DEGRADED'}")
    if not health["healthy"]:
        log("WARNING: tunnel DEGRADED — net timings this session are "
            "unreliable; rerun in a healthy session before recording "
            "artifacts")
        if os.environ.get("TPU3D_BENCH_REQUIRE_HEALTHY") == "1":
            log("TPU3D_BENCH_REQUIRE_HEALTHY=1 → aborting")
            sys.exit(3)

    voxel = 0.002
    src_np, tgt_np, R_true, t_true = make_pair(n)
    from tpu3d.ops.fused_features import fused_prepare_features

    # Target prep (amortized in the pipeline) uses the same descriptor
    # variant as the timed source prep — mixing capped and radius-exact
    # FPFH across the pair would corrupt correspondences.
    tgt, tgt_feat = fused_prepare_features(
        PointCloud.from_numpy(tgt_np, capacity=n), jnp.float32(voxel * 5)
    )
    from tpu3d.ops.icp import build_icp_target

    tgt_index = jax.jit(build_icp_target)(tgt)
    src_cloud = PointCloud.from_numpy(src_np, capacity=n)

    # 'sparse' (default at scale): source descriptors are computed ONLY
    # for the blocks the 8k correspondence subset transitively needs
    # (ops/fused_features.fused_prepare_sparse — every retained descriptor
    # bit-identical to the dense path), and RANSAC consumes the subset
    # view with corr_mode='exact' — the same statistical envelope as
    # corr_mode='auto' (8k-row estimates, PARITY.md), reached without
    # paying for the ~92% of source descriptors nobody reads. ICP never
    # needed source normals (p2plane uses TARGET normals), so it runs on
    # the raw source.
    prep_mode = os.environ.get(
        "TPU3D_BENCH_PREPARE", "sparse" if n >= 32768 else "dense"
    )
    log(f"prepare mode: {prep_mode}")

    def full_pair(src_pts, src_mask):
        """Per-instance registration work: normals + FPFH on the source,
        RANSAC coarse, ICP fine (target features AND the target's ICP slab
        index precomputed/amortized — both are per-model structures,
        matching pipeline.cpp:291-294 vs :92-95)."""
        from tpu3d.ops.fused_features import (
            fused_prepare_features,
            fused_prepare_sparse,
        )

        source = PointCloud(points=src_pts, mask=src_mask)
        if prep_mode == "sparse":
            sub_c, sub_f, _ = fused_prepare_sparse(
                source, jnp.float32(voxel * 5), corr_cap=corr_cap
            )
            coarse = ransac_registration(
                sub_c, tgt, sub_f, tgt_feat, voxel,
                max_iterations=ransac_iters, corr_mode="exact",
                est_cap=est_cap,
            )
        else:
            source, sfeat = fused_prepare_features(
                source, jnp.float32(voxel * 5)
            )
            coarse = ransac_registration(
                source, tgt, sfeat, tgt_feat, voxel,
                max_iterations=ransac_iters, corr_cap=corr_cap,
                est_cap=est_cap,
            )
        refined = icp_refine(
            source, tgt, coarse.transformation, voxel * 0.4,
            max_iterations=icp_iters, point_to_plane=True,
            target_index=tgt_index, src_cap=src_cap,
        )
        return refined.transformation, refined.fitness, refined.rmse

    jitted = jax.jit(full_pair)

    # Warmup (compile) + correctness gate. The same program also serves the
    # single-shot timing below (fetching the 4x4 T is the scalar-readback
    # sync, 16 floats) — one fewer multi-minute remote compile.
    t0 = time.perf_counter()
    T, fit, rmse = jitted(src_cloud.points, src_cloud.mask)
    T_np = np.asarray(T)
    log(f"compile+first run: {time.perf_counter() - t0:.1f}s "
        f"fitness={float(fit):.3f} rmse={float(rmse):.6f}")
    rot_err = np.abs(T_np[:3, :3] - R_true).max()
    trn_err = np.abs(T_np[:3, 3] - t_true).max()
    log(f"pose error: rot {rot_err:.4f}, trans {trn_err:.5f} m")
    quality_ok = rot_err < 0.02 and trn_err < 0.005

    times = []
    for k in range(5):
        # Distinct input VALUES per rep: the tunnel caches executions of
        # identical program+args (BENCH_NOTES) — a 0.1 µm jitter defeats
        # that without touching registration quality.
        pk = src_cloud.points + jnp.float32(1e-7 * (k + 1))
        t0 = time.perf_counter()
        np.asarray(jitted(pk, src_cloud.mask)[0])
        times.append(time.perf_counter() - t0)
    rt = roundtrip_ms() / 1000.0
    single_s = max(min(times) - rt, 1e-9)
    log(f"pair times: {['%.3f' % t for t in times]}s (roundtrip {rt:.3f}s)")

    # HEADLINE methodology: K pairs inside ONE dispatch (lax.fori_loop,
    # inputs perturbed per iteration so no two pairs are the same program
    # state — nothing can be cached or CSE'd away) — this measures pure
    # device throughput with no tunnel roundtrip or per-dispatch overhead
    # in the quotient at all.
    K = int(os.environ.get("TPU3D_BENCH_K", "10"))

    def k_pairs(p, m, rep_jitter):
        def body(i, acc):
            # 0.1 µm jitter: numerically invisible to registration (the
            # ICP convergence tolerance is 1e-6 m of rmse), but makes
            # every iteration's trace inputs distinct values.
            pi = p + (jnp.float32(1e-7) * (i + 1) + rep_jitter)
            T, fit, _ = full_pair(pi, m)
            return acc + jnp.sum(T) + fit

        return jax.lax.fori_loop(0, K, body, jnp.float32(0.0))

    # rep_jitter varies the ARGS per timed rep: the tunnel RPC layer
    # caches identical program+args executions (BENCH_NOTES), and a
    # scalar arg is enough to defeat it without a 1.2 MB re-upload.
    sync_k = jax.jit(k_pairs)
    float(sync_k(src_cloud.points, src_cloud.mask, jnp.float32(0.0)))
    k_times = []
    for r in range(3):
        jit_r = jnp.float32(1e-7 * (r + 1) * K)
        t0 = time.perf_counter()
        float(sync_k(src_cloud.points, src_cloud.mask, jit_r))
        k_times.append(time.perf_counter() - t0)
    pair_s = max((min(k_times) - rt) / K, 1e-9)
    log(
        f"K={K} pairs in one dispatch: {['%.3f' % t for t in k_times]}s"
        f" → {pair_s * 1000:.1f} ms/pair (single-shot methodology:"
        f" {single_s * 1000:.1f} ms; agreement"
        f" {100 * single_s / max(pair_s, 1e-12):.0f}%)"
    )
    # Floor-drift check: a burst probe can't see slow degradation — compare
    # the roundtrip floor before vs after the timed runs.
    health_end = roundtrip_stats()
    floor_drift = abs(health_end["min_ms"] - health["min_ms"])
    log(f"tunnel floor drift over run: {floor_drift:.2f} ms "
        f"(start {health['min_ms']}, end {health_end['min_ms']})")
    if floor_drift > 3.0:
        log("WARNING: roundtrip floor drifted > 3 ms during the run — "
            "net timings unreliable, rerun in a stable session")

    # Methodology (VERDICT r3 item 4, characterized in METHODOLOGY_r04.json
    # + BENCH_NOTES): the single-shot net is a LOWER BOUND, not an
    # independent estimate — raw single-shots measure less than
    # rt_min + true device work because the tunnel overlaps device
    # execution with RPC transport, and the roundtrip subtraction carries
    # the tunnel's full ±5 ms drift at K=1. The K-dispatch quotient
    # divides both errors by K and is the headline.

    cpu = measure_cpu_baseline(n, ransac_iters, icp_iters)
    speedup = cpu["cpu_pair_seconds"] / pair_s
    log(f"cpu reference (extrapolated oracle): {cpu['cpu_pair_seconds']:.0f}s"
        f" → speedup {speedup:.0f}x; quality_ok={quality_ok}")

    # Headline JSON BEFORE extras: the extras recompile multi-minute 1M
    # programs and a timeout there must not lose the metric.
    print(
        json.dumps(
            {
                "metric": f"registration_pairs_per_sec_{n}pts",
                "value": round(1.0 / pair_s, 4),
                "unit": "pairs/s",
                "vs_baseline": round(speedup, 1),
            }
        ),
        flush=True,
    )

    # Per-stage MFU (VERDICT r4 item 7): reported from the newest checked-in
    # MFU_r*.json (refreshed on chip by benchmarks/mfu.py — the in-context
    # prefix methodology) so every bench run carries the numbers without
    # paying the 4 extra prefix compiles here.
    report_mfu(log)

    # EXACT envelope (VERDICT r3 item 9): dense prepare + corr_mode='exact'
    # + src_mode='exact' + single-stage scoring — the zero-statistical-
    # shortcut configuration (PARITY.md "exactness knobs"). Recorded every
    # round on stderr so both envelopes have a trajectory. Runs AFTER the
    # headline JSON so its multi-minute remote compile can never lose the
    # metric. TPU3D_BENCH_EXACT=0 skips.
    if os.environ.get("TPU3D_BENCH_EXACT", "1") == "1":
        def exact_pair(src_pts, src_mask):
            source = PointCloud(points=src_pts, mask=src_mask)
            source, sfeat = fused_prepare_features(
                source, jnp.float32(voxel * 5)
            )
            coarse = ransac_registration(
                source, tgt, sfeat, tgt_feat, voxel,
                max_iterations=ransac_iters, corr_mode="exact",
                two_stage=False,
            )
            refined = icp_refine(
                source, tgt, coarse.transformation, voxel * 0.4,
                max_iterations=icp_iters, point_to_plane=True,
                target_index=tgt_index, src_mode="exact",
            )
            return refined.transformation, refined.fitness, refined.rmse

        Ke = int(os.environ.get("TPU3D_BENCH_EXACT_K", "5"))

        def k_exact(p, m, rep_jitter):
            def body(i, acc):
                pi = p + (jnp.float32(1e-7) * (i + 1) + rep_jitter)
                T, fit, _ = exact_pair(pi, m)
                return acc + jnp.sum(T) + fit

            return jax.lax.fori_loop(0, Ke, body, jnp.float32(0.0))

        sync_e = jax.jit(k_exact)
        t0 = time.perf_counter()
        float(sync_e(src_cloud.points, src_cloud.mask, jnp.float32(0.0)))
        log(f"exact compile+first: {time.perf_counter() - t0:.1f}s")
        Te, fit_e, rmse_e = jax.jit(exact_pair)(
            src_cloud.points, src_cloud.mask
        )
        Te_np = np.asarray(Te)
        e_times = []
        for r in range(3):
            jr = jnp.float32(1e-7 * (r + 1) * Ke)
            t0 = time.perf_counter()
            float(sync_e(src_cloud.points, src_cloud.mask, jr))
            e_times.append(time.perf_counter() - t0)
        exact_s = max((min(e_times) - rt) / Ke, 1e-9)
        log(
            f"exact envelope (dense prepare, corr/src exact, single-stage): "
            f"{exact_s * 1000:.1f} ms/pair (K={Ke}), fitness "
            f"{float(fit_e):.3f}, pose err rot "
            f"{np.abs(Te_np[:3, :3] - R_true).max():.4f} trans "
            f"{np.abs(Te_np[:3, 3] - t_true).max():.5f}"
        )

    if os.environ.get("TPU3D_BENCH_EXTRAS") == "1":
        run_extras(log)


def report_mfu(log):
    """Print per-stage MFU from the newest MFU_r*.json artifact (see
    benchmarks/mfu.py for the measurement + the hardware-MAC models)."""
    import glob

    paths = sorted(glob.glob(os.path.join(_REPO, "MFU_r*.json")))
    if not paths:
        log("mfu: no MFU_r*.json artifact — run benchmarks/mfu.py on chip")
        return
    try:
        with open(paths[-1]) as f:
            m = json.load(f)
    except Exception as e:
        log(f"mfu: could not read {paths[-1]}: {e}")
        return
    log(f"mfu per stage ({os.path.basename(paths[-1])}, backend "
        f"{m.get('backend')}, peak {m.get('peak_tflops_bf16')} TF bf16):")
    for s in m.get("stages", []):
        if s.get("mfu_pct") is None:
            log(f"  {s['stage']:16s} {s['ms_per_pair']:7.2f} ms/pair  "
                f"[{s['bound']}]")
        else:
            log(f"  {s['stage']:16s} {s['ms_per_pair']:7.2f} ms/pair  "
                f"{s['achieved_tflops']:6.1f} TF  mfu {s['mfu_pct']:5.2f}% "
                f"[{s['bound']}]")


def run_extras(log):
    """Stretch configs (BASELINE.json configs[3..4]); stderr only."""
    import jax
    import jax.numpy as jnp

    from tpu3d.ops.fused_features import fused_prepare_features
    from tpu3d.ops.slab import build_slab, slab_top1
    from tpu3d.parallel.batched import register_batch, stack_clouds
    from tpu3d.types import FPFHFeatures, PointCloud

    # --- 1M-point scene: exact thresholded NN (the ICP inner loop) ---------
    from tpu3d.ops.nn_walk import slab2_top1

    n1m = 1 << 20
    src_np, _, _, _ = make_pair(n1m, seed=5)
    pts = jnp.asarray(src_np[np.argsort(src_np[:, 0], kind="stable")])
    mask = jnp.ones(n1m, bool)
    slab = build_slab(pts, mask)
    f = jax.jit(lambda: jnp.sum(slab_top1(slab, pts, 0.002, slice_cap=8192)[1]))
    float(f())
    t0 = time.time()
    float(f())
    log(f"extra: slab NN 1Mx1M (r=2mm): {(time.time()-t0)*1000:.0f} ms/pass")

    raw = jnp.asarray(src_np)
    f2 = jax.jit(
        lambda: jnp.sum(
            jnp.minimum(
                slab2_top1(
                    raw, mask, raw, mask, jnp.float32(0.002),
                    block=512, sub=512, k_windows=8,
                )[1],
                1.0,
            )
        )
    )
    float(f2())
    t0 = time.time()
    float(f2())
    log(
        "extra: slab2+walk NN 1Mx1M (r=2mm, incl. BOTH index builds): "
        f"{(time.time()-t0)*1000:.0f} ms/pass"
    )

    # --- FULL 1M-pair registration: prepare + RANSAC + ICP ------------------
    # (VERDICT r3 item 4 — not just the NN pass: radius-exact fused
    # normals+FPFH at 1M, corr-subsampled RANSAC, slab-walk ICP.)
    from tpu3d.ops.icp import build_icp_target, icp_refine
    from tpu3d.ops.ransac import ransac_registration

    voxel1m = 0.001  # ~point spacing at 1M over 1 m² — keeps FPFH local
    src1_np, tgt1_np, R1, t1 = make_pair(n1m, seed=7, voxel=voxel1m)
    tgt1 = PointCloud.from_numpy(tgt1_np, capacity=n1m)
    t0 = time.time()
    tgt1p, tgt1f = fused_prepare_features(tgt1, jnp.float32(voxel1m * 5))
    float(jnp.sum(tgt1f.descriptors))
    log(f"extra: 1M prepare (normals+FPFH, incl compile): "
        f"{time.time()-t0:.1f} s")
    tgt1_index = jax.jit(build_icp_target)(tgt1p)

    from tpu3d.ops.fused_features import fused_prepare_sparse

    def pair_1m(sp, sm):
        # Sparse source prepare (the bench-headline configuration): at 1M
        # rows ~99% of source descriptors are never read by the 8k
        # correspondence subset — the sweeps run only on its member
        # blocks. ICP reads no source normals (p2plane uses the target's).
        s = PointCloud(points=sp, mask=sm)
        sub_c, sub_f, _ = fused_prepare_sparse(s, jnp.float32(voxel1m * 5))
        c = ransac_registration(sub_c, tgt1p, sub_f, tgt1f, voxel1m,
                                max_iterations=100000, corr_mode="exact")
        rfd = icp_refine(s, tgt1p, c.transformation, voxel1m * 0.4,
                         max_iterations=50, point_to_plane=True,
                         target_index=tgt1_index)
        return rfd.transformation, rfd.fitness, rfd.rmse

    j1m = jax.jit(pair_1m)
    src1 = PointCloud.from_numpy(src1_np, capacity=n1m)
    T1m, fit1m, _ = j1m(src1.points, src1.mask)
    T1m_np = np.asarray(T1m)
    rot_e = np.abs(T1m_np[:3, :3] - R1).max()
    trn_e = np.abs(T1m_np[:3, 3] - t1).max()
    sync1m = jax.jit(lambda p, m: jnp.sum(pair_1m(p, m)[0]))
    float(sync1m(src1.points, src1.mask))
    best = 1e9
    for k in range(3):
        # Distinct input values per rep — the tunnel caches identical
        # program+args executions (BENCH_NOTES).
        pk = src1.points + jnp.float32(1e-7 * (k + 1))
        t0 = time.time()
        float(sync1m(pk, src1.mask))
        best = min(best, time.time() - t0)
    log(
        f"extra: FULL 1M-pair registration (prepare+RANSAC+ICP): "
        f"{best*1000:.0f} ms/pair raw, fitness {float(fit1m):.3f}, "
        f"pose err rot {rot_e:.5f} trans {trn_e:.6f}"
    )

    # --- 64-instance batched bin picking ------------------------------------
    voxel = 0.005
    ntgt, nsrc, B = 16384, 8192, 64
    _, tgt_np, _, _ = make_pair(ntgt, voxel=voxel)
    tgt, tf = fused_prepare_features(
        PointCloud.from_numpy(tgt_np, capacity=ntgt), jnp.float32(voxel * 5)
    )
    rng = np.random.default_rng(1)
    srcs, feats = [], []
    for _ in range(B):
        aa = rng.normal(size=3) * 0.15
        th = np.linalg.norm(aa)
        k = aa / th
        K = np.array([[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]])
        Rb = (np.eye(3) + np.sin(th) * K + (1 - np.cos(th)) * K @ K).astype(
            np.float32
        )
        tb = (rng.normal(size=3) * 0.03).astype(np.float32)
        sel = rng.choice(ntgt, nsrc, replace=False)
        c, fe = fused_prepare_features(
            PointCloud.from_numpy(((tgt_np[sel] - tb) @ Rb), capacity=nsrc),
            jnp.float32(voxel * 5),
        )
        srcs.append(c)
        feats.append(fe)
    batch = stack_clouds(srcs)
    fb = FPFHFeatures(
        jnp.stack([x.descriptors for x in feats]),
        jnp.stack([x.mask for x in feats]),
    )
    g = jax.jit(
        lambda: jnp.sum(
            register_batch(
                batch, tgt, fb, tf, voxel,
                ransac_max_iterations=4096, icp_max_iterations=30,
            )[0].fitness
        )
    )
    float(g())
    t0 = time.time()
    fitsum = float(g())
    dt = time.time() - t0
    log(
        f"extra: 64-instance batch: {dt*1000:.0f} ms"
        f" ({B/dt:.0f} instances/s), mean fitness {fitsum/B:.3f}"
    )


if __name__ == "__main__":
    main()
