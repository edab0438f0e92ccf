"""Prefix-delta chip profile of the sparse-prepare GLUE.

STALE as of round 5 — do not trust its numbers. This harness replicates
the r3-era _pallas_prepare chain by hand; the shipping chain has since
moved (strata-centered 4-run subset, block=256 sparse default, build
rework), and the replica now measures a DIFFERENT program: r5 chip runs
show 110/650 ms sweep prefixes while the shipping
``fused_prepare_sparse`` measures 3.8 ms in-context in the same session
class. Use benchmarks/bench_stages.py (stage prefixes of the real
full_pair) and benchmarks/mfu.py for in-context decompositions; fix this
replica against ops/fused_features._pallas_prepare before reading it
again.

profile_prepare_sparse.py times the build/windows/sweeps in isolation and
their sum is ~2 ms short of the fused_prepare_sparse total — the missing
milliseconds are the inter-sweep glue (eigenvector planes, packed-operand
builds, histogram assembly, the (Mp, 33) transpose into sweep C, subset
extraction). This script times jitted PREFIXES of the exact chain from
ops/fused_features._pallas_prepare; adjacent deltas are the in-context
stage costs (fusion included), which isolated timings cannot see.

Run on the TPU: python benchmarks/profile_glue.py
"""

from __future__ import annotations

import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from bench import bench_caps, make_pair  # noqa: E402
from tpu3d.ops import fused_features as ff  # noqa: E402
from tpu3d.ops.features_pallas import (  # noqa: E402
    fpfh_sweep_pallas,
    moments_sweep_pallas,
    spfh_sweep_pallas,
)
from tpu3d.ops.slab2 import (  # noqa: E402
    aligned_block_windows,
    build_slab2_aligned,
)
from tpu3d.types import PointCloud  # noqa: E402


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def make_prefix(stop: str, r, block, sub, nq, max_buckets):
    """The _pallas_prepare chain, truncated after stage ``stop``."""
    r2 = r * r

    def fn(points, mask):
        al = build_slab2_aligned(
            points, mask, r, block=block, max_buckets=max_buckets
        )
        if stop == "build":
            return al.padded_points_t, al.valid_padded
        pts_t = al.padded_points_t
        mp = pts_t.shape[1]
        nbk = mp // block
        lo, length = aligned_block_windows(al, r, block)
        if stop == "windows":
            return lo, length

        # sparse member sets (same construction as _pallas_prepare)
        nq_ = min(nq, nbk)
        q_run = min(8, nq_)
        nruns = max(1, nq_ // q_run)
        run_stride = max(q_run, nbk // nruns)
        nq_ = nruns * q_run
        take_ids = (
            np.arange(nruns)[:, None] * run_stride + np.arange(q_run)[None]
        ).ravel()
        qmask_np = np.zeros((nbk,), bool)
        qmask_np[take_ids] = True
        qmask = jnp.asarray(qmask_np)
        live = length > 0
        blk_lo = jnp.clip(lo // block, 0, nbk - 1)
        blk_hi = jnp.clip(
            (lo + jnp.maximum(length, 1) - 1) // block, 0, nbk - 1
        )

        def dilate(member):
            sel = (live & member[:, None]).ravel()
            lo_f = jnp.where(sel, blk_lo.ravel(), nbk + 1)
            hi_f = jnp.where(sel, blk_hi.ravel(), -1)
            j = jnp.arange(nbk)
            cover = (lo_f[:, None] <= j[None, :]) & (
                j[None, :] <= hi_f[:, None]
            )
            return jnp.any(cover, axis=0)

        member_b = dilate(qmask) | qmask
        member_a = dilate(member_b) | member_b
        len_a = jnp.where(member_a[:, None], length, 0)
        len_b = jnp.where(member_b[:, None], length, 0)
        len_c = jnp.where(qmask[:, None], length, 0)
        if stop == "members":
            return len_a, len_b, len_c

        mrow = al.valid_padded.astype(jnp.float32)[None]
        q8 = jnp.concatenate(
            [pts_t, mrow, jnp.zeros((4, mp), jnp.float32)], axis=0
        )
        nrm8 = moments_sweep_pallas(
            q8, pts_t, lo, len_a, r2, block=block, sub=sub
        )  # (8, Mp) — normals computed in-kernel now
        nx, ny, nz = nrm8[0], nrm8[1], nrm8[2]
        if stop in ("sweepA", "eigvec"):
            return nx, ny, nz

        nrm_t = jnp.stack([nx, ny, nz])
        wv = al.valid_padded.astype(jnp.float32)
        cnt_v = jnp.maximum(jnp.sum(wv), 1.0)
        ctr = jnp.stack(
            [jnp.sum(jnp.where(al.valid_padded, pts_t[i], 0.0)) / cnt_v
             for i in range(3)]
        )
        cpts_t = pts_t - ctr[:, None]
        b3 = jnp.stack(
            [
                cpts_t[1] * nrm_t[2] - cpts_t[2] * nrm_t[1],
                cpts_t[2] * nrm_t[0] - cpts_t[0] * nrm_t[2],
                cpts_t[0] * nrm_t[1] - cpts_t[1] * nrm_t[0],
            ]
        )
        arow = (
            cpts_t[0] * nrm_t[0] + cpts_t[1] * nrm_t[1]
            + cpts_t[2] * nrm_t[2]
        )
        packed_b = jnp.concatenate(
            [cpts_t, b3, nrm_t, arow[None]], axis=0
        )
        q8n = jnp.concatenate(
            [cpts_t, mrow, nrm_t, jnp.zeros((1, mp), jnp.float32)], axis=0
        )
        if stop == "packb":
            return packed_b, q8n
        spfh40 = spfh_sweep_pallas(
            q8n, packed_b, lo, len_b, r2, block=block, sub=sub
        )  # (40, Mp) — hist assembly + normalize + transpose in-kernel
        spfh_planes = spfh40[:33]
        if stop in ("sweepB", "hist"):
            return spfh_planes
        packed_c = jnp.concatenate([pts_t, spfh_planes], axis=0)
        if stop == "packc":
            return packed_c
        wsum = fpfh_sweep_pallas(
            q8, packed_c, lo, len_c, r2, block=block, sub=sub
        )[:, :33]
        if stop == "sweepC":
            return wsum

        take = nruns * run_stride

        def pick_rows(x2d):
            w = x2d.shape[1]
            return (
                x2d.reshape(nbk, block, w)[:take]
                .reshape(nruns, run_stride, block, w)[:, :q_run]
                .reshape(nq_ * block, w)
            )

        def pick_rows_1d(x1d):
            return (
                x1d.reshape(nbk, block)[:take]
                .reshape(nruns, run_stride, block)[:, :q_run]
                .reshape(nq_ * block)
            )

        sub_pts = (
            pts_t.reshape(3, nbk, block)[:, :take]
            .reshape(3, nruns, run_stride, block)[:, :, :q_run]
            .reshape(3, nq_ * block).T
        )
        sub_mask = pick_rows_1d(al.valid_padded)
        sub_spfh = (
            spfh_planes.reshape(33, nbk, block)[:, :take]
            .reshape(33, nruns, run_stride, block)[:, :, :q_run]
            .reshape(33, nq_ * block).T
        )
        f = sub_spfh + pick_rows(wsum)
        sf = jnp.sum(f, axis=1, keepdims=True)
        sub_desc = jnp.where(sf > 0, f / jnp.maximum(sf, 1e-30), f)
        sub_orig = pick_rows_1d(al.padded_orig)
        sub_pts = jnp.where(sub_mask[:, None], sub_pts, 0.0)
        sub_desc = jnp.where(sub_mask[:, None], sub_desc, 0.0)
        return sub_pts, sub_mask, sub_desc, sub_orig

    return fn


STAGES = [
    "build", "windows", "members", "sweepA", "packb",
    "sweepB", "packc", "sweepC", "all",
]


def main():
    import time

    from tpu3d.utils.timing import roundtrip_ms

    n = int(os.environ.get("TPU3D_PROF_N", "100352"))
    K = int(os.environ.get("TPU3D_BENCH_K", "10"))
    voxel = 0.002
    src_np, _, _, _ = make_pair(n)
    src = PointCloud.from_numpy(src_np, capacity=n)
    r = jnp.float32(voxel * 5)
    block, sub = 128, 256
    corr_cap = bench_caps()[0]
    nq = max(1, corr_cap // block)
    max_buckets = 128 if n <= (1 << 18) else 512

    log(f"backend={jax.default_backend()} n={n} corr_cap={corr_cap} K={K}")
    rt = roundtrip_ms() / 1000.0
    prev = 0.0
    for stop in STAGES:
        fn = make_prefix(stop, r, block, sub, nq, max_buckets)

        # HEADLINE methodology: K invocations inside one fori_loop with
        # per-iteration input perturbation (bench.py k_pairs) — isolated
        # per-dispatch timings disagree with the in-context costs.
        def k_loop(p, m, rep_jitter, fn=fn):
            def body(i, acc):
                pi = p + (jnp.float32(1e-7) * (i + 1) + rep_jitter)
                out = fn(pi, m)
                s = jnp.float32(0.0)
                for leaf in jax.tree.leaves(out):
                    s = s + jnp.sum(leaf).astype(jnp.float32)
                return acc + s

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
        log(f"prefix thru {stop:8s} {ms:8.2f} ms   (delta {ms - prev:+6.2f})")
        prev = ms


if __name__ == "__main__":
    main()
