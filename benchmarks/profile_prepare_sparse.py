"""Sweep-level chip profile of the SPARSE prepare path at 100k points.

The bench headline runs fused_prepare_sparse (descriptors only for the
8k-correspondence-subset blocks). This times its internals in isolation —
the aligned build, the window tables, the member-set dilation, and each
Pallas sweep with the SPARSE length tables it actually gets — so the next
optimization targets the real cost centers. Run on the TPU:
  python benchmarks/profile_prepare_sparse.py
"""

from __future__ import annotations

import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from bench import make_pair  # noqa: E402
from tpu3d.ops.fused_features import fused_prepare_sparse  # noqa: E402
from tpu3d.ops.slab2 import (  # noqa: E402
    aligned_block_windows,
    build_slab2_aligned,
)
from tpu3d.types import PointCloud  # noqa: E402
from tpu3d.utils.timing import device_timeit  # noqa: E402


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    n = int(os.environ.get("TPU3D_PROF_N", "100352"))
    voxel = 0.002
    src_np, _, _, _ = make_pair(n)
    r = jnp.float32(voxel * 5)
    r2 = r * r
    src = PointCloud.from_numpy(src_np, capacity=n)
    from bench import bench_caps

    block, sub = 128, 256
    corr_cap = bench_caps()[0]

    def t(name, fn, *args, **kw):
        res = device_timeit(fn, *args, iters=3, **kw)
        log(f"{name:46s} {res['best_net_ms']:8.2f} ms")
        return res["best_net_ms"]

    log(f"backend={jax.default_backend()} n={n}")

    max_buckets = 128 if n <= (1 << 18) else 512
    t("build_slab2_aligned",
      lambda p, m: build_slab2_aligned(p, m, r, block=block,
                                       max_buckets=max_buckets),
      src.points, src.mask)

    al = jax.jit(
        lambda p, m: build_slab2_aligned(p, m, r, block=block,
                                         max_buckets=max_buckets)
    )(src.points, src.mask)
    jax.block_until_ready(al.padded_points_t)

    t("aligned_block_windows",
      lambda a: aligned_block_windows(a, r, block), al)
    lo, length = jax.jit(
        lambda a: aligned_block_windows(a, r, block))(al)
    jax.block_until_ready(lo)

    # --- sparse member sets, replicated from _pallas_prepare ---------------
    mp = al.padded_points_t.shape[1]
    nbk = mp // block
    nq = max(1, corr_cap // block)
    nq = min(nq, nbk)
    q_run = min(8, nq)
    nruns = max(1, nq // q_run)
    run_stride = max(q_run, nbk // nruns)
    nq = nruns * q_run
    take_ids = (
        np.arange(nruns)[:, None] * run_stride + np.arange(q_run)[None]
    ).ravel()
    qmask_np = np.zeros((nbk,), bool)
    qmask_np[take_ids] = True
    qmask = jnp.asarray(qmask_np)

    def members(lo_, length_, qm):
        live = length_ > 0
        blk_lo = jnp.clip(lo_ // block, 0, nbk - 1)
        blk_hi = jnp.clip(
            (lo_ + jnp.maximum(length_, 1) - 1) // block, 0, nbk - 1)

        def dilate(member):
            sel = (live & member[:, None]).ravel()
            lo_f = jnp.where(sel, blk_lo.ravel(), nbk + 1)
            hi_f = jnp.where(sel, blk_hi.ravel(), -1)
            j = jnp.arange(nbk)
            cover = (lo_f[:, None] <= j[None, :]) & (
                j[None, :] <= hi_f[:, None])
            return jnp.any(cover, axis=0)

        member_b = dilate(qm) | qm
        member_a = dilate(member_b) | member_b
        return (jnp.where(member_a[:, None], length_, 0),
                jnp.where(member_b[:, None], length_, 0),
                jnp.where(qm[:, None], length_, 0))

    t("member-set dilation", members, lo, length, qmask)
    len_a, len_b, len_c = jax.jit(members)(lo, length, qmask)
    jax.block_until_ready(len_a)
    for nm, ln in (("A", len_a), ("B", len_b), ("C", len_c)):
        rows = float(jnp.sum(ln))
        blocks = int(jnp.sum(jnp.any(ln > 0, axis=1)))
        log(f"  sweep {nm}: {blocks}/{nbk} blocks live, "
            f"{rows:.0f} window rows")

    from tpu3d.ops.features_pallas import (
        fpfh_sweep_pallas,
        moments_sweep_pallas,
        spfh_sweep_pallas,
    )

    pts_t = al.padded_points_t
    mrow = al.valid_padded.astype(jnp.float32)[None]
    q8 = jnp.concatenate(
        [pts_t, mrow, jnp.zeros((4, mp), jnp.float32)], axis=0)

    t("sweep A sparse (moments)",
      lambda q, p: moments_sweep_pallas(q, p, lo, len_a, r2, block=block,
                                        sub=sub), q8, pts_t)
    packed_b = jnp.concatenate(
        [pts_t, pts_t, pts_t, pts_t[0:1]], axis=0)  # (10, Mp) shape proxy
    t("sweep B sparse (SPFH)",
      lambda q, p: spfh_sweep_pallas(q, p, lo, len_b, r2, block=block,
                                     sub=sub), q8, packed_b)
    packed_c = jnp.concatenate([pts_t] * 12, axis=0)  # (36, Mp) proxy
    t("sweep C sparse (FPFH)",
      lambda q, p: fpfh_sweep_pallas(q, p, lo, len_c, r2, block=block,
                                     sub=sub), q8, packed_c)

    t("fused_prepare_sparse TOTAL",
      lambda c: fused_prepare_sparse(c, r)[1].descriptors, src)

    log("done")


if __name__ == "__main__":
    main()
