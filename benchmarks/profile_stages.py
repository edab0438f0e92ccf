"""Stage-level chip profile of the 100k benchmark pair.

Times each stage of the registration stack in isolation (scalar-readback
sync, net of tunnel roundtrip) so optimization work targets the real cost
centers. Run on the TPU:  python benchmarks/profile_stages.py
Env: TPU3D_PROF_N (default 100352), TPU3D_PROF_SWEEPS=1 to sweep
fused-prepare block/sub parameters.
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
from tpu3d.ops.fused_features import fused_prepare_features  # noqa: E402
from tpu3d.ops.icp import icp_refine  # noqa: E402
from tpu3d.ops.ransac import (  # noqa: E402
    feature_correspondences,
    ransac_registration,
)
from tpu3d.ops.slab import build_slab, slab_top1  # noqa: E402
from tpu3d.types import PointCloud  # noqa: E402
from tpu3d.utils.timing import device_timeit  # noqa: E402


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    n = int(os.environ.get("TPU3D_PROF_N", "100352"))
    voxel = 0.002
    src_np, tgt_np, R_true, t_true = make_pair(n)
    radius = jnp.float32(voxel * 5)
    src = PointCloud.from_numpy(src_np, capacity=n)
    tgt = PointCloud.from_numpy(tgt_np, capacity=n)

    def t(name, fn, *args, **kw):
        r = device_timeit(fn, *args, iters=3, **kw)
        log(f"{name:42s} {r['best_net_ms']:8.1f} ms")
        return r["best_net_ms"]

    log(f"backend={jax.default_backend()} n={n}")

    t("build_slab", lambda p, m: build_slab(p, m), src.points, src.mask)

    total_prep = t(
        "fused_prepare (block=256, sub=512)",
        lambda c: fused_prepare_features(c, radius),
        src,
    )

    if os.environ.get("TPU3D_PROF_SWEEPS") == "1":
        for block, sub in [(256, 1024), (512, 512), (512, 1024), (128, 512),
                           (256, 2048), (1024, 1024)]:
            t(
                f"fused_prepare (block={block}, sub={sub})",
                lambda c, b=block, s=sub: fused_prepare_features(
                    c, radius, block=b, sub=s
                ),
                src,
            )

    tgt_p, tgt_f = fused_prepare_features(tgt, radius)
    src_p, src_f = fused_prepare_features(src, radius)
    jax.block_until_ready(tgt_f.descriptors)

    t(
        "feature NN (33-D argmin)",
        lambda a, b: feature_correspondences(a, b),
        src_f,
        tgt_f,
    )

    t(
        "RANSAC 100k hyp (incl. feature NN)",
        lambda s, tg, sf, tf: ransac_registration(
            s, tg, sf, tf, voxel, max_iterations=100000
        ).transformation,
        src_p, tgt_p, src_f, tgt_f,
    )

    coarse = ransac_registration(
        src_p, tgt_p, src_f, tgt_f, voxel, max_iterations=100000
    )
    jax.block_until_ready(coarse.transformation)

    t(
        "ICP (<=200 it, from coarse)",
        lambda s, tg, T: icp_refine(
            s, tg, T, voxel * 0.4, max_iterations=200, point_to_plane=True
        ).transformation,
        src_p, tgt_p, coarse.transformation,
    )
    t(
        "ICP 10 fixed iters",
        lambda s, tg, T: icp_refine(
            s, tg, T, voxel * 0.4, max_iterations=10, point_to_plane=True
        ).transformation,
        src_p, tgt_p, jnp.eye(4),
    )

    slab = build_slab(tgt_p.points, tgt_p.mask)
    t(
        "slab_top1 (ICP inner, cap 4096)",
        lambda s, q: slab_top1(s, q, voxel * 0.4, slice_cap=4096),
        slab, src_p.points,
    )

    # --- sparse-prepare configuration (the bench headline path) -------------
    from tpu3d.ops.fused_features import fused_prepare_sparse

    t(
        "fused_prepare_sparse (corr_cap 8192)",
        lambda c: fused_prepare_sparse(c, radius)[1].descriptors,
        src,
    )
    sub_c, sub_f, _ = fused_prepare_sparse(src, radius)
    jax.block_until_ready(sub_f.descriptors)
    t(
        "feature NN (8k subset x 100k)",
        lambda a, b: feature_correspondences(a, b),
        sub_f, tgt_f,
    )
    t(
        "RANSAC 100k hyp from subset (incl. NN)",
        lambda s, tg, sf, tf: ransac_registration(
            s, tg, sf, tf, voxel, max_iterations=100000, corr_mode="exact"
        ).transformation,
        sub_c, tgt_p, sub_f, tgt_f,
    )
    t(
        "ICP raw source (<=200 it, from coarse)",
        lambda s, tg, T: icp_refine(
            s, tg, T, voxel * 0.4, max_iterations=200, point_to_plane=True
        ).transformation,
        src, tgt_p, coarse.transformation,
    )

    log("done")


if __name__ == "__main__":
    main()
