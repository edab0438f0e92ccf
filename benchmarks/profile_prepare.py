"""Sub-stage chip profile of the fused prepare path at 100k points.

Times build_slab2 (the argsort), block_windows (searchsorted windows),
each of the three Pallas sweeps, and the scatter-back in isolation so the
<10 ms push targets the real cost centers. Run on the TPU:
  python benchmarks/profile_prepare.py
"""

from __future__ import annotations

import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from bench import make_pair  # noqa: E402
from tpu3d.ops.fused_features import fused_prepare_features  # noqa: E402
from tpu3d.ops.slab2 import block_windows, build_slab2  # noqa: E402
from tpu3d.types import PointCloud  # noqa: E402
from tpu3d.utils.timing import device_timeit  # noqa: E402


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    n = int(os.environ.get("TPU3D_PROF_N", "100352"))
    voxel = 0.002
    src_np, _, _, _ = make_pair(n)
    radius = jnp.float32(voxel * 5)
    src = PointCloud.from_numpy(src_np, capacity=n)

    def t(name, fn, *args, **kw):
        r = device_timeit(fn, *args, iters=3, **kw)
        log(f"{name:46s} {r['best_net_ms']:8.2f} ms")
        return r["best_net_ms"]

    log(f"backend={jax.default_backend()} n={n}")

    block, sub, k_windows = 128, 256, 10
    r = radius

    t("argsort 100k i32 keys", lambda p: jnp.argsort(
        (p[:, 0] * 1e4).astype(jnp.int32)), src.points)
    t("build_slab2 (keys+argsort+gather)",
      lambda p, m: build_slab2(p, m, r), src.points, src.mask)

    slab = jax.jit(lambda p, m: build_slab2(p, m, r))(src.points, src.mask)
    jax.block_until_ready(slab.sorted_points)

    pad = (-n) % block
    coords = jnp.pad(slab.sorted_points_t, ((0, 0), (0, pad)),
                     constant_values=2.9e4)
    mb = jnp.pad(slab.valid_sorted, (0, pad)).reshape(-1, block)

    t("block_windows (searchsorted)",
      lambda c0, c1, m: block_windows(
          slab, (c0.reshape(-1, block), c1.reshape(-1, block)), m, r,
          k_max=k_windows),
      coords[0], coords[1], mb)

    lo, length = jax.jit(
        lambda c0, c1, m: block_windows(
            slab, (c0.reshape(-1, block), c1.reshape(-1, block)), m, r,
            k_max=k_windows)
    )(coords[0], coords[1], mb)
    jax.block_until_ready(lo)
    occ = float(jnp.sum(length)) / (lo.shape[0])
    tiles = float(jnp.sum(
        jnp.where(length > 0,
                  (lo % sub + length + sub - 1) // sub, 0)))
    log(f"  windows: nb={lo.shape[0]} mean occupancy/block={occ:.0f} "
        f"rows; total sub-tiles={tiles:.0f} "
        f"(tile area / true area = "
        f"{tiles * sub / max(float(jnp.sum(length)), 1):.2f}x)")

    from tpu3d.ops.features_pallas import (
        fpfh_sweep_pallas,
        moments_sweep_pallas,
        spfh_sweep_pallas,
    )

    npad_total = n + pad
    mrow = mb.reshape(1, -1).astype(jnp.float32)
    q8 = jnp.concatenate(
        [coords, mrow, jnp.zeros((4, npad_total), jnp.float32)], axis=0)
    pts_t = slab.sorted_points_t
    r2 = r * r

    t("sweep A (moments)",
      lambda q, p: moments_sweep_pallas(q, p, lo, length, r2, block=block,
                                        sub=sub),
      q8, pts_t)

    packed_b = jnp.concatenate(
        [pts_t, pts_t, pts_t, pts_t[0:1]], axis=0)  # (10, M) shape proxy
    q8n = q8
    t("sweep B (SPFH histograms)",
      lambda q, p: spfh_sweep_pallas(q, p, lo, length, r2, block=block,
                                     sub=sub),
      q8n, packed_b)

    packed_c = jnp.concatenate(
        [pts_t] * 12, axis=0)  # (36, M) shape proxy
    t("sweep C (FPFH weighted sum)",
      lambda q, p: fpfh_sweep_pallas(q, p, lo, length, r2, block=block,
                                     sub=sub),
      q8, packed_c)

    t("scatter_back (2x permutation scatter)",
      lambda a, o: (jnp.zeros_like(a).at[o].set(a, unique_indices=True),),
      jnp.zeros((n, 36), jnp.float32), slab.sorted_orig)

    t("fused_prepare_features TOTAL",
      lambda c: fused_prepare_features(c, radius), src)

    log("done")


if __name__ == "__main__":
    main()
