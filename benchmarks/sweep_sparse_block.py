"""K-loop sweep of fused_prepare_sparse (block, sub) at the bench shape.

The in-context prefix profile (profile_glue.py) shows sweeps A/B are
per-WINDOW fixed-cost bound in the sparse regime (every window is one
sub-tile; ~2.5-6 µs each). Window count = 3 x live blocks, so a larger
query block may now win even though (128, 256) was optimal in the dense
compute-bound regime (BENCH_NOTES). Run on the TPU:
  python benchmarks/sweep_sparse_block.py
"""

from __future__ import annotations

import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from bench import bench_caps, make_pair  # noqa: E402
from tpu3d.ops.fused_features import fused_prepare_sparse  # noqa: E402
from tpu3d.types import PointCloud  # noqa: E402
from tpu3d.utils.timing import roundtrip_ms  # noqa: E402


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    n = int(os.environ.get("TPU3D_PROF_N", "100352"))
    K = int(os.environ.get("TPU3D_BENCH_K", "10"))
    voxel = 0.002
    src_np, _, _, _ = make_pair(n)
    src = PointCloud.from_numpy(src_np, capacity=n)
    corr_cap = bench_caps()[0]
    rt = roundtrip_ms() / 1000.0
    log(f"backend={jax.default_backend()} n={n} corr_cap={corr_cap} K={K}")

    for block, sub in ((128, 256), (256, 256), (256, 512), (512, 512)):
        def k_loop(p, m, rep_jitter, block=block, sub=sub):
            def body(i, acc):
                pi = p + (jnp.float32(1e-7) * (i + 1) + rep_jitter)
                c, f, _ = fused_prepare_sparse(
                    PointCloud(points=pi, mask=m),
                    jnp.float32(voxel * 5), corr_cap=corr_cap,
                    block=block, sub=sub,
                )
                return acc + jnp.sum(f.descriptors) + jnp.sum(c.points)

            return jax.lax.fori_loop(0, K, body, jnp.float32(0.0))

        try:
            jf = jax.jit(k_loop)
            float(jf(src.points, src.mask, jnp.float32(0.0)))
            ts = []
            for r in range(3):
                # vary args per rep — the tunnel caches identical
                # program+args executions (BENCH_NOTES)
                t0 = time.perf_counter()
                float(jf(src.points, src.mask,
                         jnp.float32(1e-7 * (r + 1) * K)))
                ts.append(time.perf_counter() - t0)
            ms = max((min(ts) - rt) / K, 0.0) * 1000.0
            log(f"block={block:4d} sub={sub:4d}  {ms:7.2f} ms/pair-prepare")
        except Exception as e:  # noqa: BLE001
            log(f"block={block:4d} sub={sub:4d}  FAIL "
                f"{type(e).__name__}: {str(e)[:140]}")


if __name__ == "__main__":
    main()
