"""Isolated chip timings of the sparse-prepare glue candidates.

The prefix-delta approach (profile_glue.py) is confounded by per-prefix
XLA DCE/fusion differences and tunnel jitter; this times each suspected
glue stage alone on realistic operands. Run on the TPU:
  python benchmarks/profile_glue2.py
"""

from __future__ import annotations

import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from tpu3d.ops import fused_features as ff  # noqa: E402
from tpu3d.ops.normals import smallest_eigvec_3x3_planes  # noqa: E402
from tpu3d.ops.slab2 import sorted_positions  # noqa: E402
from tpu3d.utils.timing import device_timeit  # noqa: E402


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    mp = 116736  # padded rows at 100352 with 128 buckets x block 128
    rng = np.random.default_rng(0)

    def t(name, fn, *args, iters=5):
        res = device_timeit(fn, *args, iters=iters)
        log(f"{name:52s} {res['best_net_ms']:8.2f} ms")
        return res["best_net_ms"]

    log(f"backend={jax.default_backend()} mp={mp}")

    # 1. eigvec planes from moments
    momout = jnp.asarray(rng.normal(size=(mp, 10)).astype(np.float32)) ** 2

    def eig_stage(mo):
        cnt = jnp.maximum(mo[:, 9], 1.0)
        mx, my, mz = (mo[:, k] / cnt for k in (0, 1, 2))
        c00 = mo[:, 3] / cnt - mx * mx
        c11 = mo[:, 4] / cnt - my * my
        c22 = mo[:, 5] / cnt - mz * mz
        c01 = mo[:, 6] / cnt - mx * my
        c02 = mo[:, 7] / cnt - mx * mz
        c12 = mo[:, 8] / cnt - my * mz
        return smallest_eigvec_3x3_planes(c00, c01, c02, c11, c12, c22)

    t("eigvec planes (Mp rows, from (Mp,10) moments)", eig_stage, momout)

    # 2. histogram assembly from cumulative counts (+ the sweep-C transpose)
    spfhout = jnp.asarray(
        np.sort(rng.uniform(1, 100, size=(mp, 31)).astype(np.float32))[
            :, ::-1
        ].copy()
    )

    def hist_stage(so):
        return ff._hist_from_cums(so[:, :30], so[:, 30])

    def hist_t_stage(so):
        return ff._hist_from_cums(so[:, :30], so[:, 30]).T

    t("_hist_from_cums (Mp, 30) -> (Mp, 33)", hist_stage, spfhout)
    t("_hist_from_cums + .T -> (33, Mp)", hist_t_stage, spfhout)

    # 3. packed_b build (elementwise planes)
    pts_t = jnp.asarray(rng.normal(size=(3, mp)).astype(np.float32))
    nrm_t = jnp.asarray(rng.normal(size=(3, mp)).astype(np.float32))
    valid = jnp.asarray(rng.uniform(size=(mp,)) < 0.9)

    def packb_stage(p, nr, v):
        wv = v.astype(jnp.float32)
        cnt_v = jnp.maximum(jnp.sum(wv), 1.0)
        ctr = jnp.stack(
            [jnp.sum(jnp.where(v, p[i], 0.0)) / cnt_v for i in range(3)]
        )
        cp = p - ctr[:, None]
        b3 = jnp.stack(
            [
                cp[1] * nr[2] - cp[2] * nr[1],
                cp[2] * nr[0] - cp[0] * nr[2],
                cp[0] * nr[1] - cp[1] * nr[0],
            ]
        )
        arow = cp[0] * nr[0] + cp[1] * nr[1] + cp[2] * nr[2]
        return jnp.concatenate([cp, b3, nr, arow[None]], axis=0)

    t("packed_b build (3,Mp) planes -> (10,Mp)", packb_stage, pts_t, nrm_t,
      valid)

    # 4. final FPFH normalize (Mp, 33)
    f33 = jnp.abs(jnp.asarray(rng.normal(size=(mp, 33)).astype(np.float32)))

    def norm_stage(f):
        sf = jnp.sum(f, axis=1, keepdims=True)
        return jnp.where(sf > 0, f / jnp.maximum(sf, 1e-30), f)

    t("FPFH normalize (Mp, 33)", norm_stage, f33)

    # 5. sorted_positions at the window-table shape
    skey = jnp.asarray(
        np.sort(rng.integers(0, 1 << 30, size=(100352,)).astype(np.int32))
    )
    keys = jnp.asarray(
        rng.integers(0, 1 << 30, size=(912, 3)).astype(np.int32)
    )
    t("sorted_positions 912x3 over 100k (one call)",
      lambda s, k: sorted_positions(s, k), skey, keys)
    t("sorted_positions 2x (lo+hi, separate calls)",
      lambda s, k: (sorted_positions(s, k, side="left"),
                    sorted_positions(s, k, side="right")), skey, keys)
    keys2 = jnp.concatenate([keys, keys + 7], axis=0)
    t("sorted_positions one fused 1824x3 call",
      lambda s, k: sorted_positions(s, k), skey, keys2)
    t("sorted_positions L=512",
      lambda s, k: sorted_positions(s, k, L=512), skey, keys2)
    t("sorted_positions L=1024",
      lambda s, k: sorted_positions(s, k, L=1024), skey, keys2)

    # 6. scatter-back of the aligned build (8, Mp) column scatter
    dest = jnp.asarray(
        rng.permutation(mp)[:100352].astype(np.int32)
    )
    payload8 = jnp.asarray(rng.normal(size=(8, 100352)).astype(np.float32))
    base8 = jnp.zeros((8, mp), jnp.float32)

    def scat_stage(b, d, p):
        return b.at[:, d].set(p, mode="drop")

    t("(8, Mp) column scatter (aligned build payload)", scat_stage, base8,
      dest, payload8)

    # 7. 100k i32 argsort (the aligned build's one sort)
    key_arr = jnp.asarray(rng.integers(0, 1 << 30, 100352).astype(np.int32))
    t("argsort 100k i32", lambda k: jnp.argsort(k), key_arr)


if __name__ == "__main__":
    main()
