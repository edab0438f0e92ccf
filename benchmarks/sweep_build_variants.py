"""A/B the aligned slab2 BUILD formulations (the largest single term of
the headline prepare stage: ~2.1 of 8.3 ms/pair at 100k rows).

The shipped build (ops/slab2.build_slab2_aligned) pays, at 100k rows:
  sort_key_val (~0.55 ms) + a 1-D dest scatter back to original order
  (~0.5 ms) + one (8, Mp) column scatter (~1 ms).
Both scatters exist to route the payload from ORIGINAL row order into the
padded layout without (n,3) gathers. Two candidate reformulations:

  B "via-sort": ride the payload planes through the sort network itself
    (multi-operand ``lax.sort`` with num_keys=1 — the same trick the keys
    already use), then ONE (8, Mp) scatter from SORTED order. Drops the
    1-D scatter; the sort carries 4 extra f32 operands.
  C "gather": same multi-operand sort, then build the padded layout with
    one (8, Mp) GATHER whose index map is closed-form from the per-bucket
    tables (padded row p pulls sorted row p − (offsets[b] − starts[b]));
    no scatter at all. Padding rows pull a sentinel row appended to the
    sorted planes, so validity/orig come out exactly like the shipped
    build's.

All three must produce BIT-IDENTICAL AlignedSlab2 contents — asserted
here on every run before timing (so this doubles as a hermetic equality
check on CPU). Timing uses the K-in-one-dispatch methodology
(BENCH_NOTES): K builds per dispatch, inputs value-jittered per
iteration.

Run:  python benchmarks/sweep_build_variants.py          (chip)
      JAX_PLATFORMS=cpu python benchmarks/sweep_build_variants.py --check
"""

from __future__ import annotations

import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

import numpy as np  # noqa: E402

if "--check" in sys.argv:
    import jax

    jax.config.update("jax_platforms", "cpu")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from bench import make_pair  # noqa: E402
from tpu3d.ops.slab2 import (  # noqa: E402
    _NB_MAX,
    _SENTINEL,
    _Y_BITS,
    _Y_MAX,
    _qy_of,
    AlignedSlab2,
    aligned_capacity,
    build_slab2_aligned,
    sorted_positions,
)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _keys_and_tables(pts, mask, bucket_width, block, max_buckets):
    """Shared prologue: composite keys + (skey-dependent) bucket tables."""
    x = jnp.where(mask, pts[:, 0], _SENTINEL)
    y = jnp.where(mask, pts[:, 1], _SENTINEL)
    x0 = jnp.min(x)
    y0 = jnp.min(y)
    xext = jnp.max(jnp.where(mask, pts[:, 0], -_SENTINEL)) - x0
    yext = jnp.max(jnp.where(mask, pts[:, 1], -_SENTINEL)) - y0
    w = jnp.maximum(
        jnp.asarray(bucket_width, jnp.float32), xext / (max_buckets - 1)
    )
    inv_w = 1.0 / jnp.maximum(w, 1e-12)
    y_scale = (_Y_MAX - 1) / jnp.maximum(yext, 1e-12)
    bucket = jnp.where(
        mask,
        jnp.clip(
            jnp.floor((pts[:, 0] - x0) * inv_w).astype(jnp.int32),
            0, max_buckets - 1,
        ),
        _NB_MAX,
    )
    qy = jnp.where(mask, _qy_of(pts[:, 1], y0, y_scale), _Y_MAX)
    key = (bucket << _Y_BITS) | qy
    return key, (x0, inv_w, y0, y_scale)


def build_via_sort(pts, mask, bucket_width, block=128, max_buckets=128):
    """Variant B: payload planes ride the sort; one (8, Mp) scatter."""
    pts = pts.astype(jnp.float32)
    n = pts.shape[0]
    mp = aligned_capacity(n, block, max_buckets)
    key, frame = _keys_and_tables(pts, mask, bucket_width, block, max_buckets)
    x0, inv_w, y0, y_scale = frame
    i_idx = jnp.arange(n, dtype=jnp.int32)
    skey, sx, sy, sz, sorig = jax.lax.sort(
        (
            key,
            jnp.where(mask, pts[:, 0], _SENTINEL),
            jnp.where(mask, pts[:, 1], _SENTINEL),
            jnp.where(mask, pts[:, 2], _SENTINEL),
            i_idx,
        ),
        num_keys=1,
    )
    bounds = jnp.arange(max_buckets + 1, dtype=jnp.int32) << _Y_BITS
    starts = sorted_positions(skey, bounds, side="left")
    counts = starts[1:] - starts[:-1]
    pcounts = -(-counts // block) * block
    offsets = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(pcounts).astype(jnp.int32)]
    )
    svalid = skey < (_NB_MAX << _Y_BITS)
    sb = skey >> _Y_BITS
    pad_of_bucket = (offsets[:-1] - starts[:-1]).astype(jnp.float32)
    onehot = (
        sb[:, None] == jnp.arange(max_buckets, dtype=jnp.int32)[None, :]
    ).astype(jnp.float32)
    padshift = (onehot @ pad_of_bucket).astype(jnp.int32)
    dest = jnp.where(svalid, i_idx + padshift, mp)

    assert n + mp < (1 << 24)
    zrow = jnp.zeros((1, n), jnp.float32)
    payload8 = jnp.concatenate(
        [
            sx[None], sy[None], sz[None],
            svalid.astype(jnp.float32)[None],
            sorig.astype(jnp.float32)[None],
            zrow, zrow, zrow,
        ],
        axis=0,
    )
    base8 = jnp.concatenate(
        [
            jnp.full((3, mp), _SENTINEL, jnp.float32),
            jnp.zeros((1, mp), jnp.float32),
            (jnp.arange(mp, dtype=jnp.float32) + n)[None],
            jnp.zeros((3, mp), jnp.float32),
        ],
        axis=0,
    )
    padded8 = base8.at[:, dest].set(payload8, mode="drop")
    return AlignedSlab2(
        padded_points_t=padded8[:3],
        padded_orig=padded8[4].astype(jnp.int32),
        valid_padded=padded8[3] > 0.5,
        sorted_key=skey,
        starts_real=starts,
        offsets=offsets,
        x0=x0, inv_w=inv_w, y0=y0, y_scale=y_scale,
    )


def build_via_gather(pts, mask, bucket_width, block=128, max_buckets=128):
    """Variant C: multi-operand sort + ONE (8, Mp+pad) gather, no scatter.

    Padded row p of block j (owning bucket b) pulls sorted row
    starts[b] + (p − offsets[b]) when that lies inside the bucket's real
    run, else the appended sentinel row n. The index map is built from the
    tiny (NB+1) tables broadcast per block — no per-row table gathers.
    """
    pts = pts.astype(jnp.float32)
    n = pts.shape[0]
    mp = aligned_capacity(n, block, max_buckets)
    key, frame = _keys_and_tables(pts, mask, bucket_width, block, max_buckets)
    x0, inv_w, y0, y_scale = frame
    i_idx = jnp.arange(n, dtype=jnp.int32)
    skey, sx, sy, sz, sorig = jax.lax.sort(
        (
            key,
            jnp.where(mask, pts[:, 0], _SENTINEL),
            jnp.where(mask, pts[:, 1], _SENTINEL),
            jnp.where(mask, pts[:, 2], _SENTINEL),
            i_idx,
        ),
        num_keys=1,
    )
    bounds = jnp.arange(max_buckets + 1, dtype=jnp.int32) << _Y_BITS
    starts = sorted_positions(skey, bounds, side="left")
    counts = starts[1:] - starts[:-1]
    pcounts = -(-counts // block) * block
    offsets = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(pcounts).astype(jnp.int32)]
    )

    nbk = mp // block
    blk_start = jnp.arange(nbk, dtype=jnp.int32) * block
    b_blk = (
        jnp.sum(offsets[None, :] <= blk_start[:, None], axis=1,
                dtype=jnp.int32)
        - 1
    )
    b_blk = jnp.clip(b_blk, 0, offsets.shape[0] - 2)
    # Per padded row: sorted source row or n (the sentinel row).
    p_idx = blk_start[:, None] + jnp.arange(block, dtype=jnp.int32)[None, :]
    src_row = starts[b_blk][:, None] + (p_idx - offsets[b_blk][:, None])
    in_run = src_row < (starts[b_blk] + counts[b_blk])[:, None]
    src_row = jnp.where(in_run, src_row, n).reshape(mp)
    # Sorted-row validity must ALSO gate (bucket runs can contain rows of
    # invalid keys only when every row is invalid; in_run already excludes
    # those because counts comes from valid-key bounds) — rows of real
    # buckets are valid by construction of the composite key.

    svalid = skey < (_NB_MAX << _Y_BITS)
    planes8 = jnp.concatenate(
        [
            sx[None], sy[None], sz[None],
            svalid.astype(jnp.float32)[None],
            sorig.astype(jnp.float32)[None],
            jnp.zeros((3, n), jnp.float32),
        ],
        axis=0,
    )
    sentinel_col = jnp.array(
        [[_SENTINEL], [_SENTINEL], [_SENTINEL], [0.0], [0.0],
         [0.0], [0.0], [0.0]],
        jnp.float32,
    )
    planes8 = jnp.concatenate([planes8, sentinel_col], axis=1)  # (8, n+1)
    padded8 = planes8[:, src_row]
    # Padding rows must carry UNIQUE out-of-bounds originals (n + position)
    # like the shipped build, so scatter-backs can drop them.
    pos = jnp.arange(mp, dtype=jnp.float32) + n
    padded_orig = jnp.where(
        padded8[3] > 0.5, padded8[4], pos
    ).astype(jnp.int32)
    return AlignedSlab2(
        padded_points_t=padded8[:3],
        padded_orig=padded_orig,
        valid_padded=padded8[3] > 0.5,
        sorted_key=skey,
        starts_real=starts,
        offsets=offsets,
        x0=x0, inv_w=inv_w, y0=y0, y_scale=y_scale,
    )


VARIANTS = {
    "A-shipped": lambda p, m, w: build_slab2_aligned(p, m, w),
    "B-via-sort": lambda p, m, w: build_via_sort(p, m, w),
    "C-gather": lambda p, m, w: build_via_gather(p, m, w),
}


def check_equal(n=20000, seed=0, holes=True):
    src_np, _, _, _ = make_pair(n, seed=seed)
    pts = jnp.asarray(src_np)
    mask = jnp.ones(n, bool)
    if holes:
        rng = np.random.default_rng(seed + 1)
        mask = jnp.asarray(rng.uniform(size=n) > 0.03)
    w = jnp.float32(2 * 0.01)
    ref = jax.jit(VARIANTS["A-shipped"])(pts, mask, w)
    for name in ("B-via-sort", "C-gather"):
        out = jax.jit(VARIANTS[name])(pts, mask, w)
        for field in AlignedSlab2._fields:
            a = np.asarray(getattr(ref, field))
            b = np.asarray(getattr(out, field))
            assert a.dtype == b.dtype, (name, field, a.dtype, b.dtype)
            assert np.array_equal(a, b), (
                name, field,
                np.argwhere(a != b)[:4] if a.shape == b.shape else a.shape,
            )
        log(f"equality: {name} == A-shipped (all fields bit-identical)")


def main():
    check_equal()
    check_equal(n=4096, seed=3)
    if "--check" in sys.argv:
        log("CPU equality check PASS")
        return

    from tpu3d.utils.timing import roundtrip_ms

    n = int(os.environ.get("TPU3D_BENCH_N", "100352"))
    K = int(os.environ.get("TPU3D_BENCH_K", "20"))
    src_np, _, _, _ = make_pair(n)
    pts = jnp.asarray(src_np)
    mask = jnp.ones(n, bool)
    w = jnp.float32(2 * 0.01)
    rt = roundtrip_ms() / 1000.0
    for name, fn in VARIANTS.items():
        def k_loop(p, jit_r, fn=fn):
            def body(i, acc):
                pi = p + (jnp.float32(1e-7) * (i + 1) + jit_r)
                al = fn(pi, mask, w)
                return (
                    acc
                    + jnp.sum(al.padded_points_t[0])
                    + jnp.sum(al.offsets.astype(jnp.float32))
                )

            return jax.lax.fori_loop(0, K, body, jnp.float32(0.0))

        f = jax.jit(k_loop)
        float(f(pts, jnp.float32(0.0)))
        ts = []
        for r in range(3):
            t0 = time.perf_counter()
            float(f(pts, jnp.float32(1e-7 * (r + 1) * K)))
            ts.append(time.perf_counter() - t0)
        ms = max((min(ts) - rt) / K, 0.0) * 1000.0
        log(f"{name:11s} {ms:6.3f} ms/build (K={K})")


if __name__ == "__main__":
    main()
