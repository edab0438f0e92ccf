"""Exactness tests for the two-level slab index (ops/slab2.py).

The contract: every valid target within ``radius`` of a valid query must
lie inside one of the query block's candidate windows, for ANY input
distribution (window coverage is what makes the fused sweeps radius-exact;
the d² gate downstream discards superset extras)."""

import jax.numpy as jnp
import numpy as np
import pytest

from tpu3d.ops.slab2 import block_windows, build_slab2, query_keys


def _coverage_check(pts, mask, radius, block=64, k_max=4):
    n = pts.shape[0]
    index = build_slab2(jnp.asarray(pts), jnp.asarray(mask), 2.0 * radius)
    # Self-join: queries are the sorted cloud itself (the prepare layout).
    sorted_pts = np.asarray(index.sorted_points)
    sorted_valid = np.asarray(index.valid_sorted)
    pad = (-n) % block
    qb = jnp.asarray(
        np.pad(sorted_pts, ((0, pad), (0, 0)), constant_values=2.9e4)
    ).reshape(-1, block, 3)
    mb = jnp.asarray(np.pad(sorted_valid, (0, pad))).reshape(-1, block)
    lo, ln = block_windows(index, qb, mb, radius, k_max=k_max)
    lo, ln = np.asarray(lo), np.asarray(ln)

    orig = np.asarray(index.sorted_orig)
    valid_idx = np.where(mask)[0]
    vpts = pts[valid_idx]
    # Map original row -> sorted row.
    inv = np.empty(n, np.int64)
    inv[orig] = np.arange(n)

    for srow in range(n):
        if not sorted_valid[srow]:
            continue
        b = srow // block
        q = sorted_pts[srow]
        d2 = np.sum((vpts - q) ** 2, axis=1)
        near = valid_idx[d2 <= radius * radius]
        rows = inv[near]
        covered = np.zeros(len(rows), bool)
        for k in range(lo.shape[1]):
            covered |= (rows >= lo[b, k]) & (rows < lo[b, k] + ln[b, k])
        assert covered.all(), (
            f"query sorted-row {srow}: {np.sum(~covered)} neighbors outside "
            f"windows {list(zip(lo[b], ln[b]))}"
        )


@pytest.mark.parametrize("seed", [0, 1])
def test_window_coverage_random(seed):
    rng = np.random.default_rng(seed)
    pts = rng.uniform(-1, 1, (700, 3)).astype(np.float32)
    mask = rng.uniform(size=700) > 0.1
    _coverage_check(pts, mask, radius=0.25)


def test_window_coverage_degenerate_x():
    """All x equal → one bucket; windows must trim by y and stay exact."""
    rng = np.random.default_rng(2)
    pts = rng.uniform(-1, 1, (500, 3)).astype(np.float32)
    pts[:, 0] = 0.37
    _coverage_check(pts, np.ones(500, bool), radius=0.2)


def test_window_coverage_degenerate_xy():
    """All x AND y equal → full-scan fallback, still exact."""
    rng = np.random.default_rng(3)
    pts = rng.uniform(-1, 1, (300, 3)).astype(np.float32)
    pts[:, 0] = -0.1
    pts[:, 1] = 0.9
    _coverage_check(pts, np.ones(300, bool), radius=0.15)


def test_window_coverage_tiny_k():
    """k_max=2 (every bucket beyond the first merges into the overflow
    window) must still cover everything."""
    rng = np.random.default_rng(4)
    pts = rng.uniform(-1, 1, (400, 3)).astype(np.float32)
    _coverage_check(pts, np.ones(400, bool), radius=0.3, k_max=2)


def test_windows_disjoint():
    """Per-block windows never overlap (sweep sums must not double count)."""
    rng = np.random.default_rng(5)
    pts = rng.uniform(-1, 1, (600, 3)).astype(np.float32)
    mask = np.ones(600, bool)
    index = build_slab2(jnp.asarray(pts), jnp.asarray(mask), 0.12)
    block = 64
    pad = (-600) % block
    qb = jnp.asarray(
        np.pad(np.asarray(index.sorted_points), ((0, pad), (0, 0)))
    ).reshape(-1, block, 3)
    mb = jnp.asarray(
        np.pad(np.asarray(index.valid_sorted), (0, pad))
    ).reshape(-1, block)
    lo, ln = block_windows(index, qb, mb, 0.06, k_max=5)
    lo, ln = np.asarray(lo), np.asarray(ln)
    for b in range(lo.shape[0]):
        ivals = [
            (lo[b, k], lo[b, k] + ln[b, k])
            for k in range(lo.shape[1])
            if ln[b, k] > 0
        ]
        ivals.sort()
        for (a0, a1), (b0, b1) in zip(ivals, ivals[1:]):
            assert a1 <= b0, f"block {b}: overlapping windows {ivals}"


def test_query_keys_align_with_index():
    """query_keys on the index's own points reproduces the sorted keys."""
    rng = np.random.default_rng(6)
    pts = rng.uniform(-1, 1, (256, 3)).astype(np.float32)
    mask = rng.uniform(size=256) > 0.2
    index = build_slab2(jnp.asarray(pts), jnp.asarray(mask), 0.1)
    keys = np.asarray(query_keys(index, jnp.asarray(pts), jnp.asarray(mask)))
    orig = np.asarray(index.sorted_orig)
    assert (keys[orig] == np.asarray(index.sorted_key)).all()


def test_sorted_positions_matches_searchsorted():
    """The two-level compare formulation is bit-equal to jnp.searchsorted
    on both sides — including duplicate runs, queries below/above every
    key, unaligned lengths, and the i32-max sentinel keys that real
    invalid rows carry (_NB_MAX<<20 | _Y_MAX == int32 max)."""
    from tpu3d.ops.slab2 import sorted_positions

    rng = np.random.default_rng(11)
    imax = np.iinfo(np.int32).max
    for n in (1, 7, 128, 999, 4096):
        vals = np.sort(
            rng.integers(0, 1 << 24, size=n).astype(np.int32)
        )
        # duplicate runs + sentinel tail like a real key array
        vals[n // 3: n // 2] = vals[n // 3] if n >= 6 else vals[0]
        if n >= 8:
            vals[-3:] = imax
        sk = jnp.asarray(np.sort(vals))
        queries = np.concatenate(
            [
                rng.integers(0, 1 << 24, size=37).astype(np.int32),
                vals[rng.integers(0, n, size=23)],  # exact hits
                np.asarray([0, 1, imax, imax - 1], np.int32),
            ]
        )
        kq = jnp.asarray(queries)
        for side in ("left", "right"):
            want = jnp.searchsorted(sk, kq, side=side)
            got = sorted_positions(sk, kq, side=side)
            np.testing.assert_array_equal(
                np.asarray(got), np.asarray(want), err_msg=f"n={n} {side}"
            )
        # 2-D query shape passes through
        got2 = sorted_positions(sk, kq.reshape(-1, 4), side="left")
        want2 = jnp.searchsorted(sk, kq, side="left").reshape(-1, 4)
        np.testing.assert_array_equal(np.asarray(got2), np.asarray(want2))


def test_sorted_positions_float_keys():
    """Float keys (slab.py x-windows): bit-equal to jnp.searchsorted
    including the 3e4 invalid-row sentinels and duplicate runs."""
    from tpu3d.ops.slab2 import sorted_positions

    rng = np.random.default_rng(5)
    for n in (3, 200, 4097):
        x = np.sort(rng.normal(size=n).astype(np.float32))
        if n >= 10:
            x[-4:] = np.float32(3e4)  # invalid-row sentinels
            x[n // 4: n // 3] = x[n // 4]  # duplicate run
        sx = jnp.asarray(x)
        q = np.concatenate(
            [
                rng.normal(size=51).astype(np.float32),
                x[rng.integers(0, n, size=17)],
                np.asarray([-1e9, 1e9, 3e4, 2.9e4], np.float32),
            ]
        )
        kq = jnp.asarray(q)
        for side in ("left", "right"):
            want = jnp.searchsorted(sx, kq, side=side)
            got = sorted_positions(sx, kq, side=side)
            np.testing.assert_array_equal(
                np.asarray(got), np.asarray(want), err_msg=f"n={n} {side}"
            )
