"""Bucket-aligned padded slab2 layout (ops/slab2.py AlignedSlab2).

Invariants under test:
  * every real valid row appears exactly once in the padded layout, inside
    its bucket's run, y-sorted;
  * every block of ``block`` padded rows lies inside ONE bucket;
  * per-block windows are disjoint, exclude padding, and form an exact
    SUPERSET of each valid query's true r-ball (the exactness contract of
    registration.cpp:83-102 / :329-338's neighbor scans).
"""

from __future__ import annotations

import numpy as np
import pytest

import jax.numpy as jnp

from tpu3d.ops.slab2 import (
    aligned_block_windows,
    build_slab2_aligned,
)


def _cloud(n, seed=0, degenerate=None):
    rng = np.random.default_rng(seed)
    pts = rng.uniform(-0.5, 0.5, size=(n, 3)).astype(np.float32)
    if degenerate == "x":
        pts[:, 0] = 0.123  # single bucket
    elif degenerate == "xy":
        pts[:, 0] = 0.123
        pts[:, 1] = -0.321
    elif degenerate == "gap":
        # Two tight clusters with EMPTY buckets between them: the padding
        # shift of every row in the right cluster accumulates across a
        # run of empty buckets (exercises the closed-form
        # offsets[b]−starts[b] lookup, not just lead/tail emptiness).
        pts[: n // 2, 0] = pts[: n // 2, 0] * 0.02 - 0.49
        pts[n // 2:, 0] = pts[n // 2:, 0] * 0.02 + 0.47
    return pts


@pytest.mark.parametrize("degenerate", [None, "x", "xy", "gap"])
@pytest.mark.parametrize("block", [32, 128])
def test_aligned_layout_and_window_superset(degenerate, block):
    n = 700
    r = 0.07
    pts = _cloud(n, degenerate=degenerate)
    mask = np.ones(n, bool)
    mask[::13] = False  # some invalid rows
    al = build_slab2_aligned(
        jnp.asarray(pts), jnp.asarray(mask), r, block=block, max_buckets=64
    )
    ppts = np.asarray(al.padded_points_t).T  # (Mp, 3)
    vp = np.asarray(al.valid_padded)
    orig = np.asarray(al.padded_orig)
    offsets = np.asarray(al.offsets)
    mp = ppts.shape[0]
    assert mp % block == 0

    # Each valid input row appears exactly once, with its coordinates.
    seen = orig[vp]
    assert len(seen) == mask.sum()
    assert len(np.unique(seen)) == mask.sum()
    np.testing.assert_allclose(ppts[vp], pts[seen], rtol=0, atol=0)
    # Padding rows carry unique out-of-bounds originals (scatter-drop safe).
    pad_orig = orig[~vp]
    assert (pad_orig >= n).all()
    assert len(np.unique(pad_orig)) == len(pad_orig)

    # Blocks are bucket-pure: no block crosses a padded bucket boundary.
    for off in offsets:
        assert off % block == 0
    # QUANTIZED-y-sorted within each bucket's valid rows (the layout
    # orders by the 20-bit qy key; raw y may disorder within a tie).
    y0 = float(np.asarray(al.y0))
    ysc = float(np.asarray(al.y_scale))
    for b in range(len(offsets) - 1):
        rows = np.arange(offsets[b], offsets[b + 1])
        ys = ppts[rows, 1][vp[rows]]
        qys = np.floor((ys - y0) * ysc)
        assert (np.diff(qys) >= 0).all()

    lo, length = aligned_block_windows(al, r, block)
    lo = np.asarray(lo)
    length = np.asarray(length)
    nbk = mp // block
    assert lo.shape == (nbk, 3)

    for bk in range(nbk):
        rows = np.arange(bk * block, (bk + 1) * block)
        qs = rows[vp[rows]]
        # Windows are disjoint and never include padding rows.
        covered = []
        for k in range(3):
            w = np.arange(lo[bk, k], lo[bk, k] + length[bk, k])
            assert vp[w].all(), "window contains padding"
            covered.append(w)
        allw = np.concatenate(covered) if covered else np.array([], int)
        assert len(np.unique(allw)) == len(allw), "windows overlap"
        cov = set(allw.tolist())
        # Superset: every in-radius valid candidate of every valid query
        # in this block is inside some window.
        for q in qs:
            d2 = np.sum((ppts[vp] - ppts[q]) ** 2, axis=1)
            hits = np.where(d2 <= r * r)[0]
            hit_rows = np.where(vp)[0][hits]
            missing = [h for h in hit_rows if h not in cov]
            assert not missing, (bk, q, missing)


def test_aligned_all_invalid_and_tiny():
    pts = _cloud(40)
    mask = np.zeros(40, bool)
    al = build_slab2_aligned(
        jnp.asarray(pts), jnp.asarray(mask), 0.05, block=32, max_buckets=16
    )
    assert not bool(np.asarray(al.valid_padded).any())
    lo, length = aligned_block_windows(al, 0.05, 32)
    assert int(np.asarray(length).sum()) == 0
