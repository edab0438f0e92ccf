"""Shared in-kernel machinery: walk a block's slab windows in dynamic
sub-tiles with double-buffered HBM→VMEM DMA.

Every windowed sweep kernel (ICP stats, the three FPFH-prepare sweeps) has
the same skeleton: per grid step (one query block), iterate the block's
candidate windows [lo_k, lo_k+len_k) — disjoint row ranges of a sorted
target layout — in ``sub``-wide tiles, DMAing one packed (R, sub) tile
per step while computing on the previous one. The (window, sub-tile) pairs
are linearized so buffering crosses window boundaries.

Tiles live on the FIXED sub-aligned grid: window k touches grid tiles
[lo_k // sub, cdiv(lo_k+len_k, sub)), and every DMA start is g*sub —
Mosaic requires lane-dim slice offsets provably divisible by 128, and an
arbitrary ``lo_k + t*sub`` start is not provable. The ``own`` mask trims
each tile to the window's actual rows, so grid alignment never changes
results (costs ≤ 1 extra tile per window). Callers must pad the packed
operand's columns to a multiple of ``sub`` and its rows to a multiple
of 8 (sublane tiling) — zero padding is safe, padded rows/columns are
never owned.

Used INSIDE Pallas kernels only (operates on refs and traced scalars).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def window_walk(
    lo_ref,  # i32[nb*K] scalar-prefetch window starts (sorted rows), FLAT
    len_ref,  # i32[nb*K] window lengths, FLAT
    b,  # grid-step block index
    sub: int,  # sub-tile width (multiple of 128)
    packed_hbm,  # (R, M) ref in ANY/HBM — the packed candidate planes
    cand,  # (depth, R, sub) VMEM scratch (DMA pipeline slots; callers pass 4)
    sems,  # DMA semaphores (depth,)
    tile_fn,  # (tile_(R,sub), own_(1,sub), start, carry) -> carry
    init,  # initial carry (pytree of arrays)
    k_max: int,  # windows per block (lo/len are (nb, K) flattened)
):
    """Returns the final carry after scanning every owned candidate row.

    The window tables are FLAT 1-D SMEM operands indexed ``b*k_max + k``
    — Mosaic pads a 2-D (nb, K) SMEM array's minor dim to 128 lanes,
    which blows the 1 MB SMEM budget 64x at large nb (OOM at 1M points).
    """
    base = b * k_max
    col = jax.lax.broadcasted_iota(jnp.int32, (1, sub), 1)

    def get_dma(slot, start):
        return pltpu.make_async_copy(
            packed_hbm.at[:, pl.ds(start, sub)], cand.at[slot], sems.at[slot]
        )

    # Aligned grid-tile ranges per window.
    g0s = [lo_ref[base + k] // sub for k in range(k_max)]
    n_subs = [
        jnp.where(
            len_ref[base + k] > 0,
            pl.cdiv(lo_ref[base + k] + len_ref[base + k], sub) - g0s[k],
            0,
        )
        for k in range(k_max)
    ]
    total = n_subs[0]
    for k in range(1, k_max):
        total = total + n_subs[k]

    def decode(i):
        """Linear tile index -> (window k, grid tile g0_k + t). The settle
        flag is STICKY: without it, a zero-length window after the owning
        one re-advances k_acc (t_rem < 0 is still < n_subs)."""
        k_acc = jnp.int32(0)
        t_rem = i
        g0 = g0s[0]
        settled = jnp.bool_(False)
        for k in range(k_max - 1):
            here = settled | (t_rem < n_subs[k])
            k_acc = jnp.where(here, k_acc, k_acc + 1)
            g0 = jnp.where(here, g0, g0s[k + 1])
            t_rem = jnp.where(here, t_rem, t_rem - n_subs[k])
            settled = here
        return k_acc, (g0 + t_rem) * sub

    # Pipelined DMA (depth = scratch slots, 4) + 2x-unrolled loop: the
    # per-tile fixed cost (decode scalars, DMA wait, loop carry) is ~1 µs
    # while small tiles carry ~0.1 µs of vector work — pairing two tiles
    # per iteration halves that overhead. Leak-safety: tiles are indexed
    # over total_even = total rounded up to even; the at-most-one padding
    # tile re-fetches tile `total-1`'s region into its own slot (its DMA
    # is started AND waited exactly once, and it contributes nothing
    # through the `t < total` own-mask).
    depth = cand.shape[0]
    total_even = (total + 1) & ~jnp.int32(1)

    def clamped(t):
        return jnp.minimum(t, jnp.maximum(total - 1, 0))

    def start_tile(t):
        _, s = decode(clamped(t))
        get_dma(jax.lax.rem(t, depth), s).start()

    # Prologue DMAs only for existing (even-padded) tiles: with total == 0
    # the fori_loop below runs no bodies and init passes through.
    for t in range(2):
        @pl.when(t < total_even)
        def _prologue(t=t):
            start_tile(jnp.int32(t))

    def one(t, carry):
        """Wait + consume tile t (own-masked off if it is the pad tile)."""
        k, start = decode(clamped(t))
        own_lo = lo_ref[base + k]
        own_hi = own_lo + len_ref[base + k]
        get_dma(jax.lax.rem(t, depth), start).wait()
        row = col + start
        own = (row >= own_lo) & (row < own_hi) & (t < total)  # (1, sub)
        return tile_fn(cand[jax.lax.rem(t, depth)], own, start, carry)

    def body(j, carry):
        i = j * 2

        @pl.when(i + 2 < total_even)
        def _pf0():
            start_tile(i + 2)

        @pl.when(i + 3 < total_even)
        def _pf1():
            start_tile(i + 3)

        carry = one(i, carry)
        return one(i + 1, carry)

    return jax.lax.fori_loop(0, total_even // 2, body, init)


def window_walk_vmem(
    lo_ref,  # i32[nb*K] scalar-prefetch window starts, FLAT
    len_ref,  # i32[nb*K] window lengths, FLAT
    b,  # grid-step block index
    sub: int,  # sub-tile width (multiple of 128)
    packed_vmem,  # (R, M) ref RESIDENT IN VMEM — no DMA machinery at all
    tile_fn,  # (tile_(R,sub), own_(1,sub), start, carry) -> carry
    init,  # initial carry
    k_max: int,
):
    """VMEM-resident variant of :func:`window_walk`: when the packed
    candidate operand fits on-chip (≤ a few MB), every per-tile DMA
    start/wait/semaphore disappears — a tile is one aligned dynamic slice
    of the resident buffer. Same sub-aligned tile grid, same own-mask
    semantics; per-tile fixed cost drops from ~0.4 µs to the slice+compute
    itself, which is what makes small ``sub`` (tighter windows) pay off.
    """
    m = packed_vmem.shape[1]
    col = jax.lax.broadcasted_iota(jnp.int32, (1, sub), 1)
    base = b * k_max
    carry = init
    for k in range(k_max):  # k_max is small (3) — unrolled
        lo_k = lo_ref[base + k]
        len_k = len_ref[base + k]
        g0 = lo_k // sub
        n_sub = jnp.where(len_k > 0, pl.cdiv(lo_k + len_k, sub) - g0, 0)
        own_hi = lo_k + len_k

        def body(t, c, g0=g0, lo_k=lo_k, own_hi=own_hi):
            start = jnp.minimum((g0 + t) * sub, m - sub)
            start = pl.multiple_of(start, sub)
            tile = packed_vmem[:, pl.ds(start, sub)]
            row = col + start
            own = (row >= lo_k) & (row < own_hi)
            return tile_fn(tile, own, start, c)

        carry = jax.lax.fori_loop(0, n_sub, body, carry)
    return carry
