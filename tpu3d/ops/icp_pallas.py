"""Pallas fused ICP correspondence + normal-equation kernel (p2plane).

The XLA slab path (ops/icp.py fused_slab_stats_fn) is correct but pays
~4-5 µs of sequential `lax.map` dispatch per query block per iteration —
at 100k points (392 blocks) x ~8 iterations that overhead alone is ~10 ms,
an order of magnitude more than the actual VPU work. This kernel moves the
whole per-iteration stats pass into ONE `pallas_call`:

  grid = (n_blocks,); per grid step a (block,)-query tile is auto-piped
  into VMEM while the kernel walks that block's slab window in dynamic
  sub-tiles, double-buffering manual HBM→VMEM DMAs of a PACKED candidate
  operand (rows 0-2 target coords, 3-5 target normals — one DMA per tile).
  Correspondences (nearest target within threshold, first-hit tie break by
  lowest row like the reference's sequential argmin) and the block's
  partial 6x6 JtJ / Jtr are reduced entirely in VMEM; each block emits 44
  floats. XLA sums the (nb, 44) partials outside.

Replaces cuda/icp.cu:57-141 (find-correspondences + build-linear-system
kernels with warp atomics) with a deterministic single-pass formulation.
Semantics identical to the XLA backend: transformed-p Jacobian
(registration.cpp:326,346), inclusive threshold (:337-338).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu3d.ops.pallas_walk import window_walk

_BIG = 1e30  # python float: jnp constants would be captured by the kernel


def _stats_kernel(
    # scalar prefetch
    lo_ref,  # i32[nb*K] flat window starts
    len_ref,  # i32[nb*K] flat window lengths
    # inputs
    thr2_ref,  # f32[1] SMEM
    q_ref,  # f32[8, B] VMEM block: rows 0-2 = P.T, row 3 = mask
    packed_hbm,  # f32[8, M] ANY: rows 0-2 target coords, 3-5 normals
    # outputs
    out_ref,  # f32[8, 48] per-block packed stats (row 0) + filler
    # scratch
    cand,  # f32[2, 8, sub] double-buffered candidate tiles
    sems,  # DMA sems (2,)
    *,
    k_max,
):
    b = pl.program_id(0)
    sub = cand.shape[2]
    thr2 = thr2_ref[0]

    qt = q_ref[:]  # (8, B)
    qx = qt[0:1, :].T  # (B, 1)
    qy = qt[1:2, :].T
    qz = qt[2:3, :].T
    qm = qt[3:4, :].T > 0.5  # (B, 1)
    bsz = qx.shape[0]
    col = jax.lax.broadcasted_iota(jnp.int32, (1, sub), 1)  # (1, sub)

    def tile_fn(c, own, start, carry):
        bd, bqx, bqy, bqz, bnx, bny, bnz = carry
        dx = c[0:1, :] - qx  # (B, sub)
        dy = c[1:2, :] - qy
        dz = c[2:3, :] - qz
        d2 = dx * dx + dy * dy + dz * dz
        d2 = jnp.where(own, d2, _BIG)
        loc_min = jnp.min(d2, axis=1, keepdims=True)  # (B, 1)
        loc_arg = jnp.argmin(d2, axis=1)[:, None]  # (B, 1) lowest-row tie
        better = loc_min < bd  # (B, 1)
        # One-hot winner extraction via plane reductions (no gather).
        # Safe float-free selection: the one-hot comes from the integer
        # argmin (inside one kernel there is no FMA-recontraction
        # hazard, but integer selection is exact regardless).
        win = (col == loc_arg) & better  # (B, sub)
        wf = win.astype(jnp.float32)

        def extract(plane):  # (1, sub) -> (B, 1)
            return jnp.sum(wf * plane, axis=1, keepdims=True)

        bqx = jnp.where(better, extract(c[0:1, :]), bqx)
        bqy = jnp.where(better, extract(c[1:2, :]), bqy)
        bqz = jnp.where(better, extract(c[2:3, :]), bqz)
        bnx = jnp.where(better, extract(c[3:4, :]), bnx)
        bny = jnp.where(better, extract(c[4:5, :]), bny)
        bnz = jnp.where(better, extract(c[5:6, :]), bnz)
        bd = jnp.where(better, loc_min, bd)
        return bd, bqx, bqy, bqz, bnx, bny, bnz

    z = jnp.zeros((bsz, 1), jnp.float32)
    bd, bqx, bqy, bqz, bnx, bny, bnz = window_walk(
        lo_ref, len_ref, b, sub, packed_hbm, cand, sems, tile_fn,
        (jnp.full((bsz, 1), _BIG), z, z, z, z, z, z),
        k_max=k_max,
    )

    # With zero windows the init carry passes through (bd = _BIG) and every
    # row fails the threshold — stats come out zero with no special case.
    keep = qm & (bd <= thr2)  # inclusive, registration.cpp:337-338
    wf = keep.astype(jnp.float32)  # (B, 1)
    n_corr = jnp.sum(wf, keepdims=True)  # (1, 1)
    sum_d2 = jnp.sum(jnp.where(keep, bd, 0.0), keepdims=True)
    # J = [p x n | n] with transformed p (CPU reference convention).
    cx = qy * bnz - qz * bny
    cy = qz * bnx - qx * bnz
    cz = qx * bny - qy * bnx
    J = jnp.concatenate([cx, cy, cz, bnx, bny, bnz], axis=1)  # (B, 6)
    r = (qx - bqx) * bnx + (qy - bqy) * bny + (qz - bqz) * bnz  # (B, 1)
    Jw = J * wf
    ata = jax.lax.dot_general(
        Jw, J, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # (6, 6)
    atb = jax.lax.dot_general(
        Jw, r * wf, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # (6, 1)
    # 2-D-native packing (Mosaic cannot relayout (6,6)->(1,36)):
    # rows 0-5 = [ata | atb], row 6 = [n_corr, sum_d2], row 7 filler;
    # lane columns 7-47 zero filler (sublane/lane block-divisibility).
    stats6 = jnp.concatenate([ata, atb], axis=1)  # (6, 7)
    scal = jnp.concatenate(
        [n_corr, sum_d2, jnp.zeros((1, 5), jnp.float32)], axis=1
    )  # (1, 7)
    rows8 = jnp.concatenate(
        [stats6, scal, jnp.zeros((1, 7), jnp.float32)], axis=0
    )  # (8, 7)
    out_ref[:] = jnp.concatenate(
        [rows8, jnp.zeros((8, 41), jnp.float32)], axis=1
    )


@functools.partial(jax.jit, static_argnames=("block", "sub", "interpret"))
def icp_p2plane_stats_pallas(
    q8: jnp.ndarray,  # f32[8, Np] rows 0-2 transformed src coords, 3 mask
    packed: jnp.ndarray,  # f32[6, M] rows 0-2 tgt coords, 3-5 normals
    lo: jnp.ndarray,  # i32[nb, K] window starts
    ln: jnp.ndarray,  # i32[nb, K] window lengths
    thr2,  # f32 squared distance threshold
    block: int = 256,
    sub: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    """Per-block packed stats (nb*8, 48). Block b's (8, 48) slab holds
    rows 0-5 = [ata (6,6) | atb (6,1) | 0...], row 6 = [n_corr, sum_d2,
    0...], row 7 zero filler. ``parts.reshape(-1, 8, 48).sum(0)`` yields
    the global (8, 48) stats block. ``q8`` must be block-coherent (sorted
    by x in the target's slab frame)."""
    npad = q8.shape[1]
    nb = npad // block
    assert nb * block == npad
    # Round sub DOWN to the 128-lane grid (callers may pass min(sub, m)
    # with an unaligned m — e.g. a 300-capacity cloud) and never beyond
    # the padded operand width.
    sub = max(128, min(sub // 128 * 128,
                       -(-packed.shape[1] // 128) * 128))
    # Mosaic alignment: pad packed rows (6 -> 8, sublane tiling) and
    # columns to a multiple of sub (aligned tile grid — see pallas_walk).
    rpad = (-packed.shape[0]) % 8
    cpad = (-packed.shape[1]) % sub
    if rpad or cpad:
        packed = jnp.pad(packed, ((0, rpad), (0, cpad)))
    rows = packed.shape[0]
    kernel = functools.partial(_stats_kernel, k_max=lo.shape[1])
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # thr2
            pl.BlockSpec((8, block), lambda b, lo, ln: (0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # packed target planes
        ],
        out_specs=pl.BlockSpec((8, 48), lambda b, lo, ln: (b, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((4, rows, sub), jnp.float32),  # 4-deep DMA pipeline
            pltpu.SemaphoreType.DMA((4,)),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nb * 8, 48), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=int(npad) * 2048 * 20,
            bytes_accessed=int(npad) * 2048 * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(
        lo.astype(jnp.int32).ravel(),
        ln.astype(jnp.int32).ravel(),
        jnp.asarray([thr2], jnp.float32),
        q8,
        packed,
    )
