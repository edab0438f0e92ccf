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

_BIG = 1e30  # python float: jnp constants would be captured by the kernel


def _stats_kernel(
    # scalar prefetch
    lo_ref,  # i32[nb, K]
    len_ref,  # i32[nb, K]
    # inputs
    thr2_ref,  # f32[1] SMEM
    q_ref,  # f32[8, B] VMEM block: rows 0-2 = P.T, row 3 = mask
    packed_hbm,  # f32[6, M] ANY: rows 0-2 target coords, 3-5 normals
    # outputs
    out_ref,  # f32[1, 48] per-block packed stats
    # scratch
    cand,  # f32[2, 6, sub] double-buffered candidate tiles
    sems,  # DMA sems (2,)
):
    b = pl.program_id(0)
    k_max = lo_ref.shape[1]
    sub = cand.shape[2]
    m = packed_hbm.shape[1]
    thr2 = thr2_ref[0]

    qt = q_ref[:]  # (8, B)
    qx = qt[0:1, :].T  # (B, 1)
    qy = qt[1:2, :].T
    qz = qt[2:3, :].T
    qm = qt[3:4, :].T > 0.5  # (B, 1)
    bsz = qx.shape[0]

    col = jax.lax.broadcasted_iota(jnp.int32, (1, sub), 1)  # (1, sub)

    def get_dma(slot, start):
        return pltpu.make_async_copy(
            packed_hbm.at[:, pl.ds(start, sub)], cand.at[slot], sems.at[slot]
        )

    def tile_start(k, t):
        """Clamped start row of sub-tile t of window k (safe for any t)."""
        lo = lo_ref[b, k]
        return jnp.clip(lo + t * sub, 0, m - sub)

    # Linearize (window, sub-tile) pairs so double buffering crosses window
    # boundaries: n_sub_k = ceil(len_k / sub), prefix-summed in SMEM-free
    # scalar math (K is tiny and static).
    n_subs = [pl.cdiv(len_ref[b, k], sub) for k in range(k_max)]
    total = n_subs[0]
    for k in range(1, k_max):
        total = total + n_subs[k]

    def decode(i):
        """Linear tile index -> (window k, tile t within window)."""
        k_acc = jnp.int32(0)
        t_rem = i
        for k in range(k_max - 1):
            here = t_rem < n_subs[k]
            k_acc = jnp.where(here, k_acc, k_acc + 1)
            t_rem = jnp.where(here, t_rem, t_rem - n_subs[k])
        return k_acc, t_rem

    @pl.when(total > 0)
    def _run():
        k0, t0 = decode(jnp.int32(0))
        get_dma(0, tile_start(k0, t0)).start()

        def body(i, carry):
            bd, bqx, bqy, bqz, bnx, bny, bnz = carry
            slot = jax.lax.rem(i, 2)
            k, t = decode(i)
            lo = lo_ref[b, k]
            ln = len_ref[b, k]
            own_lo = lo + t * sub
            own_hi = lo + jnp.minimum(ln, (t + 1) * sub)
            start = tile_start(k, t)

            @pl.when(i + 1 < total)
            def _prefetch():
                kn, tn = decode(i + 1)
                get_dma(1 - slot, tile_start(kn, tn)).start()

            get_dma(slot, start).wait()
            c = cand[slot]  # (6, sub)
            row = col + start
            own = (row >= own_lo) & (row < own_hi)  # (1, sub)

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
        bd, bqx, bqy, bqz, bnx, bny, bnz = jax.lax.fori_loop(
            0,
            total,
            body,
            (jnp.full((bsz, 1), _BIG), z, z, z, z, z, z),
        )

        keep = qm & (bd <= thr2)  # inclusive, registration.cpp:337-338
        wf = keep.astype(jnp.float32)  # (B, 1)
        n_corr = jnp.sum(wf)
        sum_d2 = jnp.sum(jnp.where(keep, bd, 0.0))
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
        out = jnp.concatenate(
            [
                ata.reshape(1, 36),
                atb.reshape(1, 6),
                n_corr.reshape(1, 1),
                sum_d2.reshape(1, 1),
                jnp.zeros((1, 4), jnp.float32),
            ],
            axis=1,
        )
        out_ref[:] = out

    @pl.when(total <= 0)
    def _empty():
        out_ref[:] = jnp.zeros_like(out_ref)


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
    """Per-block packed stats (nb, 48): [ata(36) | atb(6) | n_corr | sum_d2
    | pad(4)]. Caller sums over blocks. ``q8`` must be block-coherent
    (sorted by x in the target's slab frame)."""
    npad = q8.shape[1]
    nb = npad // block
    assert nb * block == npad
    m = packed.shape[1]
    sub = min(sub, m)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # thr2
            pl.BlockSpec((8, block), lambda b, lo, ln: (0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # packed target planes
        ],
        out_specs=pl.BlockSpec((1, 48), lambda b, lo, ln: (b, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, 6, sub), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        _stats_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nb, 48), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=int(npad) * 2048 * 20,
            bytes_accessed=int(npad) * 2048 * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(
        lo.astype(jnp.int32),
        ln.astype(jnp.int32),
        jnp.asarray([thr2], jnp.float32),
        q8,
        packed,
    )
