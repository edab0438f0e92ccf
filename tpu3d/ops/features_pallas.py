"""Pallas windowed-sweep kernels for the fused normals+FPFH prepare.

The XLA sweep path (ops/fused_features.py) pays per-(block x window x
sub-tile) `lax.map`/`fori_loop` dispatch that dominates at 100k points
(~1200 sequential loop steps per sweep, each a few µs of overhead around
a few µs of VPU work). These kernels move each sweep into ONE
`pallas_call` over a (n_blocks,) grid with the shared double-buffered
window walk (ops/pallas_walk.py): DMA of packed candidate planes overlaps
compute, and the only XLA-level work left is tiny glue (covariance →
eigenvector, histogram assembly, normalization).

Sweeps (math identical to the XLA engine, see fused_features.py docstring
and src/registration.cpp:105-197 for reference semantics):
  A moments_sweep:  per-query radius moment accumulation (MXU) → PCA
                    normals outside.
  B spfh_sweep:     MXU Darboux angle numerators + cumulative-compare
                    histograms (30 counters/query).
  C fpfh_sweep:     1/dist-weighted neighbor-SPFH sum (MXU matmul).

Every kernel takes: scalar-prefetched (nb, K) window starts/lengths in the
slab2 row space, a (8, Np) query operand (rows 0-2 coords, 3 mask,
4-6 normals where needed), and a packed (R, M) HBM candidate operand whose
invalid rows carry 3e4-sentinel coords (no validity mask needed — they
fail every d² gate).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu3d.ops.normals import smallest_eigvec_3x3_planes_newton
from tpu3d.ops.pallas_walk import window_walk, window_walk_vmem

_BIG = 1e30

# VMEM residency gate: packed operands at or below this size skip the DMA
# walk entirely (window_walk_vmem) — the whole candidate array stays
# on-chip and a tile is one aligned slice. Leaves ~7 MB of the ~16 MB VMEM
# for blocks, accumulators and temporaries.
VMEM_OPERAND_BYTES = 9 * 1024 * 1024


def run_walk(vmem, lo_ref, len_ref, b, sub, packed, cand, sems, tile_fn,
             init, k_max):
    if vmem:
        return window_walk_vmem(
            lo_ref, len_ref, b, sub, packed, tile_fn, init, k_max=k_max
        )
    return window_walk(
        lo_ref, len_ref, b, sub, packed, cand, sems, tile_fn, init,
        k_max=k_max,
    )
# Bin thresholds: floor((x+1)*5.5) >= b  <=>  x >= b/5.5 - 1, b = 1..10.
_BIN_THRESH = tuple(b / 5.5 - 1.0 for b in range(1, 11))

# Theta thresholds in DIAMOND-ANGLE space (Mosaic has no atan2 lowering;
# theta is only ever BINNED, so any monotone surrogate of
# theta = atan2(s, c) ∈ (−π, π] works). d(s, c) = u = s/(|s|+|c|) when
# c ≥ 0, else sign(s)·2 − u — a continuous monotone bijection onto
# (−2, 2], ~6 VPU ops once per pair, after which every bin boundary is a
# single masked compare (same per-threshold cost as the alpha/phi bins;
# the previous half-plane scheme cost ~6 ops per threshold). Boundary
# rounding differs from atan2-binning only on the measure-zero threshold
# set — the usual bin-boundary noise class.
import math as _math


def _diamond(s: float, c: float) -> float:
    u = s / (abs(s) + abs(c))
    if c >= 0.0:
        return u
    return (2.0 if s >= 0.0 else -2.0) - u


_DIAMOND_THRESH = tuple(
    _diamond(_math.sin(_math.pi * t), _math.cos(_math.pi * t))
    for t in _BIN_THRESH
)


def _split_q(q_ref):
    """(8, B) query block -> per-coord (B, 1) columns + bool mask."""
    qt = q_ref[:]
    qx = qt[0:1, :].T
    qy = qt[1:2, :].T
    qz = qt[2:3, :].T
    qm = qt[3:4, :].T > 0.5
    return qt, qx, qy, qz, qm


def _masked_center(qx, qy, qz, qm):
    """Block-local origin over VALID queries (sentinel rows would wreck
    the centered-coordinate precision — see fused_features.block_center)."""
    wq = qm.astype(jnp.float32)
    cnt = jnp.maximum(jnp.sum(wq), 1.0)
    return (
        jnp.sum(qx * wq) / cnt,
        jnp.sum(qy * wq) / cnt,
        jnp.sum(qz * wq) / cnt,
    )


def _d2_planes(tile, qx, qy, qz):
    dx = tile[0:1, :] - qx  # (B, sub)
    dy = tile[1:2, :] - qy
    dz = tile[2:3, :] - qz
    return dx, dy, dz, dx * dx + dy * dy + dz * dz


def _dot_sub(a, b):
    """(B, sub) x (F, sub) -> (B, F), contracting the candidate axis."""
    return jax.lax.dot_general(
        a, b, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


# --------------------------------------------------------------------------
# Sweep A: radius-PCA moments
# --------------------------------------------------------------------------


def _moments_kernel(lo_ref, len_ref, scal_ref, q_ref, packed, out_ref,
                    cand, sems, *, k_max, vmem=False):
    """Moments AND the full covariance → smallest-eigenvector → viewpoint
    flip epilogue, in-kernel. Two layout tricks make the epilogue ~free:

      * the moment accumulator is TRANSPOSED — (10, B) via
        dot_general(feats, w) instead of (B, 10) via dot(w, feats) — so
        every epilogue op runs on full-lane (1, B) rows instead of
        1-lane (B, 1) columns (a 128x vreg-count difference);
      * the eigenvector uses the trig-free Newton Cardano
        (normals.smallest_eigvec_3x3_planes_newton) — Mosaic has no
        acos lowering (benchmarks/pallas_probe.py).

    Doing this here (vs the former XLA epilogue over ALL padded rows)
    scales the normal-solve cost with the swept blocks — in sparse
    prepare mode that is ~16% of the cloud (fused_features member sets).
    """
    b = pl.program_id(0)
    sub = cand.shape[2]
    r2 = scal_ref[0]
    qt, qx, qy, qz, qm = _split_q(q_ref)
    bsz = qx.shape[0]
    cx, cy, cz = _masked_center(qx, qy, qz, qm)

    def tile_fn(tile, own, start, carry):
        dx, dy, dz, d2 = _d2_planes(tile, qx, qy, qz)
        w = jnp.where(own & (d2 <= r2), 1.0, 0.0)  # (B, sub)
        c0 = tile[0:1, :] - cx  # (1, sub) centered candidate planes
        c1 = tile[1:2, :] - cy
        c2 = tile[2:3, :] - cz
        feats = jnp.concatenate(
            [c0, c1, c2, c0 * c0, c1 * c1, c2 * c2,
             c0 * c1, c0 * c2, c1 * c2, jnp.ones_like(c0)],
            axis=0,
        )  # (10, sub); row 9 of the dot is the neighbor count
        return carry + jax.lax.dot_general(
            feats, w, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # (10, B)

    mom = run_walk(
        vmem, lo_ref, len_ref, b, sub, packed, cand, sems, tile_fn,
        jnp.zeros((10, bsz), jnp.float32),
        k_max,
    )
    cnt = jnp.maximum(mom[9:10, :], 1.0)
    mx, my, mz = mom[0:1] / cnt, mom[1:2] / cnt, mom[2:3] / cnt
    c00 = mom[3:4] / cnt - mx * mx
    c11 = mom[4:5] / cnt - my * my
    c22 = mom[5:6] / cnt - mz * mz
    c01 = mom[6:7] / cnt - mx * my
    c02 = mom[7:8] / cnt - mx * mz
    c12 = mom[8:9] / cnt - my * mz
    nx, ny, nz = smallest_eigvec_3x3_planes_newton(
        c00, c01, c02, c11, c12, c22
    )
    # Flip toward the viewpoint/origin on the RAW coords (rows 0-2 of the
    # query operand are uncentered), zero invalid/padding rows.
    flip = nx * qt[0:1, :] + ny * qt[1:2, :] + nz * qt[2:3, :] > 0
    sgn = jnp.where(qt[3:4, :] > 0.5, jnp.where(flip, -1.0, 1.0), 0.0)
    out_ref[:] = jnp.concatenate(
        [nx * sgn, ny * sgn, nz * sgn, mom[9:10],
         jnp.zeros((4, bsz), jnp.float32)],
        axis=0,
    )


@functools.partial(
    jax.jit, static_argnames=("block", "sub", "interpret", "vmem")
)
def moments_sweep_pallas(q8, packed3, lo, ln, r2, block=256, sub=512,
                         interpret=False, vmem="auto"):
    """Returns (8, Np) PLANES: rows 0-2 viewpoint-flipped unit normals
    (zeroed on invalid rows), row 3 the radius-neighbor count, 4-7 pad —
    the covariance/eigenvector epilogue runs in-kernel (see
    _moments_kernel)."""
    return _run_sweep(_moments_kernel, q8, packed3, lo, ln, (r2,), 8,
                      block, sub, interpret, vmem, transposed_out=True)


# --------------------------------------------------------------------------
# Sweep B: SPFH cumulative-compare histograms
# --------------------------------------------------------------------------


def _spfh_kernel(lo_ref, len_ref, scal_ref, q_ref, packed, out_ref,
                 cand, sems, *, k_max, vmem=False):
    b = pl.program_id(0)
    sub = cand.shape[2]
    r2 = scal_ref[0]
    qt, qx, qy, qz, qm = _split_q(q_ref)
    bsz = qx.shape[0]
    qnx = qt[4:5, :].T  # (B, 1) query normals
    qny = qt[5:6, :].T
    qnz = qt[6:7, :].T
    # b_i = p_i × n_i in the caller's shared frame: the scalar-triple
    # identity alpha·d = n_i·b_j + b_i·n_j holds for any shared origin,
    # and the caller (fused_features) pre-shifts coordinates by the cloud
    # centroid so |p| ~ O(extent) — f32 cancellation noise ~1e-7
    # absolute, four orders below the 0.18-wide angle bins, regardless of
    # the world frame. Candidate-side b_j and a_j = p_j·n_j arrive
    # precomputed in the packed operand (rows 3-9), removing all per-pair
    # centering/cross work from the tile loop.
    qbx = qy * qnz - qz * qny
    qby = qz * qnx - qx * qnz
    qbz = qx * qny - qy * qnx
    qn3 = jnp.concatenate([qnx, qny, qnz], axis=1)  # (B, 3)
    qp3 = jnp.concatenate([qx, qy, qz], axis=1)
    qb3 = jnp.concatenate([qbx, qby, qbz], axis=1)
    z3 = jnp.zeros_like(qn3)
    rows_all = jnp.concatenate(
        [
            jnp.concatenate([qn3, qb3], axis=1),  # alpha·d numerator
            jnp.concatenate([z3, qn3], axis=1),  # c = n_i·n_j
            jnp.concatenate([z3, qp3], axis=1),  # pin = p_i·n_j
        ],
        axis=0,
    )  # (3B, 6) — one MXU dot per tile instead of two

    def tile_fn(tile, own, start, carry):
        cum, cnt = carry
        dx, dy, dz, d2 = _d2_planes(tile, qx, qy, qz)
        cols6 = tile[3:9, :]  # [b_j(3); n_j(3)] — precomputed planes
        aj = tile[9:10, :]  # (1, sub) = p_j·n_j
        mm = jax.lax.dot_general(
            rows_all, cols6, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # (3B, sub)
        anum = mm[:bsz, :]  # alpha·d
        c = mm[bsz: 2 * bsz, :]  # n_i·n_j
        pin = mm[2 * bsz:, :]  # p_i·n_j
        contrib = own & (d2 <= r2) & (d2 >= 1e-16)
        inv_d = jax.lax.rsqrt(jnp.maximum(d2, 1e-24))
        phi = (qnx * dx + qny * dy + qnz * dz) * inv_d
        e = (aj - pin) * inv_d
        alpha = anum * inv_d
        s = phi * c - e  # theta = atan2(s, c), binned via diamond angle
        u = s / jnp.maximum(jnp.abs(s) + jnp.abs(c), 1e-30)
        dth = jnp.where(
            c >= 0, u, jnp.where(s >= 0, 2.0, -2.0) - u
        )  # monotone surrogate of theta, (−2, 2]

        cf = contrib.astype(jnp.float32)
        am = jnp.where(contrib, alpha, -_BIG)
        pm = jnp.where(contrib, phi, -_BIG)
        tm = jnp.where(contrib, dth, -_BIG)
        # NOTE(perf, v5e): bf16 threshold compares were tried to halve the
        # 30-pass histogram — Mosaic rejects them ("Target does not
        # support this comparison" on vector<8x128x2xbf16>); the VPU has
        # no packed-bf16 compare. f32 compares are the floor here.
        parts = [
            jnp.sum((x >= t).astype(jnp.float32), axis=1, keepdims=True)
            for x, thresh in ((am, _BIN_THRESH), (pm, _BIN_THRESH),
                              (tm, _DIAMOND_THRESH))
            for t in thresh
        ]
        return (
            cum + jnp.concatenate(parts, axis=1),
            cnt + jnp.sum(cf, axis=1, keepdims=True),
        )

    cum, cnt = run_walk(
        vmem, lo_ref, len_ref, b, sub, packed, cand, sems, tile_fn,
        (jnp.zeros((bsz, 30), jnp.float32), jnp.zeros((bsz, 1), jnp.float32)),
        k_max,
    )
    # Histogram assembly + L1 normalization + TRANSPOSE in one epilogue:
    # hist_b = cum_b − cum_{b+1} per angle (cum_0 = count, cum_11 = 0) is
    # LINEAR in [cum | cnt], so one MXU dot with the constant ±1 map
    # _HIST_MAP both assembles the 33 bins and lands them as (34, B)
    # PLANES (row 33 passes the count through) — no relayout, and the
    # downstream sweep-C operand wants planes anyway. Exact: every
    # product is ±count (integers < 2^24), so bf16x6 HIGHEST reproduces
    # the old subtract formulation bit for bit.
    cumcat = jnp.concatenate([cum, cnt], axis=1)  # (B, 31)
    hist_t = jax.lax.dot_general(
        _hist_map_iota(), cumcat, (((0,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # (34, B)
    s = jnp.sum(hist_t[:33], axis=0, keepdims=True)  # (1, B) exact ints
    norm = jnp.where(
        s > 0, hist_t[:33] / jnp.maximum(s, 1e-30), hist_t[:33]
    )
    out_ref[:] = jnp.concatenate(
        [norm, hist_t[33:34], jnp.zeros((6, bsz), jnp.float32)], axis=0
    )


def _hist_map_iota():
    """The (31, 34) ±1 map, built from 2-D iotas — Pallas kernels may not
    capture array constants, and these few tiny vector compares fold away.

    Column c = 11·ang + b (b = 0..10) is histogram bin b of angle ang;
    rows 0-29 are the cumulative threshold counts (10 per angle), row 30
    the total count. hist[0] = cnt − cum_0, hist[b] = cum_{b−1} − cum_b,
    hist[10] = cum_9; column 33 passes the count through."""
    r = jax.lax.broadcasted_iota(jnp.int32, (31, 34), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (31, 34), 1)
    ang = c // 11
    b = c - ang * 11
    base = 10 * ang
    hist_col = c < 33
    plus = (
        (hist_col & (b >= 1) & (r == base + b - 1))
        | (hist_col & (b == 0) & (r == 30))
        | ((c == 33) & (r == 30))
    )
    minus = hist_col & (b <= 9) & (r == base + b)
    return jnp.where(plus, 1.0, jnp.where(minus, -1.0, 0.0))


@functools.partial(
    jax.jit, static_argnames=("block", "sub", "interpret", "vmem")
)
def spfh_sweep_pallas(q8, packed6, lo, ln, r2, block=256, sub=512,
                      interpret=False, vmem="auto"):
    """Returns (40, Np) PLANES: rows 0-32 the L1-NORMALIZED SPFH
    histogram, row 33 the neighbor count, 34-39 pad — assembly,
    normalization and the plane transpose all run in-kernel (see
    _spfh_kernel)."""
    return _run_sweep(_spfh_kernel, q8, packed6, lo, ln, (r2,), 40,
                      block, sub, interpret, vmem, transposed_out=True)


# --------------------------------------------------------------------------
# Sweep C: FPFH weighted neighbor-SPFH sum
# --------------------------------------------------------------------------


def _fpfh_kernel(lo_ref, len_ref, scal_ref, q_ref, packed, out_ref,
                 cand, sems, *, k_max, vmem=False):
    b = pl.program_id(0)
    sub = cand.shape[2]
    r2 = scal_ref[0]
    _, qx, qy, qz, qm = _split_q(q_ref)
    bsz = qx.shape[0]

    def tile_fn(tile, own, start, carry):
        dx, dy, dz, d2 = _d2_planes(tile, qx, qy, qz)
        contrib = own & (d2 <= r2) & (d2 >= 1e-16)
        wgt = jnp.where(
            contrib, jax.lax.rsqrt(jnp.maximum(d2, 1e-24)), 0.0
        )  # (B, sub)
        return carry + _dot_sub(wgt, tile[3:36, :])  # (B, 33)

    f = run_walk(
        vmem, lo_ref, len_ref, b, sub, packed, cand, sems, tile_fn,
        jnp.zeros((bsz, 33), jnp.float32),
        k_max,
    )
    out_ref[:] = jnp.concatenate(
        [f, jnp.zeros((bsz, 3), jnp.float32)], axis=1
    )


@functools.partial(
    jax.jit, static_argnames=("block", "sub", "interpret", "vmem")
)
def fpfh_sweep_pallas(q8, packed36, lo, ln, r2, block=256, sub=512,
                      interpret=False, vmem="auto"):
    """Returns (Np, 36): [weighted SPFH sum(33) | pad]."""
    return _run_sweep(_fpfh_kernel, q8, packed36, lo, ln, (r2,), 36,
                      block, sub, interpret, vmem)


# --------------------------------------------------------------------------
# Shared pallas_call plumbing
# --------------------------------------------------------------------------


def _run_sweep(kernel, q8, packed, lo, ln, scalars, out_w, block, sub,
               interpret, vmem="auto", transposed_out=False):
    npad = q8.shape[1]
    nb = npad // block
    assert nb * block == npad, (npad, block)
    # Round sub DOWN to the 128-lane grid (callers may pass min(sub, m)
    # with an unaligned m — e.g. a 300-capacity cloud) and never beyond
    # the padded operand width.
    sub = max(128, min(sub // 128 * 128,
                       -(-packed.shape[1] // 128) * 128))
    # Mosaic alignment: pad packed rows to a multiple of 8 (sublane
    # tiling) and columns to a multiple of sub (the aligned tile grid).
    # Zero padding is safe — padded rows/columns are never owned.
    rpad = (-packed.shape[0]) % 8
    cpad = (-packed.shape[1]) % sub
    if rpad or cpad:
        packed = jnp.pad(packed, ((0, rpad), (0, cpad)))
    rows = packed.shape[0]
    m = packed.shape[1]
    k_max = lo.shape[1]
    if vmem == "auto":
        vmem = rows * m * 4 <= VMEM_OPERAND_BYTES
    kernel = functools.partial(kernel, k_max=k_max, vmem=vmem)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # scalars
            pl.BlockSpec((8, block), lambda b, lo, ln: (0, b),
                         memory_space=pltpu.VMEM),
            # Packed candidate planes: fully VMEM-resident when they fit
            # (no DMA machinery at all), else HBM + the DMA window walk.
            pl.BlockSpec(memory_space=pltpu.VMEM if vmem else pl.ANY),
        ],
        out_specs=(
            pl.BlockSpec((out_w, block), lambda b, lo, ln: (0, b),
                         memory_space=pltpu.VMEM)
            if transposed_out
            else pl.BlockSpec((block, out_w), lambda b, lo, ln: (b, 0),
                              memory_space=pltpu.VMEM)
        ),
        scratch_shapes=[
            # 4-deep DMA pipeline; in resident mode it is unused but kept
            # so the kernels read ``sub`` from cand.shape either way.
            pltpu.VMEM((4, rows, sub), jnp.float32),
            pltpu.SemaphoreType.DMA((4,)),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (out_w, npad) if transposed_out else (npad, out_w),
            jnp.float32,
        ),
        cost_estimate=pl.CostEstimate(
            flops=int(npad) * 2048 * 60,
            bytes_accessed=int(npad) * 1024 * 4,
            transcendentals=int(npad) * 2048,
        ),
        interpret=interpret,
    )(
        lo.astype(jnp.int32).ravel(),
        ln.astype(jnp.int32).ravel(),
        jnp.asarray(scalars, jnp.float32),
        q8,
        packed,
    )
