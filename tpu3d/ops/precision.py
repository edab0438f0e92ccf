"""Shared precision helpers for Pallas kernels."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def dot_bf16x3(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Manual bf16x3 matmul: hi·hi + hi·lo + lo·hi with f32 accumulation
    (~1e-7 relative — f32-grade dot products at half the MXU passes of
    HIGHEST). Mosaic lacks Precision.HIGH, hence the manual split; the
    bf16 dots must request DEFAULT precision explicitly or Mosaic rejects
    the bf16-operand/fp32-contract combination ("Bad lhs type")."""
    a_hi = a.astype(jnp.bfloat16).astype(jnp.float32)
    a_lo = (a - a_hi).astype(jnp.bfloat16)
    b_hi = b.astype(jnp.bfloat16).astype(jnp.float32)
    b_lo = (b - b_hi).astype(jnp.bfloat16)

    def dot(x, y):
        return jnp.dot(
            x.astype(jnp.bfloat16), y.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,
        )

    return dot(a_hi, b_hi) + dot(a_hi, b_lo) + dot(a_lo, b_hi)


def dot_tt_bf16x3(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """bf16x3 dot contracting dim 0 of BOTH operands: (K, M) x (K, N) ->
    (M, N). Lets callers keep both operands in lane-major (K-minor-free)
    layout — no transpose materialization.

    The hi/lo split is PACKED along the contraction axis — [hi;lo;hi] ×
    [hi;hi;lo] — so hi·hi + hi·lo + lo·hi accumulates in ONE MXU issue of
    width 3K instead of three K-wide passes plus two (M, N) plane adds
    (at small K like the rank-16 scoring factors, three K=16 passes each
    waste 7/8 of the 128-deep systolic array; one K=48 pass wastes 5/8
    and skips the VPU adds). Requires 3K <= 128."""
    if 3 * a.shape[0] > 128:
        # Wide contractions don't fit one pass — fall back to three.
        dn = (((0,), (0,)), ((), ()))
        a_hi = a.astype(jnp.bfloat16).astype(jnp.float32)
        a_lo = (a - a_hi).astype(jnp.bfloat16)
        b_hi = b.astype(jnp.bfloat16).astype(jnp.float32)
        b_lo = (b - b_hi).astype(jnp.bfloat16)

        def dot(x, y):
            return jax.lax.dot_general(
                x.astype(jnp.bfloat16), y.astype(jnp.bfloat16), dn,
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT,
            )

        return dot(a_hi, b_hi) + dot(a_hi, b_lo) + dot(a_lo, b_hi)
    a_hi = a.astype(jnp.bfloat16)
    a_lo = (a - a_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    b_hi = b.astype(jnp.bfloat16)
    b_lo = (b - b_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    ap = jnp.concatenate([a_hi, a_lo, a_hi], axis=0)  # (3K, M)
    bp = jnp.concatenate([b_hi, b_hi, b_lo], axis=0)  # (3K, N)
    return jax.lax.dot_general(
        ap, bp, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    )
