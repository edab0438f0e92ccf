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
    layout — no transpose materialization."""
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
