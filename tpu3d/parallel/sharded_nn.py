"""Multi-chip nearest-neighbor search: target cloud sharded over ICI.

The scaling axis of this workload is point-cloud size (SURVEY.md §5
long-context note): a 1M-point target cloud is split row-wise across the
mesh, every chip runs the local Pallas/XLA top-1 scan against its shard, and
the global winner is a tiny (n_dev, Q) argmin after an ``all_gather`` of
per-shard (distance, index) pairs — bandwidth ∝ queries, not targets, so the
collective rides ICI cheaply.

Determinism: per-shard results are combined in shard order with a strict
``<`` via argmin-on-stacked-rows, so ties resolve to the lowest global
target index, identical to the single-chip kernel.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from tpu3d.ops.nn_pallas import nearest_neighbor


def nearest_neighbor_sharded(
    queries: jnp.ndarray,
    targets: jnp.ndarray,
    target_mask: jnp.ndarray,
    mesh: Mesh,
    axis: str = "shard",
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Top-1 NN with the target rows sharded across ``axis``.

    queries are replicated; targets/target_mask must have row count divisible
    by the axis size (pad with masked rows). Returns (idx i32[Q], d2 f32[Q])
    with GLOBAL target indices.
    """
    n_shards = mesh.shape[axis]
    m = targets.shape[0]
    if m % n_shards:
        raise ValueError(f"target rows {m} not divisible by {n_shards} shards")
    shard_rows = m // n_shards

    def local(q, t, tm):
        # q: (Q, 3) replicated; t: (shard_rows, 3); tm: (shard_rows,)
        idx, d2 = nearest_neighbor(q, t, tm)
        offset = jax.lax.axis_index(axis) * shard_rows
        # Masked-out shards (all-invalid) return garbage idx at huge d2 —
        # the global argmin ignores them.
        gath_d = jax.lax.all_gather(d2, axis)  # (n_shards, Q)
        gath_i = jax.lax.all_gather(idx + offset, axis)
        win = jnp.argmin(gath_d, axis=0)  # ties → lowest shard → lowest index
        q_ids = jnp.arange(d2.shape[0])
        return gath_i[win, q_ids], gath_d[win, q_ids]

    fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(axis), P(axis)),
        out_specs=(P(), P()),
        # Outputs ARE replicated (every shard computes the identical global
        # argmin from the all_gather) — VMA inference can't prove it.
        check_vma=False,
    )
    return fn(queries, targets, target_mask)
