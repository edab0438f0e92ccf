"""Wall-clock timing that actually synchronizes.

The reference times stages with chrono around host calls
(pipeline.cpp:34,139-142). JAX dispatch is async — and on tunneled TPU
platforms ``block_until_ready`` can be a no-op — so the only reliable sync
is reading a scalar back to the host. ``device_timeit`` reduces the
function's outputs to one scalar inside jit and fetches it; the measured
roundtrip floor is reported so callers can subtract it.
"""

from __future__ import annotations

import time
from typing import Callable

import jax
import jax.numpy as jnp


def _to_scalar(out) -> jnp.ndarray:
    leaves = jax.tree.leaves(out)
    acc = jnp.float32(0.0)
    for leaf in leaves:
        if hasattr(leaf, "dtype"):
            acc = acc + jnp.sum(leaf).astype(jnp.float32)
    return acc


def roundtrip_ms(n: int = 8) -> float:
    """Host↔device scalar readback floor — MIN of n (the tunnel adds
    heavy-tailed jitter; callers subtract this from min-of-k raw device
    timings, and min-minus-min is the consistent estimator of the
    deterministic work)."""
    x = jnp.float32(1.0)
    f = jax.jit(lambda v: v + 1.0)
    float(f(x))
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        float(f(x))
        best = min(best, time.perf_counter() - t0)
    return best * 1000.0


def roundtrip_stats(n: int = 12, spread_limit_ms: float = 3.0) -> dict:
    """Tunnel-health probe: distribution of n scalar readbacks with
    DISTINCT args (the RPC layer caches identical program+args pairs).

    The remote tunnel intermittently degrades for hours (compiles stall,
    roundtrips drift 24.9-34.3 ms within one session — METHODOLOGY_r04);
    a min-minus-min net timing minted in such a session carries the full
    drift as error. ``healthy`` is False when the observed spread exceeds
    ``spread_limit_ms`` — benchmark harnesses must flag or refuse to mint
    artifacts then (VERDICT r4 item 5)."""
    f = jax.jit(lambda v: v + 1.0)
    float(f(jnp.float32(0.0)))
    ts = []
    for i in range(n):
        t0 = time.perf_counter()
        float(f(jnp.float32(1.0 + i)))
        ts.append((time.perf_counter() - t0) * 1000.0)
    ts.sort()
    spread = ts[-1] - ts[0]
    # Healthy = the CENTER sits on the floor (median−min small) and the
    # tail is bounded. A single straggler in a burst is normal tunnel
    # jitter; what poisons min-minus-min timings is the floor itself
    # drifting — callers that run long should re-probe and compare mins
    # (bench.py does).
    center_drift = ts[n // 2] - ts[0]
    return {
        "min_ms": round(ts[0], 3),
        "median_ms": round(ts[n // 2], 3),
        "max_ms": round(ts[-1], 3),
        "spread_ms": round(spread, 3),
        "center_drift_ms": round(center_drift, 3),
        "healthy": center_drift <= spread_limit_ms
        and spread <= 8.0 * spread_limit_ms,
    }


def device_timeit(
    fn: Callable, *args, iters: int = 3, warmup: int = 1
) -> dict:
    """Time ``fn(*args)`` with forced scalar sync.

    Returns {'best_ms', 'mean_ms', 'roundtrip_ms', 'best_net_ms'}.
    """
    # eps rides through the result so every call has distinct args AND a
    # distinct output — the tunnel RPC layer caches executions of an
    # identical program+args pair (~1 ms returns, BENCH_NOTES), which
    # would turn repeat timings into cache-read timings.
    synced = jax.jit(lambda eps, *a: _to_scalar(fn(*a)) + eps)
    for w in range(warmup):
        float(synced(jnp.float32(1.0 + w), *args))
    times = []
    for i in range(iters):
        eps = jnp.float32(1e-6 * (i + 1))
        t0 = time.perf_counter()
        float(synced(eps, *args))
        times.append((time.perf_counter() - t0) * 1000.0)
    rt = roundtrip_ms()
    best = min(times)
    return {
        "best_ms": best,
        "mean_ms": sum(times) / len(times),
        "roundtrip_ms": rt,
        "best_net_ms": max(best - rt, 0.0),
    }


class StageTimer:
    """Per-stage wall timers with the reference's print style."""

    def __init__(self):
        self.stages: dict[str, float] = {}

    def time(self, name: str, fn: Callable, *args):
        t0 = time.perf_counter()
        out = fn(*args)
        out = jax.block_until_ready(out)
        self.stages[name] = (time.perf_counter() - t0) * 1000.0
        return out

    def report(self):
        for name, ms in self.stages.items():
            print(f"  {name}: {ms:.1f} ms")
