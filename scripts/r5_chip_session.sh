#!/bin/bash
# Round-5 chip validation batch: run when the tunnel is healthy.
# Each step logs to /tmp/r5_<name>.log; stops are independent (|| true).
# Usage: bash scripts/r5_chip_session.sh [quick]
set -u
cd "$(dirname "$0")/.."

probe() {
  # Gate on RESPONSIVENESS (compile completes, floor sane) — each harness
  # applies its own health policy (bench warns + floor-drift check,
  # methodology refuses to mint when degraded).
  timeout 120 python -c "
import time, jax, jax.numpy as jnp
t0=time.time(); f=jax.jit(lambda v: v*2+1); r=float(f(jnp.float32(3.0)))
print('probe ok', round(time.time()-t0,1), 's backend', jax.default_backend())
from tpu3d.utils.timing import roundtrip_stats
h=roundtrip_stats(); print('health', h)
import sys; sys.exit(0 if h['min_ms'] < 60 else 1)"
}

echo "== probe =="
probe || { echo "TUNNEL UNRESPONSIVE — aborting session"; exit 1; }

echo "== nn precision quality (new fast3 packing) =="
timeout 1200 python benchmarks/nn_precision_quality.py \
  > /tmp/r5_nnq.json 2> /tmp/r5_nnq.log || echo "nnq FAILED"

echo "== headline bench =="
timeout 2400 python bench.py > /tmp/r5_bench.json 2> /tmp/r5_bench.log \
  || echo "bench FAILED"
cat /tmp/r5_bench.json

echo "== mfu =="
timeout 2400 python benchmarks/mfu.py > /tmp/r5_mfu.json 2> /tmp/r5_mfu.log \
  || echo "mfu FAILED"

echo "== nn block sweep =="
timeout 2400 python benchmarks/sweep_nn_blocks.py \
  > /tmp/r5_nnsweep.json 2> /tmp/r5_nnsweep.log || echo "nn sweep FAILED"

if [ "${1:-}" != "quick" ]; then
  echo "== methodology =="
  timeout 2400 python benchmarks/methodology.py \
    > /tmp/r5_methodology.json 2> /tmp/r5_meth.log || echo "methodology FAILED"

  echo "== ab_stats (20 seeds) =="
  timeout 5400 python benchmarks/ab_stats.py \
    > /tmp/r5_ab.json 2> /tmp/r5_ab.log || echo "ab_stats FAILED"

  echo "== robustness =="
  timeout 3600 python benchmarks/robustness.py \
    > /tmp/r5_robust.json 2> /tmp/r5_robust.log || echo "robustness FAILED"
fi
echo "== done =="
