#!/bin/bash
# Round-5 FINAL artifact batch — run at the shipping configuration only
# (after perf iteration settles). Each step logs to /tmp/r5f_<name>.log.
# Usage: bash scripts/r5_final_artifacts.sh
set -u
cd "$(dirname "$0")/.."

probe() {
  timeout 120 python -c "
import time, jax, jax.numpy as jnp
t0=time.time(); f=jax.jit(lambda v: v*2+1); r=float(f(jnp.float32(3.0)))
print('probe ok', round(time.time()-t0,1), 's backend', jax.default_backend())
from tpu3d.utils.timing import roundtrip_stats
h=roundtrip_stats(); print('health', h)
import sys; sys.exit(0 if h['min_ms'] < 60 else 1)"
}

echo "== probe =="
probe || { echo "TUNNEL UNRESPONSIVE — aborting"; exit 1; }

echo "== methodology (self-gates on health) =="
timeout 2400 python benchmarks/methodology.py \
  > /tmp/r5f_methodology.json 2> /tmp/r5f_meth.log || echo "methodology FAILED"

echo "== ab_stats (20 seeds) =="
timeout 5400 python benchmarks/ab_stats.py \
  > /tmp/r5f_ab.json 2> /tmp/r5f_ab.log || echo "ab_stats FAILED"

echo "== robustness =="
timeout 3600 python benchmarks/robustness.py \
  > /tmp/r5f_robust.json 2> /tmp/r5f_robust.log || echo "robustness FAILED"

echo "== mfu refresh =="
timeout 2400 python benchmarks/mfu.py > /tmp/r5f_mfu.json 2> /tmp/r5f_mfu.log \
  || echo "mfu FAILED"

echo "== stage decompositions =="
timeout 2400 python benchmarks/bench_stages.py 2> /tmp/r5f_stages.log \
  || echo "stages FAILED"
timeout 2400 python benchmarks/bench_stages_exact.py 2> /tmp/r5f_stages_exact.log \
  || echo "stages_exact FAILED"

echo "== fidelity =="
timeout 2400 python benchmarks/fidelity.py > /tmp/r5f_fidelity.json \
  2> /tmp/r5f_fidelity.log || echo "fidelity FAILED"

echo "== final bench =="
timeout 2400 env TPU3D_BENCH_EXTRAS=1 python bench.py > /tmp/r5f_bench.json \
  2> /tmp/r5f_bench.log || echo "bench FAILED"
cat /tmp/r5f_bench.json
echo "== done =="
