#!/bin/bash
# Smoke test — parity with the reference's scripts/test_pipeline.sh:
# run the hermetic demo pipeline; "Test Passed" iff exit 0.
set -e
cd "$(dirname "$0")/.."
python -m tpu3d config/pipeline_config.yaml
echo "Test Passed"
