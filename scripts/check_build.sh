#!/bin/bash
# Build check — parity with the reference's scripts/check_build.sh
# (cmake+make there; native lib + import check here).
set -e
cd "$(dirname "$0")/.."
make -C native
python -c "import tpu3d; print('tpu3d', tpu3d.__version__, 'OK')"
echo "Build OK"
