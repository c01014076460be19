#!/bin/sh
# CI entry: CPU suite (8 virtual devices) + native build/selftest + ASan;
# add LIBHPC_TEST_TPU=1 smoke + bench on a TPU-attached runner.
set -e
cd "$(dirname "$0")/.."
echo "== native build + selftest =="
make -C native all
python -c "from libhpc_tpu.runtime.native import selftest; assert selftest() == 0; print('selftest ok')"
echo "== ASan selftest =="
make -C native asan && ./native/build/selftest_asan
echo "== CPU test suite (fast tier) =="
python -m pytest tests/ -q -m "not slow"
if [ "$LIBHPC_CI_FAST" != "1" ]; then
  echo "== CPU test suite (slow tier) =="
  python -m pytest tests/ -q -m "slow"
fi
echo "== graft entry dryrun =="
python -c "import __graft_entry__ as g; g.dryrun_multichip(8); print('dryrun ok')"
if [ "$LIBHPC_TEST_TPU" = "1" ]; then
  echo "== TPU smoke =="
  python -m pytest tests/test_tpu_smoke.py -q
  echo "== bench =="
  python bench.py
fi
