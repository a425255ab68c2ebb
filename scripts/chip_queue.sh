#!/bin/bash
# Pending on-chip measurements, run sequentially (the axon tunnel is
# single-client). Fire once when the tunnel is back; outputs land in
# /tmp/chip_queue/. The previous queue's items (oh_impl='lane' decision
# runs + bench) all completed — see BASELINE.md; this queue holds the
# int4 serving-bank decision runs.
set -u
OUT=/tmp/chip_queue
mkdir -p $OUT
cd "$(dirname "$0")/.."

probe() {
  # Cold reconnects can exceed 90s; two attempts with a generous window.
  timeout 240 python -c "import jax; print(float(jax.numpy.ones((4,4)).sum()))" >/dev/null 2>&1 \
    || timeout 240 python -c "import jax; print(float(jax.numpy.ones((4,4)).sum()))" >/dev/null 2>&1
}

if ! probe; then
  echo "tunnel still down $(date)" | tee $OUT/status
  exit 1
fi
echo "tunnel up $(date)" | tee $OUT/status

run() {
  name=$1; shift
  echo "== $name =="
  timeout 3000 "$@" > $OUT/$name.log 2>&1
  tail -12 $OUT/$name.log
}

# Queue as of the round-3 ninth session: the int4 queue completed
# 2026-08-19/20 (results in BASELINE.md); this queue re-validates the
# round's IVF machinery on the chip and refreshes the official line.

# 1. RUN_TPU suite (now includes the compiled IVF routed-head gate).
run tpu_suite env RUN_TPU=1 python -m pytest tests/test_tpu_integration.py -x -q

# 2. IVF pruning decision runs (1M bank, all regimes).
run ivf_lab python scripts/ivf_lab.py

# 3. Giant routed bank: 8M rows via chunked IVF build.
run giant_ivf python scripts/bigbank_lab.py --giant 8000000 --giant_ivf

# 4. Fresh official bench line (carries bigbank_ivf_* fields).
run bench env NWHEAD_ASSUME_TPU=1 python bench.py
echo "done $(date)" | tee -a $OUT/status
