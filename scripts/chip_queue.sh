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

# 1. int4 at the 1M-row bank scale: oracle gates + interleaved timing vs
#    f32/bf16/int8 (first run already completed 2026-08-19 — re-run is
#    cheap and reconfirms).
run bigbank python scripts/bigbank_lab.py

# 2. Giant-bank int4: 16M rows x 512 dims = 4.1 GB packed bank (2x the
#    int8 row ceiling), chunked build + centroid gate + timing.
run giant16m python scripts/bigbank_lab.py --giant 16000000 \
  --giant_precision int4

# 3. digits protocol with the int4 serving bank on trained weights
#    (accuracy cost of the 8x-traffic-reduction bank on real data).
run digits_int4 python scripts/parity_run.py --dataset digits \
  --arch resnet10 --epochs 8 --steps_per_epoch 40 --milestones 5 7 \
  --n_way 8 --modes full --stacks tpu --int4_eval --bf16_eval \
  --int8_eval --out $OUT/digits_int4.json

# 4. RUN_TPU suite (now includes the int4 compiled randomized sweep).
run tpu_suite env RUN_TPU=1 python -m pytest tests/test_tpu_integration.py -x -q

# 5. Fresh official bench line (now carries bigbank_int4_qps fields).
run bench env NWHEAD_ASSUME_TPU=1 python bench.py
echo "done $(date)" | tee -a $OUT/status
