#!/bin/bash
# Pending on-chip measurements, run sequentially (the axon tunnel is
# single-client). Fire once when the tunnel is back; outputs land in
# /tmp/chip_queue/. Successor to round3_chip_runs.sh (whose runs all
# completed — see BASELINE.md); this queue holds the late-round-3 items.
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
  tail -8 $OUT/$name.log
}

# 1. Million-item single-chip support bank (validation + roofline timing).
run bigbank python scripts/bigbank_lab.py

# 2. First on-chip END-TO-END TRAINING run: the digits protocol (identical
#    recipe as the recorded CPU run) on the TPU stack only, plus the int8
#    and bf16 serving-bank evals on the trained weights.
run digits_tpu python scripts/parity_run.py --dataset digits --arch resnet10 \
  --epochs 8 --steps_per_epoch 40 --milestones 5 7 --n_way 8 \
  --modes random full cluster knn hnsw --stacks tpu \
  --int8_eval --bf16_eval --fc_baseline --out $OUT/digits_tpu.json

# 3. JPEG-bytes serving now decoding REAL photographs.
run jpeg_serve python serve.py --dataset synthetic --arch resnet18 \
  --featurizer_precision int8 --head_precision int8 --jpeg_bench \
  --bench_batches 10 --batch_size 64

# 4. Fresh official bench line (skip bench's own outage probe — the
#    probe above just initialized the tunnel successfully).
run bench env NWHEAD_ASSUME_TPU=1 python bench.py
echo "done $(date)" | tee -a $OUT/status
