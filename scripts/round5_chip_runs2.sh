#!/bin/bash
# Round-5 follow-up on-chip runs (after round5_chip_runs.sh): the giant
# tile probe at 4096, the ViT deploy CLI driven end to end, and a clean
# third bench. Sequential — single-client tunnel.
set -u
OUT=/tmp/chip_r5
mkdir -p $OUT
cd "$(dirname "$0")/.."

probe() {
  timeout 600 python -c "import jax; print(float(jax.numpy.ones((4,4)).sum()))" >/dev/null 2>&1 \
    || timeout 600 python -c "import jax; print(float(jax.numpy.ones((4,4)).sum()))" >/dev/null 2>&1
}

if ! probe; then
  echo "tunnel down $(date)" | tee -a $OUT/status
  exit 1
fi
echo "batch2 start $(date)" | tee -a $OUT/status

run() {
  name=$1; shift
  echo "== $name =="
  timeout 4000 "$@" > $OUT/$name.log 2>&1
  tail -15 $OUT/$name.log
}

# 1. Does a 4096-row tile close the giant head's last ~16% vs stream?
run giant_4096 python scripts/bigbank_lab.py --giant 8000000 --giant_block_s 4096

# 2. The ViT deploy CLI end to end on chip (bench evidence already in
#    the official line; this drives serve.py --arch vit_s14 itself).
run serve_vit python serve.py --dataset synthetic --arch vit_s14 \
  --featurizer_precision int8 --head_precision int8 \
  --latency_bench --bench_batches 3

# 3. Clean third bench (quiet host — CPU suite done).
run bench3 env NWHEAD_ASSUME_TPU=1 python bench.py

echo "batch2 done $(date)" | tee -a $OUT/status
