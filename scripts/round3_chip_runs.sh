#!/bin/bash
# Round-3 pending on-chip measurements, run sequentially (the axon tunnel
# is single-client). Fire once when the tunnel is back; outputs land in
# /tmp/round3_runs/.
set -u
OUT=/tmp/round3_runs
mkdir -p $OUT
cd "$(dirname "$0")/.."

probe() {
  # Cold reconnects can exceed 90s; two attempts with a generous window.
  timeout 180 python -c "import jax; print(float(jax.numpy.ones((4,4)).sum()))" >/dev/null 2>&1 \
    || timeout 180 python -c "import jax; print(float(jax.numpy.ones((4,4)).sum()))" >/dev/null 2>&1
}

if ! probe; then
  echo "tunnel still down" | tee $OUT/status
  exit 1
fi
echo "tunnel up $(date)" | tee $OUT/status

run() {
  name=$1; shift
  echo "== $name =="
  timeout 2400 "$@" > $OUT/$name.log 2>&1
  tail -6 $OUT/$name.log
}

# 1. Quantized ViT with the LN/LayerScale/residual folds (new numbers).
run vit_s14 python scripts/quant_lab.py --vit
run vit_b14 python scripts/quant_lab.py --vit --arch=vit_b14
# ViT-L completes the int8-vs-bf16 scale curve (S/B/L).
run vit_l14 python scripts/quant_lab.py --vit --arch=vit_l14
# 2. JPEG-bytes serving with uint8 transfer.
run jpeg_serve python serve.py --dataset synthetic --arch resnet18 \
  --featurizer_precision int8 --head_precision int8 --jpeg_bench \
  --bench_batches 10 --batch_size 64
# 3. Official bench line.
run bench python bench.py
echo "done $(date)" | tee -a $OUT/status
