#!/bin/bash
# Round-4 on-chip decision runs, sequential (single-client tunnel).
# Outputs land in /tmp/chip_r4/. Order matters: cheap decision runs
# first, the official bench once decisions are folded in, the endurance
# run LAST (it kills a TPU process mid-run, which can wedge the tunnel).
set -u
OUT=/tmp/chip_r4
mkdir -p $OUT
cd "$(dirname "$0")/.."

probe() {
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
  timeout 4000 "$@" > $OUT/$name.log 2>&1
  tail -15 $OUT/$name.log
}

# 1. int4 unpack decision: MXU-side nibble recovery vs the VPU chain
#    (VERDICT r3 #1 — int4 must beat int8 where DMA dominates).
run int4_lab python scripts/int4_lab.py

# 2. IVF grouped routing decision (VERDICT r3 #2 — uniform batches):
#    whole-batch union vs per-group unions, 1M bank, both regimes.
run ivf_grouped python scripts/ivf_lab.py --probes 4,8 --groups 0,16,32,64 --batches 256 --precisions int8
# 2b. finer tiles: 512-row routing granularity.
run ivf_block512 python scripts/ivf_lab.py --probes 8,16 --groups 0,32 --batches 256 --precisions int8 --block_s 512

# 3. RUN_TPU compiled suite (gates the new kernel defaults on Mosaic).
run tpu_suite env RUN_TPU=1 python -m pytest tests/test_tpu_integration.py -x -q

# 4. Giant int4 bank at 16M rows with the decided unpack impl.
run giant_int4 python scripts/bigbank_lab.py --giant 16000000 --giant_precision int4

# 5. Fresh official bench (the roofline gate wants >=0.90 3x).
run bench1 env NWHEAD_ASSUME_TPU=1 python bench.py
run bench2 env NWHEAD_ASSUME_TPU=1 python bench.py
run bench3 env NWHEAD_ASSUME_TPU=1 python bench.py

# 6. LAST: CUB-recipe endurance + mid-run kill/resume (VERDICT r3 #4).
echo "== endurance =="
timeout 21000 python scripts/endurance_run.py --epochs 50 --kill_at 22 \
  --models_dir /tmp/endurance > $OUT/endurance.log 2>&1
tail -15 $OUT/endurance.log
echo "done $(date)" | tee -a $OUT/status
