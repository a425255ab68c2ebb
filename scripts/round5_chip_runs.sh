#!/bin/bash
# Round-5 on-chip runs, sequential (single-client tunnel). Outputs land
# in /tmp/chip_r5/. Cheap decision/curve runs first, the official bench
# once decisions are folded in, the endurance run LAST (its mid-run kill
# can wedge the tunnel for the NEXT process).
set -u
OUT=/tmp/chip_r5
mkdir -p $OUT
cd "$(dirname "$0")/.."

probe() {
  timeout 600 python -c "import jax; print(float(jax.numpy.ones((4,4)).sum()))" >/dev/null 2>&1 \
    || timeout 600 python -c "import jax; print(float(jax.numpy.ones((4,4)).sum()))" >/dev/null 2>&1
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

# 1. IVF agreement curves on REAL overlapping features (verdict #3).
run ivf_real_digits python scripts/ivf_lab.py --real digits
run ivf_real_cub python scripts/ivf_lab.py --real synthetic_cub

# 2. Host-resident streaming bank: the link constant (verdict #7).
run stream_host python scripts/bigbank_lab.py --stream_host 262144

# 3. Giant 8M bank at the scale-aware tile (verdict #2 gate: >=0.90 of
#    measured stream; block_s auto-selects 2048 past 256k rows now).
run giant_8m python scripts/bigbank_lab.py --giant 8000000

# 4. RUN_TPU compiled suite (gates the vpu2 impl + tile default on
#    Mosaic).
run tpu_suite env RUN_TPU=1 python -m pytest tests/test_tpu_integration.py -x -q

# 5. Official bench with the new ViT + latency legs (first run pays the
#    ViT kernel compiles; repeat for the roofline spread).
run bench1 env NWHEAD_ASSUME_TPU=1 python bench.py
run bench2 env NWHEAD_ASSUME_TPU=1 python bench.py

# 6. LAST: CUB-recipe endurance + mid-run kill/resume (verdict #4) —
#    per-epoch wall times + three-mode accs + exact-resume checks land
#    in the log; BASELINE.md table reads from it.
echo "== endurance =="
timeout 21000 python scripts/endurance_run.py --epochs 50 --kill_at 22 \
  --models_dir /tmp/endurance_r5 > $OUT/endurance.log 2>&1
tail -20 $OUT/endurance.log
echo "done $(date)" | tee -a $OUT/status
