#!/bin/bash
# Round-5 batch 3 (after round5_chip_runs2.sh): the giant-tile A/B
# comparator at the current default (auto -> 2048) so the bs4096 call
# can be made on same-session numbers, then the endurance run LAST (its
# mid-run kill can wedge the tunnel for the NEXT process).
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
echo "batch3 start $(date)" | tee -a $OUT/status

run() {
  name=$1; shift
  echo "== $name =="
  timeout 4000 "$@" > $OUT/$name.log 2>&1
  tail -15 $OUT/$name.log
}

# 1. Same-session comparator for the bs4096 result: 8M at the auto
#    (2048) tile, both batch sizes.
run giant_2048 python scripts/bigbank_lab.py --giant 8000000

# 2. LAST: CUB-recipe endurance + mid-run kill/resume (verdict #4) —
#    per-epoch wall times + three-mode accs + exact-resume checks land
#    in the log; BASELINE.md table reads from it.
echo "== endurance =="
timeout 12000 python scripts/endurance_run.py --epochs 50 --kill_at 22 \
  --models_dir /tmp/endurance_r5 > $OUT/endurance.log 2>&1
tail -25 $OUT/endurance.log
echo "batch3 done $(date)" | tee -a $OUT/status
