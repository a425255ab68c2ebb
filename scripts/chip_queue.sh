#!/bin/bash
# Pending on-chip measurements, run sequentially (the axon tunnel is
# single-client). Fire once when the tunnel is back; outputs land in
# /tmp/chip_queue/. The previous queue's items (bigbank, digits on-chip
# training, jpeg serve, bench) all completed — see BASELINE.md; this
# queue holds the oh_impl='lane' decision runs.
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

# 1. oh_impl='lane' vs 'sub' A/B: compiled parity + timing, CUB scale.
run ohlane_cub python scripts/ohlane_lab.py --scale cub

# 2. Same at the 1M-row bank scale (the resident-vs-streamed region the
#    lane layout is built for).
run ohlane_big python scripts/ohlane_lab.py --scale big

# 3. Library fused-kernel numerics + grads + timing (pallas_nw touched).
run libkernel python scripts/libkernel_check.py

# 4. Fresh official bench line (skip bench's own outage probe — the
#    probe above just initialized the tunnel successfully).
run bench env NWHEAD_ASSUME_TPU=1 python bench.py
echo "done $(date)" | tee -a $OUT/status
