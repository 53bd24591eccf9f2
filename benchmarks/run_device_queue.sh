#!/bin/bash
# Run the measurement half of docs/DEVICE_TODO.md sequentially, one process
# at a time (only one process may hold the tunneled TPU), tee-ing to
# /tmp/device_queue.log. Routing decisions (DEVICE_TODO step 2) and the
# final bench.py/voting_bench.py headline runs happen AFTER reading these
# results — don't add them here.
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/device_queue.log
: > "$LOG"
run() {
  echo "=== $* — $(date -u +%H:%M:%S) ===" | tee -a "$LOG"
  timeout 3600 "$@" 2>&1 | tee -a "$LOG"
  echo "=== exit $? ===" | tee -a "$LOG"
}
run python benchmarks/bitpack_probe.py --facade --stages sa1,sa2,sa3
run python benchmarks/bitpack_probe.py --stages sa1,sa2,sa3
run python benchmarks/train_sustained.py --superstep 8
run python benchmarks/serve_probe6.py
run python benchmarks/ckpt_device_probe.py
echo "QUEUE DONE $(date -u +%H:%M:%S)" | tee -a "$LOG"
