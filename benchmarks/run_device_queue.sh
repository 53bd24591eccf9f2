#!/bin/bash
# Run the measurement half of docs/DEVICE_TODO.md sequentially, one process
# at a time (only one process may hold the tunneled TPU), tee-ing to
# /tmp/device_queue.log.
#
# r5 PHASE 2 queue (the 02:42-03:49 window banked the probes and flipped the
# routing — commit 09e21f6): re-measure the routing-DEPENDENT headlines with
# the new defaults (bp2 at sa2/sa3 + bp2 window fallback, MSG fused multi,
# superstep 8), then re-run the hardware suite to confirm the 7d456a7 fixes
# (s_tile lane legalization, matmul-precision fixture) on real Mosaic.
#
# Outage hardening: the axon tunnel flaps for hours at a time and a downed
# tunnel makes backend init HANG (not fail). Each step therefore only runs
# after a cheap bounded probe confirms the tunnel answers; if the tunnel
# drops mid-queue, the remaining steps are skipped in seconds instead of
# each burning its full timeout. Probe compiles nothing (device_count only).
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/device_queue.log
: > "$LOG"
probe() {
  # Must see a NON-cpu device: the sitecustomize pins jax_platforms=axon,cpu
  # and a cpu-only fallback would wave the queue through with no TPU.
  timeout "${TUMSEG_QUEUE_PROBE_TIMEOUT:-300}" python - <<'EOF' >/dev/null 2>&1
import jax
assert any(d.platform != "cpu" for d in jax.devices())
EOF
}
run() {
  if ! probe; then
    echo "=== SKIP (tunnel down at probe): $* — $(date -u +%H:%M:%S) ===" \
      | tee -a "$LOG"
    return 1
  fi
  echo "=== $* — $(date -u +%H:%M:%S) ===" | tee -a "$LOG"
  timeout 3600 "$@" 2>&1 | tee -a "$LOG"
  # PIPESTATUS[0], not $?: the pipeline's $? is tee's (always 0), which
  # would log timeouts/crashes as success in the unattended-run log
  echo "=== exit ${PIPESTATUS[0]} ===" | tee -a "$LOG"
}
# Flagship headline FIRST with the NEW routing: the 02:42 bench (13.45M)
# predates the flips; this run both banks the post-flip number and warms the
# compile cache for the driver's round-close bench. New executables (bp2 in
# the forward) mean remote compiles on the first run — the 3600 s timeout
# covers them.
run env TUMSEG_BENCH_RETRY_WINDOW=0 python bench.py
# MSG headline with the fused multi-radius default (DEVICE_TODO step 8 /
# VERDICT r3 item 3: target <=12 ms from 15.0).
run env TUMSEG_BENCH_MODEL=pointnet2_sem_seg_msg TUMSEG_BENCH_RETRY_WINDOW=0 \
  python bench.py
# Serving headline with the new ball-query routing inside the vote scan.
run python benchmarks/voting_bench.py
# Flagship once more (now warm end-to-end) so the LAST pre-driver number in
# the log is the steady-state one.
run env TUMSEG_BENCH_RETRY_WINDOW=0 python bench.py
echo "QUEUE DONE $(date -u +%H:%M:%S)" | tee -a "$LOG"
# Hardware suite re-run: 03:33 run failed 10 tests; 7d456a7 fixed them
# (verified in interpret mode) — confirm on real Mosaic lowering. Last
# because cache-cold remote compiles of the tests' small shapes are slow;
# a timeout here must not cost the measurements above.
if probe; then
  echo "=== TPU suite — $(date -u +%H:%M:%S) ===" | tee -a "$LOG"
  timeout 7200 env TUMSEG_TEST_TPU=1 \
    python -m pytest tests/test_pallas_ops.py tests/test_parity_torch.py -q \
    2>&1 | tee -a "$LOG"
  # PIPESTATUS[0], not $? (tee's status, always 0) — same fix as run()
  echo "=== TPU suite exit ${PIPESTATUS[0]} — $(date -u +%H:%M:%S) ===" | tee -a "$LOG"
else
  echo "=== SKIP TPU suite (tunnel down at probe) ===" | tee -a "$LOG"
fi
