#!/bin/bash
# Run the measurement half of docs/DEVICE_TODO.md sequentially, one process
# at a time (only one process may hold the tunneled TPU), tee-ing to
# /tmp/device_queue.log. Routing decisions (DEVICE_TODO step 2) and the
# routing-DEPENDENT headline runs (post-flip bench.py/voting_bench.py, the
# MSG row) happen AFTER reading these results — don't add those here;
# routing-independent rows (flagship warm-up, pointnet) are fine.
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
# Flagship headline FIRST: if the tunnel only stays up briefly, a fresh
# driver-parseable bench line + a warm compile cache for the driver's
# round-close bench run is worth more than any probe.
run env TUMSEG_BENCH_RETRY_WINDOW=0 python bench.py
run python benchmarks/bitpack_probe.py --facade --stages sa1,sa2,sa3
run python benchmarks/bitpack_probe.py --stages sa1,sa2,sa3
run python benchmarks/train_sustained.py --superstep 8
run python benchmarks/serve_probe6.py
run python benchmarks/ckpt_device_probe.py
# PointNet (encoder model) headline row — VERDICT r3 item 7. No ball
# query / 3-NN in this model, so it is independent of the routing
# decisions the probes above feed.
run env TUMSEG_BENCH_MODEL=pointnet_sem_seg TUMSEG_BENCH_RETRY_WINDOW=0 \
  python bench.py
echo "QUEUE DONE $(date -u +%H:%M:%S)" | tee -a "$LOG"
# Full kernel+parity suite ON HARDWARE — VERDICT r3 item 4 (weak #4).
# Last because remote compiles of the tests' small cache-cold shapes can
# take a long time; a timeout here must not cost the measurements above.
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
