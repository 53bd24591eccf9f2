#!/bin/bash
# Probe the axon TPU tunnel until it answers, then (optionally) fire the
# pending device-measurement queue automatically.
#
#   nohup bash benchmarks/tpu_watch.sh &            # watch only
#   nohup bash benchmarks/tpu_watch.sh --queue &    # watch, then run
#                                                   #   run_device_queue.sh
#
# Appends probe results to /tmp/tpu_watch.log; the queue run tees to
# /tmp/device_queue.log (see run_device_queue.sh) and drops marker files
# /tmp/autoqueue.{running,done} so any session can see the state. The
# tunnel goes down for >8 h stretches (observed 2026-08-17/18); a downed
# tunnel makes the first backend touch HANG, hence the bounded probe.
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/tpu_watch.log
if [ "${1:-}" = "--queue" ]; then
  # stale markers from a previous run (incl. one killed mid-queue, which
  # leaves .running behind) would lie about the current state
  rm -f /tmp/autoqueue.done /tmp/autoqueue.out /tmp/autoqueue.running
fi
while true; do
  # Same STRICT probe as run_device_queue.sh: must see a NON-cpu device —
  # the sitecustomize pins jax_platforms=axon,cpu and a cpu-only fallback
  # would declare TPU UP, fire the queue, and every step would SKIP at its
  # own strict probe, consuming the one unattended recovery shot.
  if timeout 300 python -c "import jax; d=jax.devices(); assert any(x.platform != 'cpu' for x in d); print('TPU UP:', d)" \
      >>"$LOG" 2>/dev/null; then
    echo "TPU UP at $(date -u)" >>"$LOG"
    break
  fi
  echo "still down $(date -u +%H:%M:%S)" >>"$LOG"
  sleep 120
done
if [ "${1:-}" = "--queue" ]; then
  sleep 10   # let the probe process exit fully: one process holds the TPU
  touch /tmp/autoqueue.running
  bash benchmarks/run_device_queue.sh >/tmp/autoqueue.out 2>&1
  rm -f /tmp/autoqueue.running
  touch /tmp/autoqueue.done
fi
