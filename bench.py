#!/usr/bin/env python
"""Headline benchmark: PointNet++ semantic-segmentation inference throughput
(points/sec) on the default JAX backend (TPU under the driver).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "points/sec", "vs_baseline": R}

Methodology: the TPU in this image sits behind a tunnel where
block_until_ready() does not reliably block, and the *first* host readback
pays a large one-time connection warmup. Since a device executes enqueued
programs in order, we time N dispatches followed by a single scalar readback
(steady-state readback latency is measured and subtracted).

Outage handling: the axon tunnel goes down for hours at a time and backend
init then either HANGS (observed 2026-08-17) or RAISES UNAVAILABLE
(observed at the round-3 close, BENCH_r03.json rc=1). Both must still
produce one parseable JSON line with rc=0, so the measurement runs in a
CHILD process (TUMSEG_BENCH_CHILD=1) while the parent retries failed
attempts inside a bounded window (TUMSEG_BENCH_RETRY_WINDOW, default 900 s)
and emits a zero-value JSON line with an "error" field if every attempt
fails. A hang inside the child is bounded twice: by the child's own init
watchdog (TUMSEG_BENCH_INIT_TIMEOUT) and by the parent's per-attempt
timeout (TUMSEG_BENCH_ATTEMPT_TIMEOUT).

vs_baseline compares against the PyTorch reference running the same forward
(models/<model>.get_model(8,0).eval(), 4096 pts/block, 6 ch, CPU); the
flagship anchor is 7,649 points/sec for pointnet2_sem_seg measured
2026-08-16 in this container (see BASELINE.md). TUMSEG_BENCH_MODEL selects
the model (pointnet2_sem_seg | pointnet2_sem_seg_msg | pointnet_sem_seg);
the driver default stays the flagship pointnet2_sem_seg.
"""

import json
import os
import subprocess
import sys
import threading
import time

MODEL = os.environ.get("TUMSEG_BENCH_MODEL", "pointnet2_sem_seg")
METRIC = "%s_inference_points_per_sec" % MODEL

# Torch-reference-on-container-CPU anchors, same methodology for each
# (get_model(8,0).eval(), B=4 x 4096 pts x 6ch, mean of 3 iters after
# warmup; BASELINE.md). The reference has no MSG *model* module (only the
# PointNetSetAbstractionMsg layer, /root/reference/models/pointnet2_utils.py:205),
# so the MSG row anchors against the closest published workload, the SSG model.
_TORCH_CPU_ANCHORS = {
    "pointnet2_sem_seg": 7649.0,       # measured 2026-08-16
    "pointnet_sem_seg": 8787.7,        # measured 2026-08-18
    "pointnet2_sem_seg_msg": 7649.0,   # SSG anchor (no upstream MSG model)
}
TORCH_CPU_REFERENCE_POINTS_PER_SEC = _TORCH_CPU_ANCHORS.get(MODEL, 7649.0)


def _last_measured():
    """Provenance of the last live device measurement, from the
    machine-readable marker in BASELINE.md (kept next to the headline
    table). Lets a zero-value outage artifact still record honestly what
    the framework measured the last time the tunnel answered, instead of
    reading as 'the framework is broken'. Returns None if the marker is
    absent/unparseable (never raises: this runs on the failure path)."""
    try:
        path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "BASELINE.md")
        with open(path) as f:
            for line in f:
                if "last_measured:" in line:
                    payload = line.split("last_measured:", 1)[1]
                    payload = payload.rsplit("-->", 1)[0]
                    obj = json.loads(payload)
                    return obj.get(MODEL)
    except Exception:
        pass
    return None


def _error_line(msg):
    out = {
        "metric": METRIC,
        "value": 0.0,
        "unit": "points/sec",
        "vs_baseline": 0.0,
        "error": msg,
    }
    last = _last_measured()
    if last:
        out["last_measured"] = last
    return json.dumps(out)


# ---------------------------------------------------------------- child ---

def _arm_init_watchdog():
    """Bound the first device touch: backend init through the axon tunnel
    hangs forever when the tunnel is down (observed 2026-08-17/18). If the
    warmup (init + first compile + first readback — worst case ~5-10 min
    cold) hasn't completed within TUMSEG_BENCH_INIT_TIMEOUT seconds
    (default 1800), print an explicit zero-value JSON line so the parent
    records *why* instead of hanging."""
    seconds = float(os.environ.get("TUMSEG_BENCH_INIT_TIMEOUT", "1800"))
    done = threading.Event()

    def watch():
        if not done.wait(seconds):
            print(_error_line("device warmup exceeded %ds (tpu tunnel "
                              "unreachable?)" % int(seconds)), flush=True)
            os._exit(0)

    threading.Thread(target=watch, daemon=True).start()
    return done


def _child_main():
    import jax

    if os.environ.get("TUMSEG_BENCH_CPU") == "1":
        # cross-check mode (BASELINE.md "tumseg on the container CPU"):
        # must run before first backend use; the sitecustomize pre-import
        # pins jax_platforms=axon,cpu so plain env vars are ignored
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np

    # persistent compile cache: the tunneled remote-compile path is slow,
    # and repeated bench invocations hit identical HLO
    from tumseg.utils.cache import enable_compile_cache
    from tumseg import models

    enable_compile_cache()

    B = int(os.environ.get("TUMSEG_BENCH_B", "32"))
    N = int(os.environ.get("TUMSEG_BENCH_N", "4096"))
    iters = int(os.environ.get("TUMSEG_BENCH_ITERS", "30"))
    use_bf16 = os.environ.get("TUMSEG_BENCH_BF16", "1") == "1"

    # arm before the first backend touch (PRNGKey/init hang when the
    # tunnel is down, not just the first readback)
    warm = _arm_init_watchdog()

    if os.environ.get("TUMSEG_BENCH_FORCE_FAIL"):
        # outage simulation hook for tests/test_bench_outage.py: mimics the
        # exception seen at the round-3 close before any device is touched
        raise RuntimeError(
            "Unable to initialize backend 'axon': UNAVAILABLE (simulated)")
    if os.environ.get("TUMSEG_BENCH_FORCE_FAIL_RC1"):
        # rc!=0 outage whose stderr ENDS with a markerless hint line (real
        # jax init failures do this) — exercises the multi-line transient
        # classification in the parent
        sys.stderr.write(
            "RuntimeError: Unable to initialize backend 'axon': "
            "UNAVAILABLE (simulated)\n"
            "For more information see https://docs.jax.dev/errors\n")
        sys.exit(1)

    model = models.get_module(MODEL)
    variables = model.init(jax.random.PRNGKey(0), 8, 0)
    compute_dtype = jnp.bfloat16 if use_bf16 else None

    @jax.jit
    def forward(variables, x):
        logp, _, _ = model.apply(variables, x, training=False,
                                 compute_dtype=compute_dtype)
        return jnp.argmax(logp, axis=-1)

    x = jnp.asarray(np.random.default_rng(0).random((B, N, 6)),
                    dtype=jnp.float32)

    # compile + absorb the tunnel's one-time readback warmup
    out = forward(variables, x)
    float(jnp.sum(out))
    warm.set()
    # steady-state scalar readback latency
    t0 = time.perf_counter()
    float(jnp.sum(out))
    readback = time.perf_counter() - t0

    t0 = time.perf_counter()
    for _ in range(iters):
        out = forward(variables, x)
    float(jnp.sum(out))  # fences all queued programs
    per_iter = (time.perf_counter() - t0 - readback) / iters

    pps = B * N / per_iter
    print(json.dumps({
        "metric": METRIC,
        "value": round(pps, 1),
        "unit": "points/sec",
        "vs_baseline": round(pps / TORCH_CPU_REFERENCE_POINTS_PER_SEC, 2),
    }), flush=True)


# --------------------------------------------------------------- parent ---

def _parse_result(stdout):
    """Last parseable JSON line with our metric, or None."""
    for line in reversed(stdout.splitlines()):
        line = line.strip()
        if not line.startswith("{"):
            continue
        try:
            obj = json.loads(line)
        except ValueError:
            continue
        if obj.get("metric") == METRIC:
            return obj
    return None


# Error shapes worth retrying: outages/hangs of the tunneled backend.
# Anything else (bad TUMSEG_BENCH_MODEL, ImportError, a real bug) fails
# identically on every attempt — retrying it burns the whole window for
# an error that was certain on attempt 1.
_TRANSIENT_MARKERS = ("UNAVAILABLE", "unreachable", "DEADLINE",
                      "Unable to initialize backend", "failed to connect",
                      "Socket closed", "warmup exceeded",
                      "attempt exceeded", "not in the list of known "
                      "backends")


def _looks_transient(msg):
    return any(m in msg for m in _TRANSIENT_MARKERS)


def _parent_main():
    window = float(os.environ.get("TUMSEG_BENCH_RETRY_WINDOW", "900"))
    interval = float(os.environ.get("TUMSEG_BENCH_RETRY_INTERVAL", "60"))
    attempt_timeout = float(
        os.environ.get("TUMSEG_BENCH_ATTEMPT_TIMEOUT", "2400"))

    env = dict(os.environ, TUMSEG_BENCH_CHILD="1")
    deadline = time.monotonic() + window
    attempt = 0
    last_error = "no attempt ran"
    while True:
        attempt += 1
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__)],
                env=env, capture_output=True, text=True,
                timeout=attempt_timeout)
            if proc.stderr:
                sys.stderr.write(proc.stderr)
            result = _parse_result(proc.stdout)
            if result is not None and result.get("value", 0) > 0:
                print(json.dumps(result), flush=True)
                return
            if result is not None and result.get("error"):
                last_error = transient_probe = result["error"]
            elif proc.returncode != 0:
                tail = proc.stderr.strip().splitlines()
                last_error = ("child rc=%d: %s"
                              % (proc.returncode,
                                 tail[-1] if tail else "no stderr"))
                # Classify against the last ~20 stderr lines, not just the
                # one in last_error: real jax backend-init failures often
                # end with a hint/URL line that carries no marker, and
                # misclassifying an outage as deterministic skips the
                # whole retry window.
                transient_probe = "\n".join(tail[-20:])
            else:
                last_error = transient_probe = "child produced no result line"
            if not _looks_transient(transient_probe):
                break  # deterministic failure: every retry would repeat it
        except subprocess.TimeoutExpired:
            last_error = ("child attempt exceeded %ds (tpu tunnel "
                          "unreachable?)" % int(attempt_timeout))
        if time.monotonic() >= deadline:
            break
        sys.stderr.write("bench attempt %d failed (%s); retrying for up to "
                         "%.0fs more\n"
                         % (attempt, last_error,
                            deadline - time.monotonic()))
        time.sleep(min(interval, max(0.0, deadline - time.monotonic())))
    print(_error_line("%s (after %d attempt(s) over %.0fs retry window)"
                      % (last_error, attempt, window)), flush=True)


def main():
    if os.environ.get("TUMSEG_BENCH_CHILD") == "1":
        _child_main()
    else:
        _parent_main()


if __name__ == "__main__":
    main()
