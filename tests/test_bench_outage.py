"""bench.py must survive a TPU-tunnel outage: when backend init *raises*
(the round-3 failure mode — BENCH_r03.json recorded rc=1 with a raw
UNAVAILABLE traceback), the driver command must still get rc=0 and one
parseable JSON line with an error field.

The outage is simulated via TUMSEG_BENCH_FORCE_FAIL=1, which makes the
child raise the exact RuntimeError the axon backend raised, before any
device is touched (so this test runs without a TPU)."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BENCH = os.path.join(REPO, "bench.py")


def _run_bench(extra_env):
    env = dict(os.environ, **extra_env)
    return subprocess.run([sys.executable, BENCH], env=env,
                          capture_output=True, text=True, timeout=300)


def _last_json_line(stdout):
    lines = [ln for ln in stdout.splitlines() if ln.strip().startswith("{")]
    assert lines, "no JSON line in bench stdout: %r" % stdout
    return json.loads(lines[-1])


def test_backend_init_exception_yields_rc0_and_json():
    proc = _run_bench({
        "TUMSEG_BENCH_FORCE_FAIL": "1",
        "TUMSEG_BENCH_RETRY_WINDOW": "0",  # single attempt, no waiting
    })
    assert proc.returncode == 0, proc.stderr[-2000:]
    obj = _last_json_line(proc.stdout)
    assert obj["metric"] == "pointnet2_sem_seg_inference_points_per_sec"
    assert obj["value"] == 0.0
    assert obj["unit"] == "points/sec"
    assert "UNAVAILABLE" in obj["error"]
    # outage provenance (VERDICT r4 item 4): a failed artifact still records
    # the last live measurement from BASELINE.md's machine-readable marker
    last = obj["last_measured"]
    assert last["value"] > 1e6
    assert last["unit"] == "points/sec"
    assert last["date"] and last["commit"]


def test_last_measured_absent_for_models_without_marker_row():
    # the marker carries the models with banked device rows (flagship,
    # pointnet, MSG as of 2026-08-19); others' error lines must simply omit
    # the field rather than inherit the wrong provenance
    proc = _run_bench({
        "TUMSEG_BENCH_MODEL": "pointnet2_sem_seg_original",
        "TUMSEG_BENCH_FORCE_FAIL": "1",
        "TUMSEG_BENCH_RETRY_WINDOW": "0",
    })
    assert proc.returncode == 0, proc.stderr[-2000:]
    obj = _last_json_line(proc.stdout)
    assert obj["value"] == 0.0
    assert "last_measured" not in obj


def test_transient_marker_matched_beyond_last_stderr_line():
    # ADVICE r4: a child that dies rc!=0 with the UNAVAILABLE marker NOT on
    # the final stderr line (real jax failures end with a hint/URL line)
    # must still be classified transient and retried
    proc = _run_bench({
        "TUMSEG_BENCH_FORCE_FAIL_RC1": "1",
        "TUMSEG_BENCH_RETRY_WINDOW": "12",
        "TUMSEG_BENCH_RETRY_INTERVAL": "0.1",
    })
    assert proc.returncode == 0, proc.stderr[-2000:]
    obj = _last_json_line(proc.stdout)
    assert obj["value"] == 0.0
    n = int(obj["error"].split("after ")[1].split(" attempt")[0])
    assert n >= 2, "outage misclassified as deterministic: %s" % obj["error"]


def test_deterministic_failure_breaks_retry_loop_immediately():
    # a typo'd model name fails identically on every attempt — the parent
    # must emit the error line after ONE attempt, not burn the window
    proc = _run_bench({
        "TUMSEG_BENCH_MODEL": "pointnet2_semseg_typo",
        "TUMSEG_BENCH_RETRY_WINDOW": "600",
        "TUMSEG_BENCH_RETRY_INTERVAL": "0.1",
    })
    assert proc.returncode == 0, proc.stderr[-2000:]
    obj = _last_json_line(proc.stdout)
    assert obj["value"] == 0.0
    n = int(obj["error"].split("after ")[1].split(" attempt")[0])
    assert n == 1, obj["error"]


def test_retry_window_runs_multiple_attempts():
    proc = _run_bench({
        "TUMSEG_BENCH_FORCE_FAIL": "1",
        "TUMSEG_BENCH_RETRY_WINDOW": "12",
        "TUMSEG_BENCH_RETRY_INTERVAL": "0.1",
    })
    assert proc.returncode == 0, proc.stderr[-2000:]
    obj = _last_json_line(proc.stdout)
    assert obj["value"] == 0.0
    # "(after N attempt(s) ...)" with N >= 2 proves the retry loop engaged
    n = int(obj["error"].split("after ")[1].split(" attempt")[0])
    assert n >= 2, obj["error"]
    assert "retrying" in proc.stderr
