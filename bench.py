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

vs_baseline compares against the PyTorch reference running the same forward
(models/pointnet2_sem_seg.get_model(8,0).eval(), 4096 pts/block, 6 ch, CPU):
7,649 points/sec measured 2026-08-16 in this container (see BASELINE.md).
"""

import json
import os
import threading
import time

import jax
import jax.numpy as jnp
import numpy as np

# persistent compile cache: the tunneled remote-compile path is slow, and
# repeated bench invocations hit identical HLO
from tumseg.utils.cache import enable_compile_cache  # noqa: E402

enable_compile_cache()

TORCH_CPU_REFERENCE_POINTS_PER_SEC = 7649.0  # measured anchor, BASELINE.md


def _arm_init_watchdog():
    """Bound the first device touch: backend init through the axon tunnel
    hangs forever when the tunnel is down (observed 2026-08-17/18). If the
    warmup (init + first compile + first readback — worst case ~5-10 min
    cold) hasn't completed within TUMSEG_BENCH_INIT_TIMEOUT seconds
    (default 1800), print an explicit zero-value JSON line so the driver
    records *why* instead of hanging its round-close run."""
    seconds = float(os.environ.get("TUMSEG_BENCH_INIT_TIMEOUT", "1800"))
    done = threading.Event()

    def watch():
        if not done.wait(seconds):
            print(json.dumps({
                "metric": "pointnet2_sem_seg_inference_points_per_sec",
                "value": 0.0,
                "unit": "points/sec",
                "vs_baseline": 0.0,
                "error": "device warmup exceeded %ds (tpu tunnel "
                         "unreachable?)" % int(seconds),
            }), flush=True)
            os._exit(0)

    threading.Thread(target=watch, daemon=True).start()
    return done


def main():
    from tumseg import models

    B = int(os.environ.get("TUMSEG_BENCH_B", "32"))
    N = int(os.environ.get("TUMSEG_BENCH_N", "4096"))
    iters = int(os.environ.get("TUMSEG_BENCH_ITERS", "30"))
    use_bf16 = os.environ.get("TUMSEG_BENCH_BF16", "1") == "1"

    # arm before the first backend touch (PRNGKey/init hang when the
    # tunnel is down, not just the first readback)
    warm = _arm_init_watchdog()

    model = models.get_module("pointnet2_sem_seg")
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
        "metric": "pointnet2_sem_seg_inference_points_per_sec",
        "value": round(pps, 1),
        "unit": "points/sec",
        "vs_baseline": round(pps / TORCH_CPU_REFERENCE_POINTS_PER_SEC, 2),
    }))


if __name__ == "__main__":
    main()
