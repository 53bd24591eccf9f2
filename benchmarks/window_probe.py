#!/usr/bin/env python
"""Device-time probe: z-window pruned ball query vs the full kernel.

Chained-in-jit methodology (see breakdown.py) so numbers are pure device
time, not tunnel dispatch latency.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax

from tumseg.utils.cache import enable_compile_cache

enable_compile_cache()

import jax.numpy as jnp
import numpy as np

from benchmarks.breakdown import Bench


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--chain", type=int, default=20)
    ap.add_argument("--windows", default="1024,1536,2048")
    ap.add_argument("--s_tiles", default="128")
    ap.add_argument("--facade", action="store_true",
                    help="facade-block geometry (1m x 1m xy, 12m z — the "
                         "serving scan's shape) instead of the uniform cube")
    args = ap.parse_args()

    from tumseg.ops.pallas import ballquery as bq

    B, N, S, K, radius = 32, 4096, 1024, 32, 0.1
    r = np.random.default_rng(0)
    xyz = jnp.asarray(r.random((B, N, 3)), jnp.float32)
    if args.facade:
        xyz = xyz * jnp.asarray([1.0, 1.0, 12.0], jnp.float32)
    q = xyz[:, :S, :]

    bench = Bench(args.iters, args.chain)

    bench.run("bq_full sa1", lambda p: bq.query_ball_point(radius, K, p,
                                                           p[:, :S]), xyz)
    for C in [int(c) for c in args.windows.split(",")]:
        for st in [int(s) for s in args.s_tiles.split(",")]:
            bench.run(
                f"bq_window C{C} st{st}",
                lambda p, C=C, st=st: bq.query_ball_point_windowed(
                    radius, K, p, p[:, :S], C, st), xyz)

    # glue-only: sorts + boundary-only compare_all searchsorted — the
    # kernel's ACTUAL glue (2T probes; the original full-S binary-search
    # version measured 9.1 ms of pure gather latency and motivated both
    # fixes)
    def glue(p):
        import functools

        qq = p[:, :S, :]
        zs, order, xs, ys = bq._sort_with_payload(
            p[:, :, 2], p[:, :, 0], p[:, :, 1])
        qzs, qorder, qxs, qys = bq._sort_with_payload(
            qq[:, :, 2], qq[:, :, 0], qq[:, :, 1])
        ss = functools.partial(jnp.searchsorted, method="compare_all")
        s_tile = 128
        lo = jax.vmap(functools.partial(ss, side="left"))(
            zs, qzs[:, ::s_tile] - radius)
        hi = jax.vmap(functools.partial(ss, side="right"))(
            zs, qzs[:, s_tile - 1::s_tile] + radius)
        return (jnp.stack([xs, ys, zs], 1).sum() + qxs.sum() + qys.sum()
                + (lo + hi).sum().astype(jnp.float32)
                + (order.sum() + qorder.sum()).astype(jnp.float32))

    bench.run("bq_window_glue_only", glue, xyz)

    # ---- 3-NN (fp1 shape: N=4096 queries over S=1024 sources) ----
    from tumseg.ops.pallas import threenn as tn

    src = xyz[:, :1024, :]
    bench.run("3nn_full fp1",
              lambda p: tn._three_nn_impl(p, p[:, :1024, :])[0], xyz)
    for C in (256, 384, 512):
        bench.run(
            f"3nn_window C{C} nt256",
            lambda p, C=C: tn._three_nn_windowed_impl(
                p, p[:, :1024, :], C, 256)[0], xyz)

    # correctness on device (windowed vs full, real TPU compile)
    want = np.asarray(bq.query_ball_point(radius, K, xyz, q))
    got = np.asarray(bq.query_ball_point_windowed(radius, K, xyz, q))
    print(json.dumps({"name": "bq_device_parity",
                      "equal": bool(np.array_equal(want, got))}))
    wd, wi = tn._three_nn_windowed_impl(xyz, src, 384, 256)
    fd, fi = tn._three_nn_impl(xyz, src)
    print(json.dumps({
        "name": "3nn_device_parity",
        "idx_equal": bool(np.array_equal(np.asarray(wi), np.asarray(fi))),
        "dist_max_err": float(np.abs(np.asarray(wd) - np.asarray(fd)).max()),
    }))


if __name__ == "__main__":
    main()
