#!/usr/bin/env python
"""Device-time probe: bit-packed-peel ball query vs the transposed/windowed
kernels, with on-device bit-parity checks.

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
    ap.add_argument("--facade", action="store_true",
                    help="facade-block geometry (1m x 1m xy, 12m z) instead "
                         "of the uniform cube")
    ap.add_argument("--stages", default="sa1,sa2,sa3")
    args = ap.parse_args()

    from tumseg.ops.pallas import ballquery as bq

    shapes = {
        # B, N, S, K, radius — the SSG model's stage shapes, plus the MSG
        # sa1 small-radius branch (the other MSG branches share SSG shapes)
        "sa1": (32, 4096, 1024, 32, 0.1),
        "sa2": (32, 1024, 256, 32, 0.2),
        "sa3": (32, 256, 64, 32, 0.4),
        "msg1a": (32, 4096, 1024, 16, 0.05),
    }

    bench = Bench(args.iters, args.chain)
    r = np.random.default_rng(0)

    def eff(two_level, N):
        # label rows with what actually executed: the kernel's own gate
        # (ballquery.bp2_engages) is the single source of truth
        return "bp2" if (two_level and bq.bp2_engages(N)) else "bp"

    for stage in args.stages.split(","):
        B, N, S, K, radius = shapes[stage]
        xyz = np.asarray(r.random((B, N, 3)), np.float32)
        if args.facade:
            xyz = xyz * np.asarray([1.0, 1.0, 12.0], np.float32)
        xyz = jnp.asarray(xyz)
        q = xyz[:, :S, :]

        # parity first (one warm dispatch each): bp must be bit-identical
        # to the transposed kernel — identical f32 distance rounding
        ref = bq.query_ball_point_t(radius, K, xyz, q)
        got = bq.query_ball_point_bp(radius, K, xyz, q)
        eq = float(jnp.mean((ref == got).astype(jnp.float32)))
        print(json.dumps({"name": f"parity bp==t {stage}", "frac": eq}),
              flush=True)

        bench.run(f"bq_t {stage}",
                  lambda p, radius=radius, K=K, S=S: bq.query_ball_point_t(
                      radius, K, p, p[:, :S]), xyz)
        # clamp s_tile to S (query_ball_point_bp does the same) so small-S
        # stages like sa3 (S=64) still get bp rows instead of being
        # silently dropped from the A/B
        for st in sorted({min(st, S) for st in (128, 256)}):
            bench.run(
                f"bq_bp {stage} st{st}",
                lambda p, radius=radius, K=K, S=S, st=st:
                bq.query_ball_point_bp(radius, K, p, p[:, :S], st), xyz)
            if N >= 1024:
                bench.run(
                    f"bq_bp2 {stage} st{st} eff={eff(True, N)}",
                    lambda p, radius=radius, K=K, S=S, st=st:
                    bq.query_ball_point_bp(radius, K, p, p[:, :S], st, True),
                    xyz)
        if stage == "sa1":
            bench.run(
                f"bq_row {stage}",
                lambda p, radius=radius, K=K, S=S: bq.query_ball_point(
                    radius, K, p, p[:, :S]), xyz)
            bench.run(
                f"bq_window(768,1024,2048) {stage}",
                lambda p, radius=radius, K=K, S=S:
                bq.query_ball_point_windowed(radius, K, p, p[:, :S],
                                             (768, 1024, 2048)), xyz)

    # fused multi-radius kernel at the MSG stage shapes (one distance
    # build shared across the radius list) vs two separate bp calls
    msg_shapes = {
        "msg_sa1": (32, 4096, 1024, (0.05, 0.1), (16, 32)),
        "msg_sa2": (32, 1024, 256, (0.1, 0.2), (16, 32)),
    }
    for name, (B, N, S, radii, Ks) in msg_shapes.items():
        xyz = np.asarray(r.random((B, N, 3)), np.float32)
        if args.facade:
            xyz = xyz * np.asarray([1.0, 1.0, 12.0], np.float32)
        xyz = jnp.asarray(xyz)
        q = xyz[:, :S, :]
        for tl in (False, True):
            tag = eff(tl, N)
            ref = [bq.query_ball_point_bp(rad, K, xyz, q, 128, tl)
                   for rad, K in zip(radii, Ks)]
            got = bq.query_ball_point_bp_multi(radii, Ks, xyz, q, 128, tl)
            eq = min(float(jnp.mean((a == b).astype(jnp.float32)))
                     for a, b in zip(ref, got))
            print(json.dumps({"name": f"parity multi=={tag} {name}",
                              "frac": eq}), flush=True)
            # fold every radius's output into the chain dep so neither the
            # fused call nor the first of the separate calls can be DCE'd
            def _dep(outs):
                return sum(o[:, :, :1] for o in outs)

            bench.run(
                f"bq_{tag}_multi {name}",
                lambda p, radii=radii, Ks=Ks, S=S, tl=tl:
                _dep(bq.query_ball_point_bp_multi(radii, Ks, p, p[:, :S],
                                                  128, tl)), xyz)
            bench.run(
                f"bq_{tag}_2x {name}",
                lambda p, radii=radii, Ks=Ks, S=S, tl=tl:
                _dep([bq.query_ball_point_bp(rad, K, p, p[:, :S], 128, tl)
                      for rad, K in zip(radii, Ks)]), xyz)


if __name__ == "__main__":
    main()
