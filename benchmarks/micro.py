#!/usr/bin/env python
"""Kernel microbenchmarks: Pallas vs XLA for each hot op, at the shapes of
the four set-abstraction / feature-propagation stages.

Usage:  python benchmarks/micro.py [--json out.json]
Runs on the default backend (TPU under axon; falls back to CPU-interpreted
Pallas elsewhere, where timings are not meaningful but parity still checks).
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


def fence(x):
    float(jnp.sum(x[0] if isinstance(x, tuple) else x))


def timeit(f, iters=10):
    out = f()
    fence(out)  # compile + warm
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f()
    fence(out)
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", default=None)
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    from tumseg.ops import core as xla_ops
    from tumseg.ops.pallas import kernels as pk

    B = 32
    r = np.random.default_rng(0)
    results = []

    def record(name, shape, t_pallas, t_xla, parity):
        row = {"op": name, "shape": shape,
               "pallas_ms": round(t_pallas * 1e3, 3),
               "xla_ms": round(t_xla * 1e3, 3),
               "speedup": round(t_xla / max(t_pallas, 1e-12), 2),
               "parity": parity}
        results.append(row)
        print(json.dumps(row))

    # FPS + ball query at each SA stage
    stages = [(4096, 1024, 0.1), (1024, 256, 0.2), (256, 64, 0.4), (64, 16, 0.8)]
    for N, S, radius in stages:
        xyz = jnp.asarray(r.random((B, N, 3)), jnp.float32)
        fp = jax.jit(lambda p, S=S: pk.farthest_point_sample(p, S))
        fx = jax.jit(lambda p, S=S: xla_ops.farthest_point_sample(p, S))
        a, b = fp(xyz), fx(xyz)
        parity = float((np.asarray(a) == np.asarray(b)).mean())
        record("fps", f"B{B} N{N} S{S}", timeit(lambda: fp(xyz), args.iters),
               timeit(lambda: fx(xyz), args.iters), parity)

        new_xyz = xyz[:, :S]
        bp = jax.jit(lambda p, q, radius=radius: pk.query_ball_point(radius, 32, p, q))
        bx = jax.jit(lambda p, q, radius=radius: xla_ops.query_ball_point(radius, 32, p, q))
        a, b = bp(xyz, new_xyz), bx(xyz, new_xyz)
        parity = float((np.asarray(a) == np.asarray(b)).mean())
        record("ball_query", f"B{B} N{N} S{S} r{radius}",
               timeit(lambda: bp(xyz, new_xyz), args.iters),
               timeit(lambda: bx(xyz, new_xyz), args.iters), parity)

    # 3-NN at each FP stage (N queries, S sources)
    for N, S in [(4096, 1024), (1024, 256), (256, 64), (64, 16)]:
        q = jnp.asarray(r.random((B, N, 3)), jnp.float32)
        s = jnp.asarray(r.random((B, S, 3)), jnp.float32)
        tp = jax.jit(lambda a, b: pk.three_nn(a, b))
        tx = jax.jit(lambda a, b: xla_ops.three_nn(a, b))
        (pd, pi), (xd, xi) = tp(q, s), tx(q, s)
        parity = float((np.asarray(pi) == np.asarray(xi)).mean())
        record("three_nn", f"B{B} N{N} S{S}",
               timeit(lambda: tp(q, s), args.iters),
               timeit(lambda: tx(q, s), args.iters), parity)

    # grouping at sa1 scale
    N, S, K, D = 4096, 1024, 32, 9
    xyz = jnp.asarray(r.random((B, N, 3)), jnp.float32)
    feats = jnp.asarray(r.random((B, N, D)), jnp.float32)
    idx = jnp.asarray(r.integers(0, N, (B, S, K)), jnp.int32)
    center = jnp.asarray(r.random((B, S, 3)), jnp.float32)
    src = jnp.concatenate([xyz, feats], axis=-1)

    gp = jax.jit(lambda i, s_, c: pk.group_points(i, s_, c))

    def xla_group(i, x, f, c):
        gx = xla_ops.index_points(x, i) - c[:, :, None, :]
        return jnp.concatenate([gx, xla_ops.index_points(f, i)], axis=-1)

    gx_ = jax.jit(xla_group)
    a = gp(idx, src, center)
    b = gx_(idx, xyz, feats, center)
    parity = float(np.allclose(np.asarray(a), np.asarray(b), atol=1e-5))
    record("group_points", f"B{B} N{N} S{S} K{K} C{3+D}",
           timeit(lambda: gp(idx, src, center), args.iters),
           timeit(lambda: gx_(idx, xyz, feats, center), args.iters), parity)

    if args.json:
        with open(args.json, "w") as f:
            json.dump(results, f, indent=1)
        print(f"wrote {args.json}")


if __name__ == "__main__":
    main()
