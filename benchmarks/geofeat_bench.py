#!/usr/bin/env python
"""Geometric-feature throughput: vectorized reduceat+closed-form path vs the
per-point-SVD loop it replaced (VERDICT r4 item 6).

Pure NumPy/SciPy on the host CPU — no TPU, no jax. The loop oracle is timed
on a subset and extrapolated linearly (both paths are O(N * mean_neighbors)
after the shared cKDTree build, so per-point rate is scale-free); running
the loop on the full million points would take ~an hour on this 1-core box.

Usage: python benchmarks/geofeat_bench.py [--n 1000000] [--loop-n 20000]
"""
import argparse
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from tumseg.data.features import geometric_features  # noqa: E402


def make_room(n, rng):
    """A facade-like room: two walls + ground + volumetric clutter, with
    realistic ~point-per-3cm density so radius-0.8 neighborhoods are the
    few-hundred-point size real TUM tiles produce."""
    n_wall = n * 2 // 5
    w1 = np.stack([rng.uniform(0, 20, n_wall), 0.02 * rng.standard_normal(n_wall),
                   rng.uniform(0, 15, n_wall)], 1)
    w2 = np.stack([0.02 * rng.standard_normal(n_wall), rng.uniform(0, 20, n_wall),
                   rng.uniform(0, 15, n_wall)], 1)
    n_rest = n - 2 * n_wall
    ground = np.stack([rng.uniform(0, 20, n_rest), rng.uniform(0, 20, n_rest),
                       0.3 * rng.standard_normal(n_rest)], 1)
    return np.concatenate([w1, w2, ground])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--loop-n", type=int, default=20_000)
    ap.add_argument("--radius", type=float, default=0.8)
    args = ap.parse_args()
    rng = np.random.default_rng(0)
    pts = make_room(args.n, rng)

    t0 = time.perf_counter()
    lp, lo, lc, non = geometric_features(pts, radius=args.radius)
    vec_s = time.perf_counter() - t0
    print(f"vectorized: {args.n} pts in {vec_s:.1f} s "
          f"({args.n / vec_s:,.0f} pts/s), non_index={len(non)}")

    # loop oracle on a subset of the SAME cloud (same density -> same
    # mean neighborhood size), extrapolated
    sub = pts[rng.choice(args.n, args.loop_n, replace=False)]
    from tests.test_features import _reference_geometric_features
    t0 = time.perf_counter()
    _reference_geometric_features(sub, args.radius)
    loop_s = time.perf_counter() - t0
    loop_rate = args.loop_n / loop_s
    print(f"per-point-SVD loop: {args.loop_n} pts in {loop_s:.1f} s "
          f"({loop_rate:,.0f} pts/s)")
    print(f"speedup at {args.n} pts: {args.n / vec_s / loop_rate:.1f}x "
          f"(extrapolated loop time {args.n / loop_rate / 60:.1f} min)")


if __name__ == "__main__":
    main()
