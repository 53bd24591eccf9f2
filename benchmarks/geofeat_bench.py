#!/usr/bin/env python
"""Geometric-feature throughput: vectorized reduceat+closed-form path vs the
per-point-SVD loop it replaced (VERDICT r4 item 6).

Pure NumPy/SciPy on the host CPU — no TPU, no jax.

Fairness: the loop oracle queries the FULL cloud's cKDTree for each probe
point (an earlier version of this bench reused the test-suite oracle, which
builds its tree over the probe subset — ~100x sparser neighborhoods, i.e. a
different workload entirely). The loop is timed on a probe subset and
extrapolated linearly: both paths are O(N * mean_k) per point at fixed
density, so the per-point rate is scale-free. Tree builds sit OUTSIDE both
timed regions (the full-cloud build is done once and reused across radii;
geometric_features' own internal build, ~1% of its dense-radius time, stays
inside its number — slightly understating the vectorized rate).

The speedup is a function of the mean neighborhood size k:
- small k (sparse clouds / small radius): the loop is bound by per-point
  Python + small-array overhead (~60 us/pt) while the vectorized path runs
  at a few us/pt -> tens of x.
- large k (r=0.8 on dense tiles): BOTH paths are bound by the O(k)
  neighbor enumeration + moment math, so the gain compresses to single
  digits. The production answer at that density is the reference's own
  flow — voxel-downsample first, features on voxels, scatter back via the
  inverse map (features.attach_geofeatures, geofunction.py:158-170) —
  which divides k, not the constant.

Usage: python benchmarks/geofeat_bench.py [--n 200000] [--loop-n 1500]
                                          [--radii 0.2,0.8]
"""
import argparse
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from tumseg.data.features import geometric_features, pca_eigenvalues  # noqa: E402


def make_room(n, rng):
    """A facade-like room: two walls + ground + volumetric clutter. Density
    scales with n; at n=200K the r=0.8 neighborhoods are ~500 points, the
    size a voxel-downsampled TUM tile produces."""
    n_wall = n * 2 // 5
    w1 = np.stack([rng.uniform(0, 20, n_wall), 0.02 * rng.standard_normal(n_wall),
                   rng.uniform(0, 15, n_wall)], 1)
    w2 = np.stack([0.02 * rng.standard_normal(n_wall), rng.uniform(0, 20, n_wall),
                   rng.uniform(0, 15, n_wall)], 1)
    n_rest = n - 2 * n_wall
    ground = np.stack([rng.uniform(0, 20, n_rest), rng.uniform(0, 20, n_rest),
                       0.3 * rng.standard_normal(n_rest)], 1)
    return np.concatenate([w1, w2, ground])


def loop_oracle_rate(pts, tree, probe_idx, radius):
    """Per-point rate of the pre-vectorization loop (one tree query + one
    SVD per point, tumseg r4 features.py / geofunction.py:49-98 math),
    querying the FULL cloud's tree so neighborhoods match the real
    workload. ``tree`` is the prebuilt full-cloud cKDTree."""
    t0 = time.perf_counter()
    k_sum = 0
    for i in probe_idx:
        idx = tree.query_ball_point(pts[i], r=radius)
        k_sum += len(idx)
        if len(idx) > 1:
            np.maximum(pca_eigenvalues(pts[idx]), 0.0)
    dt = time.perf_counter() - t0
    return len(probe_idx) / dt, k_sum / len(probe_idx)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=200_000)
    ap.add_argument("--loop-n", type=int, default=1_500)
    ap.add_argument("--radii", default="0.2,0.8")
    args = ap.parse_args()
    rng = np.random.default_rng(0)
    pts = make_room(args.n, rng)
    probe = rng.choice(args.n, args.loop_n, replace=False)
    from scipy.spatial import cKDTree
    tree = cKDTree(pts)  # shared across radii; outside both timed regions

    for radius in (float(r) for r in args.radii.split(",")):
        t0 = time.perf_counter()
        geometric_features(pts, radius=radius)
        vec_s = time.perf_counter() - t0
        vec_rate = args.n / vec_s
        loop_rate, mean_k = loop_oracle_rate(pts, tree, probe, radius)
        print(f"r={radius}: mean_k={mean_k:,.0f}  "
              f"vectorized {vec_rate:,.0f} pts/s ({vec_s:.1f} s for "
              f"{args.n:,})  loop {loop_rate:,.0f} pts/s "
              f"(extrapolated {args.n / loop_rate / 60:.1f} min)  "
              f"speedup {vec_rate / loop_rate:.1f}x")


if __name__ == "__main__":
    main()
