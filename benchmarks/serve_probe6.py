#!/usr/bin/env python
"""A/B the vote-accumulation lowering inside the serving scan (DESIGN.md 2b).

Three pool-identical modes (tests/test_voting.py pins equality):
  scan — per-chunk flat scatter-add carried through the lax.scan
         (r2/r3 configuration; the scatter was ~47 ms of a ~510 ms vote)
  sort — scan outputs predictions; ONE post-scan sort of the flat
         (idx*C+pred) keys + run-count scatter with UNIQUE in-range
         indices (no duplicate-index serialization)
  bulk — scan outputs predictions; ONE post-scan scatter-add over all
         keys (fewer, bigger scatter ops)

Usage: python benchmarks/serve_probe6.py [--points 1000000] [--votes 2]
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--points", type=int, default=1_000_000)
    ap.add_argument("--votes", type=int, default=2)
    ap.add_argument("--batch", type=int, default=32)
    args = ap.parse_args()

    from tumseg import models
    from tumseg.data.dataset import TestGridDataset
    from tumseg.infer.voting import InferenceRunner

    r = np.random.default_rng(0)
    n = args.points
    xyz = np.stack([r.uniform(0, 20, n), r.uniform(0, 4, n),
                    r.uniform(0, 12, n)], 1)
    labels = r.integers(0, 8, n)

    ds = TestGridDataset(num_classes=8, block_points=4096, seed=0)
    ds.scene_points_list = [xyz]
    ds.semantic_labels_list = [labels]
    ds.file_list = ["synthetic_scene.las"]
    ds.labelweights = np.ones(8, dtype=np.float32)

    model = models.get_module("pointnet2_sem_seg")
    variables = model.init(jax.random.PRNGKey(0), 8, 0)

    preds = {}
    for mode in ("scan", "sort", "bulk"):
        runner = InferenceRunner(model, variables, num_classes=8,
                                 batch_size=args.batch,
                                 compute_dtype=jnp.bfloat16)
        runner.vote_scatter = mode
        warm = runner.infer_scene(ds, 0, num_votes=1)
        assert warm.shape == (n,)
        t0 = time.perf_counter()
        preds[mode] = runner.infer_scene(ds, 0, num_votes=args.votes)
        wall = time.perf_counter() - t0
        print(json.dumps({"name": f"vote_scatter={mode}",
                          "wall_s": round(wall, 3),
                          "scene_pts_per_s":
                              round(n * args.votes / wall, 1)}), flush=True)
    # same runner seed => same re-blocking => predictions must MATCH
    print(json.dumps({"name": "pred_parity", "equal": bool(
        np.array_equal(preds["scan"], preds["sort"])
        and np.array_equal(preds["scan"], preds["bulk"]))}))


if __name__ == "__main__":
    main()
