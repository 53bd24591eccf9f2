#!/usr/bin/env python
"""End-to-end whole-scene voting throughput: host sliding-grid re-blocking +
sharded device forwards + device vote pooling, on a production-scale
synthetic facade. This is the serving-path number (the reference's
modelTesting loop), complementing bench.py's pure-forward number.

Usage: python benchmarks/voting_bench.py [--points 1000000] [--votes 2]
Prints one JSON line with scene points/sec (scene_points * votes / wall).
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
    ap.add_argument("--block_points", type=int, default=4096)
    args = ap.parse_args()

    from tumseg import models
    from tumseg.data.dataset import TestGridDataset
    from tumseg.infer.voting import InferenceRunner

    # facade-shaped scene: 20m x 4m x 12m, densities like TUM-Facade tiles
    r = np.random.default_rng(0)
    n = args.points
    xyz = np.stack([r.uniform(0, 20, n), r.uniform(0, 4, n),
                    r.uniform(0, 12, n)], 1)
    labels = r.integers(0, 8, n)

    ds = TestGridDataset(num_classes=8, block_points=args.block_points,
                         seed=0)
    ds.scene_points_list = [xyz]
    ds.semantic_labels_list = [labels]
    ds.file_list = ["synthetic_scene.las"]
    ds.labelweights = np.ones(8, dtype=np.float32)

    model = models.get_module("pointnet2_sem_seg")
    variables = model.init(jax.random.PRNGKey(0), 8, 0)
    runner = InferenceRunner(model, variables, num_classes=8,
                             batch_size=args.batch,
                             compute_dtype=jnp.bfloat16)

    # warm: compile + tunnel readback
    warm = runner.infer_scene(ds, 0, num_votes=1)
    assert warm.shape == (n,)

    t0 = time.perf_counter()
    pred = runner.infer_scene(ds, 0, num_votes=args.votes)
    wall = time.perf_counter() - t0
    pps = n * args.votes / wall

    # host-side costs per vote, for the bottleneck split: the device path
    # only needs grid_indices (featurization happens on device)
    t0 = time.perf_counter()
    idx_blocks, _ = ds.grid_indices(0)
    host_grid_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    _ = ds[0]
    host_featurize_s = time.perf_counter() - t0

    print(json.dumps({
        "metric": "whole_scene_voting_points_per_sec",
        "scene_points": n,
        "votes": args.votes,
        "block_batches": int(np.ceil(idx_blocks.shape[0] / args.batch)),
        "blocks_per_vote": int(idx_blocks.shape[0]),
        "wall_s": round(wall, 2),
        "host_grid_s_per_vote": round(host_grid_s, 2),
        "host_full_featurize_s_per_vote": round(host_featurize_s, 2),
        "device_features": runner.device_features,
        "device_reblock": runner.device_reblock,
        "value": round(pps, 1),
    }))


if __name__ == "__main__":
    main()
