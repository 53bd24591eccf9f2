#!/usr/bin/env python
"""Split the vote-scan's non-forward cost: featurize takes vs gt-gate
labels gather vs vote scatter."""

from __future__ import annotations

import json
import sys
import time
from functools import partial

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax

from tumseg.utils.cache import enable_compile_cache

enable_compile_cache()

import jax.numpy as jnp
import numpy as np


def fence(x):
    float(jnp.sum(jax.tree_util.tree_leaves(x)[0].astype(jnp.float32)))


def main():
    from tumseg import models
    from tumseg.data.dataset import TestGridDataset
    from tumseg.infer.voting import InferenceRunner, _reblock_on_device

    r = np.random.default_rng(0)
    n = 1_000_000
    xyz = np.stack([r.uniform(0, 20, n), r.uniform(0, 4, n),
                    r.uniform(0, 12, n)], 1)
    ds = TestGridDataset(num_classes=8, block_points=4096, seed=0)
    ds.scene_points_list = [xyz]
    ds.semantic_labels_list = [r.integers(0, 8, n)]
    ds.file_list = ["s.las"]
    ds.labelweights = np.ones(8, dtype=np.float32)

    model = models.get_module("pointnet2_sem_seg")
    variables = model.init(jax.random.PRNGKey(0), 8, 0)
    runner = InferenceRunner(model, variables, num_classes=8, batch_size=32,
                             compute_dtype=jnp.bfloat16,
                             device_features=True, device_reblock=True)
    runner.infer_scene(ds, 0, num_votes=1)  # warm

    (flat_base, starts_pos, counts_pos, cell_rank, offsets_pad,
     nb, nb_pad, nc, segments) = runner._grid_tensors(ds, 0)
    labels = jnp.asarray(ds.semantic_labels_list[0].astype(np.int32))
    lw = jnp.asarray(ds.labelweights)
    sx, se, cm, cmask = runner._scene_tensors(ds, 0)
    fwd_feat = runner._forward_featurized_fn
    bs = 32

    idx = _reblock_on_device(jax.random.PRNGKey(7), flat_base, starts_pos,
                             counts_pos, None, 4096, segments)
    n_pad = int(sx.shape[0])
    idxp = jnp.pad(idx, ((0, nb_pad - nb), (0, 0)), constant_values=n_pad)

    def scan_over(body):
        @jax.jit
        def run(pool):
            nchunks = idxp.shape[0] // bs
            pool, _ = jax.lax.scan(
                body, pool, (idxp.reshape(nchunks, bs, -1),
                             offsets_pad.reshape(nchunks, bs, 2)))
            return pool
        return run

    def time_it(name, run):
        pool = jnp.zeros((n_pad + 1, 8), jnp.float32)
        out = run(pool)
        fence(out)
        pool = jnp.zeros((n_pad + 1, 8), jnp.float32)
        t0 = time.perf_counter()
        for _ in range(5):
            pool = run(pool)
        fence(pool)
        ms = (time.perf_counter() - t0) / 5 * 1e3
        print(json.dumps({"name": name, "ms_per_vote": round(ms, 1)}),
              flush=True)

    # (a) forward only: fold preds into pool[0] additively (no scatter)
    def body_fwd(pool, chunk):
        i, o = chunk
        pred = fwd_feat(variables, sx, se, cm, cmask,
                        jnp.minimum(i, sx.shape[0] - 1), o, 1.0)
        return pool.at[0, 0].add(jnp.sum(pred).astype(pool.dtype)), None

    time_it("scan forward only", scan_over(body_fwd))

    # (b) + scatter, no gate
    def body_scatter(pool, chunk):
        i, o = chunk
        pred = fwd_feat(variables, sx, se, cm, cmask,
                        jnp.minimum(i, sx.shape[0] - 1), o, 1.0)
        pool = pool.at[i.reshape(-1), pred.reshape(-1)].add(1.0)
        return pool, None

    time_it("scan forward+scatter", scan_over(body_scatter))

    # (c) + gt gate labels gather
    def body_full(pool, chunk):
        i, o = chunk
        pred = fwd_feat(variables, sx, se, cm, cmask,
                        jnp.minimum(i, sx.shape[0] - 1), o, 1.0)
        smpw = lw[labels[i]]
        keep = ((smpw != 0) & ~jnp.isinf(smpw)).reshape(-1)
        pool = pool.at[i.reshape(-1), pred.reshape(-1)].add(
            keep.astype(pool.dtype))
        return pool, None

    time_it("scan forward+scatter+gate", scan_over(body_full))

    # (d) flat 1-D scatter into [N*8] (reshaped at the end)
    def scan_flat(body):
        @jax.jit
        def run(poolf):
            nchunks = idxp.shape[0] // bs
            poolf, _ = jax.lax.scan(
                body, poolf, (idxp.reshape(nchunks, bs, -1),
                              offsets_pad.reshape(nchunks, bs, 2)))
            return poolf
        return run

    def body_flat(poolf, chunk):
        i, o = chunk
        pred = fwd_feat(variables, sx, se, cm, cmask,
                        jnp.minimum(i, sx.shape[0] - 1), o, 1.0)
        flat = i.reshape(-1) * 8 + pred.reshape(-1)
        poolf = poolf.at[flat].add(1.0)
        return poolf, None

    run = scan_flat(body_flat)
    poolf = jnp.zeros((n * 8,), jnp.float32)
    out = run(poolf)
    fence(out)
    poolf = jnp.zeros((n * 8,), jnp.float32)
    t0 = time.perf_counter()
    for _ in range(5):
        poolf = run(poolf)
    fence(poolf)
    print(json.dumps({"name": "scan forward+flat-scatter",
                      "ms_per_vote": round((time.perf_counter() - t0) / 5 * 1e3,
                                           1)}), flush=True)


if __name__ == "__main__":
    main()
