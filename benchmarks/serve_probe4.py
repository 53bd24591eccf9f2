#!/usr/bin/env python
"""Round-3 vote-scan optimizations, measured in isolation:
(a) the packed single-key re-block shuffle vs the exact two-key sort;
(b) one bulk end-of-vote scatter (preds staged contiguously during the
    scan) vs the per-chunk flat scatter-add."""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax

from tumseg.utils.cache import enable_compile_cache

enable_compile_cache()

import jax.numpy as jnp
import numpy as np

REPS = 5


def fence(x):
    float(jnp.sum(jax.tree_util.tree_leaves(x)[0].astype(jnp.float32)))


def main():
    from tumseg import models
    from tumseg import ops as tumseg_ops
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

    (flat_base, starts_pos, counts_pos, cell_rank, offsets_pad,
     nb, nb_pad, nc, segments) = runner._grid_tensors(ds, 0)
    # cell_rank is a HOST array in the cached tuple (only the global-sort
    # fallback consumes it); upload once for the A/B
    cell_rank = jnp.asarray(cell_rank)
    sx, se, cm, cmask = runner._scene_tensors(ds, 0)
    n_pad = int(sx.shape[0])
    fwd_feat = runner._forward_featurized_fn
    bs, C = 32, 8
    print(json.dumps({"nb": nb, "nb_pad": nb_pad, "nc": nc}), flush=True)

    # --- (a) global composite-key sort vs per-cell-row segmented sorts ------
    # (the packed single-key experiment this section originally measured was
    # a wash and is reverted; the segmented minor-axis shuffle replaced the
    # global sort as the production path in round 3)
    for name, segs, crank in [("reblock_sort_global", None, cell_rank),
                              ("reblock_sort_segmented", segments, None)]:
        @jax.jit
        def rb(key, segs=segs, crank=crank):
            return _reblock_on_device(key, flat_base, starts_pos, counts_pos,
                                      crank, 4096, segs)

        out = rb(jax.random.PRNGKey(0))
        fence(out)
        t0 = time.perf_counter()
        for i in range(REPS):
            out = rb(jax.random.fold_in(jax.random.PRNGKey(1), i))
        fence(out)
        print(json.dumps({"phase": name, "ms_per_vote": round(
            (time.perf_counter() - t0) / REPS * 1e3, 1)}), flush=True)

    idx = _reblock_on_device(jax.random.PRNGKey(7), flat_base, starts_pos,
                             counts_pos, None, 4096, segments)
    idxp = jnp.pad(idx, ((0, nb_pad - nb), (0, 0)), constant_values=n_pad)
    offs = offsets_pad
    nchunks = nb_pad // bs

    def time_vote(name, run, pool0):
        out = run(pool0())
        fence(out)
        t0 = time.perf_counter()
        pool = pool0()
        for _ in range(REPS):
            pool = run(pool)
        fence(pool)
        print(json.dumps({"phase": name, "ms_per_vote": round(
            (time.perf_counter() - t0) / REPS * 1e3, 1)}), flush=True)

    with tumseg_ops.window_enabled(True):
        # baseline: per-chunk flat scatter (production body)
        def body_chunk(pool, chunk):
            i, o = chunk

            def run(p):
                pred = fwd_feat(variables, sx, se, cm, cmask,
                                jnp.minimum(i, n_pad - 1), o, 1.0)
                return p.at[i.reshape(-1) * C + pred.reshape(-1)].add(1.0)

            all_dummy = jnp.min(i) >= n_pad
            return jax.lax.cond(all_dummy, lambda p: p, run, pool), None

        @jax.jit
        def scan_chunk_scatter(pool):
            p, _ = jax.lax.scan(body_chunk, pool,
                                (idxp.reshape(nchunks, bs, -1),
                                 offs.reshape(nchunks, bs, 2)))
            return p

        time_vote("scan_per_chunk_scatter", scan_chunk_scatter,
                  lambda: jnp.zeros(((n_pad + 1) * C,), jnp.float32))

        # bulk: stage preds contiguously in the scan carry, ONE scatter after
        def body_stage(carry, chunk):
            preds_all, step = carry
            i, o = chunk

            def run(_):
                return fwd_feat(variables, sx, se, cm, cmask,
                                jnp.minimum(i, n_pad - 1), o, 1.0)

            all_dummy = jnp.min(i) >= n_pad
            pred = jax.lax.cond(all_dummy,
                                lambda _: jnp.zeros((bs, 4096), jnp.int32),
                                run, None)
            preds_all = jax.lax.dynamic_update_index_in_dim(
                preds_all, pred.reshape(-1), step * (bs * 4096), axis=0)
            return (preds_all, step + 1), None

        @jax.jit
        def scan_bulk_scatter(pool):
            preds_all = jnp.zeros((nb_pad * 4096,), jnp.int32)
            (preds_all, _), _ = jax.lax.scan(
                body_stage, (preds_all, 0),
                (idxp.reshape(nchunks, bs, -1),
                 offs.reshape(nchunks, bs, 2)))
            return pool.at[idxp.reshape(-1) * C + preds_all].add(1.0)

        time_vote("scan_bulk_scatter", scan_bulk_scatter,
                  lambda: jnp.zeros(((n_pad + 1) * C,), jnp.float32))


if __name__ == "__main__":
    main()
