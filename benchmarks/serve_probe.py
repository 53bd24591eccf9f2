#!/usr/bin/env python
"""Per-vote cost split of the device re-blocking serving path, and the
effect of z-window extraction kernels (TUMSEG_OPS_WINDOW) on it."""

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


def fence(x):
    float(jnp.sum(jax.tree_util.tree_leaves(x)[0].astype(jnp.float32)))


def main():
    from tumseg import models, ops
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

    def split(window: bool):
        ops.set_window(window)
        runner = InferenceRunner(model, variables, num_classes=8,
                                 batch_size=32, compute_dtype=jnp.bfloat16,
                                 device_features=True, device_reblock=True)
        # warm everything (compiles + caches + tunnel)
        runner.infer_scene(ds, 0, num_votes=1)

        (flat_base, starts_pos, counts_pos, cell_rank, offsets_pad,
         nb, nb_pad, nc, segments) = runner._grid_tensors(ds, 0)
        sx, se, cm, cmask = runner._scene_tensors(ds, 0)
        n_pad = int(sx.shape[0])
        vote_fn = runner._vote_scan_fn(1.0, int(se.shape[1]))

        # reblock alone (10 dispatches, one fence)
        k = jax.random.PRNGKey(7)
        idx = _reblock_on_device(k, flat_base, starts_pos, counts_pos,
                                 None, 4096, segments)
        fence(idx)
        t0 = time.perf_counter()
        for i in range(10):
            idx = _reblock_on_device(jax.random.fold_in(k, i), flat_base,
                                     starts_pos, counts_pos, None,
                                     4096, segments)
        fence(idx)
        reblock_ms = (time.perf_counter() - t0) / 10 * 1e3

        # vote scan alone
        idxp = jnp.pad(idx, ((0, nb_pad - nb), (0, 0)),
                       constant_values=n_pad)
        pool = jnp.zeros(((n_pad + 1) * 8,), jnp.float32)
        pool = vote_fn(variables, sx, se, cm, cmask, idxp, offsets_pad,
                       pool)
        fence(pool)
        pool = jnp.zeros(((n_pad + 1) * 8,), jnp.float32)
        t0 = time.perf_counter()
        for _ in range(5):
            pool = vote_fn(variables, sx, se, cm, cmask, idxp, offsets_pad,
                           pool)
        fence(pool)
        vote_ms = (time.perf_counter() - t0) / 5 * 1e3
        print(json.dumps({"window": window,
                          "reblock_ms_per_vote": round(reblock_ms, 1),
                          "vote_scan_ms_per_vote": round(vote_ms, 1)}),
              flush=True)

    split(False)
    split(True)
    ops.set_window(False)


if __name__ == "__main__":
    main()
