#!/usr/bin/env python
"""Per-phase device-time split of the whole vote (VERDICT r2 item 4): the
re-block sort, then the scan with each of its per-chunk components isolated
(featurize gather, forward, vote scatter), plus the dummy-granule overhead.
Methodology: each phase is one jitted whole-vote dispatch (scan or sort),
timed over REPS dependent runs with a single scalar-readback fence —
per-dispatch timing is floored at ~3 ms by the axon tunnel, but a whole
vote is hundreds of ms so 5 reps suffice."""

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


def time_vote(name, run, pool0):
    out = run(pool0())
    fence(out)
    t0 = time.perf_counter()
    pool = pool0()
    for _ in range(REPS):
        pool = run(pool)
    fence(pool)
    ms = (time.perf_counter() - t0) / REPS * 1e3
    print(json.dumps({"phase": name, "ms_per_vote": round(ms, 1)}),
          flush=True)
    return ms


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
    sx, se, cm, cmask = runner._scene_tensors(ds, 0)
    n_pad = int(sx.shape[0])
    fwd_feat = runner._forward_featurized_fn
    bs = 32
    C = 8
    L = int(flat_base.shape[0])
    print(json.dumps({"nb": nb, "nb_pad": nb_pad, "L": L, "n_pad": n_pad}),
          flush=True)

    # --- phase: the re-block sort alone (per vote) ---------------------------
    @jax.jit
    def reblock_only(key):
        return _reblock_on_device(key, flat_base, starts_pos, counts_pos,
                                  None, 4096, segments)

    out = reblock_only(jax.random.PRNGKey(0))
    fence(out)
    t0 = time.perf_counter()
    for i in range(REPS):
        out = reblock_only(jax.random.fold_in(jax.random.PRNGKey(1), i))
    fence(out)
    print(json.dumps({"phase": "reblock_sort", "ms_per_vote": round(
        (time.perf_counter() - t0) / REPS * 1e3, 1)}), flush=True)

    idx = reblock_only(jax.random.PRNGKey(7))
    idxp = jnp.pad(idx, ((0, nb_pad - nb), (0, 0)), constant_values=n_pad)
    offs = offsets_pad
    nchunks = nb_pad // bs

    def scan_over(body):
        @jax.jit
        def run(pool):
            p, _ = jax.lax.scan(body, pool,
                                (idxp.reshape(nchunks, bs, -1),
                                 offs.reshape(nchunks, bs, 2)))
            return p
        return run

    def pool0():
        return jnp.zeros(((n_pad + 1) * C,), jnp.float32)

    def with_cond(run_chunk):
        def body(pool, chunk):
            i, o = chunk
            all_dummy = jnp.min(i) >= n_pad
            pool = jax.lax.cond(all_dummy, lambda p: p,
                                lambda p: run_chunk(p, i, o), pool)
            return pool, None
        return body

    with tumseg_ops.window_enabled(True):
        # --- full vote scan (production body) --------------------------------
        def full_chunk(p, i, o):
            pred = fwd_feat(variables, sx, se, cm, cmask,
                            jnp.minimum(i, n_pad - 1), o, 1.0)
            return p.at[i.reshape(-1) * C + pred.reshape(-1)].add(1.0)

        t_full = time_vote("scan_full", scan_over(with_cond(full_chunk)),
                           pool0)

        # --- no scatter: fold preds additively -------------------------------
        def nosc_chunk(p, i, o):
            pred = fwd_feat(variables, sx, se, cm, cmask,
                            jnp.minimum(i, n_pad - 1), o, 1.0)
            return p.at[0].add(jnp.sum(pred).astype(p.dtype))

        t_nosc = time_vote("scan_no_scatter", scan_over(with_cond(nosc_chunk)),
                           pool0)

        # --- contiguous gather: iota idx (same bytes, no randomness) ---------
        def ctg_chunk(p, i, o):
            ii = (jnp.arange(bs * 4096, dtype=jnp.int32).reshape(bs, 4096)
                  % (n_pad - 1))
            pred = fwd_feat(variables, sx, se, cm, cmask, ii, o, 1.0)
            return p.at[i.reshape(-1) * C + pred.reshape(-1)].add(1.0)

        t_ctg = time_vote("scan_contiguous_gather",
                          scan_over(with_cond(ctg_chunk)), pool0)

        # --- forward only from one constant pre-featurized block -------------
        xconst = jax.random.normal(jax.random.PRNGKey(3), (bs, 4096, 6),
                                   jnp.float32)

        def fwd_chunk(p, i, o):
            logp, _, _ = model.apply(variables, xconst, training=False,
                                     compute_dtype=jnp.bfloat16)
            pred = jnp.argmax(logp, axis=-1).astype(jnp.int32)
            return p.at[i.reshape(-1) * C + pred.reshape(-1)].add(1.0)

        t_fwd = time_vote("scan_forward_only",
                          scan_over(with_cond(fwd_chunk)), pool0)

        # --- dummy-granule overhead: scan over only the REAL chunks ----------
        nreal = (nb + bs - 1) // bs * bs

        def scan_real(body):
            @jax.jit
            def run(pool):
                p, _ = jax.lax.scan(body, pool,
                                    (idxp[:nreal].reshape(-1, bs, 4096),
                                     offs[:nreal].reshape(-1, bs, 2)))
                return p
            return run

        t_real = time_vote("scan_real_chunks_only",
                           scan_real(with_cond(full_chunk)), pool0)

    print(json.dumps({
        "derived": {
            "scatter_ms": round(t_full - t_nosc, 1),
            "random_vs_contiguous_gather_ms": round(t_full - t_ctg, 1),
            "featurize_total_ms": round(t_full - t_fwd, 1),
            "dummy_granule_ms": round(t_full - t_real, 1),
        }}), flush=True)


if __name__ == "__main__":
    main()
