#!/usr/bin/env python
"""Device-time split of the training sampler's phases (chained-in-jit
methodology, benchmarks/breakdown.py style): which part of the +30 ms
sampled-step overhead is candidates-gather vs rejection loop vs sort vs
top_k alternative vs featurize gathers."""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from tumseg.utils.cache import enable_compile_cache

enable_compile_cache()

import jax
import jax.numpy as jnp
import numpy as np

from benchmarks.soak import make_tile

REPS = 20


def timed(tag, fn, *args):
    out = fn(*args)
    jax.tree_util.tree_map(lambda x: x.block_until_ready(), out)
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)))
    t0 = time.perf_counter()
    out = fn(*args)
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)))
    dt = (time.perf_counter() - t0)
    print(json.dumps({"phase": tag, "ms": round(1e3 * dt / REPS, 3)}),
          flush=True)


def chain(f):
    """REPS dependent applications inside one jit (defeats CSE with a
    value-preserving perturbation)."""

    @jax.jit
    def g(key, rooms):
        acc = 0.0
        for i in range(REPS):
            k = jax.random.fold_in(key, i)
            out = f(k, rooms)
            acc = acc + jnp.sum(jax.tree_util.tree_leaves(out)[0]
                                .astype(jnp.float32)) * 1e-30
        return acc

    return g


def main():
    import shutil
    from pathlib import Path

    from tumseg.data.dataset import TrainBlockDataset
    from tumseg.data.device_sampler import DeviceBlockSampler

    work = Path("/tmp/tumseg_probe")
    shutil.rmtree(work, ignore_errors=True)
    work.mkdir(parents=True)
    paths = []
    for name, seed in [("a.las", 0), ("b.las", 1)]:
        p = str(work / name)
        make_tile(p, 600_000, seed)
        paths.append(p)
    ds = TrainBlockDataset(paths, num_classes=8, num_point=4096, color=True,
                           class8=True, seed=0)
    s = DeviceBlockSampler.from_dataset(ds)
    print(json.dumps({"cap": s.cap, "cands": 9 * s.cap}), flush=True)

    B, P = 16, 4096
    rooms = jnp.zeros((B,), jnp.int32)
    key = jax.random.PRNGKey(0)

    # fixed centers for isolating phases
    def centers_of(key, rooms):
        def one(k, rid):
            u = jax.random.uniform(k, (), jnp.float32)
            t = jnp.minimum((u * s._room_count[rid]).astype(jnp.int32),
                            s._room_count[rid] - 1)
            return s._xyz[s._room_start[rid] + t]
        return jax.vmap(one)(jax.random.split(key, B), rooms)

    cs = centers_of(key, rooms)

    # 1) one candidates pass (gather 2x9cap + compare)
    def cand_pass(k, rooms):
        c = centers_of(k, rooms)
        idx, inside = jax.vmap(lambda rid, cc: s._candidates(rid, cc[0],
                                                             cc[1]))(rooms, c)
        return (jnp.sum(inside.astype(jnp.int32)),)

    timed("candidates_pass", chain(cand_pass), key, rooms)

    # 2) full rejection loop (trial(s) until accept)
    def rej(k, rooms):
        def one(kk, rid):
            def trial(kk):
                kk, kc = jax.random.split(kk)
                u = jax.random.uniform(kc, (), jnp.float32)
                t = jnp.minimum((u * s._room_count[rid]).astype(jnp.int32),
                                s._room_count[rid] - 1)
                c = s._xyz[s._room_start[rid] + t]
                _, inside = s._candidates(rid, c[0], c[1])
                return kk, c, jnp.sum(inside.astype(jnp.int32))
            kk, c, cnt = jax.lax.while_loop(
                lambda st: st[2] <= s.min_block_points,
                lambda st: trial(st[0]), trial(kk))
            return cnt
        return (jax.vmap(one)(jax.random.split(k, B), rooms),)

    timed("rejection_loop", chain(rej), key, rooms)

    # 3) the sort (u, idx) over [B, 9cap]
    n_c = 9 * s.cap

    def sort_phase(k, rooms):
        u = jax.random.uniform(k, (B, n_c), jnp.float32)
        idx = jnp.broadcast_to(jnp.arange(n_c, dtype=jnp.int32)[None], (B, n_c))
        _, ranked = jax.lax.sort((u, idx), dimension=1, num_keys=1)
        return (ranked[:, :P],)

    timed("sort_u_idx", chain(sort_phase), key, rooms)

    # 4) top_k alternative
    def topk_phase(k, rooms):
        u = jax.random.uniform(k, (B, n_c), jnp.float32)
        _, ranked = jax.lax.top_k(u, P)
        return (ranked,)

    timed("top_k", chain(topk_phase), key, rooms)

    # 5) featurize gathers: 3 gathers of [B, P] rows
    def feat_phase(k, rooms):
        sel = jax.random.randint(k, (B, P), 0, s._xyz.shape[0] - 1)
        pts = jnp.take(s._xyz, sel, axis=0)
        ext = jnp.take(s._extra, sel, axis=0)
        lab = jnp.take(s._labels, sel)
        return (pts.sum() + ext.sum() + lab.sum(),)

    timed("featurize_gathers", chain(feat_phase), key, rooms)

    # 6) full sample_batch
    def full(k, rooms):
        pts, lab = s.sample_batch(k, rooms)
        return (pts,)

    timed("sample_batch_full", chain(full), key, rooms)


if __name__ == "__main__":
    main()
