#!/usr/bin/env python
"""Per-stage device-time breakdown of the PointNet++ forward on TPU.

micro.py times one dispatch per measurement, so per-op numbers are floored
by the axon tunnel's enqueue latency (~3 ms) and small ops are unreadable.
Here each op runs CHAIN times inside ONE jitted fori_loop, with a
value-preserving data dependency (x + 1e-30*f(out) keeps bits identical but
defeats CSE/hoisting), so the measured time is pure device time.

Usage: python benchmarks/breakdown.py [--iters 5] [--chain 20] [--json out]
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
    leaf = jax.tree_util.tree_leaves(x)[0]
    float(jnp.sum(leaf.astype(jnp.float32)))


def chained(f, x0, chain):
    """jit(fn) running f `chain` times with a bit-identical data dependency."""

    @jax.jit
    def run(x):
        def body(_, carry):
            out = f(carry)
            dep = jnp.sum(jax.tree_util.tree_leaves(out)[0]
                          .astype(jnp.float32)) * 1e-30
            return carry + dep.astype(carry.dtype)

        return jax.lax.fori_loop(0, chain, body, x)

    return run


class Bench:
    def __init__(self, iters, chain):
        self.iters = iters
        self.chain = chain
        self.rows = []

    def run(self, name, f, x0, chain=None):
        chain = chain or self.chain
        g = chained(f, x0, chain)
        t_compile = time.perf_counter()
        out = g(x0)
        fence(out)
        compile_s = time.perf_counter() - t_compile
        t0 = time.perf_counter()
        for _ in range(self.iters):
            out = g(out)
        fence(out)
        per_op_ms = (time.perf_counter() - t0) / self.iters / chain * 1e3
        row = {"name": name, "ms": round(per_op_ms, 4),
               "compile_s": round(compile_s, 1)}
        self.rows.append(row)
        print(json.dumps(row), flush=True)
        return per_op_ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--chain", type=int, default=20)
    ap.add_argument("--json", default=None)
    ap.add_argument("--only", default=None,
                    help="comma list of row-name substrings to run")
    args = ap.parse_args()

    from tumseg import models, ops
    from tumseg.nn import layers as L

    B = 32
    r = np.random.default_rng(0)
    bench = Bench(args.iters, args.chain)

    def want(name):
        return args.only is None or any(s in name for s in args.only.split(","))

    model = models.get_module("pointnet2_sem_seg")
    variables = model.init(jax.random.PRNGKey(0), 8, 0)
    params, stats = variables["params"], variables["batch_stats"]

    # ---- dispatch floor / trivial op --------------------------------------
    x_small = jnp.ones((8, 128), jnp.float32)
    if want("floor"):
        bench.run("floor(add)", lambda x: x + 1.0, x_small, chain=64)

    stages = [(4096, 1024, 0.1, 32), (1024, 256, 0.2, 32),
              (256, 64, 0.4, 32), (64, 16, 0.8, 32)]

    # ---- per-op at each stage ---------------------------------------------
    for i, (N, S, radius, K) in enumerate(stages, start=1):
        xyz = jnp.asarray(r.random((B, N, 3)), jnp.float32)
        if want(f"fps{i}"):
            bench.run(f"fps{i} N{N}->S{S}",
                      lambda p, S=S: ops.farthest_point_sample(p, S), xyz)
        if want(f"bq{i}"):
            bench.run(f"bq{i} N{N} S{S} r{radius}",
                      lambda p, S=S, radius=radius, K=K:
                      ops.query_ball_point(radius, K, p, p[:, :S]), xyz)

    for i, (N, S) in enumerate([(4096, 1024), (1024, 256), (256, 64)],
                               start=1):
        q = jnp.asarray(r.random((B, N, 3)), jnp.float32)
        if want(f"3nn{i}"):
            bench.run(f"3nn fp{i} N{N} S{S}",
                      lambda a, S=S: ops.three_nn_dispatch(a, a[:, :S])[0], q)

    # ---- SA stage blocks (eval mode, group+MLP+max, given fps+bq done) ----
    in_ch = [9 + 3, 64 + 3, 128 + 3, 256 + 3]
    feat_dim = [6, 64, 128, 256]
    for i, (N, S, radius, K) in enumerate(stages, start=1):
        if not want(f"sa{i}"):
            continue
        xyz = jnp.asarray(r.random((B, N, 3)), jnp.float32)
        feats = jnp.asarray(r.random((B, N, feat_dim[i - 1])), jnp.float32)
        cfg = dict(npoint=S, radius=radius, nsample=K)
        p, s = params[f"sa{i}"], stats[f"sa{i}"]

        def sa_block(ft, xyz=xyz, cfg=cfg, p=p, s=s):
            _, out, _ = L.set_abstraction(
                p, s, cfg, xyz, ft, training=False, momentum=0.1,
                compute_dtype=jnp.bfloat16)
            return out

        bench.run(f"sa{i}_block N{N}->S{S}", sa_block, feats)

    # ---- FP stage blocks ---------------------------------------------------
    fp_shapes = [  # (name, N, S, skip_ch, feat_ch)
        ("fp4", 64, 16, 256, 512), ("fp3", 256, 64, 128, 256),
        ("fp2", 1024, 256, 64, 256), ("fp1", 4096, 1024, None, 128),
    ]
    for name, N, S, skip_ch, feat_ch in fp_shapes:
        if not want(name):
            continue
        xyz1 = jnp.asarray(r.random((B, N, 3)), jnp.float32)
        xyz2 = jnp.asarray(r.random((B, S, 3)), jnp.float32)
        skip = (jnp.asarray(r.random((B, N, skip_ch)), jnp.float32)
                if skip_ch else None)
        feat = jnp.asarray(r.random((B, S, feat_ch)), jnp.float32)
        p, s = params[name], stats[name]

        def fp_block(ft, xyz1=xyz1, xyz2=xyz2, skip=skip, p=p, s=s):
            out, _ = L.feature_propagation(
                p, s, xyz1, xyz2, skip, ft, training=False, momentum=0.1,
                compute_dtype=jnp.bfloat16)
            return out

        bench.run(f"{name}_block N{N} S{S}", fp_block, feat)

    # ---- per-block fwd+bwd at the training batch size ---------------------
    # subtract the B16-scaled forward rows to read the backward's share
    if want("bwd"):
        Bt = 16
        for i, (N, S, radius, K) in enumerate(stages, start=1):
            xyzt = np.asarray(r.random((Bt, N, 3)), np.float32)
            featst = jnp.asarray(r.random((Bt, N, feat_dim[i - 1])),
                                 jnp.float32)
            cfg = dict(npoint=S, radius=radius, nsample=K)
            p, s = params[f"sa{i}"], stats[f"sa{i}"]

            def sa_grad(ft, xyz=xyzt, cfg=cfg, p=p, s=s):
                def f(ft):
                    _, out, _ = L.set_abstraction(
                        p, s, cfg, xyz, ft, training=True, momentum=0.1,
                        compute_dtype=jnp.bfloat16, fast_gather=True)
                    return jnp.sum(out.astype(jnp.float32))

                return jax.grad(f)(ft)

            bench.run(f"sa{i}_fwdbwd B16", sa_grad, featst)

        for name, N, S, skip_ch, feat_ch in fp_shapes:
            xyz1 = np.asarray(r.random((Bt, N, 3)), np.float32)
            xyz2 = np.asarray(r.random((Bt, S, 3)), np.float32)
            skip = (np.asarray(r.random((Bt, N, skip_ch)), np.float32)
                    if skip_ch else None)
            featt = jnp.asarray(r.random((Bt, S, feat_ch)), jnp.float32)
            p, s = params[name], stats[name]

            def fp_grad(ft, xyz1=xyz1, xyz2=xyz2, skip=skip, p=p, s=s):
                def f(ft):
                    out, _ = L.feature_propagation(
                        p, s, xyz1, xyz2, skip, ft, training=True,
                        momentum=0.1, compute_dtype=jnp.bfloat16,
                        fast_gather=True)
                    return jnp.sum(out.astype(jnp.float32))

                return jax.grad(f)(ft)

            bench.run(f"{name}_fwdbwd B16", fp_grad, featt)

    # ---- full forward + train step ----------------------------------------
    if want("forward"):
        x = jnp.asarray(r.random((B, 4096, 6)), jnp.float32)

        def fwd(x):
            logp, _, _ = model.apply(variables, x, training=False,
                                     compute_dtype=jnp.bfloat16)
            return logp

        bench.run("forward B32", fwd, x, chain=5)

    if want("msg"):
        msg = models.get_module("pointnet2_sem_seg_msg")
        msg_vars = msg.init(jax.random.PRNGKey(0), 8, 0)
        xm = jnp.asarray(r.random((B, 4096, 6)), jnp.float32)

        def msg_fwd(x):
            logp, _, _ = msg.apply(msg_vars, x, training=False,
                                   compute_dtype=jnp.bfloat16)
            return logp

        bench.run("msg_forward B32", msg_fwd, xm, chain=5)

    if want("train"):
        from tumseg.train import TrainEngine

        eng = TrainEngine(model, 8, np.ones(8), seed=0,
                          compute_dtype=jnp.bfloat16)
        eng.init_state(jax.random.PRNGKey(0), 0)
        xt = jnp.asarray(r.random((16, 4096, 6)), jnp.float32)
        tt = jnp.asarray(r.integers(0, 8, (16, 4096)), jnp.int32)

        # one-dispatch-per-step here (state donation precludes chaining);
        # train step is large enough that dispatch floor is noise
        loss, _ = eng.train_batch(xt, tt, 1e-3, 0.1)
        fence(loss)
        t0 = time.perf_counter()
        for _ in range(20):
            loss, _ = eng.train_batch(xt, tt, 1e-3, 0.1)
        fence(loss)
        ms = (time.perf_counter() - t0) / 20 * 1e3
        row = {"name": "train_step B16 bf16", "ms": round(ms, 3)}
        bench.rows.append(row)
        print(json.dumps(row), flush=True)

    if args.json:
        with open(args.json, "w") as f:
            json.dump(bench.rows, f, indent=1)


if __name__ == "__main__":
    main()
