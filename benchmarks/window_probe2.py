#!/usr/bin/env python
"""Decomposed device-time probe for the z-window glue pieces."""

from __future__ import annotations

import functools
import json
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax

from tumseg.utils.cache import enable_compile_cache

enable_compile_cache()

import jax.numpy as jnp
import numpy as np
from jax import lax

from benchmarks.breakdown import Bench


def main():
    from tumseg.ops.pallas import ballquery as bq

    B, N, S, K, radius = 32, 4096, 1024, 32, 0.1
    r = np.random.default_rng(0)
    xyz = jnp.asarray(r.random((B, N, 3)), jnp.float32)

    bench = Bench(3, 10)

    # 1. variadic z-sort of the candidates (4 operands)
    def sort4(p):
        zs, order, xs, ys = bq._sort_with_payload(
            p[:, :, 2], p[:, :, 0], p[:, :, 1])
        return zs + xs + ys + order.astype(jnp.float32)

    bench.run("sort4 N4096", sort4, xyz)

    # 2. searchsorted, both methods
    zs_np = np.sort(np.asarray(xyz[:, :, 2]), axis=1)
    zs = jnp.asarray(zs_np)
    qz = jnp.asarray(np.sort(r.random((B, S)).astype(np.float32), axis=1))

    for method in ("scan", "compare_all", "sort"):
        def ss(q, method=method):
            lo = jax.vmap(functools.partial(
                jnp.searchsorted, side="left", method=method))(zs, q - radius)
            hi = jax.vmap(functools.partial(
                jnp.searchsorted, side="right", method=method))(zs, q + radius)
            return (lo + hi).astype(jnp.float32)

        bench.run(f"searchsorted2x {method}", ss, qz)

    # 3. unpermute gather [B, S, K] int32 via take_along_axis
    out_sorted = jnp.asarray(
        r.integers(0, N, (B, S, K)).astype(np.int32))
    inv = jnp.asarray(
        np.argsort(r.random((B, S)), axis=1).astype(np.int32))

    def unperm(o):
        return jnp.take_along_axis(o, inv[:, :, None], axis=1)

    bench.run("unpermute takealong", unperm, out_sorted)

    # 4. windowed kernel alone (start rows all zero, no cond, C=1536)
    planes = jnp.transpose(xyz, (0, 2, 1))
    order = jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32), (B, N))
    qs = xyz[:, :S, :]
    T = S // 128
    starts = jnp.zeros((B, T), jnp.int32)

    def kernel_only(q, C=1536, s_tile=128):
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu
        kern = functools.partial(bq._ballquery_window_kernel, radius, K, N, C)
        return pl.pallas_call(
            kern,
            grid=(B, T),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 3, N), lambda i, j: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, N), lambda i, j: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, s_tile, 3), lambda i, j: (i, j, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, s_tile, K), lambda i, j: (i, j, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, S, K), jnp.int32),
        )(starts, planes, order[:, None, :], q)

    bench.run("bq_window_kernel_only C1536", kernel_only, qs)

    # 5. fits values on uniform data
    for C in (1280, 1536, 2048):
        lo = jax.vmap(functools.partial(jnp.searchsorted, side="left"))(
            zs, qz - radius)
        hi = jax.vmap(functools.partial(jnp.searchsorted, side="right"))(
            zs, qz + radius)
        T2 = S // 128
        lo_t = lo.reshape(B, T2, 128)[:, :, 0]
        hi_t = hi.reshape(B, T2, 128)[:, :, -1]
        start = jnp.clip((lo_t // 128) * 128, 0, N - C)
        fits = bool(jnp.all(hi_t - start <= C))
        print(json.dumps({"name": f"fits C{C} uniform", "fits": fits}))


if __name__ == "__main__":
    main()
