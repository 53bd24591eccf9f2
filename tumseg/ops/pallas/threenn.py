"""Pallas TPU kernel for 3-nearest-neighbor search.

The XLA path builds the full [B, N, S] distance tensor in HBM and runs
top_k (~48 ms inside fp1 at B=32, N=4096, S=1024). This kernel computes
each [N_tile, S] distance block in VMEM — the cross-term as an MXU matmul
(the same ||q||^2 + ||s||^2 - 2 q.s expansion as the XLA path, so distances
round identically) — and peels the three smallest (distance, index) pairs
with masked-min reductions; ties break to the lower index, matching the
stable-sort order.

Differentiation: the result feeds inverse-distance weights, but in these
models the coordinates are raw inputs with no parameter dependence
(models/pointnet2_sem_seg.py:23-24 — l_xyz come straight from the input
points), so the op is wrapped in a custom_vjp returning zero cotangents for
the coordinates, keeping the training path jit/grad-compatible.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_DEFAULT_N_TILE = 1024
_BIG = 3.4e38  # plain float: jnp scalars would be captured tracers


def _threenn_kernel(s_total: int, q_ref, src_ref, splane_ref, dist_out_ref,
                    idx_out_ref, dist_ref):
    N_t = q_ref.shape[1]
    S = src_ref.shape[1]
    col = lax.broadcasted_iota(jnp.int32, (N_t, S), dimension=1)
    kcol3 = lax.broadcasted_iota(jnp.int32, (N_t, 3), dimension=1)

    q = q_ref[0, :, :]                                   # [N_t, 3]
    s = src_ref[0, :, :]                                 # [S, 3]
    qsq = jnp.sum(q * q, axis=1, keepdims=True)          # [N_t, 1]
    sx = splane_ref[0, 0, :]
    sy = splane_ref[0, 1, :]
    sz = splane_ref[0, 2, :]
    ssq = (sx * sx + sy * sy + sz * sz)[None, :]         # [1, S] (lane axis)
    cross = lax.dot_general(q, s, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=lax.Precision.HIGHEST)
    # the distance matrix is materialized ONCE to scratch (pins rounding);
    # the peel then chains VALUES — each masked rewrite of the [N_t, S] ref
    # would cost an extra full write+read pass per peel
    dist_ref[:, :] = qsq + ssq - 2.0 * cross
    cand = dist_ref[:, :]

    dacc = jnp.zeros((N_t, 3), dtype=jnp.float32)
    iacc = jnp.zeros((N_t, 3), dtype=jnp.int32)
    for k in range(3):
        minv = jnp.min(cand, axis=1, keepdims=True)
        mi = jnp.min(jnp.where(cand == minv, col, s_total), axis=1,
                     keepdims=True)
        dacc = dacc + jnp.where(kcol3 == k, minv, 0.0)
        iacc = iacc + jnp.where(kcol3 == k, mi, 0)
        if k < 2:
            cand = jnp.where(col == mi, _BIG, cand)

    dist_out_ref[0, :, :] = dacc
    idx_out_ref[0, :, :] = iacc


def _threenn_kernel_t(s_total: int, qplane_ref, src_ref, dist_out_ref,
                      idx_out_ref, dist_ref):
    """Transposed peel: candidates on SUBLANES, queries on lanes.

    The row-major kernel above reduces the peel mins across the LANE axis
    (S candidates on lanes) — cross-lane reductions are the VPU's slow
    direction and measured ~10% of ceiling (benchmarks/RESULTS.md
    roofline). Here cand is [S, N_t]: each peel reduces across sublanes
    (chained vector mins over S/8 vregs), the same orientation that puts
    the ball-query peel at ~40% of ceiling. Distances are built DIRECTLY
    on the VPU as dx^2+dy^2+dz^2 (the ball-query kernel's form): the MXU
    ||q||^2+||s||^2-2q.s expansion pads its depth-3 contraction to 128 —
    a 42x FLOP inflation that measured 0.33 ms of fp1's 1.93 ms. The
    direct form is the more accurate one but rounds differently from the
    XLA path's expansion, so near-tie neighbor picks can flip (~4e-5 of
    indices at fp1 scale, all verified distance-ties; RESULTS.md) —
    TUMSEG_OPS_IMPL=xla stays the bit-exact path, and the row kernel
    above keeps the expansion form as the in-repo bit-reference.
    Outputs land as [B, 3, N] planes, transposed outside the kernel.
    """
    N_t = qplane_ref.shape[2]
    S = src_ref.shape[1]
    rows = lax.broadcasted_iota(jnp.int32, (S, N_t), dimension=0)
    krow3 = lax.broadcasted_iota(jnp.int32, (3, N_t), dimension=0)

    s = src_ref[0, :, :]                                 # [S, 3]
    sx = s[:, 0][:, None]                                # [S, 1]
    sy = s[:, 1][:, None]
    sz = s[:, 2][:, None]
    qx = qplane_ref[0, 0, :][None, :]                    # [1, N_t]
    qy = qplane_ref[0, 1, :][None, :]
    qz = qplane_ref[0, 2, :][None, :]
    dx = sx - qx
    dy = sy - qy
    dz = sz - qz
    dist_ref[:, :] = dx * dx + dy * dy + dz * dz         # [S, N_t]
    cand = dist_ref[:, :]

    dacc = jnp.zeros((3, N_t), dtype=jnp.float32)
    iacc = jnp.zeros((3, N_t), dtype=jnp.int32)
    for k in range(3):
        minv = jnp.min(cand, axis=0, keepdims=True)      # [1, N_t]
        mi = jnp.min(jnp.where(cand == minv, rows, s_total), axis=0,
                     keepdims=True)
        dacc = dacc + jnp.where(krow3 == k, minv, 0.0)
        iacc = iacc + jnp.where(krow3 == k, mi, 0)
        if k < 2:
            cand = jnp.where(rows == mi, _BIG, cand)

    dist_out_ref[0, :, :] = dacc
    idx_out_ref[0, :, :] = iacc


def _three_nn_impl_t(xyz1: jnp.ndarray, xyz2: jnp.ndarray):
    B, N, _ = xyz1.shape
    S = xyz2.shape[1]
    n_tile = min(_DEFAULT_N_TILE, N)
    if N % n_tile != 0:
        n_tile = N

    queries = xyz1.astype(jnp.float32)
    sources = xyz2.astype(jnp.float32)
    qplanes = jnp.transpose(queries, (0, 2, 1))          # [B, 3, N]

    grid = (B, N // n_tile)
    kernel = functools.partial(_threenn_kernel_t, S)
    dists, idx = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 3, n_tile), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S, 3), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, 3, n_tile), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, n_tile), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, 3, N), jnp.float32),
            jax.ShapeDtypeStruct((B, 3, N), jnp.int32),
        ),
        scratch_shapes=[pltpu.VMEM((S, n_tile), jnp.float32)],
    )(qplanes, sources)
    return (jnp.transpose(dists, (0, 2, 1)),
            jnp.transpose(idx, (0, 2, 1)))


def _three_nn_impl(xyz1: jnp.ndarray, xyz2: jnp.ndarray):
    B, N, _ = xyz1.shape
    S = xyz2.shape[1]
    n_tile = min(_DEFAULT_N_TILE, N)
    if N % n_tile != 0:
        n_tile = N

    queries = xyz1.astype(jnp.float32)
    sources = xyz2.astype(jnp.float32)
    splanes = jnp.transpose(sources, (0, 2, 1))          # [B, 3, S]

    grid = (B, N // n_tile)
    kernel = functools.partial(_threenn_kernel, S)
    dists, idx = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, n_tile, 3), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S, 3), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, S), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, n_tile, 3), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_tile, 3), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, N, 3), jnp.float32),
            jax.ShapeDtypeStruct((B, N, 3), jnp.int32),
        ),
        scratch_shapes=[pltpu.VMEM((n_tile, S), jnp.float32)],
    )(queries, sources, splanes)
    return dists, idx


# ---------------------------------------------------------------------------
# z-window pruned variant
# ---------------------------------------------------------------------------
#
# Same idea as ballquery.query_ball_point_windowed: sort sources and queries
# by z so each query tile only scans a C << S window of source candidates.
# 3-NN has no radius to bound the window a priori, so correctness is checked
# POST-HOC: the windowed result is exact iff each query's found 3rd-nearest
# distance beats the (squared) z-distance to both window edges — any source
# outside the window is at least that far away. A lax.cond falls back to the
# full kernel when any query fails the check. Distances use the SAME
# ||q||^2+||s||^2-2q.s MXU expansion as the full kernel, so accepted windows
# reproduce its results bit-for-bit; the guard slack covers the expansion's
# absolute rounding error (which scales with the coordinate magnitudes).

_WINDOW_N_TILE = 256


def _threenn_window_kernel(s_total: int, c_window: int, start_ref, q_ref,
                           srcs_ref, splane_ref, oc_ref, dist_out_ref,
                           idx_out_ref):
    N_t = q_ref.shape[1]
    kcol3 = lax.broadcasted_iota(jnp.int32, (N_t, 3), dimension=1)

    start = pl.multiple_of(start_ref[pl.program_id(0), pl.program_id(1)], 128)
    s = srcs_ref[0, pl.ds(start, c_window), :]           # [C, 3]
    sx = splane_ref[0, 0, pl.ds(start, c_window)]
    sy = splane_ref[0, 1, pl.ds(start, c_window)]
    sz = splane_ref[0, 2, pl.ds(start, c_window)]
    oc = oc_ref[0, 0, pl.ds(start, c_window)][None, :]   # [1, C] original idx

    q = q_ref[0, :, :]                                   # [N_t, 3]
    qsq = jnp.sum(q * q, axis=1, keepdims=True)
    ssq = (sx * sx + sy * sy + sz * sz)[None, :]
    cross = lax.dot_general(q, s, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=lax.Precision.HIGHEST)
    cand = qsq + ssq - 2.0 * cross                       # [N_t, C]

    dacc = jnp.zeros((N_t, 3), dtype=jnp.float32)
    iacc = jnp.zeros((N_t, 3), dtype=jnp.int32)
    for k in range(3):
        minv = jnp.min(cand, axis=1, keepdims=True)
        mi = jnp.min(jnp.where(cand == minv, oc, s_total), axis=1,
                     keepdims=True)
        dacc = dacc + jnp.where(kcol3 == k, minv, 0.0)
        iacc = iacc + jnp.where(kcol3 == k, mi, 0)
        if k < 2:
            cand = jnp.where(oc == mi, _BIG, cand)

    dist_out_ref[0, :, :] = dacc
    idx_out_ref[0, :, :] = iacc


@functools.partial(jax.jit, static_argnums=(2, 3))
def _three_nn_windowed_impl(xyz1, xyz2, window: int, n_tile: int):
    from tumseg.ops.pallas.ballquery import _sort_with_payload

    B, N, _ = xyz1.shape
    S = xyz2.shape[1]
    C = min(window, S)
    n_tile = min(n_tile, N)
    if N % n_tile != 0:
        n_tile = N
    T = N // n_tile
    if C == S or C % 128 != 0 or S % 128 != 0:
        return _three_nn_impl(xyz1, xyz2)

    queries = xyz1.astype(jnp.float32)
    sources = xyz2.astype(jnp.float32)

    zs, sorder, xs, ys = _sort_with_payload(
        sources[:, :, 2], sources[:, :, 0], sources[:, :, 1])
    srcs_sorted = jnp.stack([xs, ys, zs], axis=-1)        # [B, S, 3]
    splanes = jnp.stack([xs, ys, zs], axis=1)             # [B, 3, S]
    qzs, qorder, qxs, qys = _sort_with_payload(
        queries[:, :, 2], queries[:, :, 0], queries[:, :, 1])
    q_sorted = jnp.stack([qxs, qys, qzs], axis=-1)        # [B, N, 3]
    _, inv = lax.sort((qorder, jnp.broadcast_to(
        jnp.arange(N, dtype=jnp.int32), qorder.shape)), dimension=1,
        num_keys=1)

    # center each tile's window on its source-rank span; only the tile
    # boundary queries are ranked (monotone in sorted order), and
    # compare_all avoids the latency-bound binary-search gathers
    ss = functools.partial(jnp.searchsorted, method="compare_all")
    lo_t = jax.vmap(ss)(zs, qzs[:, ::n_tile])             # [B, T]
    hi_t = jax.vmap(ss)(zs, qzs[:, n_tile - 1::n_tile])
    start = jnp.clip((((lo_t + hi_t) // 2 - C // 2) // 128) * 128,
                     0, S - C).astype(jnp.int32)

    grid = (B, T)
    kernel = functools.partial(_threenn_window_kernel, S, C)
    dists_s, idx_s = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),        # [B, T] starts
            pl.BlockSpec((1, n_tile, 3), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S, 3), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, S), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, S), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, n_tile, 3), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_tile, 3), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, N, 3), jnp.float32),
            jax.ShapeDtypeStruct((B, N, 3), jnp.int32),
        ),
    )(start, q_sorted, srcs_sorted, splanes, sorder[:, None, :])

    # post-hoc exactness guard: every query's 3rd-nearest must beat the
    # z-distance to both window edges (with slack for the MXU expansion's
    # coordinate-magnitude-scaled rounding)
    d3 = dists_s[:, :, 2]                                 # [B, N] sorted order
    zlo = jnp.take_along_axis(zs, start, axis=1)          # [B, T]
    zhi = jnp.take_along_axis(zs, start + C - 1, axis=1)
    zlo_q = jnp.repeat(zlo, n_tile, axis=1)               # [B, N]
    zhi_q = jnp.repeat(zhi, n_tile, axis=1)
    start_q = jnp.repeat(start, n_tile, axis=1)
    ssq_max = jnp.max(xs * xs + ys * ys + zs * zs, axis=1, keepdims=True)
    qsq = qxs * qxs + qys * qys + qzs * qzs
    slack = 8e-7 * (1.0 + qsq + ssq_max)
    left_ok = (start_q == 0) | ((qzs >= zlo_q) &
                                (d3 + slack < (qzs - zlo_q) ** 2))
    right_ok = (start_q + C == S) | ((qzs <= zhi_q) &
                                     (d3 + slack < (zhi_q - qzs) ** 2))
    fits = jnp.all(left_ok & right_ok)

    def _use_windowed(_):
        # one-hot MXU row gather; XLA's take_along costs ~1 ms each here
        from tumseg.ops.pallas.group import group_points

        packed = jnp.concatenate([dists_s, idx_s.astype(jnp.float32)],
                                 axis=-1)                 # [B, N, 6]
        zeros = jnp.zeros((B, N, 3), dtype=jnp.float32)
        g = group_points(inv[:, :, None], packed, zeros, fast=False)[:, :, 0]
        return g[:, :, :3], jnp.rint(g[:, :, 3:]).astype(jnp.int32)

    def _full(_):
        return _three_nn_impl(queries, sources)

    return lax.cond(fits, _use_windowed, _full, operand=None)


@jax.custom_vjp
def three_nn(xyz1: jnp.ndarray, xyz2: jnp.ndarray):
    """xyz1 [B, N, 3], xyz2 [B, S, 3] -> (dists [B, N, 3], idx [B, N, 3]).

    Dispatches the transposed direct-build kernel (fp1: 1.60 ms vs the
    row/expansion kernel's 2.26 — RESULTS.md round 3); the row kernel
    stays available as `_three_nn_impl` (expansion form, bit-reference).
    """
    return _three_nn_impl_t(xyz1, xyz2)


def _three_nn_fwd(xyz1, xyz2):
    return _three_nn_impl_t(xyz1, xyz2), (xyz1, xyz2)


def _three_nn_bwd(res, g):
    xyz1, xyz2 = res
    return jnp.zeros_like(xyz1), jnp.zeros_like(xyz2)


three_nn.defvjp(_three_nn_fwd, _three_nn_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def three_nn_windowed(xyz1: jnp.ndarray, xyz2: jnp.ndarray,
                      window: int = 384, n_tile: int = _WINDOW_N_TILE):
    """three_nn with z-window source pruning (exact; falls back on device
    when the post-hoc nearest-distance guard rejects a window)."""
    return _three_nn_windowed_impl(xyz1, xyz2, window, n_tile)


def _three_nn_windowed_fwd(xyz1, xyz2, window, n_tile):
    return _three_nn_windowed_impl(xyz1, xyz2, window, n_tile), (xyz1, xyz2)


def _three_nn_windowed_bwd(window, n_tile, res, g):
    xyz1, xyz2 = res
    return jnp.zeros_like(xyz1), jnp.zeros_like(xyz2)


three_nn_windowed.defvjp(_three_nn_windowed_fwd, _three_nn_windowed_bwd)
