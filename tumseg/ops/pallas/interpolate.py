"""Pallas TPU kernel for weighted 3-NN gather-interpolation.

Computes out[b, n, :] = sum_k w[b, n, k] * points2[b, idx[b, n, k], :] —
the inverse-distance interpolation of feature propagation
(reference models/pointnet2_utils.py:300-303) — as a one-hot MXU matmul:
each query tile builds W[n, s] = sum_k w_k * 1[idx_k == s] in VMEM and
contracts it with the source features on the MXU, replacing XLA's slow
dynamic gather of [B, N, 3, D] neighbor blocks.

Differentiation: d/d points2 is W^T @ g (a second accumulation kernel);
weights/indices derive from coordinates with no parameter dependence in
these models, so their cotangents are zero (same argument as
tumseg.ops.pallas.threenn).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_DEFAULT_N_TILE = 256


def _build_w(idx_ref, w_ref, S: int):
    """[N_t, S] combination matrix from idx/w tiles of shape (1, N_t, 3)."""
    N_t = idx_ref.shape[1]
    col = lax.broadcasted_iota(jnp.int32, (N_t, S), dimension=1)
    w = jnp.zeros((N_t, S), dtype=jnp.float32)
    for k in range(3):
        ik = idx_ref[0, :, k][:, None]
        wk = w_ref[0, :, k][:, None]
        w = w + jnp.where(col == ik, wk, 0.0)
    return w


def _interp_fwd_kernel(S: int, precision, idx_ref, w_ref, p2_ref, out_ref):
    W = _build_w(idx_ref, w_ref, S)
    out_ref[0, :, :] = jnp.dot(W, p2_ref[0, :, :],
                               preferred_element_type=jnp.float32,
                               precision=precision)


def _interp_bwd_kernel(S: int, precision, idx_ref, w_ref, g_ref, dp2_ref):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        dp2_ref[0, :, :] = jnp.zeros_like(dp2_ref[0, :, :])

    W = _build_w(idx_ref, w_ref, S)                      # [N_t, S]
    dp2_ref[0, :, :] += jnp.dot(W.T, g_ref[0, :, :],
                                preferred_element_type=jnp.float32,
                                precision=precision)


def _tiles(N: int):
    n_tile = min(_DEFAULT_N_TILE, N)
    if N % n_tile != 0:
        n_tile = N
    return n_tile


def _interp_impl(idx: jnp.ndarray, weight: jnp.ndarray,
                 points2: jnp.ndarray, precision) -> jnp.ndarray:
    B, N, _ = idx.shape
    S, D = points2.shape[1], points2.shape[2]
    n_tile = _tiles(N)
    grid = (B, N // n_tile)
    kernel = functools.partial(_interp_fwd_kernel, S, precision)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, n_tile, 3), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_tile, 3), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S, D), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, n_tile, D), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N, D), jnp.float32),
    )(idx.astype(jnp.int32), weight.astype(jnp.float32),
      points2.astype(jnp.float32))


def _interp_bwd_impl(idx, weight, g, S: int, precision):
    B, N, _ = idx.shape
    D = g.shape[2]
    n_tile = _tiles(N)
    grid = (B, N // n_tile)
    kernel = functools.partial(_interp_bwd_kernel, S, precision)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, n_tile, 3), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_tile, 3), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_tile, D), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        # all j-steps hit the same output block -> sequential accumulation
        out_specs=pl.BlockSpec((1, S, D), lambda i, j: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, S, D), jnp.float32),
    )(idx.astype(jnp.int32), weight.astype(jnp.float32),
      g.astype(jnp.float32))


def _make_weighted_interpolate(precision):
    @jax.custom_vjp
    def _wi(idx, weight, points2):
        return _interp_impl(idx, weight, points2, precision)

    def _wi_fwd(idx, weight, points2):
        return (_interp_impl(idx, weight, points2, precision),
                (idx, weight, points2.shape[1]))

    def _wi_bwd(res, g):
        idx, weight, S = res
        dp2 = _interp_bwd_impl(idx, weight, g, S, precision)
        return None, jnp.zeros_like(weight), dp2

    _wi.defvjp(_wi_fwd, _wi_bwd)
    return _wi


_WI = {
    # Mosaic supports only DEFAULT and HIGHEST dot precisions
    "high": _make_weighted_interpolate(lax.Precision.HIGHEST),
    "default": _make_weighted_interpolate(lax.Precision.DEFAULT),
}


def weighted_interpolate(idx: jnp.ndarray, weight: jnp.ndarray,
                         points2: jnp.ndarray,
                         fast: bool = False) -> jnp.ndarray:
    """idx [B,N,3] int, weight [B,N,3], points2 [B,S,D] -> [B,N,D].
    ``fast`` selects single-pass bf16 contraction for bf16 compute mode."""
    return _WI["default" if fast else "high"](idx, weight, points2)
