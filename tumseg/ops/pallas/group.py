"""Pallas TPU kernel for fused neighborhood grouping.

Replaces the set-abstraction gather pipeline — ``index_points(xyz, idx)``,
``index_points(points, idx)``, center-subtract, concat (reference
models/pointnet2_utils.py:127-134) — with a one-hot MXU contraction, so
XLA's slow dynamic gather never runs.

Layout choice: the contraction is computed transposed,
``out.T [C, R] = src.T [C, N] @ onehot.T [N, R]`` with R = S*K flat group
rows, because C (a dozen channels at sa1) would otherwise pad to 128 output
lanes and waste ~10x MXU work; as matmul *rows* C only pads to the 8-sublane
granule. The flat row indices and the K-expanded centers are prepared by
cheap XLA reshapes outside the kernel (Mosaic cannot shape-cast lanes into
sublanes).

Differentiation: d/d(src) is the transposed contraction (accumulating
backward kernel); index/center inputs get zero cotangents (coordinates have
no parameter dependence upstream — same argument as threenn).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_R_TILE = 512        # exact mode (f32 intermediates)
_R_TILE_FAST = 1024  # bf16 one-hot halves the VMEM footprint


def _split3_dot(x, onehot_bf16, exact: bool):
    """x @ onehot with a one-hot bf16 rhs (0/1 are exact in bf16).
    exact=True reconstructs all 24 f32 mantissa bits via a 3-way bf16 split
    of x (Mosaic supports only DEFAULT and HIGHEST dot precisions;
    fp32-HIGHEST costs 6 passes, this costs 3); exact=False is single-pass
    bf16 for bf16 compute mode.

    Precision is pinned to DEFAULT: bf16 x bf16 -> f32 is a single exact MXU
    pass regardless, and an ambient ``jax.default_matmul_precision("highest")``
    context (e.g. the torch-parity tests) would otherwise leak in and make
    Mosaic reject the bf16 operands ("Bad lhs type" — HIGHEST requests a
    multi-pass split that Mosaic only implements for f32 inputs)."""
    if not exact:
        return jnp.dot(x.astype(jnp.bfloat16), onehot_bf16,
                       preferred_element_type=jnp.float32,
                       precision=lax.Precision.DEFAULT)
    out = jnp.zeros((x.shape[0], onehot_bf16.shape[1]), dtype=jnp.float32)
    rem = x
    for _ in range(3):
        part = rem.astype(jnp.bfloat16)
        out = out + jnp.dot(part, onehot_bf16,
                            preferred_element_type=jnp.float32,
                            precision=lax.Precision.DEFAULT)
        rem = rem - part.astype(jnp.float32)
    return out


def _group_fwd_kernel(exact, idx_row_ref, srcT_ref, centerT_ref, outT_ref):
    C, N = srcT_ref.shape[1], srcT_ref.shape[2]
    R = idx_row_ref.shape[2]
    idx_row = idx_row_ref[0, 0, :][None, :]                  # [1, R] lanes
    niota = lax.broadcasted_iota(jnp.int32, (N, R), dimension=0)
    onehot_t = (niota == idx_row).astype(jnp.bfloat16)       # [N, R]
    gathered = _split3_dot(srcT_ref[0, :, :], onehot_t, exact)  # [C, R]
    riota = lax.broadcasted_iota(jnp.int32, (C, R), dimension=0)
    center = jnp.zeros((C, R), dtype=jnp.float32)
    for c in range(3):  # channels 0-2 become center-relative
        center = center + jnp.where(riota == c,
                                    centerT_ref[0, c, :][None, :], 0.0)
    outT_ref[0, :, :] = (gathered - center).astype(outT_ref.dtype)


def _group_bwd_kernel(exact, idx_col_ref, gT_ref, dsrcT_ref):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        dsrcT_ref[0, :, :] = jnp.zeros_like(dsrcT_ref[0, :, :])

    N = dsrcT_ref.shape[2]
    R = idx_col_ref.shape[1]
    col = lax.broadcasted_iota(jnp.int32, (R, N), dimension=1)
    onehot = (col == idx_col_ref[0, :, :]).astype(jnp.bfloat16)  # [R, N]
    g = gT_ref[0, :, :].astype(jnp.float32)  # cotangent may arrive bf16
    dsrcT_ref[0, :, :] += _split3_dot(g, onehot, exact)


def _r_tile(R_total: int, exact: bool = True) -> int:
    r = min(_R_TILE if exact else _R_TILE_FAST, R_total)
    while R_total % r != 0:
        r //= 2
    return max(r, 1)


def _group_t_impl(idx_col, idx_row, srcT, centerT, exact):
    import functools

    B, C, N = srcT.shape
    R_total = idx_row.shape[2]
    r = _r_tile(R_total, exact)
    grid = (B, R_total // r)
    # fast (bf16-compute) mode also STORES bf16: the grouped tensor is the
    # largest HBM intermediate of a SA stage and its consumer (the pointwise
    # MLP) casts to bf16 anyway
    out_dtype = jnp.float32 if exact else jnp.bfloat16
    return pl.pallas_call(
        functools.partial(_group_fwd_kernel, exact),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, r), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C, N), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, r), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, C, r), lambda i, j: (i, 0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, C, R_total), out_dtype),
    )(idx_row, srcT, centerT)


def _group_t_bwd_impl(idx_col, gT, N: int, exact):
    import functools

    B, C, R_total = gT.shape
    r = _r_tile(R_total, exact)
    grid = (B, R_total // r)
    return pl.pallas_call(
        functools.partial(_group_bwd_kernel, exact),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, r, 1), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C, r), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, C, N), lambda i, j: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, C, N), jnp.float32),
    )(idx_col, gT)


def _make_group_t(exact):
    @jax.custom_vjp
    def _group_t(idx_col, idx_row, srcT, centerT):
        return _group_t_impl(idx_col, idx_row, srcT, centerT, exact)

    def _gt_fwd(idx_col, idx_row, srcT, centerT):
        out = _group_t_impl(idx_col, idx_row, srcT, centerT, exact)
        return out, (idx_col, srcT.shape[2], centerT)

    def _gt_bwd(res, g):
        idx_col, N, centerT = res
        dsrcT = _group_t_bwd_impl(idx_col, g, N, exact)
        return None, None, dsrcT, jnp.zeros_like(centerT)

    _group_t.defvjp(_gt_fwd, _gt_bwd)
    return _group_t


_GROUP_T = {
    "high": _make_group_t(True),
    "default": _make_group_t(False),
}


def group_points(idx: jnp.ndarray, src: jnp.ndarray, new_xyz: jnp.ndarray,
                 fast: bool = False) -> jnp.ndarray:
    """idx [B,S,K] int, src [B,N,3+D] (xyz first), new_xyz [B,S,3]
    -> grouped [B,S,K,3+D] with channels 0-2 center-relative.
    ``fast`` selects single-pass bf16 contraction for bf16 compute mode."""
    B, S, K = idx.shape
    C = src.shape[2]
    R = S * K
    idx_flat = idx.reshape(B, R).astype(jnp.int32)
    srcT = jnp.transpose(src.astype(jnp.float32), (0, 2, 1))
    centerT = jnp.transpose(
        jnp.broadcast_to(new_xyz[:, :, None, :], (B, S, K, 3)
                         ).reshape(B, R, 3).astype(jnp.float32), (0, 2, 1))
    group_t = _GROUP_T["default" if fast else "high"]
    outT = group_t(idx_flat[:, :, None], idx_flat[:, None, :], srcT, centerT)
    return jnp.transpose(outT.reshape(B, C, S, K), (0, 2, 3, 1))
