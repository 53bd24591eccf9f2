"""Pallas TPU kernel for farthest point sampling.

Why a kernel: FPS is inherently sequential in npoint (1024+256+64+16 = 1360
carried steps across the four SA stages), and as an XLA ``fori_loop`` each
step round-trips the carried [B, N] distance field through HBM and pays loop
overhead — it dominates the whole PointNet++ forward (~100ms more than the
MXU work). Here the entire batch's coordinate planes live in VMEM for the
whole loop; each step is a handful of full-width VPU passes:

    sel   = (col == far)            # one-hot of current centroids  [B, N]
    c_x   = sum(xs * sel, axis=1)   # centroid gather via reduction (no
    ...                             #   dynamic per-row indexing needed)
    d     = (xs-cx)^2 + (ys-cy)^2 + (zs-cz)^2
    dist  = min(dist, d)
    far   = argmax(dist, axis=1)

Semantics match tumseg.ops.core.farthest_point_sample (and the reference's
models/pointnet2_utils.py:63-84) exactly, including first-index tie-breaks.

VMEM budget: 4 x [B, N] f32 planes (xs/ys/zs/dist) + [B, npoint] i32 out;
for the worst stage (B=32, N=4096) about 2.5 MB — comfortably inside the
~16 MB/core. Larger B is split by a batch grid.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# max [B_tile, N] f32 planes we keep resident; 8 MB / (4 planes * 4 B)
_VMEM_PLANE_BUDGET = 8 * 1024 * 1024 // (4 * 4)


def _fps_kernel(npoint: int, xs_ref, ys_ref, zs_ref, start_ref, out_ref,
                dist_ref):
    B, N = xs_ref.shape
    xs = xs_ref[:, :]
    ys = ys_ref[:, :]
    zs = zs_ref[:, :]
    col = lax.broadcasted_iota(jnp.int32, (B, N), dimension=1)
    # Mosaic cannot store to a dynamic single-lane offset, so centroid
    # indices are accumulated with a one-hot add along the npoint axis.
    out_col = lax.broadcasted_iota(jnp.int32, (B, npoint), dimension=1)

    dist_ref[:, :] = jnp.full((B, N), 1e10, dtype=jnp.float32)
    out_ref[:, :] = jnp.zeros((B, npoint), dtype=jnp.int32)

    def body(i, far):
        # record current centroids: out[:, i] = far
        out_ref[:, :] = out_ref[:, :] + jnp.where(out_col == i, far, 0)
        sel = (col == far).astype(jnp.float32)              # [B, N] one-hot
        cx = jnp.sum(xs * sel, axis=1, keepdims=True)       # [B, 1]
        cy = jnp.sum(ys * sel, axis=1, keepdims=True)
        cz = jnp.sum(zs * sel, axis=1, keepdims=True)
        d = (jnp.square(xs - cx) + jnp.square(ys - cy) + jnp.square(zs - cz))
        dist = jnp.minimum(dist_ref[:, :], d)
        dist_ref[:, :] = dist
        # first-index argmax via where+min (jnp.argmax hits a Mosaic
        # legalization bug for sub-128-lane widths)
        maxv = jnp.max(dist, axis=1, keepdims=True)
        return jnp.min(jnp.where(dist == maxv, col, N), axis=1,
                       keepdims=True).astype(jnp.int32)

    lax.fori_loop(0, npoint, body, start_ref[:, :])


@functools.partial(jax.jit, static_argnums=(1,))
def farthest_point_sample(xyz: jnp.ndarray, npoint: int,
                          start: jnp.ndarray = None) -> jnp.ndarray:
    """xyz [B, N, 3] -> [B, npoint] int32, identical to the XLA composition.

    ``start`` [B] int32 optionally seeds the per-batch first centroid
    (defaults to 0, like eval mode)."""
    B, N, _ = xyz.shape
    if start is None:
        start = jnp.zeros((B,), dtype=jnp.int32)
    start = start.astype(jnp.int32).reshape(B, 1)

    # coordinate planes [B, N]; the transpose is one cheap XLA op and buys
    # full-lane VPU utilization inside the kernel
    xs = xyz[..., 0].astype(jnp.float32)
    ys = xyz[..., 1].astype(jnp.float32)
    zs = xyz[..., 2].astype(jnp.float32)

    b_tile = max(1, min(B, _VMEM_PLANE_BUDGET // max(N, 1)))
    if b_tile < B:
        # Mosaic wants the sublane block dim (8, .)-aligned unless full
        b_tile = max(8, b_tile - b_tile % 8)
    grid = (pl.cdiv(B, b_tile),)

    kernel = functools.partial(_fps_kernel, npoint)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((b_tile, N), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b_tile, N), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b_tile, N), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b_tile, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((b_tile, npoint), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, npoint), jnp.int32),
        scratch_shapes=[pltpu.VMEM((b_tile, N), jnp.float32)],
    )(xs, ys, zs, start)
