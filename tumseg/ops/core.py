"""Point-cloud core ops as XLA compositions (channels-last, static shapes).

These mirror the semantics of the reference's PyTorch tensor-op kernels
(/root/reference/models/pointnet2_utils.py:19-158) but are designed for TPU:

- ``square_distance`` is a single MXU matmul plus rank-1 updates.
- ``farthest_point_sample`` is a ``lax.fori_loop`` with a carried min-distance
  field, vectorized over the batch (the reference loops in Python per step).
- ``query_ball_point`` uses a masked ``lax.top_k`` to select the first-K
  in-radius neighbors in ascending index order — O(N log K) per query row
  instead of the reference's full O(N log N) sort
  (models/pointnet2_utils.py:103).
- ``three_nn`` similarly replaces sort-and-slice with ``top_k``.

A Pallas implementation of the hot kernels lives in ``tumseg.ops.pallas`` and
is selected through the dispatch table in ``tumseg.ops`` (set
``TUMSEG_OPS_IMPL=xla|pallas`` or call ``tumseg.ops.set_impl``).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax


def square_distance(src: jnp.ndarray, dst: jnp.ndarray) -> jnp.ndarray:
    """Pairwise squared Euclidean distance.

    src: [B, N, C], dst: [B, M, C] -> [B, N, M].
    Same expansion as the reference (pointnet2_utils.py:19-40):
    ||a-b||^2 = ||a||^2 + ||b||^2 - 2 a.b  (one batched MXU matmul).
    """
    # HIGHEST precision: distances gate radius membership, so the fp32 MXU
    # path (not the default bf16 passes) is required for parity.
    dist = -2.0 * jnp.einsum(
        "bnc,bmc->bnm", src, dst,
        preferred_element_type=jnp.float32, precision=lax.Precision.HIGHEST)
    dist += jnp.sum(src * src, axis=-1)[:, :, None]
    dist += jnp.sum(dst * dst, axis=-1)[:, None, :]
    return dist


def index_points(points: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Batched gather: points [B, N, C], idx [B, ...] int -> [B, ..., C].

    Equivalent to the reference's fancy-index gather
    (pointnet2_utils.py:43-60) for any trailing idx shape.
    """
    B, N, C = points.shape
    flat = idx.reshape(B, -1)                       # [B, P]
    out = jnp.take_along_axis(points, flat[..., None], axis=1)  # [B, P, C]
    return out.reshape(*idx.shape, C)


def farthest_point_sample(xyz: jnp.ndarray, npoint: int,
                          start: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Farthest point sampling: xyz [B, N, 3] -> indices [B, npoint] int32.

    Sequential in ``npoint`` (inherent), vectorized over B x N per step with a
    carried min-distance field — the exact iteration of the reference
    (pointnet2_utils.py:63-84). ``start`` optionally supplies the per-batch
    initial index ([B] int32); the reference draws it uniformly at random,
    callers pass ``jax.random.randint`` keys' output for that behavior and
    ``None`` (index 0) for deterministic eval.
    """
    B, N, _ = xyz.shape
    # Derive all carries from xyz so that under shard_map their
    # varying-manual-axes type matches the loop body's output (a plain
    # jnp.zeros carry is device-invariant and trips check_vma).
    zero_b = jnp.zeros_like(xyz[:, 0, 0]).astype(jnp.int32)     # [B]
    if start is None:
        start = zero_b
    else:
        start = start.astype(jnp.int32) + zero_b

    def body(i, state):
        distance, farthest, centroids = state
        centroids = lax.dynamic_update_slice(
            centroids, farthest[:, None], (0, i))
        centroid = jnp.take_along_axis(xyz, farthest[:, None, None], axis=1)
        d = jnp.sum(jnp.square(xyz - centroid), axis=-1)       # [B, N]
        distance = jnp.minimum(distance, d)
        farthest = jnp.argmax(distance, axis=-1).astype(jnp.int32)
        return distance, farthest, centroids

    distance0 = jnp.full_like(xyz[..., 0], 1e10).astype(jnp.float32)
    centroids0 = jnp.zeros((B, npoint), dtype=jnp.int32) + zero_b[:, None]
    _, _, centroids = lax.fori_loop(0, npoint, body, (distance0, start, centroids0))
    return centroids


def query_ball_point(radius: float, nsample: int, xyz: jnp.ndarray,
                     new_xyz: jnp.ndarray) -> jnp.ndarray:
    """Fixed-K ball query: first ``nsample`` points (in index order) within
    ``radius`` of each query; shortfall filled with the first found neighbor.

    xyz [B, N, 3], new_xyz [B, S, 3] -> [B, S, nsample] int32.
    Reproduces reference semantics (pointnet2_utils.py:87-107) where the
    sorted masked-index trick keeps the K smallest indices: here done with a
    top_k over (N - masked_idx) so no full sort is materialized.
    """
    B, N, _ = xyz.shape
    S = new_xyz.shape[1]
    sqrdists = square_distance(new_xyz, xyz)                    # [B, S, N]
    idx = lax.broadcasted_iota(jnp.int32, (B, S, N), dimension=2)
    masked = jnp.where(sqrdists > radius * radius, N, idx)      # out-of-ball -> N
    # K smallest masked indices == K largest of (N - masked); descending top_k
    # then yields ascending original indices, matching the reference's sort.
    inv = (N - masked).astype(jnp.int32)
    k = min(nsample, N)
    top, _ = lax.top_k(inv, k)                                  # [B, S, k]
    group_idx = N - top
    if k < nsample:  # degenerate nsample > N: pad, filled below via `first`
        pad = jnp.full((B, S, nsample - k), N, dtype=group_idx.dtype)
        group_idx = jnp.concatenate([group_idx, pad], axis=-1)
    first = group_idx[..., :1]
    group_idx = jnp.where(group_idx == N, first, group_idx)
    return group_idx


def sample_and_group(npoint: int, radius: float, nsample: int,
                     xyz: jnp.ndarray, points: Optional[jnp.ndarray],
                     fps_start: Optional[jnp.ndarray] = None,
                     ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """FPS + ball query + gather + center-subtract + feature concat.

    xyz [B, N, 3], points [B, N, D] or None ->
      new_xyz [B, npoint, 3], new_points [B, npoint, nsample, 3 (+D)].
    Mirrors pointnet2_utils.py:110-138 with channels-last layout.
    """
    fps_idx = farthest_point_sample(xyz, npoint, start=fps_start)
    new_xyz = index_points(xyz, fps_idx)                        # [B, S, 3]
    idx = query_ball_point(radius, nsample, xyz, new_xyz)       # [B, S, K]
    grouped_xyz = index_points(xyz, idx)                        # [B, S, K, 3]
    grouped_xyz_norm = grouped_xyz - new_xyz[:, :, None, :]
    if points is not None:
        grouped_points = index_points(points, idx)              # [B, S, K, D]
        new_points = jnp.concatenate([grouped_xyz_norm, grouped_points], axis=-1)
    else:
        new_points = grouped_xyz_norm
    return new_xyz, new_points


def sample_and_group_all(xyz: jnp.ndarray, points: Optional[jnp.ndarray]
                         ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Single-group variant (pointnet2_utils.py:141-158), channels-last."""
    B, N, C = xyz.shape
    new_xyz = jnp.zeros((B, 1, C), dtype=xyz.dtype)
    grouped_xyz = xyz[:, None, :, :]                            # [B, 1, N, 3]
    if points is not None:
        new_points = jnp.concatenate(
            [grouped_xyz, points[:, None, :, :]], axis=-1)
    else:
        new_points = grouped_xyz
    return new_xyz, new_points


def three_nn(xyz1: jnp.ndarray, xyz2: jnp.ndarray
             ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """3 nearest neighbors of each xyz1 point among xyz2.

    xyz1 [B, N, 3], xyz2 [B, S, 3] -> (dists [B, N, 3], idx [B, N, 3]),
    ascending by distance, ties broken by lower index (same as the
    reference's stable sort at pointnet2_utils.py:296-298).
    """
    sqrdists = square_distance(xyz1, xyz2)                      # [B, N, S]
    neg, idx = lax.top_k(-sqrdists, 3)
    return -neg, idx


def interpolate_weighted(dists: jnp.ndarray, idx: jnp.ndarray,
                         points2: jnp.ndarray) -> jnp.ndarray:
    """Inverse-distance weighted gather-sum given 3-NN results
    (pointnet2_utils.py:300-303: weights 1/(d+1e-8), normalized)."""
    dist_recip = 1.0 / (dists + 1e-8)
    norm = jnp.sum(dist_recip, axis=2, keepdims=True)
    weight = dist_recip / norm                                  # [B, N, 3]
    neighbors = index_points(points2, idx)                      # [B, N, 3, D]
    return jnp.sum(neighbors * weight[..., None], axis=2)


def three_interpolate(xyz1: jnp.ndarray, xyz2: jnp.ndarray,
                      points2: jnp.ndarray) -> jnp.ndarray:
    """Inverse-distance-weighted 3-NN interpolation of points2 onto xyz1.

    xyz1 [B, N, 3], xyz2 [B, S, 3], points2 [B, S, D] -> [B, N, D].
    Matches pointnet2_utils.py:296-303.
    """
    dists, idx = three_nn(xyz1, xyz2)
    return interpolate_weighted(dists, idx, points2)


@functools.partial(jax.jit, static_argnums=(1,))
def pc_normalize(pc: jnp.ndarray, axis: int = 0) -> jnp.ndarray:
    """Center to centroid and scale to the unit sphere
    (pointnet2_utils.py:11-17)."""
    centroid = jnp.mean(pc, axis=axis, keepdims=True)
    pc = pc - centroid
    m = jnp.max(jnp.sqrt(jnp.sum(pc * pc, axis=-1)))
    return pc / m
