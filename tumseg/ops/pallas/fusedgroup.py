"""Fused ball-query + neighborhood-group Pallas TPU kernel.

The split pipeline pays the K=32 selection twice: the ball-query kernel
peels K masked minima (~3 VPU ops per candidate per k, ops/pallas/
ballquery.py) and the group kernel then rebuilds a one-hot from the
returned indices (~2 more ops per candidate per k, ops/pallas/group.py).
But "first nsample in-radius candidates in ascending index order"
(reference models/pointnet2_utils.py:87-107) has a closed form: with
``cnt = cumsum(in_ball)`` along candidates, candidate s is the k-th pick
iff ``in_ball[s] and cnt[s] == k+1``. That equality IS the gather one-hot,
so selection and gather collapse into one build:

- distances [N, S_t] transposed (candidates on sublanes, queries on lanes),
- cnt via chunked lower-triangular MXU matmuls with an f32 carry
  (0/1 entries are exact in bf16; counts accumulate in f32),
- cntM = where(in_ball, cnt, -1): ONE compare per (candidate, k) builds
  E_k [N, S_t], which feeds the transposed gather matmul
  out_k.T [C, S_t] = src.T [C, N] @ E_k (output lanes = queries, so a
  dozen channels pad only to the 8-sublane granule, not 128 lanes),
- shortfall slots (k >= total in-ball) re-select the first pick via
  target_k = 1, replicating the reference's group_first fill,
- indices are recovered exactly as iota-row contractions with the same
  E_k (for the custom VJP, which reuses the group kernel's accumulating
  backward — and for parity tests against query_ball_point).

Semantics are identical to query_ball_point + group_neighborhoods: the
distance form (dx^2+dy^2+dz^2) matches the ball-query kernel, so r^2
boundary rounding is shared; the gather is the same bf16 one-hot
contraction (3-way split in exact mode) as group.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tumseg.ops.pallas.group import _group_t_bwd_impl, _split3_dot

_S_TILE = 128
# largest chunk that keeps tri [chunk, chunk] bf16 in a 2 MB corner of
# VMEM: fewer cumsum parts ==> dramatically faster Mosaic compiles (the
# chunk-concat x k-loop structure compiles superlinearly slowly)
_CHUNK = 1024


def _fused_kernel(radius: float, nsample: int, exact: bool,
                  xyz_ref, q_ref, srcT_ref, outT_ref, idxT_ref):
    N = xyz_ref.shape[1]
    S_t = q_ref.shape[1]
    C = srcT_ref.shape[1]

    sx = xyz_ref[0, :, 0][:, None]                        # [N, 1]
    sy = xyz_ref[0, :, 1][:, None]
    sz = xyz_ref[0, :, 2][:, None]
    qx = q_ref[0, :, 0][None, :]                          # [1, S_t]
    qy = q_ref[0, :, 1][None, :]
    qz = q_ref[0, :, 2][None, :]
    dx = sx - qx
    dy = sy - qy
    dz = sz - qz
    d = dx * dx + dy * dy + dz * dz                       # [N, S_t]
    mask = (d <= radius * radius).astype(jnp.bfloat16)

    # inclusive cumsum along candidates (sublanes) via chunked
    # lower-triangular matmuls; 0/1 products are exact in bf16 and the
    # running carry accumulates in f32 (exact up to 2^24 >> N)
    chunk = min(_CHUNK, N)
    tri = (lax.broadcasted_iota(jnp.int32, (chunk, chunk), 0)
           >= lax.broadcasted_iota(jnp.int32, (chunk, chunk), 1)
           ).astype(jnp.bfloat16)
    # Mosaic-backend minefield, bisected 2026-08-17 (each of these crashed
    # the remote compiler with exit code 1): (a) jnp.where selecting on a
    # matmul-derived operand, (b) VMEM-scratch round-trip of the chunks,
    # (c) carrying cnt_c[chunk-1:chunk, :] row-slices across iterations.
    # Everything below is therefore pure arithmetic on chained VALUES:
    # cntm = cnt*m - (1-m) gives cnt where in-ball and -1 elsewhere, and
    # the carry is a column-sum (same value as the last cumsum row).
    carry = jnp.zeros((1, S_t), dtype=jnp.float32)
    cntm_chunks = []
    for ci in range(N // chunk):
        m_c = mask[ci * chunk:(ci + 1) * chunk, :]
        m_cf = m_c.astype(jnp.float32)
        cnt_c = jnp.dot(tri, m_c, preferred_element_type=jnp.float32,
                        precision=lax.Precision.DEFAULT) + carry
        # -1 sentinel where not in ball: the per-k equality then needs no
        # separate mask AND
        cntm_chunks.append(cnt_c * m_cf - (1.0 - m_cf))
        carry = carry + jnp.sum(m_cf, axis=0, keepdims=True)
    total = carry                                          # [1, S_t]
    cntm = (cntm_chunks[0] if len(cntm_chunks) == 1
            else jnp.concatenate(cntm_chunks, axis=0))     # [N, S_t]
    s_iota = lax.broadcasted_iota(jnp.int32, (1, N),
                                  dimension=1).astype(jnp.float32)
    # row-iota-mask center build (see gridk kernel: Mosaic crashes on the
    # row concat here)
    c_iota = lax.broadcasted_iota(jnp.int32, (C, S_t), 0)
    center = ((c_iota == 0).astype(jnp.float32) * qx
              + (c_iota == 1).astype(jnp.float32) * qy
              + (c_iota == 2).astype(jnp.float32) * qz)    # [C, S_t]
    for k in range(nsample):  # python floats: captured jnp scalars error
        # arithmetic select (see minefield note): k+1 while in range, else 1
        target_k = 1.0 + (total > float(k)).astype(jnp.float32) * float(k)
        ek = (cntm == target_k).astype(jnp.bfloat16)       # [N, S_t]
        gathered = _split3_dot(srcT_ref[0, :, :], ek, exact)  # [C, S_t]
        outT_ref[0, k * C:(k + 1) * C, :] = (
            gathered - center).astype(outT_ref.dtype)
        # index recovery: the unique selected candidate's iota (exact via
        # the same 3-way split — indices need 12 bits, bf16 carries 8).
        # Empty balls (total == 0, ek all-zero) emit the N sentinel, same
        # as query_ball_point's shortfall-with-nothing-found.
        empty = (total <= 0.0).astype(jnp.float32) * float(N)
        idxT_ref[0, k:k + 1, :] = _split3_dot(s_iota, ek, True) + empty


def _fused_gridk_kernel(radius: float, nsample: int, exact: bool,
                        xyz_ref, q_ref, srcT_ref, outT_ref, idxT_ref,
                        cntm_ref, total_ref):
    """One k per grid step (grid = [B, S/s_tile, K], k fastest).

    The unrolled kernel above compiles pathologically on the current
    Mosaic backend at sa scale — the program repeats the compare+matmul
    body K=32 times. Here each grid step holds ONE k-body: the cumsum
    selection map is computed once per (batch, s-tile) at k == 0 into
    VMEM scratch and re-read by the remaining K-1 steps, so program size
    is ~K× smaller while device work is identical. Output rows for step k
    land via the BlockSpec row-block index (no dynamic stores); indices
    accumulate one-hot into an 8-row block (k // 8) because a 1-row
    dynamic store is not legal on sublanes.
    """
    N = xyz_ref.shape[1]
    S_t = q_ref.shape[1]
    C = srcT_ref.shape[1]
    k = pl.program_id(2)

    qx = q_ref[0, :, 0][None, :]                          # [1, S_t]
    qy = q_ref[0, :, 1][None, :]
    qz = q_ref[0, :, 2][None, :]

    @pl.when(k == 0)
    def _():
        sx = xyz_ref[0, :, 0][:, None]                    # [N, 1]
        sy = xyz_ref[0, :, 1][:, None]
        sz = xyz_ref[0, :, 2][:, None]
        dx = sx - qx
        dy = sy - qy
        dz = sz - qz
        d = dx * dx + dy * dy + dz * dz                   # [N, S_t]
        mask = (d <= radius * radius).astype(jnp.bfloat16)
        chunk = min(_CHUNK, N)
        tri = (lax.broadcasted_iota(jnp.int32, (chunk, chunk), 0)
               >= lax.broadcasted_iota(jnp.int32, (chunk, chunk), 1)
               ).astype(jnp.bfloat16)
        carry = jnp.zeros((1, S_t), dtype=jnp.float32)
        for ci in range(N // chunk):
            m_c = mask[ci * chunk:(ci + 1) * chunk, :]
            m_cf = m_c.astype(jnp.float32)
            cnt_c = jnp.dot(tri, m_c,
                            preferred_element_type=jnp.float32,
                            precision=lax.Precision.DEFAULT) + carry
            cntm_ref[ci * chunk:(ci + 1) * chunk, :] = (
                cnt_c * m_cf - (1.0 - m_cf))
            carry = carry + jnp.sum(m_cf, axis=0, keepdims=True)
        total_ref[0:1, :] = carry

    cntm = cntm_ref[:, :]                                  # [N, S_t]
    total = total_ref[0:1, :]                              # [1, S_t]
    kf = k.astype(jnp.float32)
    # k+1 while k < total (in range), else 1: the reference's group_first
    # shortfall fill, as pure arithmetic on the traced grid index
    target_k = 1.0 + (total > kf).astype(jnp.float32) * kf
    ek = (cntm == target_k).astype(jnp.bfloat16)           # [N, S_t]
    gathered = _split3_dot(srcT_ref[0, :, :], ek, exact)   # [C, S_t]
    # center rows 0-2 = query xyz, rest 0 — built arithmetically via
    # row-iota masks: tpu.concatenate of single rows onto a zeros block
    # is ANOTHER Mosaic crash ("result/input offset mismatch on
    # non-concat dimension", /tmp/fused_sa2.log 2026-08-17)
    c_iota = lax.broadcasted_iota(jnp.int32, (C, S_t), 0)
    center = ((c_iota == 0).astype(jnp.float32) * qx
              + (c_iota == 1).astype(jnp.float32) * qy
              + (c_iota == 2).astype(jnp.float32) * qz)    # [C, S_t]
    outT_ref[0, :, :] = (gathered - center).astype(outT_ref.dtype)

    s_iota = lax.broadcasted_iota(jnp.int32, (1, N),
                                  dimension=1).astype(jnp.float32)
    empty = (total <= 0.0).astype(jnp.float32) * float(N)
    idx_row = _split3_dot(s_iota, ek, True) + empty        # [1, S_t]
    row_sel = (lax.broadcasted_iota(jnp.int32, (8, S_t), 0)
               == lax.rem(k, 8)).astype(jnp.float32)
    contrib = row_sel * idx_row                            # [8, S_t]

    @pl.when(lax.rem(k, 8) == 0)
    def _():
        idxT_ref[0, :, :] = contrib

    @pl.when(lax.rem(k, 8) != 0)
    def _():
        idxT_ref[0, :, :] += contrib


def _fused_gridk_impl(radius: float, nsample: int, xyz, new_xyz, src,
                      exact: bool):
    B, N, _ = xyz.shape
    S = new_xyz.shape[1]
    C = src.shape[2]
    if N > _CHUNK and N % _CHUNK != 0:
        raise NotImplementedError(
            f"fused_ball_group needs N <= {_CHUNK} or N % {_CHUNK} == 0, "
            f"got N={N}")
    s_tile = min(_S_TILE, S)
    if S % s_tile != 0:
        s_tile = S

    xyzf = xyz.astype(jnp.float32)
    queries = new_xyz.astype(jnp.float32)
    srcT = jnp.transpose(src.astype(jnp.float32), (0, 2, 1))  # [B, C, N]
    C8 = (C + 7) // 8 * 8
    if C8 != C:
        srcT = jnp.pad(srcT, [(0, 0), (0, C8 - C), (0, 0)])
    K8 = (nsample + 7) // 8 * 8

    out_dtype = jnp.float32 if exact else jnp.bfloat16
    grid = (B, S // s_tile, nsample)
    kernel = functools.partial(_fused_gridk_kernel, float(radius), nsample,
                               exact)
    outT, idxT = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, N, 3), lambda i, j, k: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s_tile, 3), lambda i, j, k: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C8, N), lambda i, j, k: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, C8, s_tile), lambda i, j, k: (i, k, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, s_tile), lambda i, j, k: (i, k // 8, j),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, nsample * C8, S), out_dtype),
            jax.ShapeDtypeStruct((B, K8, S), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((N, s_tile), jnp.float32),
            pltpu.VMEM((8, s_tile), jnp.float32),
        ],
    )(xyzf, queries, srcT)

    # [B, K*C8, S] -> [B, S, K, C]
    grouped = jnp.transpose(outT, (0, 2, 1)).reshape(
        B, S, nsample, C8)[..., :C]
    idx = jnp.rint(jnp.transpose(idxT[:, :nsample, :],
                                 (0, 2, 1))).astype(jnp.int32)
    return grouped, idx


def _fused_impl(radius: float, nsample: int, xyz, new_xyz, src, exact: bool):
    B, N, _ = xyz.shape
    S = new_xyz.shape[1]
    C = src.shape[2]
    if N > _CHUNK and N % _CHUNK != 0:
        # the cumsum chunk loop covers exactly N // chunk * chunk candidates
        raise NotImplementedError(
            f"fused_ball_group needs N <= {_CHUNK} or N % {_CHUNK} == 0, "
            f"got N={N}")
    s_tile = min(_S_TILE, S)
    if S % s_tile != 0:
        s_tile = S

    xyzf = xyz.astype(jnp.float32)
    queries = new_xyz.astype(jnp.float32)
    srcT = jnp.transpose(src.astype(jnp.float32), (0, 2, 1))  # [B, C, N]
    # pad channels to the 8-sublane granule so every k*C write offset in the
    # [K*C, S_t] output block is sublane-aligned
    C8 = (C + 7) // 8 * 8
    if C8 != C:
        srcT = jnp.pad(srcT, [(0, 0), (0, C8 - C), (0, 0)])

    out_dtype = jnp.float32 if exact else jnp.bfloat16
    grid = (B, S // s_tile)
    kernel = functools.partial(_fused_kernel, float(radius), nsample, exact)
    outT, idxT = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, N, 3), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s_tile, 3), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C8, N), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, nsample * C8, s_tile), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nsample, s_tile), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, nsample * C8, S), out_dtype),
            jax.ShapeDtypeStruct((B, nsample, S), jnp.float32),
        ),
    )(xyzf, queries, srcT)

    # [B, K*C, S] -> [B, S, K, C]
    grouped = jnp.transpose(outT, (0, 2, 1)).reshape(
        B, S, nsample, C8)[..., :C]
    idx = jnp.rint(jnp.transpose(idxT, (0, 2, 1))).astype(jnp.int32)
    return grouped, idx


def _make_fused(radius: float, nsample: int, exact: bool, structure: str):
    impl = _fused_gridk_impl if structure == "gridk" else _fused_impl

    @jax.custom_vjp
    def fused(xyz, new_xyz, src):
        return impl(radius, nsample, xyz, new_xyz, src, exact)

    def _fwd(xyz, new_xyz, src):
        grouped, idx = impl(radius, nsample, xyz, new_xyz, src, exact)
        return (grouped, idx), (idx, src.shape[1])

    def _bwd(res, cots):
        g, _ = cots                      # idx cotangent is discrete: ignored
        idx, N = res
        B, S, K, C = g.shape
        R = S * K
        gT = jnp.transpose(g.reshape(B, R, C).astype(jnp.float32), (0, 2, 1))
        idx_col = idx.reshape(B, R, 1)
        dsrcT = _group_t_bwd_impl(idx_col, gT, N, exact)
        dsrc = jnp.transpose(dsrcT, (0, 2, 1))
        # coordinates carry no upstream parameter dependence in these models
        # (same zero-cotangent convention as group.py / threenn.py)
        return None, None, dsrc

    fused.defvjp(_fwd, _bwd)
    return fused


_FUSED_CACHE = {}


def fused_ball_group(radius: float, nsample: int, xyz: jnp.ndarray,
                     new_xyz: jnp.ndarray, src: jnp.ndarray,
                     fast: bool = False, structure: str = None):
    """xyz [B,N,3], new_xyz [B,S,3], src [B,N,3+D] (xyz-first channels) ->
    (grouped [B,S,K,3+D] with channels 0-2 center-relative, idx [B,S,K]).

    Drop-in for query_ball_point + group_neighborhoods in one kernel pass.
    ``fast`` selects the single-pass bf16 gather (bf16 compute mode);
    exact mode reconstructs f32 via the 3-way bf16 split. ``structure``
    picks the kernel shape: "gridk" (default; one k per grid step, ~K×
    smaller Mosaic program) or "unroll" (original Python-unrolled k-loop,
    kept for A/B — it crashes or compiles pathologically at sa scale).
    """
    import os
    if structure is None:
        structure = os.environ.get("TUMSEG_FUSED_STRUCTURE", "gridk")
    key = (float(radius), int(nsample), bool(fast), structure)
    if key not in _FUSED_CACHE:
        _FUSED_CACHE[key] = _make_fused(float(radius), int(nsample),
                                        not fast, structure)
    return _FUSED_CACHE[key](xyz, new_xyz, src)
