"""Pallas TPU kernel for fixed-K ball query.

The XLA composition materializes a [B, S, N] distance tensor in HBM and runs
``top_k`` over the masked indices (~68 ms for sa1's B=32, S=1024, N=4096).
This kernel never materializes distances off-chip: each program handles one
batch row x one S-tile, computes the masked index matrix in VMEM from the
coordinate planes, and peels the K smallest indices with K masked-min
reductions (successive minima strictly above the last taken index).

Semantics identical to tumseg.ops.core.query_ball_point (and the reference
models/pointnet2_utils.py:87-107): first ``nsample`` in-radius points in
ascending index order, shortfall filled with the first found neighbor.

Layout note: coordinates are packed as [B, 3, N] planes so every BlockSpec
has its last two dims either full or (8, 128)-aligned, as Mosaic requires.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_DEFAULT_S_TILE = 256


def _legalize_lane_tile(s_tile: int, S: int) -> int:
    """Legal query-tile size for kernels that tile queries on the MINOR
    (lane) axis: a partial tile must be a 128-multiple that divides S, else
    the full row (Mosaic block-shape rule — interpret mode tolerates
    anything; real lowering rejects sub-128 partial lane tiles, the r5
    hardware-suite failure class fixed in 7d456a7)."""
    s_tile = min(s_tile, S)
    if S % s_tile != 0:
        return S
    if s_tile < S and s_tile % 128 != 0:
        cand = -(-s_tile // 128) * 128
        while cand < S and S % cand != 0:
            cand += 128
        s_tile = min(cand, S)
    return s_tile


def _ballquery_kernel(radius: float, nsample: int, n_total: int,
                      xyz_ref, q_ref, out_ref):
    S_t = q_ref.shape[1]
    N = xyz_ref.shape[2]
    col = lax.broadcasted_iota(jnp.int32, (S_t, N), dimension=1)
    kcol = lax.broadcasted_iota(jnp.int32, (S_t, nsample), dimension=1)

    # [S_t, N] squared distances from broadcasted planes, all VPU (a q.s
    # MXU expansion was tried and is ~10x SLOWER here: a contraction depth
    # of 3 pads to 128 on the systolic array, and HIGHEST multiplies the
    # [S_t, N] output passes by 6). Membership parity with the XLA oracle
    # holds at 1.0 on the benched shapes (ties at the r^2 boundary are
    # measure-zero); masked stays a chained VALUE (no scratch round-trip).
    qn = q_ref[0, :, :]                                   # [S_t, 3]
    dx = xyz_ref[0, 0, :][None, :] - qn[:, 0][:, None]
    dy = xyz_ref[0, 1, :][None, :] - qn[:, 1][:, None]
    dz = xyz_ref[0, 2, :][None, :] - qn[:, 2][:, None]
    d = dx * dx + dy * dy + dz * dz
    # The direct form rounds differently from the oracle's ||q||^2+||s||^2
    # -2q.s expansion, so ~4e-5 of points exactly at the r^2 boundary flip
    # membership vs the XLA path (measured; semantically neutral — both are
    # valid roundings of the same ball). The bit-matching MXU-expansion
    # variant was benchmarked and costs ~15% more end-to-end: a contraction
    # depth of 3 pads to 128 on the systolic array. TUMSEG_OPS_IMPL=xla
    # remains the bit-exact reference path.
    masked = jnp.where(d <= radius * radius, col, n_total)

    acc = jnp.zeros((S_t, nsample), dtype=jnp.int32)
    last = jnp.full((S_t, 1), -1, dtype=jnp.int32)
    first = jnp.zeros((S_t, 1), dtype=jnp.int32)
    for k in range(nsample):  # static unroll: nsample is a model constant
        cand = jnp.where(masked > last, masked, n_total)
        cur = jnp.min(cand, axis=1, keepdims=True)
        if k == 0:
            first = cur
        filled = jnp.where(cur == n_total, first, cur)
        acc = acc + jnp.where(kcol == k, filled, 0)
        last = cur
    out_ref[0, :, :] = acc


@functools.partial(jax.jit, static_argnums=(0, 1))
def query_ball_point(radius: float, nsample: int, xyz: jnp.ndarray,
                     new_xyz: jnp.ndarray) -> jnp.ndarray:
    """xyz [B, N, 3], new_xyz [B, S, 3] -> [B, S, nsample] int32."""
    B, N, _ = xyz.shape
    S = new_xyz.shape[1]
    s_tile = min(_DEFAULT_S_TILE, S)
    if S % s_tile != 0:  # S is a power-of-two model constant; stay simple
        s_tile = S

    planes = jnp.transpose(xyz.astype(jnp.float32), (0, 2, 1))      # [B,3,N]
    queries = new_xyz.astype(jnp.float32)                           # [B,S,3]

    grid = (B, S // s_tile)
    kernel = functools.partial(_ballquery_kernel, float(radius), nsample, N)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 3, N), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s_tile, 3), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, s_tile, nsample), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, S, nsample), jnp.int32),
    )(planes, queries)


def _ballquery_kernel_t(radius: float, nsample: int, n_total: int,
                        xyz_ref, qplane_ref, out_ref):
    """Transposed peel: candidates on SUBLANES, queries on lanes.

    The row kernel above peels `jnp.min(cand, axis=1)` across the LANE
    axis (N candidates on lanes) — K=32 cross-lane reductions per tile,
    the VPU's slow direction (the same pathology the transposed 3-NN
    kernel removed, threenn.py). Here masked is [N, S_t]; each peel
    reduces across sublanes. Output lands as [B, nsample, S] planes and
    is transposed outside. Semantics identical to the row kernel."""
    N = xyz_ref.shape[1]
    S_t = qplane_ref.shape[2]
    rows = lax.broadcasted_iota(jnp.int32, (N, S_t), dimension=0)
    krow = lax.broadcasted_iota(jnp.int32, (nsample, S_t), dimension=0)

    d = _bp_distances(xyz_ref, qplane_ref)                # [N, S_t]
    masked = jnp.where(d <= radius * radius, rows, n_total)

    acc = jnp.zeros((nsample, S_t), dtype=jnp.int32)
    last = jnp.full((1, S_t), -1, dtype=jnp.int32)
    first = jnp.zeros((1, S_t), dtype=jnp.int32)
    for k in range(nsample):
        cand = jnp.where(masked > last, masked, n_total)
        cur = jnp.min(cand, axis=0, keepdims=True)        # [1, S_t]
        if k == 0:
            first = cur
        filled = jnp.where(cur == n_total, first, cur)
        acc = acc + jnp.where(krow == k, filled, 0)
        last = cur
    out_ref[0, :, :] = acc


@functools.partial(jax.jit, static_argnums=(0, 1, 4))
def query_ball_point_t(radius: float, nsample: int, xyz: jnp.ndarray,
                       new_xyz: jnp.ndarray,
                       s_tile: int = 128) -> jnp.ndarray:
    """Transposed-peel query_ball_point (same contract as the row form)."""
    B, N, _ = xyz.shape
    S = new_xyz.shape[1]
    s_tile = _legalize_lane_tile(s_tile, S)

    rowsxyz = xyz.astype(jnp.float32)                     # [B, N, 3]
    qplanes = jnp.transpose(new_xyz.astype(jnp.float32), (0, 2, 1))

    grid = (B, S // s_tile)
    kernel = functools.partial(_ballquery_kernel_t, float(radius), nsample, N)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, N, 3), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, s_tile), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, nsample, s_tile), lambda i, j: (i, 0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, nsample, S), jnp.int32),
    )(rowsxyz, qplanes)
    return jnp.transpose(out, (0, 2, 1))


# ---------------------------------------------------------------------------
# bit-packed peel variant
# ---------------------------------------------------------------------------
#
# The K-peel above costs ~4 VPU ops per candidate per k (mask-compare, min
# reduction, one-hot select) — 4*N*K per query, the measured forward floor.
# But the peel only consumes the BOOLEAN in-ball mask and candidate POSITIONS
# (== original indices in the full kernel), so pack the mask into int32
# words — bit (n % 32) of word (n // 32) — and peel set bits instead of
# lanes: find the first nonzero word (min-iota over W = N/32 sublane rows),
# take its lowest set bit (w & -w), convert the power of two to a bit
# position, clear it, repeat. Each peel step touches W words instead of N
# candidates: ~8*W ops per k, a ~16x peel cut. The distance build is
# unchanged (f32, same rounding as the transposed kernel), so membership —
# and therefore output indices — are bit-identical to _ballquery_kernel_t.


def _bp_pack_and_peel(in_ball, nsample: int, n_total: int, two_level: bool):
    """Pack an [N, S_t] 0/1 in-ball mask into int32 words and peel the
    ``nsample`` lowest set bits per lane -> acc [nsample, S_t] of original
    candidate indices (shortfall filled with the first found neighbor,
    empty balls with the n_total sentinel handled by the caller contract —
    identical fill semantics to the masked-min peels above)."""
    N, S_t = in_ball.shape
    W = N // 32
    rows = lax.broadcasted_iota(jnp.int32, (N, S_t), dimension=0)
    wrow = lax.broadcasted_iota(jnp.int32, (W, S_t), dimension=0)
    krow = lax.broadcasted_iota(jnp.int32, (nsample, S_t), dimension=0)

    # pack: bit (n % 32) of word (n // 32); the reshape keeps the minor
    # (lane) dim so Mosaic lays it out as a pure sublane regroup
    shifted = in_ball << (rows % 32)
    words = jnp.sum(shifted.reshape(W, 32, S_t), axis=1)  # [W, S_t]

    def _lsb_pos(v):
        lsb = v & (0 - v)
        return lsb, lax.population_count(lsb - 1)         # lsb=2^j -> j

    acc = jnp.zeros((nsample, S_t), dtype=jnp.int32)
    first = jnp.zeros((1, S_t), dtype=jnp.int32)
    if two_level and W % 32 == 0 and W >= 32:
        Ws = W // 32
        srow = lax.broadcasted_iota(jnp.int32, (Ws, S_t), dimension=0)
        summ = jnp.sum(((words != 0).astype(jnp.int32)
                        << (wrow % 32)).reshape(Ws, 32, S_t), axis=1)
        for k in range(nsample):
            snz = summ != 0
            ssel = jnp.min(jnp.where(snz, srow, Ws), axis=0, keepdims=True)
            s_oh = srow == ssel                           # [Ws, S_t]
            sval = jnp.sum(jnp.where(s_oh, summ, 0), axis=0, keepdims=True)
            slsb, sbit = _lsb_pos(sval)
            wsel = ssel * 32 + sbit                       # first nz word
            onehot = wrow == wsel                         # [W, S_t]
            wval = jnp.sum(jnp.where(onehot, words, 0), axis=0,
                           keepdims=True)
            lsb, bitpos = _lsb_pos(wval)
            cur = jnp.where(ssel == Ws, n_total, wsel * 32 + bitpos)
            if k == 0:
                first = cur
            filled = jnp.where(cur == n_total, first, cur)
            acc = acc + jnp.where(krow == k, filled, 0)
            words = words - jnp.where(onehot, lsb, 0)
            # word exhausted -> clear its summary bit
            summ = summ - jnp.where(s_oh, jnp.where(wval == lsb, slsb, 0), 0)
    else:
        for k in range(nsample):  # static unroll: nsample a model constant
            nz = words != 0
            wsel = jnp.min(jnp.where(nz, wrow, W), axis=0, keepdims=True)
            onehot = wrow == wsel                         # [W, S_t]
            wval = jnp.sum(jnp.where(onehot, words, 0), axis=0,
                           keepdims=True)
            lsb, bitpos = _lsb_pos(wval)
            cur = jnp.where(wsel == W, n_total, wsel * 32 + bitpos)
            if k == 0:
                first = cur
            filled = jnp.where(cur == n_total, first, cur)
            acc = acc + jnp.where(krow == k, filled, 0)
            words = words - jnp.where(onehot, lsb, 0)
    return acc


def _bp_distances(xyz_ref, qplane_ref):
    """[N, S_t] squared distances, candidates on sublanes. Shared by the
    transposed (_ballquery_kernel_t) and bit-packed (_ballquery_kernel_bp*)
    peels — their cross-variant bit-parity rests on one distance build."""
    s = xyz_ref[0, :, :]                                  # [N, 3]
    sx = s[:, 0][:, None]
    sy = s[:, 1][:, None]
    sz = s[:, 2][:, None]
    qx = qplane_ref[0, 0, :][None, :]                     # [1, S_t]
    qy = qplane_ref[0, 1, :][None, :]
    qz = qplane_ref[0, 2, :][None, :]
    dx = sx - qx
    dy = sy - qy
    dz = sz - qz
    return dx * dx + dy * dy + dz * dz                    # [N, S_t]


def _ballquery_kernel_bp(radius: float, nsample: int, n_total: int,
                         two_level: bool,
                         xyz_ref, qplane_ref, out_ref):
    """Bit-packed peel: candidates on sublanes, queries on lanes.

    ``two_level`` additionally maintains a summary bitmap (bit w of summary
    word w//32 = "word w nonzero") so the first-nonzero-word search is a
    lowest-set-bit extraction over W/32 summary rows instead of a min-iota
    reduction over W word rows — ~5*W ops per peel step vs ~8*W."""
    d = _bp_distances(xyz_ref, qplane_ref)
    in_ball = (d <= radius * radius).astype(jnp.int32)
    out_ref[0, :, :] = _bp_pack_and_peel(in_ball, nsample, n_total, two_level)


def _ballquery_kernel_bp_multi(radii, nsamples, n_total: int,
                               two_level: bool,
                               xyz_ref, qplane_ref, *out_refs):
    """Multi-radius bit-packed peel: ONE distance build shared across all
    radii (the MSG layer queries the same (xyz, new_xyz) pair once per
    radius — reference models/pointnet2_utils.py:229-237). The 8*N-op
    distance build is the largest single term in the bp kernel (vs
    ~K*5*(N/32) peel), so sharing it across R radii saves ~(R-1)*8*N ops
    per query tile. Each radius keeps its own mask/pack/peel, so outputs
    are bit-identical to per-radius query_ball_point_bp calls."""
    d = _bp_distances(xyz_ref, qplane_ref)
    for radius, nsample, out_ref in zip(radii, nsamples, out_refs):
        in_ball = (d <= radius * radius).astype(jnp.int32)
        out_ref[0, :, :] = _bp_pack_and_peel(in_ball, nsample, n_total,
                                             two_level)


def bp2_engages(n_points: int) -> bool:
    """True when the two-level ("bp2") summary bitmap actually engages at
    candidate count ``n_points`` — the single source of truth for the
    _bp_pack_and_peel gate (W = N/32 must itself pack into words:
    W % 32 == 0 and W >= 32). Probes/labels must query this instead of
    re-deriving the condition (bitpack_probe.py)."""
    w = n_points // 32
    return n_points % 32 == 0 and w % 32 == 0 and w >= 32


@functools.partial(jax.jit, static_argnums=(0, 1, 4, 5))
def query_ball_point_bp(radius: float, nsample: int, xyz: jnp.ndarray,
                        new_xyz: jnp.ndarray,
                        s_tile: int = 128,
                        two_level: bool = False) -> jnp.ndarray:
    """Bit-packed-peel query_ball_point (same contract as the row form).

    ``two_level=True`` (the "bp2" variant) adds a summary bitmap over the
    packed words, but that level only engages when ``bp2_engages(N)``
    (W = N/32 a multiple of 32 and >= 32 — i.e. N % 1024 == 0 and
    N >= 1024). At any other shape the call SILENTLY runs the single-level
    peel ("bp"), so A/B rows labeled bp2 at such shapes measure bp
    (bitpack_probe.py prints the effective variant per row)."""
    B, N, _ = xyz.shape
    S = new_xyz.shape[1]
    s_tile = _legalize_lane_tile(s_tile, S)
    if N % 32 != 0:
        return query_ball_point(radius, nsample, xyz, new_xyz)

    rowsxyz = xyz.astype(jnp.float32)                     # [B, N, 3]
    qplanes = jnp.transpose(new_xyz.astype(jnp.float32), (0, 2, 1))

    grid = (B, S // s_tile)
    kernel = functools.partial(_ballquery_kernel_bp, float(radius), nsample,
                               N, bool(two_level))
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, N, 3), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, s_tile), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, nsample, s_tile), lambda i, j: (i, 0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, nsample, S), jnp.int32),
    )(rowsxyz, qplanes)
    return jnp.transpose(out, (0, 2, 1))


@functools.partial(jax.jit, static_argnums=(0, 1, 4, 5))
def query_ball_point_bp_multi(radii, nsamples, xyz: jnp.ndarray,
                              new_xyz: jnp.ndarray,
                              s_tile: int = 128,
                              two_level: bool = False):
    """Fused multi-radius ball query: one kernel launch, the distance
    build shared across radii, one [B, S, K_i] int32 output per radius.

    Same contract per output as query_ball_point_bp(radii[i], nsamples[i],
    xyz, new_xyz) — bit-identical indices. Used by the MSG set-abstraction
    layer (reference models/pointnet2_utils.py:205-262), whose radius list
    queries the same centroids 2-3x."""
    radii = tuple(float(r) for r in radii)
    nsamples = tuple(int(k) for k in nsamples)
    B, N, _ = xyz.shape
    S = new_xyz.shape[1]
    s_tile = _legalize_lane_tile(s_tile, S)
    if N % 32 != 0:
        return tuple(query_ball_point(r, k, xyz, new_xyz)
                     for r, k in zip(radii, nsamples))

    rowsxyz = xyz.astype(jnp.float32)                     # [B, N, 3]
    qplanes = jnp.transpose(new_xyz.astype(jnp.float32), (0, 2, 1))

    grid = (B, S // s_tile)
    kernel = functools.partial(_ballquery_kernel_bp_multi, radii, nsamples,
                               N, bool(two_level))
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, N, 3), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, s_tile), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=tuple(
            pl.BlockSpec((1, k, s_tile), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM) for k in nsamples),
        out_shape=tuple(
            jax.ShapeDtypeStruct((B, k, S), jnp.int32) for k in nsamples),
    )(rowsxyz, qplanes)
    return tuple(jnp.transpose(o, (0, 2, 1)) for o in outs)


# ---------------------------------------------------------------------------
# z-window pruned variant
# ---------------------------------------------------------------------------
#
# The full kernel's cost is the K-peel over all N candidates per query. But a
# ball of radius r only contains points with |z - z_q| <= r, so after sorting
# candidates by z every query's in-radius set lives in a contiguous rank
# window. Sorting the queries by z too makes each s_tile-query tile share a
# single candidate window of C << N sorted lanes, cutting the peel (and the
# distance build) by N/C. Facade blocks (1 m x 1 m xy, full building height,
# reference sem_seg_training.py:207-221) spread almost entirely in z, so the
# needed window is tiny; even the uniform-cube worst case fits C=1536 at
# sa1's N=4096, S=1024, r=0.1.
#
# Exactness: the peel runs on ORIGINAL indices (carried through the sort), so
# output semantics are identical to the full kernel whenever the window
# covers every in-radius candidate. That coverage is *checked on device*
# (searchsorted bounds with a rounding margin) and a lax.cond falls back to
# the full kernel when any tile's window would overflow — the windowed path
# is a pure optimization, never a semantics change.

_WINDOW_S_TILE = 128
# transposed-peel windowed kernel (candidates on sublanes); flipped by the
# on-device A/B in benchmarks — semantics identical either way
_WINDOW_TRANSPOSED = True


def _ballquery_window_kernel(radius: float, nsample: int, n_total: int,
                             c_window: int, start_ref, xyz_ref, oc_ref,
                             q_ref, out_ref):
    S_t = q_ref.shape[1]
    kcol = lax.broadcasted_iota(jnp.int32, (S_t, nsample), dimension=1)

    start = pl.multiple_of(start_ref[pl.program_id(0), pl.program_id(1)], 128)
    sx = xyz_ref[0, 0, pl.ds(start, c_window)]            # [C]
    sy = xyz_ref[0, 1, pl.ds(start, c_window)]
    sz = xyz_ref[0, 2, pl.ds(start, c_window)]
    oc = oc_ref[0, 0, pl.ds(start, c_window)]             # [C] original idx

    qn = q_ref[0, :, :]                                   # [S_t, 3]
    dx = sx[None, :] - qn[:, 0][:, None]
    dy = sy[None, :] - qn[:, 1][:, None]
    dz = sz[None, :] - qn[:, 2][:, None]
    d = dx * dx + dy * dy + dz * dz
    masked = jnp.where(d <= radius * radius, oc[None, :], n_total)

    acc = jnp.zeros((S_t, nsample), dtype=jnp.int32)
    last = jnp.full((S_t, 1), -1, dtype=jnp.int32)
    first = jnp.zeros((S_t, 1), dtype=jnp.int32)
    for k in range(nsample):
        cand = jnp.where(masked > last, masked, n_total)
        cur = jnp.min(cand, axis=1, keepdims=True)
        if k == 0:
            first = cur
        filled = jnp.where(cur == n_total, first, cur)
        acc = acc + jnp.where(kcol == k, filled, 0)
        last = cur
    out_ref[0, :, :] = acc


def _ballquery_window_kernel_t(radius: float, nsample: int, n_total: int,
                               c_window: int, start_ref, srcs_ref, occol_ref,
                               qplane_ref, out_ref):
    """Transposed-peel windowed kernel: the C-candidate window lives on
    SUBLANES (dynamic 128-aligned row slice), queries on lanes, so the
    K peel minima reduce in the VPU's fast direction — same move as
    _ballquery_kernel_t / the transposed 3-NN kernel."""
    S_t = qplane_ref.shape[2]
    krow = lax.broadcasted_iota(jnp.int32, (nsample, S_t), dimension=0)

    start = pl.multiple_of(start_ref[pl.program_id(0), pl.program_id(1)], 128)
    s = srcs_ref[0, pl.ds(start, c_window), :]            # [C, 3]
    sx = s[:, 0][:, None]
    sy = s[:, 1][:, None]
    sz = s[:, 2][:, None]
    oc = occol_ref[0, pl.ds(start, c_window), :]          # [C, 1] orig idx

    qx = qplane_ref[0, 0, :][None, :]                     # [1, S_t]
    qy = qplane_ref[0, 1, :][None, :]
    qz = qplane_ref[0, 2, :][None, :]
    dx = sx - qx
    dy = sy - qy
    dz = sz - qz
    d = dx * dx + dy * dy + dz * dz                       # [C, S_t]
    masked = jnp.where(d <= radius * radius,
                       jnp.broadcast_to(oc, (c_window, S_t)), n_total)

    acc = jnp.zeros((nsample, S_t), dtype=jnp.int32)
    last = jnp.full((1, S_t), -1, dtype=jnp.int32)
    first = jnp.zeros((1, S_t), dtype=jnp.int32)
    for k in range(nsample):
        cand = jnp.where(masked > last, masked, n_total)
        cur = jnp.min(cand, axis=0, keepdims=True)
        if k == 0:
            first = cur
        filled = jnp.where(cur == n_total, first, cur)
        acc = acc + jnp.where(krow == k, filled, 0)
        last = cur
    out_ref[0, :, :] = acc


def _sort_with_payload(keys, *payloads):
    """Ascending sort along axis 1, carrying payloads. keys [B, N]."""
    iota = jnp.broadcast_to(jnp.arange(keys.shape[1], dtype=jnp.int32),
                            keys.shape)
    return lax.sort((keys, iota) + payloads, dimension=1, num_keys=1)


def _unpermute_rows_int(values: jnp.ndarray, inv: jnp.ndarray) -> jnp.ndarray:
    """Row gather values[b, inv[b, s], :] for int payloads via the one-hot
    MXU group kernel (XLA's dynamic row gather costs ~1 ms at [32,1024,32];
    the contraction is ~0.05 ms). Values must be < 2^24 (exact in the 3-way
    bf16 split)."""
    from tumseg.ops.pallas.group import group_points

    B, S, K = values.shape
    zeros = jnp.zeros((B, S, 3), dtype=jnp.float32)
    g = group_points(inv[:, :, None], values.astype(jnp.float32), zeros,
                     fast=False)
    return jnp.rint(g[:, :, 0, :]).astype(values.dtype)


@functools.partial(jax.jit, static_argnums=(0, 1, 4, 5, 6))
def query_ball_point_windowed(radius: float, nsample: int, xyz: jnp.ndarray,
                              new_xyz: jnp.ndarray,
                              window=1536,
                              s_tile: int = _WINDOW_S_TILE,
                              fallback: str = "full") -> jnp.ndarray:
    """Exact query_ball_point with z-window candidate pruning.

    Same contract as query_ball_point. ``window`` is an int or an ascending
    tuple of candidate window sizes: the sort/searchsorted glue is shared and
    a lax.cond chain picks the SMALLEST tier whose window covers every
    tile's in-radius span, falling back to ``fallback`` when none does:
    "full" = the plain peel kernel; "bp"/"bp2" = the bit-packed peel
    (data-INDEPENDENT ~2.22 ms at sa1 with s_tile 256 vs the full kernel's
    5.0 and the N//2 window tier's 3.2 — r5 device bitpack_probe, both
    facade and uniform-cube data), so windows handle the data that fits
    them tightly and bp2 bounds the worst case.
    """
    B, N, _ = xyz.shape
    S = new_xyz.shape[1]
    windows = (window,) if isinstance(window, int) else tuple(window)
    tiers = sorted({min(c, N) for c in windows})
    tiers = [c for c in tiers if c < N and c % 128 == 0]
    if _WINDOW_TRANSPOSED:
        s_tile = _legalize_lane_tile(s_tile, S)
    else:
        s_tile = min(s_tile, S)
        if S % s_tile != 0:
            s_tile = S
    T = S // s_tile
    if not tiers or N % 128 != 0:
        return query_ball_point(radius, nsample, xyz, new_xyz)

    xyz = xyz.astype(jnp.float32)
    queries = new_xyz.astype(jnp.float32)

    # one variadic sort carries coords + original indices through z order
    zs, order, xs, ys = _sort_with_payload(
        xyz[:, :, 2], xyz[:, :, 0], xyz[:, :, 1])
    planes = jnp.stack([xs, ys, zs], axis=1)              # [B, 3, N] sorted
    qzs, qorder, qxs, qys = _sort_with_payload(
        queries[:, :, 2], queries[:, :, 0], queries[:, :, 1])
    q_sorted = jnp.stack([qxs, qys, qzs], axis=-1)        # [B, S, 3]
    # inverse permutation to restore original query order at the end
    _, inv = lax.sort((qorder, jnp.broadcast_to(
        jnp.arange(S, dtype=jnp.int32), qorder.shape)), dimension=1,
        num_keys=1)

    # per-tile in-radius rank bounds, with a margin covering the kernel's
    # d = dx^2+dy^2+dz^2 rounding at the r^2 boundary (few-ulp slack).
    # qzs ascending => lo/hi are monotone across each tile, so only the
    # boundary queries (first: window lo; last: window hi) need searching —
    # 2T probes per batch row instead of 2S (searchsorted's gather steps were
    # the dominant glue cost, benchmarks/window_probe2.py).
    # method="compare_all": one broadcast compare+reduce. The default
    # binary-search method costs ~0.4 ms per step in gather LATENCY on TPU
    # (size-independent), ~10 ms for the pair — measured, window_probe2.py.
    qz_first = qzs[:, ::s_tile]                           # [B, T]
    qz_last = qzs[:, s_tile - 1::s_tile]
    m_first = (radius + jnp.abs(qz_first)) * 1e-6
    m_last = (radius + jnp.abs(qz_last)) * 1e-6
    ss = functools.partial(jnp.searchsorted, method="compare_all")
    lo_t = jax.vmap(functools.partial(ss, side="left"))(
        zs, qz_first - radius - m_first)                  # [B, T]
    hi_t = jax.vmap(functools.partial(ss, side="right"))(
        zs, qz_last + radius + m_last)

    def _windowed(C, start):
        grid = (B, T)
        if _WINDOW_TRANSPOSED:
            kernel = functools.partial(_ballquery_window_kernel_t,
                                       float(radius), nsample, N, C)
            srcs_rows = jnp.stack([xs, ys, zs], axis=-1)  # [B, N, 3] sorted
            qplanes = jnp.stack([qxs, qys, qzs], axis=1)  # [B, 3, S] sorted
            out_t = pl.pallas_call(
                kernel,
                grid=grid,
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.SMEM),  # [B, T] starts
                    pl.BlockSpec((1, N, 3), lambda i, j: (i, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, N, 1), lambda i, j: (i, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, 3, s_tile), lambda i, j: (i, 0, j),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((1, nsample, s_tile),
                                       lambda i, j: (i, 0, j),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((B, nsample, S), jnp.int32),
            )(start, srcs_rows, order[:, :, None], qplanes)
            out_sorted = jnp.transpose(out_t, (0, 2, 1))
        else:
            kernel = functools.partial(_ballquery_window_kernel,
                                       float(radius), nsample, N, C)
            out_sorted = pl.pallas_call(
                kernel,
                grid=grid,
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.SMEM),  # [B, T] starts
                    pl.BlockSpec((1, 3, N), lambda i, j: (i, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, 1, N), lambda i, j: (i, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, s_tile, 3), lambda i, j: (i, j, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((1, s_tile, nsample),
                                       lambda i, j: (i, j, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((B, S, nsample), jnp.int32),
            )(start, planes, order[:, None, :], q_sorted)
        return _unpermute_rows_int(out_sorted, inv)

    def _full(_):
        if fallback in ("bp", "bp2") and N % 32 == 0:
            return query_ball_point_bp(radius, nsample, xyz, queries,
                                       s_tile=256,
                                       two_level=fallback == "bp2")
        return query_ball_point(radius, nsample, xyz, queries)

    # smallest covering tier wins; the cond chain is built innermost-first so
    # the outermost test is the cheapest window
    def _tier(C, nxt):
        start = jnp.clip((lo_t // 128) * 128, 0, N - C).astype(jnp.int32)
        fits = jnp.all(hi_t - start <= C)
        return lambda _: lax.cond(fits, lambda __: _windowed(C, start), nxt,
                                  operand=None)

    chain = _full
    for C in reversed(tiers):
        chain = _tier(C, chain)
    return chain(None)
