"""Point-cloud op dispatch: XLA compositions by default, Pallas TPU kernels
for the hot ops where available.

Select globally with ``set_impl('xla'|'pallas'|'auto')`` or the environment
variable ``TUMSEG_OPS_IMPL``. 'auto' (default) uses Pallas kernels on TPU
backends and XLA elsewhere.
"""

from __future__ import annotations

import os

import jax

from tumseg.ops import core as _xla
from tumseg.ops.core import (  # noqa: F401  (always-XLA helpers)
    index_points,
    pc_normalize,
    sample_and_group_all,
    square_distance,
    three_nn,
)

_IMPL = os.environ.get("TUMSEG_OPS_IMPL", "auto")


def set_impl(impl: str) -> None:
    global _IMPL
    if impl not in ("xla", "pallas", "auto"):
        raise ValueError(f"unknown ops impl {impl!r}")
    _IMPL = impl


def _use_pallas() -> bool:
    if _IMPL == "xla":
        return False
    if _IMPL == "pallas":
        return True
    try:
        # "axon" is this image's tunneled TPU PJRT platform
        return jax.default_backend() in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return False


def _pallas():
    from tumseg.ops.pallas import kernels  # lazy: only imported when selected
    return kernels


def farthest_point_sample(xyz, npoint, start=None):
    if _use_pallas() and xyz.shape[1] * npoint >= _FPS_PALLAS_MIN:
        try:
            return _pallas().farthest_point_sample(xyz, npoint, start=start)
        except NotImplementedError:
            pass
    return _xla.farthest_point_sample(xyz, npoint, start=start)


def query_ball_point(radius, nsample, xyz, new_xyz):
    if _use_pallas() and xyz.shape[1] * new_xyz.shape[1] >= _BALLQUERY_PALLAS_MIN:
        try:
            N, S = xyz.shape[1], new_xyz.shape[1]
            if _BQ_VARIANT in ("bp", "bp2") and N % 32 == 0:
                # explicit override: bit-packed peel everywhere — packs
                # the in-ball mask into int32 words and peels lowest set
                # bits — ~8*(N/32) VPU ops per peel step vs ~4*N for the
                # masked-min peel ("bp2" adds the summary-bitmap level:
                # ~5*(N/32)). Bit-identical indices (same f32 distance
                # build, same fill semantics; tests/test_pallas_ops.py).
                from tumseg.ops.pallas.ballquery import query_ball_point_bp
                return query_ball_point_bp(radius, nsample, xyz, new_xyz,
                                           two_level=_BQ_VARIANT == "bp2")
            if N >= _WINDOW_MIN_N and N % 128 == 0 and S >= 256:
                # tiered z-window with bp2 fallback: smallest covering
                # window wins on device; data that fits no tier runs the
                # data-independent bit-packed peel. r5 device bitpack_probe
                # at sa1 (B32 N4096 S1024 r0.1): facade fits the tight
                # 3N/16 tier (1.53 ms), bp2-st256 is 2.22 on ANY data,
                # beating both the old N//2 tier (3.22 on uniform cube)
                # and the full kernel (5.0) — so the N//2 tier is gone.
                from tumseg.ops.pallas.ballquery import (
                    query_ball_point_windowed)
                return query_ball_point_windowed(
                    radius, nsample, xyz, new_xyz,
                    (_bq_window_tight(N), _bq_window(N)),
                    fallback="bp2")
            if N <= 1024 and N % 32 == 0:
                # bit-packed peel wins at sa2/sa3 shapes on device (r5
                # bitpack_probe, both datasets: sa2 0.40-0.42 ms bp2-st128
                # vs 0.54-0.59 transposed; sa3 0.27-0.30 bp vs 0.31-0.32
                # — two_level silently degrades to bp below N=1024)
                from tumseg.ops.pallas.ballquery import query_ball_point_bp
                return query_ball_point_bp(radius, nsample, xyz, new_xyz,
                                           s_tile=128, two_level=True)
            if N <= 1024:
                # transposed peel (candidates on sublanes): round-3 winner
                # at sa2-like shapes, now the N % 32 != 0 fallback
                from tumseg.ops.pallas.ballquery import query_ball_point_t
                return query_ball_point_t(radius, nsample, xyz, new_xyz)
            return _pallas().query_ball_point(radius, nsample, xyz, new_xyz)
        except NotImplementedError:
            pass
    return _xla.query_ball_point(radius, nsample, xyz, new_xyz)


# Size thresholds below which the XLA composition beats the Pallas kernel.
# Round-2 device-time measurements (benchmarks/breakdown.py, chained-in-jit
# — the round-1 thresholds were set from dispatch-floored micro.py numbers)
# show the kernels winning or tying at EVERY model stage: fps4 0.35 vs
# 0.57 ms XLA, bq4 0.35 vs 0.58, fps2 0.37 vs 2.89. Thresholds are kept as
# knobs but set to dispatch the kernels unconditionally, same as the
# gather-replacement kernels (group_points, weighted_interpolate) whose
# XLA fallback — dynamic gather — is the pathology they exist to avoid.
_THREE_NN_PALLAS_MIN = 0          # N * S
_FPS_PALLAS_MIN = 0               # N * npoint
_BALLQUERY_PALLAS_MIN = 0         # N * S

# z-window pruning (ballquery/threenn *_windowed) carries an on-device
# exactness guard with full-kernel fallback, so it is never a semantics
# change. Ball query dispatches the TIERED windowed kernel unconditionally
# at N>=4096 (see query_ball_point above): even the uniform-cube worst case
# fits the N//2 tier and beats the full kernel (3.1 vs 4.0 ms at sa1,
# benchmarks/window_probe.py). The 3-NN window has no radius bound, needs a
# wider window, and LOSES on non-scan data (3.1 vs 2.0 ms at fp1), so it
# stays opt-in via TUMSEG_OPS_WINDOW=1 / set_window(True) / the
# window_enabled context — the serving path enables it (real-scan blocks).
_WINDOW_MIN_N = 4096
_WINDOW = os.environ.get("TUMSEG_OPS_WINDOW", "0") == "1"

# Ball-query kernel variant: "auto" (default, r5 device-measured winners) =
# tiered-window-with-bp2-fallback at N>=4096, bit-packed peel at
# N % 32 == 0 <= 1024, transposed peel otherwise; "bp"/"bp2" = force the
# bit-packed kernel (single/two-level) at every N % 32 == 0 shape. NOTE:
# bp2's summary level needs N % 1024 == 0 (W = N/32 must itself pack into
# words); at other shapes "bp2" silently executes the single-level bp peel.
_BQ_VARIANT = os.environ.get("TUMSEG_OPS_BQ", "auto")


def set_bq_variant(variant: str) -> None:
    """Select the ball-query kernel family ("auto" | "bp" | "bp2")."""
    global _BQ_VARIANT
    if variant not in ("auto", "bp", "bp2"):
        raise ValueError(f"unknown ball-query variant {variant!r}")
    _BQ_VARIANT = variant


def set_window(enabled: bool) -> None:
    """Enable z-window pruned extraction kernels (real-scan geometry)."""
    global _WINDOW
    _WINDOW = bool(enabled)


class window_enabled:
    """Context manager: windowed extraction kernels for traces entered
    inside (used by the serving path, whose scenes are real scans)."""

    def __init__(self, enabled: bool = True):
        self.enabled = bool(enabled)

    def __enter__(self):
        global _WINDOW
        self._prev = _WINDOW
        _WINDOW = self.enabled
        return self

    def __exit__(self, *exc):
        global _WINDOW
        _WINDOW = self._prev
        return False


def _bq_window(n: int) -> int:
    # a 128-query tile spans ~N/8 candidate ranks; real facade blocks add
    # only a thin in-radius z-slab on top of that
    return min(n, max(1024, (n // 4 + 127) // 128 * 128))


def _bq_window_tight(n: int) -> int:
    # facade columns (1 m x 1 m xy, metres of z) concentrate each query
    # tile's in-radius span even tighter than N/4; the round-3 facade sweep
    # (window_probe.py --facade) shows C=768 covers at N=4096 and runs
    # 2.09 vs 2.29 ms — the cond chain falls through to the wider tiers on
    # data that needs them
    return min(n, max(768, (3 * n // 16 + 127) // 128 * 128))


def _three_nn_window(s: int) -> int:
    return min(s, max(384, (s * 3 // 8 + 127) // 128 * 128))


_GATHER_ROWS_PALLAS_MIN = 1 << 16  # N * S below this: XLA gather wins


def gather_rows(xyz, idx):
    """Exact [B, S, 3] row gather of xyz [B, N, 3] by idx [B, S] — the
    new-centroid gather after FPS. XLA's dynamic gather costs ~0.27 ms at
    sa1's shape; on TPU this reuses the one-hot-contraction group kernel
    (zero centers, K=1) at ~5x less."""
    import jax.numpy as jnp

    B, S = idx.shape
    if _use_pallas() and xyz.shape[1] * S >= _GATHER_ROWS_PALLAS_MIN:
        try:
            zeros = jnp.zeros((B, S, 3), dtype=jnp.float32)
            g = _pallas().group_points(idx[:, :, None], xyz, zeros,
                                       fast=False)
            return g[:, :, 0, :]
        except NotImplementedError:
            pass
    return index_points(xyz, idx)


def group_neighborhoods(idx, src, new_xyz, fast_gather=False):
    """Gather src rows ([B,N,3+D], xyz-first) by idx [B,S,K] and center the
    first 3 channels on new_xyz -> [B,S,K,3+D]. Fused Pallas kernel on TPU
    (one one-hot MXU contraction, no XLA dynamic gather); XLA composition
    elsewhere."""
    import jax.numpy as jnp

    if _use_pallas():
        try:
            return _pallas().group_points(idx, src, new_xyz, fast=fast_gather)
        except NotImplementedError:
            pass
    grouped = index_points(src, idx)
    center = jnp.pad(new_xyz, [(0, 0), (0, 0), (0, src.shape[-1] - 3)])
    return grouped - center[:, :, None, :]


# Fused ball-query+group (ops/pallas/fusedgroup.py): cnt = cumsum(in_ball)
# turns first-K-by-index selection into the gather one-hot directly,
# skipping both the K-peel and the index->one-hot rebuild of the split
# path. Parity is exact (tests/test_pallas_ops.py::test_fused_*) and the
# round-3 grid-k restructure compiles fine, but ON DEVICE it LOSES to the
# split path at every stage shape (9.5 vs 5.3 ms at sa1, 1.53 vs 1.22 at
# sa2 — the cumsum tri-matmul + f32 selection compares + per-k index
# recovery cost more than the peel they replace; docs/DESIGN.md). Stays
# OPT-IN on measurement. TUMSEG_OPS_FUSED_GROUP=1 enables.
_FUSED_GROUP = os.environ.get("TUMSEG_OPS_FUSED_GROUP", "0") == "1"


def msg_ball_groups(radius_list, nsample_list, xyz, new_xyz, src,
                    fast_gather=False):
    """Multi-scale ball query + neighborhood gather: one grouped tensor
    [B, S, K_i, C] per radius. On TPU all radii share ONE fused bit-packed
    kernel launch and ONE distance build (ops/pallas/ballquery.py
    query_ball_point_bp_multi — default since the r5 device A/B); at
    N % 32 != 0 shapes falls back to per-radius ball_group (identical
    outputs either way). Reference: the per-radius loop in
    /root/reference/models/pointnet2_utils.py:205-262."""
    N = xyz.shape[1]
    if (_use_pallas() and _BQ_VARIANT in ("auto", "bp", "bp2")
            and N % 32 == 0 and len(radius_list) > 1
            and xyz.shape[1] * new_xyz.shape[1] >= _BALLQUERY_PALLAS_MIN):
        # default ON since r5: the fused multi-radius kernel beats
        # per-radius dispatches at both MSG stages on device (msg_sa1
        # 3.24 ms bp2_multi vs 3.90 two bp2 calls vs ~5.0+ per-radius
        # window/transposed; msg_sa2 0.46 vs 0.52 — bitpack_probe, both
        # facade and uniform data; parity frac=1.0)
        try:
            from tumseg.ops.pallas.ballquery import query_ball_point_bp_multi
            idxs = query_ball_point_bp_multi(
                tuple(radius_list), tuple(nsample_list), xyz, new_xyz,
                two_level=_BQ_VARIANT != "bp")
            return [group_neighborhoods(idx, src, new_xyz,
                                        fast_gather=fast_gather)
                    for idx in idxs]
        except NotImplementedError:
            pass
    return [ball_group(r, k, xyz, new_xyz, src, fast_gather=fast_gather)
            for r, k in zip(radius_list, nsample_list)]


def ball_group(radius, nsample, xyz, new_xyz, src, fast_gather=False):
    """Ball query + neighborhood gather + centering in one step:
    -> grouped [B, S, K, C]."""
    N = xyz.shape[1]
    # the fused kernel's cumsum chunk is 1024 candidates; other N fall back
    if _FUSED_GROUP and _use_pallas() and (N <= 1024 or N % 1024 == 0):
        try:
            from tumseg.ops.pallas.fusedgroup import fused_ball_group
            grouped, _ = fused_ball_group(radius, nsample, xyz, new_xyz,
                                          src, fast=fast_gather)
            return grouped
        except NotImplementedError:
            pass
    idx = query_ball_point(radius, nsample, xyz, new_xyz)
    return group_neighborhoods(idx, src, new_xyz, fast_gather=fast_gather)


def sample_and_group(npoint, radius, nsample, xyz, points, fps_start=None,
                     fast_gather=False):
    import jax.numpy as jnp

    fps_idx = farthest_point_sample(xyz, npoint, start=fps_start)
    new_xyz = gather_rows(xyz, fps_idx)
    src = (jnp.concatenate([xyz, points], axis=-1)
           if points is not None else xyz)
    return new_xyz, ball_group(radius, nsample, xyz, new_xyz, src,
                               fast_gather=fast_gather)


def three_nn_dispatch(xyz1, xyz2):
    if _use_pallas() and xyz1.shape[1] * xyz2.shape[1] >= _THREE_NN_PALLAS_MIN:
        try:
            N, S = xyz1.shape[1], xyz2.shape[1]
            if _WINDOW and N >= _WINDOW_MIN_N and S >= 1024 and S % 128 == 0:
                from tumseg.ops.pallas.threenn import three_nn_windowed
                return three_nn_windowed(xyz1, xyz2, _three_nn_window(S))
            return _pallas().three_nn(xyz1, xyz2)
        except NotImplementedError:
            pass
    return _xla.three_nn(xyz1, xyz2)


def three_interpolate(xyz1, xyz2, points2, fast_gather=False):
    import jax.numpy as jnp

    dists, idx = three_nn_dispatch(xyz1, xyz2)
    if _use_pallas():
        try:
            dist_recip = 1.0 / (dists + 1e-8)
            weight = dist_recip / jnp.sum(dist_recip, axis=2, keepdims=True)
            return _pallas().weighted_interpolate(idx, weight, points2,
                                                  fast=fast_gather)
        except NotImplementedError:
            pass
    return _xla.interpolate_weighted(dists, idx, points2)
