"""Pallas kernel parity tests (run in interpreter mode on CPU; the same
kernels compile natively on TPU where the dispatcher selects them)."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tumseg.ops import core as xla_ops


@pytest.fixture(autouse=True)
def _interpret_mode():
    """Pallas TPU kernels run under the interpreter on CPU. With
    TUMSEG_TEST_TPU=1 (hardware suite run, conftest.py) the kernels
    compile natively through Mosaic instead — the point of that mode is
    device evidence, so interpretation must NOT be forced there."""
    if os.environ.get("TUMSEG_TEST_TPU") == "1":
        yield
        return
    from jax.experimental.pallas import tpu as pltpu

    with pltpu.force_tpu_interpret_mode():
        yield


@pytest.mark.parametrize("B,N,npoint", [(2, 128, 16), (3, 100, 32), (1, 64, 64)])
def test_fps_pallas_matches_xla(B, N, npoint):
    from tumseg.ops.pallas.fps import farthest_point_sample as fps_pallas

    r = np.random.default_rng(0)
    xyz = jnp.asarray(r.random((B, N, 3)), jnp.float32)
    start = jnp.asarray(r.integers(0, N, B), jnp.int32)
    want = np.asarray(xla_ops.farthest_point_sample(xyz, npoint, start=start))
    got = np.asarray(fps_pallas(xyz, npoint, start=start))
    np.testing.assert_array_equal(got, want)


def test_fps_pallas_default_start():
    from tumseg.ops.pallas.fps import farthest_point_sample as fps_pallas

    r = np.random.default_rng(1)
    xyz = jnp.asarray(r.random((2, 96, 3)), jnp.float32)
    want = np.asarray(xla_ops.farthest_point_sample(xyz, 24))
    got = np.asarray(fps_pallas(xyz, 24))
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("B,N,S,K,r", [(2, 128, 64, 8, 0.3),
                                       (1, 256, 256, 16, 0.2),
                                       (2, 100, 40, 4, 0.5)])
def test_ballquery_pallas_matches_xla(B, N, S, K, r):
    from tumseg.ops.pallas.ballquery import query_ball_point as bq_pallas

    rng = np.random.default_rng(0)
    xyz = jnp.asarray(rng.random((B, N, 3)), jnp.float32)
    new_xyz = xyz[:, :S, :]
    want = np.asarray(xla_ops.query_ball_point(r, K, xyz, new_xyz))
    got = np.asarray(bq_pallas(r, K, xyz, new_xyz))
    np.testing.assert_array_equal(got, want)


def test_ballquery_pallas_fill_semantics():
    from tumseg.ops.pallas.ballquery import query_ball_point as bq_pallas

    xyz = jnp.asarray([[[0, 0, 0], [10, 10, 10], [10.05, 10, 10]]],
                      jnp.float32)
    got = np.asarray(bq_pallas(0.2, 4, xyz, xyz[:, :1]))
    np.testing.assert_array_equal(got[0, 0], [0, 0, 0, 0])


@pytest.mark.parametrize("B,N,S", [(2, 128, 64), (1, 512, 16), (2, 100, 40)])
def test_threenn_pallas_matches_xla(B, N, S):
    from tumseg.ops.pallas.threenn import three_nn as tnn_pallas

    rng = np.random.default_rng(3)
    xyz1 = jnp.asarray(rng.random((B, N, 3)), jnp.float32)
    xyz2 = jnp.asarray(rng.random((B, S, 3)), jnp.float32)
    wd, wi = xla_ops.three_nn(xyz1, xyz2)
    gd, gi = tnn_pallas(xyz1, xyz2)
    np.testing.assert_array_equal(np.asarray(gi), np.asarray(wi))
    np.testing.assert_allclose(np.asarray(gd), np.asarray(wd), atol=1e-5)


def test_threenn_pallas_interp_grad():
    """three_interpolate through the pallas 3-NN must be differentiable in
    points2 and match the XLA gradient."""
    from tumseg.ops.pallas.threenn import three_nn as tnn_pallas

    rng = np.random.default_rng(4)
    xyz1 = jnp.asarray(rng.random((1, 64, 3)), jnp.float32)
    xyz2 = jnp.asarray(rng.random((1, 16, 3)), jnp.float32)
    pts2 = jnp.asarray(rng.random((1, 16, 8)), jnp.float32)

    def f_pallas(p):
        d, i = tnn_pallas(xyz1, xyz2)
        return jnp.sum(xla_ops.interpolate_weighted(d, i, p) ** 2)

    def f_xla(p):
        return jnp.sum(xla_ops.three_interpolate(xyz1, xyz2, p) ** 2)

    gp = jax.grad(f_pallas)(pts2)
    gx = jax.grad(f_xla)(pts2)
    np.testing.assert_allclose(np.asarray(gp), np.asarray(gx), atol=1e-4)


@pytest.mark.parametrize("B,N,S,D", [(2, 128, 64, 8), (1, 512, 16, 128)])
def test_weighted_interpolate_matches_xla(B, N, S, D):
    from tumseg.ops.pallas.interpolate import weighted_interpolate

    rng = np.random.default_rng(5)
    dists = jnp.asarray(rng.random((B, N, 3)) + 0.01, jnp.float32)
    idx = jnp.asarray(rng.integers(0, S, (B, N, 3)), jnp.int32)
    pts2 = jnp.asarray(rng.random((B, S, D)), jnp.float32)
    recip = 1.0 / (dists + 1e-8)
    w = recip / jnp.sum(recip, axis=2, keepdims=True)
    want = np.asarray(xla_ops.interpolate_weighted(dists, idx, pts2))
    got = np.asarray(weighted_interpolate(idx, w, pts2))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_weighted_interpolate_grad_matches_xla():
    from tumseg.ops.pallas.interpolate import weighted_interpolate

    rng = np.random.default_rng(6)
    B, N, S, D = 1, 128, 32, 16
    dists = jnp.asarray(rng.random((B, N, 3)) + 0.01, jnp.float32)
    idx = jnp.asarray(rng.integers(0, S, (B, N, 3)), jnp.int32)
    pts2 = jnp.asarray(rng.random((B, S, D)), jnp.float32)
    recip = 1.0 / (dists + 1e-8)
    w = recip / jnp.sum(recip, axis=2, keepdims=True)

    gp = jax.grad(lambda p: jnp.sum(weighted_interpolate(idx, w, p) ** 2))(pts2)
    gx = jax.grad(lambda p: jnp.sum(
        xla_ops.interpolate_weighted(dists, idx, p) ** 2))(pts2)
    np.testing.assert_allclose(np.asarray(gp), np.asarray(gx), atol=1e-3)


@pytest.mark.parametrize("B,N,S,K,D", [(2, 128, 32, 8, 5), (1, 256, 64, 16, 0)])
def test_group_points_matches_xla(B, N, S, K, D):
    from tumseg.ops.pallas.group import group_points

    rng = np.random.default_rng(7)
    xyz = jnp.asarray(rng.random((B, N, 3)), jnp.float32)
    feats = (jnp.asarray(rng.random((B, N, D)), jnp.float32) if D else None)
    idx = jnp.asarray(rng.integers(0, N, (B, S, K)), jnp.int32)
    new_xyz = jnp.asarray(rng.random((B, S, 3)), jnp.float32)

    grouped_xyz = xla_ops.index_points(xyz, idx) - new_xyz[:, :, None, :]
    if feats is not None:
        want = jnp.concatenate(
            [grouped_xyz, xla_ops.index_points(feats, idx)], axis=-1)
        src = jnp.concatenate([xyz, feats], axis=-1)
    else:
        want = grouped_xyz
        src = xyz
    got = group_points(idx, src, new_xyz)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_group_points_grad_matches_xla():
    from tumseg.ops.pallas.group import group_points

    rng = np.random.default_rng(8)
    B, N, S, K, D = 1, 64, 16, 8, 4
    xyz = jnp.asarray(rng.random((B, N, 3)), jnp.float32)
    feats = jnp.asarray(rng.random((B, N, D)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, N, (B, S, K)), jnp.int32)
    new_xyz = jnp.asarray(rng.random((B, S, 3)), jnp.float32)

    def f_pallas(p):
        src = jnp.concatenate([xyz, p], axis=-1)
        return jnp.sum(group_points(idx, src, new_xyz) ** 2)

    def f_xla(p):
        gx = xla_ops.index_points(xyz, idx) - new_xyz[:, :, None, :]
        return jnp.sum(jnp.concatenate(
            [gx, xla_ops.index_points(p, idx)], axis=-1) ** 2)

    gp = jax.grad(f_pallas)(feats)
    gx = jax.grad(f_xla)(feats)
    np.testing.assert_allclose(np.asarray(gp), np.asarray(gx), atol=1e-3)


def test_gather_rows_exact(monkeypatch):
    """ops.gather_rows (the post-FPS centroid gather) is bit-exact against
    index_points on the kernel path."""
    from tumseg import ops

    rng = np.random.default_rng(9)
    B, N, S = 2, 512, 128
    xyz = jnp.asarray(rng.random((B, N, 3)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, N, (B, S)), jnp.int32)
    want = np.asarray(xla_ops.index_points(xyz, idx))
    monkeypatch.setattr(ops, "_IMPL", "pallas")
    monkeypatch.setattr(ops, "_GATHER_ROWS_PALLAS_MIN", 0)
    got = np.asarray(ops.gather_rows(xyz, idx))
    np.testing.assert_array_equal(got, want)


def test_fps_pallas_batch_tiling():
    """Batches larger than one VMEM tile split over the grid."""
    from tumseg.ops.pallas import fps as fps_mod

    r = np.random.default_rng(2)
    xyz = jnp.asarray(r.random((5, 64, 3)), jnp.float32)
    old = fps_mod._VMEM_PLANE_BUDGET
    try:
        fps_mod._VMEM_PLANE_BUDGET = 2 * 64  # force b_tile=2 -> grid of 3
        got = np.asarray(fps_mod.farthest_point_sample(xyz, 8))
    finally:
        fps_mod._VMEM_PLANE_BUDGET = old
    want = np.asarray(xla_ops.farthest_point_sample(xyz, 8))
    np.testing.assert_array_equal(got, want)


# ---- fused ball-query + group (cnt-cumsum selection) ----------------------

@pytest.mark.parametrize("r,K", [(0.12, 8), (0.03, 8), (0.45, 16)])
def test_fused_ball_group_matches_split(r, K):
    """Indices must equal query_ball_point exactly (incl. shortfall fill at
    the tiny radius) and the grouped tensor must equal the gather+center
    composition bit-for-bit in exact mode."""
    from tumseg.ops.pallas.fusedgroup import fused_ball_group

    rng = np.random.default_rng(11)
    B, N, S = 2, 512, 128
    xyz = jnp.asarray(rng.random((B, N, 3)), jnp.float32)
    new_xyz = xyz[:, :S, :]
    src = jnp.concatenate(
        [xyz, jnp.asarray(rng.random((B, N, 5)), jnp.float32)], axis=-1)
    grouped, idx = fused_ball_group(r, K, xyz, new_xyz, src)
    want_idx = np.asarray(xla_ops.query_ball_point(r, K, xyz, new_xyz))
    np.testing.assert_array_equal(np.asarray(idx), want_idx)
    want = np.asarray(xla_ops.index_points(src, jnp.asarray(want_idx)))
    center = np.zeros((B, S, 1, src.shape[-1]), np.float32)
    center[..., :3] = np.asarray(new_xyz)[:, :, None, :]
    np.testing.assert_array_equal(np.asarray(grouped), want - center)


def test_fused_ball_group_small_stage_shapes():
    """sa4-like shapes: N < 128 (single cumsum chunk) and S < 128."""
    from tumseg.ops.pallas.fusedgroup import fused_ball_group

    rng = np.random.default_rng(12)
    B, N, S, K = 2, 64, 16, 8
    xyz = jnp.asarray(rng.random((B, N, 3)), jnp.float32)
    new_xyz = xyz[:, :S, :]
    src = jnp.concatenate(
        [xyz, jnp.asarray(rng.random((B, N, 4)), jnp.float32)], axis=-1)
    grouped, idx = fused_ball_group(0.8, K, xyz, new_xyz, src)
    want_idx = np.asarray(xla_ops.query_ball_point(0.8, K, xyz, new_xyz))
    np.testing.assert_array_equal(np.asarray(idx), want_idx)


def test_fused_ball_group_empty_ball_sentinel():
    """Queries with NO candidate in radius must emit the N sentinel index,
    like query_ball_point (grouped stays -center in both paths)."""
    from tumseg.ops.pallas.fusedgroup import fused_ball_group

    xyz = jnp.asarray(np.linspace(0, 1, 64 * 3).reshape(1, 64, 3),
                      jnp.float32)
    far = jnp.full((1, 8, 3), 100.0, jnp.float32)
    new_xyz = jnp.concatenate([xyz[:, :8, :], far], axis=1)  # half empty
    grouped, idx = fused_ball_group(0.01, 4, xyz, new_xyz, xyz)
    want = np.asarray(xla_ops.query_ball_point(0.01, 4, xyz, new_xyz))
    np.testing.assert_array_equal(np.asarray(idx), want)
    assert (np.asarray(idx)[0, 8:] == 64).all()


def test_fused_ball_group_unsupported_n_falls_back():
    """N > 1024 with N % 1024 != 0 must raise NotImplementedError (the
    dispatcher's fallback trigger), never a shape error mid-trace."""
    from tumseg.ops.pallas.fusedgroup import fused_ball_group

    rng = np.random.default_rng(15)
    xyz = jnp.asarray(rng.random((1, 1152, 3)), jnp.float32)
    with pytest.raises(NotImplementedError, match="1024"):
        fused_ball_group(0.2, 8, xyz, xyz[:, :128, :], xyz)


def test_fused_ball_group_grad_matches_xla():
    from tumseg.ops.pallas.fusedgroup import fused_ball_group

    rng = np.random.default_rng(13)
    B, N, S, K, r = 2, 256, 64, 8, 0.2
    xyz = jnp.asarray(rng.random((B, N, 3)), jnp.float32)
    new_xyz = xyz[:, :S, :]
    feats = jnp.asarray(rng.random((B, N, 5)), jnp.float32)
    cot = jnp.asarray(rng.random((B, S, K, 8)), jnp.float32)

    def f_fused(feats):
        src = jnp.concatenate([xyz, feats], axis=-1)
        grouped, _ = fused_ball_group(r, K, xyz, new_xyz, src)
        return jnp.sum(grouped * cot)

    def f_xla(feats):
        src = jnp.concatenate([xyz, feats], axis=-1)
        idx = xla_ops.query_ball_point(r, K, xyz, new_xyz)
        grouped = (xla_ops.index_points(src, idx)
                   - jnp.pad(new_xyz, [(0, 0), (0, 0), (0, 5)])[:, :, None, :])
        return jnp.sum(grouped * cot)

    g_fused = jax.grad(f_fused)(feats)
    g_xla = jax.grad(f_xla)(feats)
    np.testing.assert_allclose(np.asarray(g_fused), np.asarray(g_xla),
                               rtol=1e-5, atol=1e-5)


def test_fused_ball_group_fast_mode():
    from tumseg.ops.pallas.fusedgroup import fused_ball_group

    rng = np.random.default_rng(14)
    B, N, S, K, r = 2, 256, 64, 8, 0.2
    xyz = jnp.asarray(rng.random((B, N, 3)), jnp.float32)
    new_xyz = xyz[:, :S, :]
    src = jnp.concatenate(
        [xyz, jnp.asarray(rng.random((B, N, 5)), jnp.float32)], axis=-1)
    grouped, idx = fused_ball_group(r, K, xyz, new_xyz, src, fast=True)
    assert grouped.dtype == jnp.bfloat16
    # indices stay exact even in fast mode (iota contraction is always split)
    want_idx = np.asarray(xla_ops.query_ball_point(r, K, xyz, new_xyz))
    np.testing.assert_array_equal(np.asarray(idx), want_idx)
    want = np.asarray(xla_ops.index_points(src, jnp.asarray(want_idx)))
    center = np.zeros((B, S, 1, src.shape[-1]), np.float32)
    center[..., :3] = np.asarray(new_xyz)[:, :, None, :]
    np.testing.assert_allclose(np.asarray(grouped, dtype=np.float32),
                               want - center, rtol=1e-2, atol=1e-2)


def _collect_dot_precisions(jaxpr, out):
    """All (operand dtypes, precision) pairs of dot_general eqns, recursing
    through ClosedJaxpr params (custom_vjp_call) and raw Jaxpr params
    (pallas_call's kernel body)."""
    for eqn in jaxpr.eqns:
        if eqn.primitive.name == "dot_general":
            out.append((tuple(v.aval.dtype.name for v in eqn.invars),
                        eqn.params.get("precision")))
        for v in eqn.params.values():
            for w in (v if isinstance(v, (list, tuple)) else [v]):
                inner = getattr(w, "jaxpr", w)
                if hasattr(inner, "eqns"):
                    _collect_dot_precisions(inner, out)
    return out


@pytest.mark.parametrize("exact", [True, False])
def test_kernel_dots_immune_to_ambient_precision(exact):
    """Regression for the r5 Mosaic 'Bad lhs type' hardware failures: an
    ambient ``jax.default_matmul_precision("highest")`` context (used by the
    torch-parity tests) must NOT leak into the Pallas kernels' bf16 dots —
    Mosaic only implements HIGHEST's multi-pass split for f32 operands, and
    bf16 x bf16 -> f32 is single-pass exact under DEFAULT anyway. Every bf16
    dot in the traced kernels must carry an explicit non-HIGHEST precision."""
    from jax import lax
    from tumseg.ops.pallas.group import group_points
    from tumseg.ops.pallas.fusedgroup import fused_ball_group

    rng = np.random.default_rng(15)
    B, N, S, K, r = 1, 128, 32, 8, 0.2
    src = jnp.asarray(rng.random((B, N, 6)), jnp.float32)
    xyz = src[:, :, :3]
    idx = jnp.asarray(rng.integers(0, N, (B, S, K)), jnp.int32)
    new_xyz = jnp.asarray(rng.random((B, S, 3)), jnp.float32)

    with jax.default_matmul_precision("highest"):
        traces = [
            jax.make_jaxpr(lambda i, s, n: group_points(
                i, s, n, fast=not exact))(idx, src, new_xyz),
            jax.make_jaxpr(lambda p, n, s: fused_ball_group(
                r, K, p, n, s, fast=not exact))(xyz, xyz[:, :S], src),
        ]
    dots = []
    for t in traces:
        _collect_dot_precisions(t.jaxpr, dots)
    bf16_dots = [(dt, prec) for dt, prec in dots if "bfloat16" in dt]
    assert bf16_dots, "expected bf16 MXU dots in the kernel traces"
    for dtypes, prec in bf16_dots:
        assert prec is not None, (
            f"unpinned bf16 dot {dtypes}: ambient precision would leak in")
        assert lax.Precision.HIGHEST not in tuple(prec), (
            f"bf16 dot {dtypes} traced at HIGHEST — Mosaic rejects this "
            f"on hardware ('Bad lhs type')")


# ---- z-window pruned variants (exactness incl. the on-device fallback) ----

@pytest.mark.parametrize("r,window,s_tile", [(0.1, 256, 128), (0.25, 256, 64),
                                             (0.45, 256, 32)])
def test_ballquery_windowed_matches_xla(r, window, s_tile):
    # s_tile 64/32 exercise the dispatcher's Mosaic lane legalization (they
    # round up to 128 — sub-128 query tiles only lower in interpret mode);
    # s_tile=128 over 256 queries keeps a real multi-tile grid on hardware.
    from tumseg.ops.pallas.ballquery import query_ball_point_windowed

    rng = np.random.default_rng(7)
    xyz = jnp.asarray(rng.random((2, 512, 3)), jnp.float32)
    new_xyz = xyz[:, :256, :]
    want = np.asarray(xla_ops.query_ball_point(r, 8, xyz, new_xyz))
    got = np.asarray(query_ball_point_windowed(r, 8, xyz, new_xyz,
                                               window, s_tile))
    np.testing.assert_array_equal(got, want)


def test_ballquery_windowed_tiers_match_xla():
    """Tuple window = tiered cond chain (smallest covering tier wins); every
    data shape must still be exact, including ones where only the larger
    tier (or no tier) covers."""
    from tumseg.ops.pallas.ballquery import query_ball_point_windowed

    rng = np.random.default_rng(9)
    # thin z-slab: smallest tier covers
    thin = rng.random((2, 512, 3))
    thin[:, :, 2] *= 8.0  # z-spread >> r, windows tiny
    # uniform cube: needs the larger tier
    cube = rng.random((2, 512, 3))
    # degenerate z: nothing covers, full-kernel fallback
    flat = rng.random((2, 512, 3))
    flat[:, :, 2] = 0.5
    for pts in (thin, cube, flat):
        xyz = jnp.asarray(pts, jnp.float32)
        new_xyz = xyz[:, :256, :]
        want = np.asarray(xla_ops.query_ball_point(0.1, 8, xyz, new_xyz))
        got = np.asarray(query_ball_point_windowed(0.1, 8, xyz, new_xyz,
                                                   (128, 256), 128))
        np.testing.assert_array_equal(got, want)


def test_ballquery_windowed_degenerate_z_falls_back():
    from tumseg.ops.pallas.ballquery import query_ball_point_windowed

    rng = np.random.default_rng(8)
    xyz = jnp.asarray(rng.random((2, 512, 3)), jnp.float32)
    xyz = xyz.at[:, :, 2].set(0.5)  # all candidates share one z rank window
    new_xyz = xyz[:, :128, :]
    want = np.asarray(xla_ops.query_ball_point(0.1, 8, xyz, new_xyz))
    got = np.asarray(query_ball_point_windowed(0.1, 8, xyz, new_xyz, 256, 32))
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("fallback", ["bp", "bp2"])
def test_ballquery_windowed_bitpack_fallback_matches_xla(fallback):
    """The dispatcher's default sa1 route is windowed with fallback="bp2"
    (ops/__init__.py): when no tier covers, the sorted-glue path must hand
    the ORIGINAL-order inputs to the bit-packed kernel and stay exact."""
    from tumseg.ops.pallas.ballquery import query_ball_point_windowed

    rng = np.random.default_rng(11)
    # degenerate z: every query's in-radius span is the whole array, no
    # tier covers -> the bp fallback branch runs
    flat = rng.random((2, 512, 3))
    flat[:, :, 2] = 0.5
    # thin slab: the first tier covers -> fallback must NOT perturb routing
    thin = rng.random((2, 512, 3))
    thin[:, :, 2] *= 8.0
    for pts in (flat, thin):
        xyz = jnp.asarray(pts, jnp.float32)
        new_xyz = xyz[:, :256, :]
        want = np.asarray(xla_ops.query_ball_point(0.1, 8, xyz, new_xyz))
        got = np.asarray(query_ball_point_windowed(
            0.1, 8, xyz, new_xyz, (128, 256), 128, fallback=fallback))
        np.testing.assert_array_equal(got, want)


def test_threenn_windowed_matches_full():
    from tumseg.ops.pallas.threenn import (_three_nn_impl,
                                           _three_nn_windowed_impl)

    rng = np.random.default_rng(9)
    xyz1 = jnp.asarray(rng.random((2, 512, 3)), jnp.float32)
    xyz2 = jnp.asarray(rng.random((2, 256, 3)), jnp.float32)
    fd, fi = _three_nn_impl(xyz1, xyz2)
    wd, wi = _three_nn_windowed_impl(xyz1, xyz2, 128, 64)
    np.testing.assert_array_equal(np.asarray(wi), np.asarray(fi))
    np.testing.assert_allclose(np.asarray(wd), np.asarray(fd), atol=1e-6)


def test_threenn_windowed_guard_falls_back():
    from tumseg.ops.pallas.threenn import (_three_nn_impl,
                                           _three_nn_windowed_impl)

    rng = np.random.default_rng(10)
    xyz1 = jnp.asarray(rng.random((2, 512, 3)), jnp.float32)
    xyz2 = jnp.asarray(rng.random((2, 256, 3)), jnp.float32)
    xyz1 = xyz1.at[:, :, 2].set(0.25)  # z carries no ordering information
    xyz2 = xyz2.at[:, :, 2].set(0.25)
    fd, fi = _three_nn_impl(xyz1, xyz2)
    wd, wi = _three_nn_windowed_impl(xyz1, xyz2, 128, 64)
    np.testing.assert_array_equal(np.asarray(wi), np.asarray(fi))
    np.testing.assert_allclose(np.asarray(wd), np.asarray(fd), atol=1e-6)


def test_fused_ball_group_structures_agree():
    """The gridk structure (one k per grid step; the shape that actually
    compiles on the Mosaic backend — see docs/DESIGN.md) must reproduce
    the unrolled structure bit-for-bit, K not a multiple of 8 included."""
    from tumseg.ops.pallas.fusedgroup import fused_ball_group

    rng = np.random.default_rng(17)
    B, N, S = 2, 512, 128
    xyz = jnp.asarray(rng.random((B, N, 3)), jnp.float32)
    new_xyz = xyz[:, :S, :]
    src = jnp.concatenate(
        [xyz, jnp.asarray(rng.random((B, N, 5)), jnp.float32)], axis=-1)
    for K in (4, 12, 16):
        gg, gi = fused_ball_group(0.12, K, xyz, new_xyz, src,
                                  structure="gridk")
        ug, ui = fused_ball_group(0.12, K, xyz, new_xyz, src,
                                  structure="unroll")
        np.testing.assert_array_equal(np.asarray(gi), np.asarray(ui))
        np.testing.assert_array_equal(np.asarray(gg), np.asarray(ug))


def test_threenn_transposed_matches_row():
    """Candidates-on-sublanes peel with direct VPU distance build: any
    index that differs from the row kernel's expansion form must be a
    rounding-level distance TIE (the two forms round differently near
    equidistant candidates; ~4e-5 of picks at fp1 scale, RESULTS.md), and
    selected distances agree to the forms' rounding difference."""
    from tumseg.ops.pallas.threenn import _three_nn_impl, _three_nn_impl_t

    rng = np.random.default_rng(19)
    for B, N, S in [(2, 256, 128), (1, 1024, 512), (2, 100, 40)]:
        xyz1 = jnp.asarray(rng.random((B, N, 3)), jnp.float32)
        xyz2 = jnp.asarray(rng.random((B, S, 3)), jnp.float32)
        rd, ri = _three_nn_impl(xyz1, xyz2)
        td, ti = _three_nn_impl_t(xyz1, xyz2)
        rd, ri, td, ti = map(np.asarray, (rd, ri, td, ti))
        mism = ti != ri
        assert mism.mean() < 1e-3
        # mismatched picks must be ties: selected distances still agree
        np.testing.assert_allclose(td, rd, atol=2e-6)
        if mism.any():
            assert np.max(np.abs(td[mism] - rd[mism])) < 2e-6


def test_ballquery_bitpacked_matches_row():
    """The bit-packed-peel kernel (in-ball mask packed into int32 words,
    K lowest-set-bit extractions instead of K masked-min reductions) must
    reproduce the row kernel bit-for-bit — the distance build and fill
    semantics are unchanged, only the peel representation differs."""
    import tumseg.ops.pallas.ballquery as bq

    rng = np.random.default_rng(29)
    for B, N, S, K, rad in [(2, 256, 128, 8, 0.3), (1, 512, 256, 16, 0.2),
                            (2, 128, 64, 32, 0.05), (1, 96, 40, 33, 0.9)]:
        xyz = jnp.asarray(rng.random((B, N, 3)), jnp.float32)
        q = xyz[:, :S, :]
        a = np.asarray(bq.query_ball_point(rad, K, xyz, q))
        b = np.asarray(bq.query_ball_point_bp(rad, K, xyz, q))
        np.testing.assert_array_equal(b, a)
    # empty-ball fill: all-sentinel rows, like the row kernel
    xyz = jnp.asarray([[[0, 0, 0], [10, 10, 10], [10.05, 10, 10]]
                       + [[5, 5, 5]] * 29], jnp.float32)
    got = np.asarray(bq.query_ball_point_bp(0.2, 4, xyz, xyz[:, :1]))
    np.testing.assert_array_equal(got[0, 0], [0, 0, 0, 0])
    # N not a multiple of 32 falls back to the row kernel
    xyz = jnp.asarray(rng.random((1, 100, 3)), jnp.float32)
    q = xyz[:, :16, :]
    np.testing.assert_array_equal(
        np.asarray(bq.query_ball_point_bp(0.3, 8, xyz, q)),
        np.asarray(bq.query_ball_point(0.3, 8, xyz, q)))
    # two-level (summary bitmap) variant, engaged at N >= 1024. N=1024 has
    # a single summary word (Ws=1); N=2048/4096 exercise the multi-
    # summary-word selection (ssel/srow min + summary-bit clear) that the
    # production sa1 shape actually runs — a regression there would pass
    # every Ws=1 test and only surface as wrong neighbors on device.
    for n_bp2, s_bp2 in ((1024, 32), (2048, 48), (4096, 32)):
        xyz = jnp.asarray(rng.random((1, n_bp2, 3)), jnp.float32)
        q = xyz[:, :s_bp2, :]
        np.testing.assert_array_equal(
            np.asarray(bq.query_ball_point_bp(0.12, 8, xyz, q, 128, True)),
            np.asarray(bq.query_ball_point(0.12, 8, xyz, q)),
            err_msg=f"bp2 N={n_bp2}")


def test_ballquery_bp_multi_matches_single():
    """The fused multi-radius kernel (ONE shared distance build, one output
    per radius — the MSG layer's query pattern) must be bit-identical to
    separate query_ball_point_bp calls, for both peel levels, per-radius K,
    and 2- and 3-radius lists."""
    import tumseg.ops.pallas.ballquery as bq

    rng = np.random.default_rng(37)
    cases = [(2, 256, 128, (0.1, 0.2), (8, 16)),
             (1, 1024, 256, (0.1, 0.2, 0.4), (4, 8, 32)),
             (1, 96, 40, (0.3, 0.9), (33, 3))]
    for B, N, S, radii, Ks in cases:
        xyz = jnp.asarray(rng.random((B, N, 3)), jnp.float32)
        q = xyz[:, :S, :]
        for two_level in (False, True):
            got = bq.query_ball_point_bp_multi(radii, Ks, xyz, q,
                                               two_level=two_level)
            assert len(got) == len(radii)
            for r, K, g in zip(radii, Ks, got):
                want = np.asarray(
                    bq.query_ball_point_bp(r, K, xyz, q, 128, two_level))
                np.testing.assert_array_equal(
                    np.asarray(g), want,
                    err_msg=f"N{N} r{r} K{K} two_level={two_level}")
    # N not a multiple of 32 falls back to per-radius row kernels
    xyz = jnp.asarray(rng.random((1, 100, 3)), jnp.float32)
    q = xyz[:, :16, :]
    got = bq.query_ball_point_bp_multi((0.2, 0.4), (4, 8), xyz, q)
    for r, K, g in zip((0.2, 0.4), (4, 8), got):
        np.testing.assert_array_equal(
            np.asarray(g), np.asarray(bq.query_ball_point(r, K, xyz, q)))


def test_msg_ball_groups_fused_routing():
    """ops.msg_ball_groups under TUMSEG_OPS_BQ=bp2 (fused multi-radius
    kernel) must produce groups identical to the per-radius ball_group
    path the MSG layer used before."""
    import tumseg.ops as ops

    rng = np.random.default_rng(43)
    B, N, S = 2, 256, 64
    xyz = jnp.asarray(rng.random((B, N, 3)), jnp.float32)
    newxyz = jnp.asarray(rng.random((B, S, 3)), jnp.float32)
    src = jnp.asarray(rng.random((B, N, 7)), jnp.float32)  # xyz-first
    src = src.at[:, :, :3].set(xyz)
    radii, Ks = (0.2, 0.4), (8, 16)
    want = [np.asarray(ops._xla.query_ball_point(r, k, xyz, newxyz))
            for r, k in zip(radii, Ks)]
    prev_impl, prev_var = ops._IMPL, ops._BQ_VARIANT
    try:
        ops.set_impl("pallas")
        for variant in ("auto", "bp", "bp2"):
            ops.set_bq_variant(variant)
            groups = ops.msg_ball_groups(radii, Ks, xyz, newxyz, src)
            assert len(groups) == 2
            for g, idx_want, k in zip(groups, want, Ks):
                ref = (np.asarray(src)[np.arange(B)[:, None, None],
                                       idx_want]
                       - np.pad(np.asarray(newxyz), [(0, 0), (0, 0), (0, 4)])
                       [:, :, None, :])
                assert g.shape == (B, S, k, 7), variant
                np.testing.assert_allclose(np.asarray(g), ref, atol=1e-5,
                                           err_msg=variant)
    finally:
        ops._IMPL, ops._BQ_VARIANT = prev_impl, prev_var


def test_ballquery_variants_randomized_cross_parity():
    """Randomized shapes/radii: every kernel family (row, transposed,
    bit-packed single/two-level) must agree with the XLA oracle exactly.
    Catches family-specific edge cases (word boundaries, shortfall, dense
    balls) that the fixed-shape tests might miss."""
    import tumseg.ops.pallas.ballquery as bq

    rng = np.random.default_rng(41)
    for trial in range(6):
        B = int(rng.integers(1, 3))
        N = int(rng.choice([64, 96, 160, 1024]))
        S = int(rng.integers(1, max(2, N // 4)))
        K = int(rng.choice([1, 3, 8, 32]))
        rad = float(rng.uniform(0.05, 1.2))
        xyz = jnp.asarray(rng.random((B, N, 3)), jnp.float32)
        q = jnp.asarray(rng.random((B, S, 3)), jnp.float32)
        want = np.asarray(xla_ops.query_ball_point(rad, K, xyz, q))
        msg = f"trial {trial}: B{B} N{N} S{S} K{K} r{rad:.3f}"
        for name, fn in [
            ("row", lambda: bq.query_ball_point(rad, K, xyz, q)),
            ("t", lambda: bq.query_ball_point_t(rad, K, xyz, q)),
            ("bp", lambda: bq.query_ball_point_bp(rad, K, xyz, q)),
            ("bp2", lambda: bq.query_ball_point_bp(rad, K, xyz, q, 128,
                                                   True)),
        ]:
            np.testing.assert_array_equal(np.asarray(fn()), want,
                                          err_msg=f"{msg} [{name}]")


def test_ballquery_dispatcher_bq_variant_routing():
    """set_bq_variant("bp"/"bp2") must route ops.query_ball_point through
    the bit-packed kernel (and "auto" through the round-3 winners), with
    identical indices across all variants."""
    import tumseg.ops as ops

    rng = np.random.default_rng(31)
    xyz = jnp.asarray(rng.random((1, 256, 3)), jnp.float32)
    q = xyz[:, :64, :]
    want = np.asarray(xla_ops.query_ball_point(0.25, 8, xyz, q))
    prev_impl, prev_var = ops._IMPL, ops._BQ_VARIANT
    try:
        ops.set_impl("pallas")
        for variant in ("auto", "bp", "bp2"):
            ops.set_bq_variant(variant)
            got = np.asarray(ops.query_ball_point(0.25, 8, xyz, q))
            np.testing.assert_array_equal(got, want, err_msg=variant)
        with pytest.raises(ValueError):
            ops.set_bq_variant("nope")
    finally:
        ops._IMPL, ops._BQ_VARIANT = prev_impl, prev_var


def test_ballquery_transposed_matches_row():
    """The transposed-peel full kernel (candidates on sublanes, dispatched
    at N <= 1024) and the transposed windowed kernel must reproduce the
    row kernels bit-for-bit — same direct distance build, same peel math,
    only the tile orientation differs."""
    import tumseg.ops.pallas.ballquery as bq

    rng = np.random.default_rng(23)
    for B, N, S, K, rad in [(2, 256, 128, 8, 0.3), (1, 512, 256, 16, 0.2),
                            (2, 128, 64, 32, 0.05)]:
        xyz = jnp.asarray(rng.random((B, N, 3)), jnp.float32)
        q = xyz[:, :S, :]
        a = np.asarray(bq.query_ball_point(rad, K, xyz, q))
        b = np.asarray(bq.query_ball_point_t(rad, K, xyz, q))
        np.testing.assert_array_equal(b, a)
    # windowed: both structures vs the full kernel
    xyz = jnp.asarray(rng.random((2, 512, 3)), jnp.float32)
    q = xyz[:, :256, :]
    full = np.asarray(bq.query_ball_point(0.25, 8, xyz, q))
    prev = bq._WINDOW_TRANSPOSED
    try:
        for flag in (True, False):
            bq._WINDOW_TRANSPOSED = flag
            got = np.asarray(bq.query_ball_point_windowed.__wrapped__(
                0.25, 8, xyz, q, (128, 256), 128))
            np.testing.assert_array_equal(got, full)
    finally:
        bq._WINDOW_TRANSPOSED = prev
