"""Kernel unit tests vs. pure-NumPy oracles (independent re-implementations
of the reference semantics — no torch, no reference imports)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tumseg.ops import core as ops


# ---------- NumPy oracles ----------

def np_square_distance(src, dst):
    return ((src[:, :, None, :] - dst[:, None, :, :]) ** 2).sum(-1)


def np_fps(xyz, npoint, start):
    B, N, _ = xyz.shape
    out = np.zeros((B, npoint), dtype=np.int64)
    for b in range(B):
        dist = np.full(N, 1e10)
        far = start[b]
        for i in range(npoint):
            out[b, i] = far
            d = ((xyz[b] - xyz[b, far]) ** 2).sum(-1)
            dist = np.minimum(dist, d)
            far = int(dist.argmax())
    return out


def np_query_ball(radius, nsample, xyz, new_xyz):
    B, N, _ = xyz.shape
    S = new_xyz.shape[1]
    out = np.zeros((B, S, nsample), dtype=np.int64)
    for b in range(B):
        for s in range(S):
            d = ((xyz[b] - new_xyz[b, s]) ** 2).sum(-1)
            inside = np.where(d <= radius ** 2)[0]
            if inside.size == 0:
                out[b, s] = N  # reference would index OOB; callers guarantee >=1
                continue
            sel = inside[:nsample]
            if sel.size < nsample:
                sel = np.concatenate([sel, np.full(nsample - sel.size, sel[0])])
            out[b, s] = sel
    return out


def np_three_interp(xyz1, xyz2, points2):
    B, N, _ = xyz1.shape
    out = np.zeros((B, N, points2.shape[2]))
    for b in range(B):
        d = ((xyz1[b][:, None, :] - xyz2[b][None, :, :]) ** 2).sum(-1)
        idx = np.argsort(d, axis=1, kind="stable")[:, :3]
        dd = np.take_along_axis(d, idx, axis=1)
        w = 1.0 / (dd + 1e-8)
        w = w / w.sum(1, keepdims=True)
        out[b] = (points2[b][idx] * w[..., None]).sum(1)
    return out


# ---------- tests ----------

@pytest.fixture
def cloud(rng):
    B, N = 2, 128
    return rng.random((B, N, 3)).astype(np.float32)


def test_square_distance(cloud, rng):
    dst = rng.random((2, 64, 3)).astype(np.float32)
    got = np.asarray(ops.square_distance(jnp.array(cloud), jnp.array(dst)))
    want = np_square_distance(cloud, dst)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_index_points_2d(cloud, rng):
    idx = rng.integers(0, 128, (2, 17))
    got = np.asarray(ops.index_points(jnp.array(cloud), jnp.array(idx)))
    want = np.stack([cloud[b][idx[b]] for b in range(2)])
    np.testing.assert_array_equal(got, want)


def test_index_points_3d(cloud, rng):
    idx = rng.integers(0, 128, (2, 9, 5))
    got = np.asarray(ops.index_points(jnp.array(cloud), jnp.array(idx)))
    want = np.stack([cloud[b][idx[b]] for b in range(2)])
    np.testing.assert_array_equal(got, want)


def test_fps_matches_oracle(cloud):
    start = np.array([3, 77])
    got = np.asarray(ops.farthest_point_sample(jnp.array(cloud), 16,
                                               start=jnp.array(start)))
    want = np_fps(cloud, 16, start)
    np.testing.assert_array_equal(got, want)


def test_fps_default_start(cloud):
    got = np.asarray(ops.farthest_point_sample(jnp.array(cloud), 8))
    want = np_fps(cloud, 8, np.zeros(2, int))
    np.testing.assert_array_equal(got, want)


def test_fps_covers_spread():
    # FPS on a line should pick the extremes early
    xyz = np.zeros((1, 100, 3), dtype=np.float32)
    xyz[0, :, 0] = np.linspace(0, 1, 100)
    idx = np.asarray(ops.farthest_point_sample(jnp.array(xyz), 3))
    assert set(idx[0, :2].tolist()) == {0, 99}


def test_query_ball_matches_oracle(cloud, rng):
    new_xyz = cloud[:, :32, :]
    got = np.asarray(ops.query_ball_point(0.3, 8, jnp.array(cloud),
                                          jnp.array(new_xyz)))
    want = np_query_ball(0.3, 8, cloud, new_xyz)
    np.testing.assert_array_equal(got, want)


def test_query_ball_fill_semantics(cloud):
    # center on an isolated point: all K slots fill with that point's index
    xyz = np.array([[[0, 0, 0], [10, 10, 10], [10.05, 10, 10]]], dtype=np.float32)
    got = np.asarray(ops.query_ball_point(0.2, 4, jnp.array(xyz),
                                          jnp.array(xyz[:, :1])))
    np.testing.assert_array_equal(got[0, 0], [0, 0, 0, 0])


def test_sample_and_group_shapes(cloud, rng):
    feats = rng.random((2, 128, 5)).astype(np.float32)
    new_xyz, new_points = ops.sample_and_group(16, 0.4, 8, jnp.array(cloud),
                                               jnp.array(feats))
    assert new_xyz.shape == (2, 16, 3)
    assert new_points.shape == (2, 16, 8, 3 + 5)
    # grouped xyz channel is center-relative: first neighbor of each group is
    # within radius of the center
    assert np.all(np.asarray(new_points[..., :3] ** 2).sum(-1) <= 0.4 ** 2 + 1e-5)


def test_sample_and_group_all(cloud, rng):
    feats = rng.random((2, 128, 5)).astype(np.float32)
    new_xyz, new_points = ops.sample_and_group_all(jnp.array(cloud), jnp.array(feats))
    assert new_xyz.shape == (2, 1, 3)
    assert new_points.shape == (2, 1, 128, 8)
    np.testing.assert_array_equal(np.asarray(new_points[..., :3]), cloud[:, None])


def test_three_interpolate_matches_oracle(rng):
    xyz1 = rng.random((2, 64, 3)).astype(np.float32)
    xyz2 = rng.random((2, 16, 3)).astype(np.float32)
    pts2 = rng.random((2, 16, 7)).astype(np.float32)
    got = np.asarray(ops.three_interpolate(jnp.array(xyz1), jnp.array(xyz2),
                                           jnp.array(pts2)))
    want = np_three_interp(xyz1, xyz2, pts2)
    np.testing.assert_allclose(got, want, atol=1e-3)


def test_three_interpolate_exact_at_source(rng):
    # interpolating onto the source points reproduces them (nearest d=0 dominates)
    xyz2 = rng.random((1, 16, 3)).astype(np.float32)
    pts2 = rng.random((1, 16, 4)).astype(np.float32)
    got = np.asarray(ops.three_interpolate(jnp.array(xyz2), jnp.array(xyz2),
                                           jnp.array(pts2)))
    np.testing.assert_allclose(got, pts2, atol=1e-4)


def test_ops_jit_and_grad(cloud, rng):
    # the grouping pipeline must be differentiable w.r.t. features
    feats = jnp.array(rng.random((2, 128, 5)).astype(np.float32))

    @jax.jit
    def f(p):
        _, np_ = ops.sample_and_group(16, 0.4, 8, jnp.array(cloud), p)
        return jnp.sum(np_ ** 2)

    g = jax.grad(f)(feats)
    assert g.shape == feats.shape
    assert np.isfinite(np.asarray(g)).all()
