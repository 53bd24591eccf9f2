"""pc_utils tests: PLY roundtrips, volume conversion, renders, euler mats."""

import numpy as np
import pytest

from tumseg.viz import pc_utils as U


def test_ply_roundtrip_ascii(tmp_path, rng):
    pts = rng.random((50, 3)).astype(np.float32)
    p = str(tmp_path / "a.ply")
    U.write_ply(pts, p, text=True)
    got = U.read_ply(p)
    np.testing.assert_allclose(got, pts, atol=1e-5)


def test_ply_roundtrip_binary(tmp_path, rng):
    pts = rng.random((50, 3)).astype(np.float32)
    p = str(tmp_path / "b.ply")
    U.write_ply(pts, p, text=False)
    got = U.read_ply(p)
    np.testing.assert_allclose(got, pts, atol=1e-6)


def test_volume_roundtrip(rng):
    pts = rng.random((30, 3)) * 1.6 - 0.8
    vol = U.point_cloud_to_volume(pts, 12, radius=1.0)
    assert vol.shape == (12, 12, 12)
    back = U.volume_to_point_cloud(vol)
    assert back.shape[0] == int(vol.sum())
    flat = U.point_cloud_to_volume_batch(pts[None], 12)
    assert flat.shape == (1, 12 ** 3)


def test_euler2mat_orthogonal():
    m = U.euler2mat(0.3, 0.5, -0.2)
    np.testing.assert_allclose(m @ m.T, np.eye(3), atol=1e-10)
    np.testing.assert_allclose(np.linalg.det(m), 1.0, atol=1e-10)
    # z-rotation convention: rotates x toward y
    mz = U.euler2mat(np.pi / 2, 0, 0)
    np.testing.assert_allclose(mz @ [1, 0, 0], [0, 1, 0], atol=1e-12)


def test_draw_point_cloud(rng):
    pts = rng.random((200, 3)) - 0.5
    img = U.draw_point_cloud(pts, canvasSize=100, space=40, diameter=7)
    assert img.shape == (100, 100)
    assert 0 <= img.min() and img.max() <= 1.0
    assert img.max() == 1.0  # normalized


def test_three_views(rng):
    pts = rng.random((100, 3)) - 0.5
    img = U.point_cloud_three_views(pts)
    assert img.shape == (500, 1500)
