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


def _mesh_elements(rng):
    verts = np.zeros(10, dtype=[("x", "f4"), ("y", "f4"), ("z", "f4"),
                                ("red", "u1")])
    verts["x"] = rng.random(10).astype(np.float32)
    verts["y"] = rng.random(10).astype(np.float32)
    verts["z"] = rng.random(10).astype(np.float32)
    verts["red"] = rng.integers(0, 256, 10)
    faces = np.empty(3, dtype=[("vertex_indices", "O")])
    faces["vertex_indices"][0] = np.array([0, 1, 2], dtype=np.int32)
    faces["vertex_indices"][1] = np.array([3, 4, 5, 6], dtype=np.int32)
    faces["vertex_indices"][2] = np.array([7, 8, 9], dtype=np.int32)
    return {"vertex": verts, "face": faces}


@pytest.mark.parametrize("text,bo", [(True, "<"), (False, "<"), (False, ">")])
def test_ply_full_roundtrip_lists_and_endianness(tmp_path, rng, text, bo):
    """Full plyfile capability surface: multi-element, list properties,
    both endiannesses (reference vendors plyfile.py for this)."""
    els = _mesh_elements(rng)
    p = str(tmp_path / "mesh.ply")
    U.write_ply_full(p, els, text=text, byte_order=bo, comments=["mesh"])
    got = U.read_ply_full(p)
    assert set(got) == {"vertex", "face"}
    np.testing.assert_allclose(got["vertex"]["x"], els["vertex"]["x"],
                               atol=1e-6)
    np.testing.assert_array_equal(got["vertex"]["red"], els["vertex"]["red"])
    assert got["face"].shape == (3,)
    for i in range(3):
        np.testing.assert_array_equal(
            np.asarray(got["face"]["vertex_indices"][i], dtype=np.int64),
            np.asarray(els["face"]["vertex_indices"][i], dtype=np.int64))


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


def test_euler_conversion_roundtrips():
    rng = np.random.default_rng(3)
    for _ in range(50):
        z, x = rng.uniform(-np.pi, np.pi, 2)
        y = rng.uniform(-np.pi / 2 + 0.05, np.pi / 2 - 0.05)  # mat2euler range
        m = U.euler2mat(z, y, x)
        # mat2euler inverts euler2mat
        z2, y2, x2 = U.mat2euler(m)
        np.testing.assert_allclose([z2, y2, x2], [z, y, x], atol=1e-10)
        # quaternion path encodes the same rotation
        np.testing.assert_allclose(U._quat2mat(U.euler2quat(z, y, x)), m,
                                   atol=1e-10)
        np.testing.assert_allclose(U.quat2euler(U.euler2quat(z, y, x)),
                                   [z, y, x], atol=1e-9)
        # angle-axis path
        theta, vec = U.euler2angle_axis(z, y, x)
        np.testing.assert_allclose(np.linalg.norm(vec), 1.0, atol=1e-12)
        np.testing.assert_allclose(U.angle_axis2euler(theta, vec),
                                   [z, y, x], atol=1e-9)


def test_mat2euler_gimbal_lock():
    for sy in (1.0, -1.0):
        m = U.euler2mat(0.7, sy * np.pi / 2, 0.0)
        z, y, x = U.mat2euler(m)
        np.testing.assert_allclose(U.euler2mat(z, y, x), m, atol=1e-10)
        assert x == 0.0  # pinned by convention at the singularity


def test_euler_identity_edge_cases():
    assert U.euler2angle_axis(0, 0, 0)[0] == 0.0
    np.testing.assert_allclose(U.quat2euler([1, 0, 0, 0]), [0, 0, 0],
                               atol=1e-12)
    np.testing.assert_allclose(U._quat2mat([0, 0, 0, 0]), np.eye(3))


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


def test_three_views_demo_jpg(tmp_path, rng):
    pts = rng.random((80, 3)) - 0.5
    out = str(tmp_path / "demo.jpg")
    assert U.point_cloud_three_views_demo(pts, out) == out
    from PIL import Image

    with Image.open(out) as im:
        assert im.size == (1500, 500)


def test_pyplot_draw_helpers(tmp_path, rng):
    pts = rng.random((40, 3))
    p1 = str(tmp_path / "cloud.png")
    U.pyplot_draw_point_cloud(pts, p1)
    import os

    assert os.path.getsize(p1) > 0
    vol = U.point_cloud_to_volume(pts * 1.6 - 0.8, 8)
    p2 = str(tmp_path / "vol.png")
    U.pyplot_draw_volume(vol, p2)
    assert os.path.getsize(p2) > 0
