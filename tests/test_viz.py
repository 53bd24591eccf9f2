"""Native renderer build + rasterization tests and artifact writers."""

import shutil

import numpy as np
import pytest

from tumseg.viz.writers import read_labels_txt, write_labels_txt, write_obj_pointcloud


@pytest.mark.skipif(shutil.which("g++") is None, reason="no C++ toolchain")
def test_render_frame_draws_points():
    from tumseg.viz.show3d import render_frame

    r = np.random.default_rng(0)
    xyz = r.random((200, 3))
    colors = np.full((200, 3), 255.0, dtype=np.float32)
    img = render_frame(xyz, colors, size=200, ballradius=5)
    assert img.shape == (200, 200, 3) and img.dtype == np.uint8
    assert (img > 0).sum() > 100  # something was rasterized


@pytest.mark.skipif(shutil.which("g++") is None, reason="no C++ toolchain")
def test_render_depth_ordering():
    """A nearer point (larger z) must win the depth test at the same pixel."""
    from tumseg.viz.show3d import _load_renderer
    import ctypes as ct

    dll = _load_renderer()
    size = 64
    show = np.zeros((size, size, 3), dtype=np.uint8)
    # two points at the same pixel, different z; colors distinguish them
    ixyz = np.array([[32, 32, 0], [32, 32, 100]], dtype=np.int32)
    c0 = np.array([10.0, 250.0], dtype=np.float32)
    c1 = np.array([10.0, 250.0], dtype=np.float32)
    c2 = np.array([10.0, 250.0], dtype=np.float32)
    dll.render_ball(ct.c_int(size), ct.c_int(size),
                    show.ctypes.data_as(ct.c_void_p), ct.c_int(2),
                    ixyz.ctypes.data_as(ct.c_void_p),
                    c0.ctypes.data_as(ct.c_void_p),
                    c1.ctypes.data_as(ct.c_void_p),
                    c2.ctypes.data_as(ct.c_void_p), ct.c_int(3))
    # center pixel colored by the z=100 point (bright), not the z=0 one
    assert show[32, 32].max() > 100


@pytest.mark.skipif(shutil.which("g++") is None, reason="no C++ toolchain")
def test_render_z_shading_gradient():
    """Points farther in z render dimmer (depth cue 0.3..1.0)."""
    from tumseg.viz.show3d import _load_renderer
    import ctypes as ct

    dll = _load_renderer()
    size = 96
    show = np.zeros((size, size, 3), dtype=np.uint8)
    ixyz = np.array([[20, 48, 0], [70, 48, 1000]], dtype=np.int32)
    ones = np.array([255.0, 255.0], dtype=np.float32)
    dll.render_ball(ct.c_int(size), ct.c_int(size),
                    show.ctypes.data_as(ct.c_void_p), ct.c_int(2),
                    ixyz.ctypes.data_as(ct.c_void_p),
                    ones.ctypes.data_as(ct.c_void_p),
                    ones.ctypes.data_as(ct.c_void_p),
                    ones.ctypes.data_as(ct.c_void_p), ct.c_int(5))
    near = int(show[70, 48].max())
    far = int(show[20, 48].max())
    assert near > far > 0


def test_writers_roundtrip(tmp_path):
    labels = np.array([0, 3, 7, 1])
    p = str(tmp_path / "labels.txt")
    write_labels_txt(p, labels)
    np.testing.assert_array_equal(read_labels_txt(p), labels)

    xyz = np.random.default_rng(0).random((4, 3))
    obj = str(tmp_path / "pc.obj")
    write_obj_pointcloud(obj, xyz, labels=labels,
                         label2color={i: [i, i, i] for i in range(8)})
    lines = open(obj).read().splitlines()
    assert len(lines) == 4 and all(l.startswith("v ") for l in lines)


@pytest.mark.skipif(shutil.which("g++") is None, reason="no C++ toolchain")
def test_demo_snapshot(tmp_path):
    """The viewer demo main (reference show3d_balls.py:167-223 counterpart)
    renders a synthetic labeled cloud headlessly via --snapshot."""
    from tumseg.viz.show3d import demo

    out = str(tmp_path / "demo.png")
    demo(["--snapshot", out, "--npoints", "500"])
    import cv2

    img = cv2.imread(out)
    assert img is not None and img.shape == (800, 800, 3)
    # white background with colored label sprites rendered on top
    assert (img < 250).any()


@pytest.mark.skipif(shutil.which("g++") is None, reason="no C++ toolchain")
def test_demo_snapshot_from_las(tmp_path):
    from tumseg.data.las import write_las
    from tumseg.viz.show3d import demo

    r = np.random.default_rng(1)
    p = str(tmp_path / "tile.las")
    write_las(p, r.random((300, 3)), np.arange(300) % 5)
    out = str(tmp_path / "demo_las.png")
    demo(["--dataset", p, "--snapshot", out, "--npoints", "200"])
    import cv2

    assert cv2.imread(out) is not None
