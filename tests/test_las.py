"""LAS reader/writer roundtrip and Extra Bytes tests."""

import numpy as np
import pytest

from tumseg.data.las import read_las, write_las, read_las_file_with_labels


def _tile(n=1000, seed=0):
    r = np.random.default_rng(seed)
    xyz = np.stack([r.uniform(0, 12, n), r.uniform(0, 4, n), r.uniform(0, 20, n)], 1)
    labels = r.integers(0, 18, n).astype(np.uint8)
    rgb = r.integers(0, 256, (n, 3)).astype(np.uint16)
    return xyz, labels, rgb


def test_roundtrip_xyz_class_rgb(tmp_path):
    xyz, labels, rgb = _tile()
    path = str(tmp_path / "tile.las")
    write_las(path, xyz, labels, rgb=rgb)
    las = read_las(path)
    assert len(las) == len(xyz)
    np.testing.assert_allclose(las.xyz, xyz, atol=1e-3)
    np.testing.assert_array_equal(las.classification, labels)
    np.testing.assert_array_equal(las.red, rgb[:, 0])
    np.testing.assert_array_equal(las.green, rgb[:, 1])
    np.testing.assert_array_equal(las.blue, rgb[:, 2])


def test_roundtrip_no_rgb(tmp_path):
    xyz, labels, _ = _tile(256)
    path = str(tmp_path / "norgb.las")
    write_las(path, xyz, labels)
    las = read_las(path)
    assert las.header.point_format == 6
    np.testing.assert_allclose(las.xyz, xyz, atol=1e-3)
    with pytest.raises(AttributeError):
        _ = las.red


def test_extra_bytes_named_scalars(tmp_path):
    xyz, labels, rgb = _tile(512, seed=1)
    planarity = np.random.default_rng(2).random(512).astype(np.float32)
    omni = np.random.default_rng(3).random(512).astype(np.float64)
    path = str(tmp_path / "eb.las")
    write_las(path, xyz, labels, rgb=rgb,
              extra={"Planarity (0.8)": planarity, "Omnivariance": omni})
    las = read_las(path)
    # exact-name access
    got = getattr(las, "Planarity (0.8)")
    np.testing.assert_array_equal(got, planarity)
    np.testing.assert_array_equal(las.Omnivariance, omni)
    # sanitized alias access (like CLI flag "Planarity(0.8)" / lowercase)
    np.testing.assert_array_equal(getattr(las, "planarity (0.8)"), planarity)
    assert "Planarity (0.8)" in las.point_format_dimensions


def test_read_las_file_with_labels(tmp_path):
    xyz, labels, rgb = _tile(64, seed=4)
    path = str(tmp_path / "rl.las")
    write_las(path, xyz, labels, rgb=rgb)
    coords, got = read_las_file_with_labels(path)
    assert coords.shape == (64, 3) and got.dtype == np.uint8
    np.testing.assert_array_equal(got, labels)


def test_large_coords_precision(tmp_path):
    # UTM-scale coordinates as in real TUM-Facade tiles
    xyz, labels, _ = _tile(128, seed=5)
    xyz += np.array([690000.0, 5336000.0, 500.0])
    path = str(tmp_path / "utm.las")
    write_las(path, xyz, labels)
    las = read_las(path)
    np.testing.assert_allclose(las.xyz, xyz, atol=1e-3)
