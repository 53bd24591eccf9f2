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


def test_fuzz_roundtrips(tmp_path):
    """Randomized roundtrips across point counts, coordinate ranges, scales,
    and extra-bytes dtypes."""
    r = np.random.default_rng(99)
    for trial in range(8):
        n = int(r.integers(1, 5000))
        scale = float(r.choice([0.001, 0.01, 0.0001]))
        offset = r.uniform(-1e5, 1e5, 3)
        xyz = r.uniform(0, 100, (n, 3)) + offset
        labels = r.integers(0, 32, n).astype(np.uint8)
        use_rgb = bool(r.integers(0, 2))
        rgb = (r.integers(0, 65536, (n, 3)).astype(np.uint16)
               if use_rgb else None)
        eb_dtype = r.choice([np.float32, np.float64, np.uint8, np.int32])
        extra = {"Field A": r.uniform(0, 1, n).astype(eb_dtype)} \
            if r.integers(0, 2) else None
        p = str(tmp_path / f"fuzz{trial}.las")
        write_las(p, xyz, labels, rgb=rgb, extra=extra,
                  scales=(scale,) * 3)
        las = read_las(p)
        assert len(las) == n
        np.testing.assert_allclose(las.xyz, xyz, atol=scale * 0.51)
        np.testing.assert_array_equal(las.classification, labels)
        if use_rgb:
            np.testing.assert_array_equal(las.red, rgb[:, 0])
        if extra:
            got = getattr(las, "Field A")
            if np.issubdtype(eb_dtype, np.floating):
                np.testing.assert_allclose(got, extra["Field A"])
            else:
                np.testing.assert_array_equal(got, extra["Field A"])


def test_malformed_files_fail_loudly(tmp_path):
    from tumseg.data.las import read_las

    bad_magic = tmp_path / "bad.las"
    bad_magic.write_bytes(b"NOPE" + b"\x00" * 400)
    with pytest.raises(ValueError, match="not a LAS file"):
        read_las(str(bad_magic))

    # truncated header
    xyz, labels, _ = _tile(32, seed=6)
    p = tmp_path / "trunc.las"
    write_las(str(p), xyz, labels)
    data = p.read_bytes()
    p.write_bytes(data[:100])
    with pytest.raises(Exception):
        read_las(str(p))


def test_scale_overflow_fails_loudly(tmp_path):
    # the min-offset absorbs absolute magnitude; overflow needs SPREAD
    xyz = np.array([[0.0, 0.0, 0.0], [1e8, 0.0, 0.0]])
    with pytest.raises(ValueError, match="overflow"):
        write_las(str(tmp_path / "o.las"), xyz, np.array([1, 1]),
                  scales=(1e-6, 1e-6, 1e-6))


def test_unknown_dimension_message(tmp_path):
    from tumseg.data.las import read_las

    xyz, labels, _ = _tile(16, seed=7)
    p = str(tmp_path / "dim.las")
    write_las(p, xyz, labels)
    las = read_las(p)
    with pytest.raises(AttributeError, match="no dimension"):
        getattr(las, "Verticality")


def test_large_coords_precision(tmp_path):
    # UTM-scale coordinates as in real TUM-Facade tiles
    xyz, labels, _ = _tile(128, seed=5)
    xyz += np.array([690000.0, 5336000.0, 500.0])
    path = str(tmp_path / "utm.las")
    write_las(path, xyz, labels)
    las = read_las(path)
    np.testing.assert_allclose(las.xyz, xyz, atol=1e-3)
