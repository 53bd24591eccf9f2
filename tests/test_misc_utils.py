"""Tests for aux utilities: timing, profiling, class weights, crop, s3dis."""

import numpy as np
import pytest

from tumseg.data import augment, s3dis
from tumseg.utils.labels import compute_class_weights
from tumseg.utils.profiling import StepTimer, annotate
from tumseg.utils.timing import current_time, time_print


def test_time_helpers():
    import time as _t

    msg = time_print(_t.time() - 3661)
    assert msg.startswith("Time taken = 1:1:")
    assert len(current_time().split(":")) == 3


def test_step_timer():
    t = StepTimer(points_per_step=1000)
    with t.step():
        pass
    assert len(t.durations) == 1
    assert t.points_per_sec > 0
    assert "points/sec" in t.report()


def test_annotate_context():
    with annotate("test-span"):
        pass


def test_compute_class_weights():
    ds = [(None, np.array([0, 0, 0, 1]))]  # class0: 3, class1: 1
    w = compute_class_weights(ds)
    # n_points / (n_classes * count): 4/(2*3), 4/(2*1)
    np.testing.assert_allclose(w, [4 / 6, 2.0], rtol=1e-6)


def test_random_crop(rng):
    pts = rng.random((100, 3))
    out = augment.random_point_cloud_crop(pts, 10, rng=np.random.default_rng(0))
    assert out.shape == (10, 3)
    with pytest.raises(AssertionError):
        augment.random_point_cloud_crop(pts, 200)


def test_assert_finite():
    from tumseg.utils.debug import assert_finite, finite_fraction

    assert_finite({"a": np.ones(3)}, "ok")
    with pytest.raises(FloatingPointError):
        assert_finite({"a": np.array([1.0, np.nan])}, "bad")
    assert finite_fraction(np.array([1.0, np.inf])) == 0.5


def test_summarize_model():
    import jax
    from tumseg import models
    from tumseg.utils.debug import summarize_model

    var = models.get_module("pointnet2_sem_seg").init(
        jax.random.PRNGKey(0), 8, 0)
    lines = []
    total = summarize_model(var, log=lines.append)
    assert total > 900_000  # ~1M params (SURVEY §2.3)
    assert any("sa1" in l for l in lines)
    assert any("TOTAL" in l for l in lines)


def test_nan_guard():
    from tumseg.utils.debug import NanGuard

    class FakeEngine:
        def train_batch(self, *a):
            return np.float32("nan"), 0

    g = NanGuard(FakeEngine())
    with pytest.raises(FloatingPointError):
        g.train_batch(None, None, 0.1, 0.1)


# ---- s3dis legacy utils ----

def _room(rng, n=3000):
    data = np.zeros((n, 6))
    data[:, 0] = rng.uniform(0, 3, n)
    data[:, 1] = rng.uniform(0, 2, n)
    data[:, 2] = rng.uniform(0, 2.5, n)
    data[:, 3:6] = rng.integers(0, 256, (n, 3))
    label = rng.integers(0, 13, n).astype(np.uint8)
    return data, label


def test_room2blocks(rng):
    data, label = _room(rng)
    bd, bl = s3dis.room2blocks(data[:, :6], label, 256, block_size=1.0,
                               stride=1.0, rng=np.random.default_rng(0))
    assert bd.shape[1:] == (256, 6) and bl.shape[1:] == (256,)
    assert bd.shape[0] > 0


def test_room2blocks_plus_normalized(rng):
    data, label = _room(rng)
    dl = np.concatenate([data, label[:, None]], 1)
    bd, bl = s3dis.room2blocks_plus_normalized(
        dl, 128, 1.0, 1.0, rng=np.random.default_rng(0))
    assert bd.shape[1:] == (128, 9)
    assert bd[..., 3:6].max() <= 1.0          # RGB scaled
    assert 0 <= bd[..., 6:9].min() and bd[..., 6:9].max() <= 1.0
    assert np.abs(bd[..., 0]).max() <= 0.5 + 1e-6  # xy centered per block


def test_room2samples(rng):
    data, label = _room(rng, 1000)
    sd, sl = s3dis.room2samples(data, label, 256, rng=np.random.default_rng(0))
    assert sd.shape == (4, 256, 6) and sl.shape == (4, 256, 1)


def test_collect_point_label(tmp_path, rng):
    anno = tmp_path / "Annotations"
    anno.mkdir()
    for i, cls in enumerate(["wall_1", "chair_1", "staris_1"]):
        pts = rng.random((20, 6))
        np.savetxt(str(anno / f"{cls}.txt"), pts)
    out = str(tmp_path / "room.npy")
    dl = s3dis.collect_point_label(str(anno), out, file_format="numpy")
    assert dl.shape == (60, 7)
    assert dl[:, :3].min() >= 0  # shifted to origin
    # unknown 'staris' mapped to clutter (12)
    assert set(np.unique(dl[:, 6])) <= {s3dis.CLASS2LABEL["wall"],
                                        s3dis.CLASS2LABEL["chair"], 12}
    assert np.load(out).shape == (60, 7)


def test_point_label_to_obj(tmp_path, rng):
    dl = np.concatenate([rng.random((30, 6)),
                         rng.integers(0, 13, (30, 1))], 1)
    src = str(tmp_path / "room.npy")
    np.save(src, dl)
    out = str(tmp_path / "room.obj")
    s3dis.point_label_to_obj(src, out)
    assert len(open(out).read().splitlines()) == 30


def test_collect_bounding_box(tmp_path, rng):
    anno = tmp_path / "Annotations"
    anno.mkdir()
    np.savetxt(str(anno / "table_1.txt"), rng.random((10, 6)))
    out = str(tmp_path / "bb.txt")
    s3dis.collect_bounding_box(str(anno), out)
    line = open(out).read().split()
    assert line[0] == "table" and len(line) == 7


def test_room2blocks_plus_and_wrapper(tmp_path, rng):
    data, label = _room(rng)
    dl = np.concatenate([data, label[:, None]], 1)
    bd, bl = s3dis.room2blocks_plus(dl, 128, 1.0, 1.0,
                                    rng=np.random.default_rng(0))
    assert bd.shape[1:] == (128, 6)  # no normalized channels
    assert bd[..., 3:6].max() <= 1.0
    src = str(tmp_path / "room.npy")
    np.save(src, dl)
    bd2, bl2 = s3dis.room2blocks_wrapper(src, 128)
    assert bd2.shape[1:] == (128, 6) and bd2.shape[0] == bd.shape[0]


def test_data_to_obj(tmp_path, rng):
    dl = np.concatenate([rng.random((30, 6)) * 255,
                         rng.integers(0, 13, (30, 1))], 1)
    out = str(tmp_path / "d.obj")
    s3dis.data_to_obj(dl, out, no_wall=True)
    lines = open(out).read().splitlines()
    n_kept = int(((dl[:, 6] != 0) & (dl[:, 6] != 2)).sum())
    assert len(lines) == n_kept
    s3dis.data_to_obj(dl, out, no_wall=False)
    assert len(open(out).read().splitlines()) == 30


def test_bbox_label_to_obj_variants(tmp_path):
    bb = np.array([[0, 0, 0, 1, 2, 3, 7],       # table
                   [1, 1, 1, 2, 2, 2, 2]])      # wall
    src = str(tmp_path / "bb.txt")
    np.savetxt(src, bb)
    prefix = str(tmp_path / "boxes")
    s3dis.bbox_label_to_obj(src, prefix)
    objs = sorted(tmp_path.glob("boxes_*.obj"))
    mtls = sorted(tmp_path.glob("boxes_*.mtl"))
    assert len(objs) == 2 and len(mtls) == 2
    text = objs[0].read_text()
    assert text.count("\nv ") == 8 and text.count("\nf ") == 6
    # easy_view keeps only furniture/floor labels
    prefix2 = str(tmp_path / "easy")
    s3dis.bbox_label_to_obj(src, prefix2, easy_view=True)
    assert len(list(tmp_path.glob("easy_*.obj"))) == 1

    room_prefix = str(tmp_path / "room")
    s3dis.bbox_label_to_obj_room(src, room_prefix, permute=[0, 2, 1],
                                 center=True)
    rt = (tmp_path / "room.obj").read_text()
    assert rt.count("\nv ") == 16 and rt.count("\nf ") == 12
    assert "mtllib room.mtl" in rt
    s3dis.bbox_label_to_obj_room(src, str(tmp_path / "noT"),
                                 exclude_table=True)
    assert (tmp_path / "noT.obj").read_text().count("\nv ") == 8


def test_collect_point_bounding_box(tmp_path, rng):
    anno = tmp_path / "Annotations"
    anno.mkdir()
    np.savetxt(str(anno / "chair_1.txt"), rng.random((10, 6)))
    np.savetxt(str(anno / "wall_1.txt"), rng.random((5, 6)) + 2.0)
    out = str(tmp_path / "pbb.npy")
    pbb = s3dis.collect_point_bounding_box(str(anno), out, "numpy")
    assert pbb.shape == (15, 13)
    assert pbb[:, 0:3].min() >= 0  # room-shifted
    # offset + point (pre-shift) = box center; half-dims consistent:
    # reconstruct each instance's extent from offsets and half-dims
    half = pbb[:10, 10:13]
    assert (half >= 0).all()
    loaded = np.load(out)
    np.testing.assert_allclose(loaded, pbb)
