"""Device-side training block sampler: semantics parity with
TrainBlockDataset.sample (reference sem_seg_training.py:200-259)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tumseg.data.dataset import TrainBlockDataset
from tumseg.data.device_sampler import (DeviceBlockSampler,
                                        DeviceSampleLoader, RoomBatch)


def _dense_rooms(seed=0, n0=6000, n1=4000):
    """Two rooms dense enough that 1 m blocks hold >MIN points."""
    r = np.random.default_rng(seed)
    rooms = []
    for n, span in ((n0, (3.0, 2.0)), (n1, (2.0, 2.5))):
        pts = np.stack([r.uniform(0, span[0], n), r.uniform(0, span[1], n),
                        r.uniform(0, 2.0, n)], axis=1)
        labels = (pts[:, 0] * 3).astype(np.int64) % 8
        extra = [r.uniform(0, 255, n), r.uniform(0, 1, n)]
        rooms.append((pts, labels, extra))
    return rooms


MIN_PTS = 200  # the reference hard-codes 1024; tests use smaller dense rooms


@pytest.fixture(scope="module")
def sampler():
    rooms = _dense_rooms()
    return DeviceBlockSampler(
        [p for p, _, _ in rooms], [l for _, l, _ in rooms],
        [e for _, _, e in rooms], color_flags=[True, False],
        num_point=512, block_size=1.0, min_block_points=MIN_PTS), rooms


def test_sampled_blocks_match_host_semantics(sampler):
    s, rooms = sampler
    key = jax.random.PRNGKey(7)
    room_ids = jnp.asarray([0, 1, 0, 1], jnp.int32)
    pts, lab, centers, cnts, sel = jax.tree_util.tree_map(
        np.asarray, s.sample_batch_aux(key, room_ids))
    assert pts.shape == (4, 512, 8) and lab.shape == (4, 512)
    half = 0.5
    for b, rid in enumerate([0, 1, 0, 1]):
        room_pts, room_lab, room_ext = rooms[rid]
        c = centers[b]
        # the center is an actual point of the right room
        d = np.abs(room_pts.astype(np.float32) - c).max(axis=1)
        assert d.min() == 0.0
        # the device count equals the host count of the SAME block (f32
        # boundary compare, same expression); accept rule respected
        rp32 = room_pts.astype(np.float32)
        inside = ((rp32[:, 0] >= c[0] - half) & (rp32[:, 0] <= c[0] + half)
                  & (rp32[:, 1] >= c[1] - half) & (rp32[:, 1] <= c[1] + half))
        assert cnts[b] == inside.sum()
        assert cnts[b] > MIN_PTS
        # every selected point lies inside the block
        assert np.all(np.abs(pts[b, :, 0]) <= half + 1e-6)
        assert np.all(np.abs(pts[b, :, 1]) <= half + 1e-6)
        # feature columns reproduce the host formula exactly (f32)
        cmax = room_pts.max(axis=0).astype(np.float32)
        # selected payload indices -> recompute features on host
        sel_xyz = np.asarray(s._xyz)[sel[b]]
        np.testing.assert_allclose(pts[b, :, 0], sel_xyz[:, 0] - c[0],
                                   rtol=0, atol=0)
        np.testing.assert_allclose(pts[b, :, 2], sel_xyz[:, 2], rtol=0, atol=0)
        np.testing.assert_allclose(pts[b, :, 3:6], sel_xyz / cmax,
                                   rtol=1e-6, atol=0)
        # labels travel with their points
        np.testing.assert_array_equal(lab[b], np.asarray(s._labels)[sel[b]])
        # color extra scaled /255, plain extra untouched
        np.testing.assert_allclose(pts[b, :, 6],
                                   np.asarray(s._extra)[sel[b], 0],
                                   rtol=0, atol=0)
        assert pts[b, :, 6].max() <= 1.0 + 1e-6


def test_without_replacement_when_block_is_big_enough(sampler):
    s, _ = sampler
    _, _, _, cnts, sel = s.sample_batch_aux(jax.random.PRNGKey(3),
                                            jnp.asarray([0, 0], jnp.int32))
    cnts, sel = np.asarray(cnts), np.asarray(sel)
    for b in range(2):
        assert cnts[b] >= 512  # dense rooms: blocks exceed num_point
        assert np.unique(sel[b]).size == 512  # no duplicates


def test_with_replacement_when_block_is_small():
    """Rooms where every block holds (MIN, num_point) points must draw with
    replacement — duplicates allowed, all members inside."""
    r = np.random.default_rng(1)
    n = 3000
    pts = np.stack([r.uniform(0, 10.0, n), r.uniform(0, 10.0, n),
                    r.uniform(0, 2.0, n)], axis=1)  # ~30 pts / m^2
    s = DeviceBlockSampler([pts], [np.zeros(n, np.int64)], [[]],
                           color_flags=[], num_point=256, block_size=1.0,
                           min_block_points=10)
    _, _, centers, cnts, sel = jax.tree_util.tree_map(
        np.asarray, s.sample_batch_aux(jax.random.PRNGKey(0),
                                       jnp.asarray([0, 0], jnp.int32)))
    for b in range(2):
        assert 10 < cnts[b] < 256
        assert np.unique(sel[b]).size <= cnts[b]  # drawn from block members
        sel_xyz = np.asarray(s._xyz)[sel[b]]
        assert np.all(np.abs(sel_xyz[:, :2] - centers[b][:2]) <= 0.5 + 1e-6)


def test_selection_is_uniform_over_block_members():
    """Without-replacement draws hit each block member equally often."""
    r = np.random.default_rng(2)
    n = 2000
    pts = np.stack([r.uniform(0, 1.0, n), r.uniform(0, 1.0, n),
                    r.uniform(0, 1.0, n)], axis=1)  # one room == one block
    s = DeviceBlockSampler([pts], [np.arange(n) % 8], [[]], color_flags=[],
                           num_point=64, block_size=4.0, min_block_points=10)
    counts = np.zeros(n)
    B = 64
    _, _, _, _, sel = jax.tree_util.tree_map(
        np.asarray,
        s.sample_batch_aux(jax.random.PRNGKey(11),
                           jnp.zeros((B,), jnp.int32)))
    np.add.at(counts, sel.reshape(-1), 1)
    # B*64 draws over ~n members: mean 2.05 hits; a uniform draw's max stays
    # far below a concentrated one's
    assert counts.mean() == pytest.approx(B * 64 / n, rel=0.01)
    assert counts.max() <= 12


def test_from_dataset_and_loader(tmp_path):
    from tumseg.data.las import write_las

    r = np.random.default_rng(5)
    paths = []
    for i in range(2):
        n = 5000
        pts = np.stack([r.uniform(0, 2.5, n), r.uniform(0, 2.0, n),
                        r.uniform(0, 2.0, n)], axis=1)
        p = str(tmp_path / f"room{i}.las")
        raw = np.array([1, 2, 3, 5, 12])[np.arange(n) % 5]  # mappable codes
        write_las(p, pts, raw)
        paths.append(p)
    ds = TrainBlockDataset(paths, num_classes=8, num_point=128, color=False,
                           class8=True, seed=0)
    s = DeviceBlockSampler.from_dataset(ds, min_block_points=100)
    assert s.num_extra_features == 0 and s.num_point == 128

    loader = DeviceSampleLoader(ds, batch_size=4, shuffle=True, seed=3)
    batches1 = [b.room_ids.copy() for b in loader]
    assert all(isinstance(b, np.ndarray) for b in batches1)
    assert len(batches1) == len(ds) // 4
    # same seed+epoch -> same order; next epoch reshuffles
    loader2 = DeviceSampleLoader(ds, batch_size=4, shuffle=True, seed=3)
    batches2 = [b.room_ids.copy() for b in loader2]
    np.testing.assert_array_equal(np.concatenate(batches1),
                                  np.concatenate(batches2))
    batches3 = [b.room_ids.copy() for b in loader2]
    assert not np.array_equal(np.concatenate(batches1),
                              np.concatenate(batches3))
    # the id multiset is always (a prefix of) room_idxs
    ids = np.concatenate(batches1)
    assert set(ids.tolist()) <= set(ds.room_idxs.tolist())

    pts_b, lab_b = jax.tree_util.tree_map(
        np.asarray,
        s.sample_batch(jax.random.PRNGKey(0),
                       jnp.asarray(batches1[0], jnp.int32)))
    assert pts_b.shape == (4, 128, 6) and lab_b.shape == (4, 128)
    assert np.isfinite(pts_b).all()
    assert (lab_b >= 0).all() and (lab_b < 8).all()


def test_center_distribution_matches_host():
    """Label histograms of device-sampled blocks track the host sampler's
    (same distribution family, different RNG streams)."""
    rooms = _dense_rooms(seed=9, n0=8000, n1=1)  # single room in play
    pts, labels, extra = rooms[0]
    # match the host's hard-coded accept threshold (1024) so both sides
    # reject the same sparse edge blocks
    s = DeviceBlockSampler([pts], [labels], [[]], color_flags=[],
                           num_point=256, block_size=1.0,
                           min_block_points=1024)
    B = 96
    _, lab_dev = jax.tree_util.tree_map(
        np.asarray, s.sample_batch(jax.random.PRNGKey(4),
                                   jnp.zeros((B,), jnp.int32)))

    ds = TrainBlockDataset()
    ds.room_points = [pts]
    ds.room_labels = [labels]
    ds.room_coord_min = [pts.min(axis=0)]
    ds.room_coord_max = [pts.max(axis=0)]
    ds.extra_features_data = [[]]
    ds.num_point = 256
    ds.room_idxs = np.zeros(B, np.int64)
    rng = np.random.default_rng(4)
    host_lab = np.stack([ds.sample(i, rng)[1] for i in range(B)])

    h_dev = np.bincount(lab_dev.reshape(-1), minlength=8) / lab_dev.size
    h_host = np.bincount(host_lab.reshape(-1), minlength=8) / host_lab.size
    np.testing.assert_allclose(h_dev, h_host, atol=0.04)


def test_sparse_room_cap_floor():
    """A room whose densest 0.6 m bin holds far fewer than num_point/9
    points must still sample (cap is floored so the 9*cap candidate pool
    covers a full without-replacement draw): previously `ranked[:P]`
    silently clamped to 9*cap and the wor/wr where() shape-errored at
    trace time."""
    r = np.random.default_rng(3)
    n = 1200
    pts = np.stack([r.uniform(0, 2.0, n), r.uniform(0, 1.0, n),
                    r.uniform(0, 2.0, n)], axis=1)
    labels = (pts[:, 0] * 3).astype(np.int64) % 8
    s = DeviceBlockSampler([pts], [labels], [[]], color_flags=[],
                           num_point=4096, block_size=1.0,
                           min_block_points=200)
    assert 9 * s.cap >= 4096
    bpts, blab = jax.tree_util.tree_map(
        np.asarray,
        s.sample_batch(jax.random.PRNGKey(0), jnp.zeros(2, jnp.int32)))
    assert bpts.shape == (2, 4096, 6) and blab.shape == (2, 4096)
    # draws are real points of the room (duplicated with replacement)
    assert np.isfinite(bpts).all()
    assert (blab >= 0).all() and (blab < 8).all()


def test_too_small_room_raises_at_build_time():
    """A room with <= min_block_points total points can never satisfy the
    accept rule (cnt > min_block_points), so the on-device rejection
    while_loop would spin forever inside the train-step jit. The sampler
    must refuse it on host, at build time, with a clear message."""
    r = np.random.default_rng(3)
    small = np.stack([r.uniform(0, 1, 150), r.uniform(0, 1, 150),
                      r.uniform(0, 1, 150)], axis=1)
    dense = _dense_rooms()[0][0]
    with pytest.raises(ValueError, match="min_block_points"):
        DeviceBlockSampler([dense, small],
                           [np.zeros(len(dense), np.int64),
                            np.zeros(150, np.int64)],
                           [[], []], color_flags=[],
                           num_point=64, block_size=1.0,
                           min_block_points=MIN_PTS)
