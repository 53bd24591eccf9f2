"""Dataset, augmentation, and loader tests on synthetic LAS tiles."""

import numpy as np
import pytest

from tumseg.data import augment
from tumseg.data.dataset import TestGridDataset, TrainBlockDataset
from tumseg.data.las import write_las
from tumseg.data.loader import BatchLoader


@pytest.fixture
def tiles(tmp_path):
    """Two synthetic facade tiles with RGB + 18-class codes."""
    paths = []
    for i in range(2):
        r = np.random.default_rng(i)
        n = 20000
        xyz = np.stack([r.uniform(0, 6, n), r.uniform(0, 3, n),
                        r.uniform(0, 10, n)], 1)
        labels = r.choice([1, 2, 3, 5, 7, 8, 11, 13], n)
        rgb = r.integers(0, 256, (n, 3)).astype(np.uint16)
        p = str(tmp_path / f"tile{i}.las")
        write_las(p, xyz, labels, rgb=rgb)
        paths.append(p)
    return paths


def test_train_dataset_block_shapes(tiles):
    ds = TrainBlockDataset(tiles, num_classes=8, num_point=512, class8=True,
                           color=True, seed=0)
    assert len(ds) > 0
    feats, labels = ds[0]
    assert feats.shape == (512, 9)  # 6 base + rgb
    assert labels.shape == (512,)
    assert labels.min() >= 0 and labels.max() <= 7
    # channel semantics: block-centered xy, raw z, room-max normalized 3:6
    assert np.abs(feats[:, 0]).max() <= 0.5 + 1e-9
    assert np.abs(feats[:, 1]).max() <= 0.5 + 1e-9
    assert feats[:, 2].min() >= 0
    assert 0 <= feats[:, 3].min() and feats[:, 5].max() <= 1.0 + 1e-9
    # rgb scaled to [0,1]
    assert feats[:, 6:9].max() <= 1.0


def test_train_dataset_no_color(tiles):
    ds = TrainBlockDataset(tiles, num_classes=18, num_point=256, class8=False,
                           color=False, seed=0)
    feats, labels = ds[0]
    assert feats.shape == (256, 6)
    assert ds.num_extra_features == 0
    # 18-class mode: raw codes pass through unmapped (SURVEY §5.1.9)
    assert labels.max() <= 17


def test_train_dataset_copy_split(tiles):
    ds = TrainBlockDataset(tiles, num_classes=8, num_point=256, seed=0)
    n = len(ds)
    idx = np.arange(n)
    train = ds.copy(indices=idx[: int(0.7 * n)])
    evald = ds.copy(indices=idx[int(0.7 * n):])
    assert len(train) + len(evald) == n
    assert train.room_points is not ds.room_points  # shallow list copy
    f, l = train[0]
    assert f.shape[0] == 256


def test_labelweights_cube_root(tiles):
    ds = TrainBlockDataset(tiles, num_classes=8, num_point=256, seed=0)
    w = ds.calculate_labelweights()
    assert w.shape == (8,)
    assert np.isfinite(w).all() and (w >= 1.0 - 1e-6).all()
    assert abs(w.min() - 1.0) < 1e-5  # most frequent class has weight 1


def test_save_load_roundtrip(tiles, tmp_path):
    ds = TrainBlockDataset(tiles, num_classes=8, num_point=256, seed=0)
    p = str(tmp_path / "ds.pkl")
    ds.save_data(p)
    ds2 = TrainBlockDataset.load_data(p)
    assert len(ds2) == len(ds)
    assert ds2.num_extra_features == ds.num_extra_features
    f, l = ds2[0]
    assert f.shape == (256, 9)


def test_filtered_update(tiles):
    ds = TrainBlockDataset(tiles, num_classes=8, num_point=256, seed=0)
    ds.non_index = [0]
    before = len(ds)
    ds.filtered_update()
    assert len(ds) < before
    assert set(np.unique(ds.room_idxs)) == {1}


def test_test_grid_dataset(tiles):
    ds = TestGridDataset(las_file_list=tiles[:1], num_classes=8,
                         block_points=512, class8=True, color=True, seed=0)
    assert len(ds) == 1
    data, labels, smpw, pidx = ds[0]
    B = data.shape[0]
    assert data.shape == (B, 512, 9)
    assert labels.shape == smpw.shape == pidx.shape == (B, 512)
    n_scene = ds.scene_points_list[0].shape[0]
    assert pidx.max() < n_scene
    # every original point appears at least once across blocks
    assert np.unique(pidx.astype(int)).size == n_scene
    # weights = labelweights[gt]
    np.testing.assert_allclose(
        smpw.ravel(), ds.labelweights[labels.ravel().astype(int)], rtol=1e-6)
    # block-centered coordinates bounded by block size + padding
    assert np.abs(data[..., 0]).max() <= 0.5 + ds.padding + 1e-6


def test_test_grid_copy_and_index_update(tiles):
    ds = TestGridDataset(las_file_list=tiles, num_classes=8, block_points=512,
                         seed=0)
    sub = ds.copy([1])
    assert len(sub) == 1
    ds.index_update([0])
    assert len(ds) == 1
    assert len(ds.labelweights) == 8


def test_test_grid_subset_keeps_scene_state_aligned(tiles):
    """copy/index_update must subset extra_features_data + file_list and
    remap non_index along with the scenes (the reference's latent bug at
    sem_seg_testing.py:286-310, fixed here; ADVICE r1 #1)."""
    ds = TestGridDataset(las_file_list=tiles, num_classes=8, block_points=512,
                         seed=0)
    # attach a distinguishable per-scene extra feature column
    for r in range(2):
        n = ds.scene_points_list[r].shape[0]
        ds.extra_features_data[r].append(np.full(n, float(r)))
    ds.feature_name.append("marker")
    ds.num_extra_features += 1
    ds.non_index = [0, 1]

    sub = ds.copy([1])
    assert len(sub.extra_features_data) == 1
    assert sub.extra_features_data[0][-1][0] == 1.0  # scene 1's column
    assert sub.file_list == [ds.file_list[1]]
    assert sub.non_index == [0]  # old scene 1 remapped to position 0
    data, labels, smpw, pidx = sub[0]  # feature gather works post-subset
    assert data.shape[2] == 10  # 9 + marker
    np.testing.assert_allclose(data[..., 9], 1.0)

    ds.index_update([1])
    assert len(ds.extra_features_data) == 1
    assert ds.extra_features_data[0][-1][0] == 1.0
    assert ds.non_index == [0]


def test_grid_indices_binned_matches_naive_masks(tiles):
    """grid_indices' stride-bin candidate pruning must reproduce the naive
    full-scene masks bit-for-bit (same point sets per cell -> same RNG
    consumption -> identical blocks)."""
    ds = TestGridDataset(las_file_list=tiles[:1], num_classes=8,
                         block_points=256, seed=0)
    points = ds.scene_points_list[0][:, :3]
    cmin, cmax = points.min(0), points.max(0)
    gx = int(np.ceil((cmax[0] - cmin[0] - ds.block_size) / ds.stride) + 1)
    gy = int(np.ceil((cmax[1] - cmin[1] - ds.block_size) / ds.stride) + 1)

    naive_cells = []
    for iy in range(gy):
        for ix in range(gx):
            s_x = cmin[0] + ix * ds.stride
            e_x = min(s_x + ds.block_size, cmax[0])
            s_x = e_x - ds.block_size
            s_y = cmin[1] + iy * ds.stride
            e_y = min(s_y + ds.block_size, cmax[1])
            s_y = e_y - ds.block_size
            inside = ((points[:, 0] >= s_x - ds.padding)
                      & (points[:, 0] <= e_x + ds.padding)
                      & (points[:, 1] >= s_y - ds.padding)
                      & (points[:, 1] <= e_y + ds.padding))
            pi = np.flatnonzero(inside)
            if pi.size:
                naive_cells.append((pi, s_x, s_y))

    rng = np.random.default_rng(99)
    want_blocks, want_offsets = [], []
    for pi, s_x, s_y in naive_cells:
        num_batch = int(np.ceil(pi.size / ds.block_points))
        size = num_batch * ds.block_points
        short = size - pi.size
        repeat = rng.choice(pi, short, replace=short > pi.size)
        pi = np.concatenate((pi, repeat))
        rng.shuffle(pi)
        want_blocks.append(pi.reshape(-1, ds.block_points))
        want_offsets.append(np.repeat([[s_x, s_y]], num_batch, axis=0))

    ds._rng = np.random.default_rng(99)
    got_blocks, got_offsets = ds.grid_indices(0)
    np.testing.assert_array_equal(got_blocks,
                                  np.concatenate(want_blocks, axis=0))
    np.testing.assert_allclose(got_offsets,
                               np.concatenate(want_offsets, axis=0))


def test_batch_loader_seed_deterministic_across_workers(tiles):
    ds = TrainBlockDataset(tiles, num_classes=8, num_point=128, seed=0)
    runs = []
    for workers in (1, 4):
        loader = BatchLoader(ds, batch_size=4, shuffle=True, drop_last=True,
                             num_workers=workers, seed=7)
        f, l = next(iter(loader))
        runs.append((f, l))
    np.testing.assert_array_equal(runs[0][0], runs[1][0])
    np.testing.assert_array_equal(runs[0][1], runs[1][1])


def test_test_grid_save_load(tiles, tmp_path):
    ds = TestGridDataset(las_file_list=tiles[:1], num_classes=8,
                         block_points=512, seed=0)
    p = str(tmp_path / "test_ds.pkl")
    ds.save_data(p)
    ds2 = TestGridDataset.load_data(p)
    assert len(ds2) == 1
    np.testing.assert_allclose(ds2.labelweights, ds.labelweights)
    data, labels, smpw, pidx = ds2[0]
    assert data.shape[1] == 512


def test_batch_loader_propagates_worker_errors(tiles):
    class Broken:
        def __len__(self):
            return 4

        def __getitem__(self, i):
            raise RuntimeError("boom")

    loader = BatchLoader(Broken(), batch_size=2, num_workers=2)
    with pytest.raises(RuntimeError, match="boom"):
        list(loader)


def test_batch_loader(tiles):
    ds = TrainBlockDataset(tiles, num_classes=8, num_point=256, seed=0)
    loader = BatchLoader(ds, batch_size=4, shuffle=True, drop_last=True,
                         num_workers=2, seed=1)
    batches = list(loader)
    assert len(batches) == len(ds) // 4
    f, l = batches[0]
    assert f.shape == (4, 256, 9) and f.dtype == np.float32
    assert l.shape == (4, 256) and l.dtype == np.int32


def test_rotate_z_preserves_z_and_norm(rng):
    pts = rng.random((4, 100, 3)).astype(np.float32)
    out = augment.rotate_point_cloud_z(pts, rng=np.random.default_rng(0))
    np.testing.assert_allclose(out[..., 2], pts[..., 2], atol=1e-5)
    np.testing.assert_allclose((out[..., :2] ** 2).sum(-1),
                               (pts[..., :2] ** 2).sum(-1), rtol=1e-4)


def test_jnp_host_rotation_agree():
    import jax
    import jax.numpy as jnp

    pts = np.random.default_rng(0).random((2, 64, 3)).astype(np.float32)
    out = augment.jrotate_z(jax.random.PRNGKey(0), jnp.array(pts))
    np.testing.assert_allclose(np.asarray(out)[..., 2], pts[..., 2], atol=1e-6)
    np.testing.assert_allclose(np.asarray((out[..., :2] ** 2).sum(-1)),
                               (pts[..., :2] ** 2).sum(-1), rtol=1e-4)


def test_device_augmentations_keyed(rng):
    import jax
    import jax.numpy as jnp

    pts = jnp.asarray(rng.random((2, 64, 3)).astype(np.float32))
    k = jax.random.PRNGKey(0)
    j = augment.jjitter(k, pts)
    assert np.abs(np.asarray(j - pts)).max() <= 0.05 + 1e-6  # clip bound
    s = augment.jscale(k, pts)
    ratio = np.asarray(s / pts)
    assert 0.8 - 1e-5 <= ratio.min() and ratio.max() <= 1.25 + 1e-5
    sh = augment.jshift(k, pts)
    d = np.asarray(sh - pts)
    # per-cloud constant shift within range
    assert np.abs(d).max() <= 0.1 + 1e-6
    np.testing.assert_allclose(d[:, 0, :], d[:, 1, :], atol=1e-6)
    # keyed determinism
    np.testing.assert_array_equal(np.asarray(augment.jrotate_z(k, pts)),
                                  np.asarray(augment.jrotate_z(k, pts)))


def test_rotate_with_normal_variants(rng):
    """xyz+normal rotations: same rotation on both blocks, norms preserved,
    and xyz path agrees with the plain variants (provider.py:86-174)."""
    pts = rng.random((3, 50, 6)).astype(np.float32)
    # normalize the normal block so we can check it stays unit-length
    pts[..., 3:6] /= np.linalg.norm(pts[..., 3:6], axis=-1, keepdims=True)

    out = augment.rotate_point_cloud_with_normal(
        pts.copy(), rng=np.random.default_rng(0))
    np.testing.assert_allclose(np.linalg.norm(out[..., 3:6], axis=-1), 1.0,
                               rtol=1e-5)
    # +y rotation preserves the y component of both blocks
    np.testing.assert_allclose(out[..., 1], pts[..., 1], atol=1e-5)
    np.testing.assert_allclose(out[..., 4], pts[..., 4], atol=1e-5)

    ang = 0.7
    fixed = augment.rotate_point_cloud_by_angle_with_normal(pts.copy(), ang)
    plain = augment.rotate_point_cloud_by_angle(pts[..., :3].copy(), ang)
    np.testing.assert_allclose(fixed[..., :3], plain, atol=1e-5)
    np.testing.assert_allclose(np.linalg.norm(fixed[..., 3:6], axis=-1), 1.0,
                               rtol=1e-5)

    pert = augment.rotate_perturbation_point_cloud_with_normal(
        pts.copy(), rng=np.random.default_rng(1))
    # small perturbation: stays close but not identical
    assert np.abs(pert[..., :3] - pts[..., :3]).max() < 0.5
    assert np.abs(pert - pts).max() > 0
    np.testing.assert_allclose(np.linalg.norm(pert[..., 3:6], axis=-1), 1.0,
                               rtol=1e-5)
    # same R applied to xyz and normals: dot(xyz, normal) invariant
    np.testing.assert_allclose(
        (pert[..., :3] * pert[..., 3:6]).sum(-1),
        (pts[..., :3] * pts[..., 3:6]).sum(-1), atol=1e-4)


def test_perturbation_with_normal_matches_plain_xyz(rng):
    """The batch-vectorized with-normal perturbation uses the same euler
    composition R = Rz@Ry@Rx as the per-cloud plain variant."""
    pts = rng.random((2, 30, 6)).astype(np.float32)
    a = augment.rotate_perturbation_point_cloud_with_normal(
        pts.copy(), rng=np.random.default_rng(5))
    b = augment.rotate_perturbation_point_cloud(
        pts[..., :3].copy(), rng=np.random.default_rng(5))
    np.testing.assert_allclose(a[..., :3], b, atol=1e-5)


def test_jitter_scale_shift_shapes(rng):
    pts = rng.random((2, 64, 3)).astype(np.float32)
    g = np.random.default_rng(0)
    assert augment.jitter_point_cloud(pts, rng=g).shape == pts.shape
    assert augment.shift_point_cloud(pts.copy(), rng=g).shape == pts.shape
    assert augment.random_scale_point_cloud(pts.copy(), rng=g).shape == pts.shape
    assert augment.random_point_dropout(pts.copy(), rng=g).shape == pts.shape
    d, l, idx = augment.shuffle_data(pts, np.arange(2), rng=g)
    assert d.shape == pts.shape
    nd = augment.normalize_data(pts)
    assert np.sqrt((nd ** 2).sum(-1)).max() <= 1.0 + 1e-5


def test_grid_structure_concurrent_insert_evict():
    """Hammer grid_structure from two threads walking different scenes (the
    run_testing main/prefetch pattern): the eviction list-comp must not see
    a concurrent insert (pre-fix: RuntimeError 'dictionary changed size
    during iteration'; advisor r3 finding)."""
    import threading as _th

    r = np.random.default_rng(5)
    ds = TestGridDataset(block_points=64, stride=0.5, block_size=1.0,
                         padding=0.001)
    ds.scene_points_list = [np.concatenate(
        [r.uniform(0, 2.0, (400, 3)), r.uniform(0, 1, (400, 3))], axis=1)
        for _ in range(12)]
    scenes = ds.scene_points_list
    errs = []

    def walk(offset):
        try:
            for _ in range(6):
                for i in range(len(scenes)):
                    ds.grid_structure((i + offset) % len(scenes))
        except Exception as e:  # noqa: BLE001 - recorded for the assert
            errs.append(e)

    threads = [_th.Thread(target=walk, args=(o,)) for o in (0, 1)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errs, errs
