"""Geometric-feature computation tests (tumseg/data/features.py) — the
working replacement for the reference's broken geofunction.py."""

import numpy as np
import pytest

from tumseg.data.dataset import TestGridDataset, TrainBlockDataset
from tumseg.data.features import (
    attach_geofeatures, cal_geofeature, geometric_features, voxel_downsample,
)
from tumseg.data.las import write_las


@pytest.fixture
def tile(tmp_path):
    r = np.random.default_rng(0)
    # dense enough that a 1m x 1m xy-block holds >1024 points (the train
    # sampler's rejection threshold): 6000 pts over 2x2 m -> ~1500/block
    n = 6000
    xyz = np.stack([r.uniform(0, 2, n), r.uniform(0, 2, n),
                    r.uniform(0, 3, n)], 1)
    labels = r.choice([1, 2, 3, 5, 7, 8, 11, 13], n)
    p = str(tmp_path / "feat.las")
    write_las(p, xyz, labels)
    return p


def test_geometric_features_planar_oracle(rng):
    # points on a plane -> planarity ~1, surface variation ~0
    n = 500
    pts = np.zeros((n, 3))
    pts[:, 0] = rng.uniform(0, 1, n)
    pts[:, 1] = rng.uniform(0, 1, n)
    lp, lo, lc, non = geometric_features(pts, radius=0.5)
    assert not non
    # uniform-in-plane neighborhoods: lambda2 = 0 exactly, lambda1/lambda0
    # well below 1 (isotropic square), so planarity ~0.5-0.7
    assert lp.mean() > 0.4
    assert lc.max() < 1e-6


def test_geometric_features_isolated_points():
    pts = np.array([[0.0, 0, 0], [100.0, 0, 0], [0, 100.0, 0]])
    lp, lo, lc, non = geometric_features(pts, radius=0.5)
    assert non == [0, 1, 2]
    assert (lp == 0).all()


def _reference_geometric_features(points, radius):
    """The pre-vectorization per-point SVD loop, kept verbatim as the oracle
    for the closed-form tiled-gram path (matches geofunction.py:49-98 math)."""
    from scipy.spatial import cKDTree
    from tumseg.data.features import pca_eigenvalues
    n = points.shape[0]
    tree = cKDTree(points)
    lp, lo, lc = np.zeros(n), np.zeros(n), np.zeros(n)
    non = []
    for i in range(n):
        idx = tree.query_ball_point(points[i], r=radius)
        if len(idx) <= 1:
            non.append(i)
            continue
        lam = np.maximum(pca_eigenvalues(points[idx]), 0.0)
        if lam[0] <= 0:
            non.append(i)
            continue
        lp[i] = (lam[1] - lam[2]) / lam[0]
        lo[i] = float(np.cbrt(lam[0] * lam[1] * lam[2]))
        lc[i] = lam[2] / lam.sum()
    return lp, lo, lc, non


def test_geometric_features_matches_svd_loop_oracle(rng):
    # mixed geometry: a plane, a line, and a volumetric blob, plus isolated
    # points — exercises every eigenvalue regime of the closed-form path
    plane = np.stack([rng.uniform(0, 1, 300), rng.uniform(0, 1, 300),
                      1e-3 * rng.standard_normal(300)], 1)
    line = np.stack([rng.uniform(2, 3, 150), np.full(150, 0.5),
                     1e-3 * rng.standard_normal(150)], 1)
    blob = 0.3 * rng.standard_normal((200, 3)) + [5, 5, 5]
    iso = np.array([[50.0, 50, 50], [60.0, 60, 60]])
    pts = np.concatenate([plane, line, blob, iso])
    lp_v, lo_v, lc_v, non_v = geometric_features(pts, radius=0.4, batch=97)
    lp_r, lo_r, lc_r, non_r = _reference_geometric_features(pts, radius=0.4)
    assert non_v == non_r
    # atol 5e-7: at degenerate spectra (lambda2 ~ 0) the SVD oracle itself
    # carries ~1e-7 conditioning noise vs the closed-form+Newton path —
    # both are exact to their shared floor
    np.testing.assert_allclose(lp_v, lp_r, atol=5e-7)
    np.testing.assert_allclose(lo_v, lo_r, atol=5e-7)
    np.testing.assert_allclose(lc_v, lc_r, atol=5e-7)


def test_geometric_features_duplicate_points_match_oracle(rng):
    # duplicate points produce distance-0 pairs, which the COO enumeration
    # must keep as EXPLICIT zeros (a sparse container dropping them would
    # silently shrink neighborhood counts and shift every mean); also the
    # self-pair of every point is such an explicit zero
    base = rng.uniform(0, 2, (150, 3))
    pts = np.vstack([base, base[:40]])  # 40 exact duplicates
    for got, want in zip(geometric_features(pts, radius=0.5)[:3],
                         _reference_geometric_features(pts, 0.5)[:3]):
        np.testing.assert_allclose(got, want, atol=5e-7)


def test_geometric_features_multi_piece_tiles_match(rng, monkeypatch):
    # force the tile entry budget below one tile's worth so _tile_moments
    # runs its piece loop (searchsorted slicing) — results must be
    # bit-identical to the unconstrained single-piece path
    from tumseg.data import features as F

    pts = rng.uniform(0, 2, (500, 3))
    want = geometric_features(pts, radius=0.5)
    monkeypatch.setattr(F, "_TILE_ENTRY_BUDGET", 64)
    got = geometric_features(pts, radius=0.5)
    for g, w in zip(got[:3], want[:3]):
        np.testing.assert_array_equal(g, w)
    assert got[3] == want[3]


def test_geometric_features_georeferenced_offset_stable(rng):
    # UTM-scale coordinates (the real TUM tiles are georeferenced): the
    # query-point-local accumulation must not lose the signal to
    # cancellation against ~1e6-magnitude offsets
    base = rng.uniform(0, 2, (400, 3))
    off = base + np.array([691_000.0, 5_336_000.0, 520.0])
    for col in range(3):
        a = geometric_features(base, radius=0.6)[col]
        b = geometric_features(off, radius=0.6)[col]
        np.testing.assert_allclose(a, b, atol=1e-5)


def test_eigvals3_closed_form_matches_eigvalsh(rng):
    from tumseg.data.features import _eigvals3_sym_desc
    a = rng.standard_normal((500, 3, 3))
    sym = a @ np.transpose(a, (0, 2, 1))  # PSD, well-conditioned-ish
    # add exact special cases: zero, scaled identity, diagonal
    sym = np.concatenate([sym, np.zeros((1, 3, 3)),
                          3.7 * np.eye(3)[None],
                          np.diag([5.0, 2.0, 9.0])[None]])
    packed = np.stack([sym[:, 0, 0], sym[:, 0, 1], sym[:, 0, 2],
                       sym[:, 1, 1], sym[:, 1, 2], sym[:, 2, 2]], axis=1)
    got = _eigvals3_sym_desc(packed)
    want = np.linalg.eigvalsh(sym)[:, ::-1]
    np.testing.assert_allclose(got, want, atol=1e-8)


def test_voxel_downsample_majority_and_inverse(rng):
    pts = rng.uniform(0, 1, (2000, 3))
    labels = rng.integers(0, 4, 2000)
    c, m = voxel_downsample(pts, labels, voxel_size=0.2)
    assert c.shape[0] == m.shape[0] <= 125 + 27
    c2, m2, inv = voxel_downsample(pts, labels, voxel_size=0.2,
                                   return_inverse=True)
    np.testing.assert_allclose(c, c2)
    assert inv.shape == (2000,)
    assert inv.max() == c.shape[0] - 1
    # each point's voxel centroid within voxel diameter of the point
    np.testing.assert_array_less(
        np.abs(c[inv] - pts).max(axis=1), 0.2 + 1e-9)


@pytest.mark.parametrize("downsample", [False, True])
def test_attach_geofeatures_lengths_match(tile, downsample):
    """Feature columns must be per-full-resolution-point even when computed
    on a downsampled cloud (ADVICE r1 #2)."""
    ds = TrainBlockDataset([tile], num_classes=8, num_point=128, color=False,
                           seed=0)
    attach_geofeatures(ds, ["Planarity", "Omnivariance"],
                       downsample=downsample)
    assert ds.num_extra_features == 2
    assert ds.feature_name == ["Planarity", "Omnivariance"]
    n_room = ds.room_points[0].shape[0]
    for col in ds.extra_features_data[0]:
        assert col.shape == (n_room,)
    feats, labels = ds[0]
    assert feats.shape == (128, 8)
    assert np.isfinite(feats).all()


def test_attach_geofeatures_test_dataset(tile):
    ds = TestGridDataset(las_file_list=[tile], num_classes=8,
                         block_points=128, color=False, seed=0)
    attach_geofeatures(ds, ["Surface variation"])
    data, labels, smpw, pidx = ds[0]
    assert data.shape[2] == 7  # 6 base (color off) + 1 geo
    assert np.isfinite(data).all()


def test_cal_geofeature_downsample_parity_direction(tile):
    """Downsampled features approximate full-res ones (same scale, finite)."""
    ds = TrainBlockDataset([tile], num_classes=8, num_point=128, color=False,
                           seed=0)
    lp_f, _, _, _ = cal_geofeature(ds, downsample=False)
    lp_d, _, _, _ = cal_geofeature(ds, downsample=True)
    assert lp_f[0].shape == lp_d[0].shape
    assert np.isfinite(lp_d[0]).all()
