"""Geometric feature computation (planarity / omnivariance / surface
variation) and voxel downsampling.

Replaces the reference's Open3D-based geofunction.py (declared unused and
partially broken there — geofunction.py:7 says the real features came from
CloudCompare; collFeatures crashes on `.shape` of a list, and the follow-up
`filtered_update` call targets a method that never existed, SURVEY §5.1.1-2).
This is the *working* equivalent: per-neighborhood PCA over a scipy cKDTree
radius search (r=0.8 as in geofunction.py:49), with the eigenvalue features

    planarity          p = (λ1 - λ2) / λ0
    omnivariance       o = (λ0 λ1 λ2)^(1/3)
    surface variation  c = λ2 / (λ0 + λ1 + λ2)

(λ descending; geofunction.py:72-74). Points with no neighbors beyond
themselves get 0-features and are reported in ``non_index``.

Unlike the reference (which concatenates all rooms into one cloud and then
appends a single flat list as if it were per-room), features here are
computed and returned per room so they slot directly into
``extra_features_data[room][feature]``.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np
from scipy.spatial import cKDTree


def pca_eigenvalues(neighborhood: np.ndarray) -> np.ndarray:
    """Descending eigenvalues of the neighborhood covariance (the SVD of the
    centered Gram matrix, as in geofunction.py:34-46)."""
    centered = neighborhood - neighborhood.mean(axis=0)
    h = centered.T @ centered
    return np.linalg.svd(h, compute_uv=False)  # descending by construction


def geometric_features(points: np.ndarray, radius: float = 0.8,
                       batch: int = 4096
                       ) -> Tuple[np.ndarray, np.ndarray, np.ndarray, List[int]]:
    """Per-point (planarity, omnivariance, surface_variation, non_index)
    for one room's [N, 3] cloud."""
    n = points.shape[0]
    tree = cKDTree(points)
    lp = np.zeros(n)
    lo = np.zeros(n)
    lc = np.zeros(n)
    non_index: List[int] = []

    for start in range(0, n, batch):
        chunk = points[start:start + batch]
        neighbor_lists = tree.query_ball_point(chunk, r=radius)
        for j, idx in enumerate(neighbor_lists):
            i = start + j
            if len(idx) <= 1:
                non_index.append(i)
                continue
            lam = pca_eigenvalues(points[idx])
            lam = np.maximum(lam, 0.0)
            if lam[0] <= 0:
                non_index.append(i)
                continue
            lp[i] = (lam[1] - lam[2]) / lam[0]
            lo[i] = float(np.cbrt(lam[0] * lam[1] * lam[2]))
            lc[i] = lam[2] / lam.sum()
    return lp, lo, lc, non_index


def voxel_downsample(points: np.ndarray, labels: np.ndarray,
                     voxel_size: float = 0.05, return_inverse: bool = False):
    """Voxel-grid downsample: centroid position + majority label per voxel
    (the open3d voxel_down_sample equivalent, geofunction.py:101-118).

    With ``return_inverse=True`` also returns the [N] voxel index of each
    input point, so per-voxel quantities can be scattered back to full
    resolution."""
    keys = np.floor((points - points.min(axis=0)) / voxel_size).astype(np.int64)
    _, inverse, counts = np.unique(keys, axis=0, return_inverse=True,
                                   return_counts=True)
    n_voxels = counts.shape[0]
    sums = np.zeros((n_voxels, 3))
    np.add.at(sums, inverse, points)
    centroids = sums / counts[:, None]
    # majority label per voxel
    num_classes = int(labels.max()) + 1
    votes = np.zeros((n_voxels, num_classes), dtype=np.int64)
    np.add.at(votes, (inverse, labels.astype(np.int64)), 1)
    maj = votes.argmax(axis=1).astype(labels.dtype)
    if return_inverse:
        return centroids, maj, inverse
    return centroids, maj


def cal_geofeature(dataset, downsample: bool = False, visualize: bool = False):
    """Compute per-room geometric features for a Train/Test dataset.

    Returns (lp_rooms, lo_rooms, lc_rooms, non_index) where *_rooms are
    per-room feature arrays and non_index holds (room, point) pairs with no
    neighbors — the CLI drops those rooms, fixing the reference's intended
    filtered_update behavior (sem_seg_training.py:466-470).
    """
    rooms = getattr(dataset, "room_points", None)
    if rooms is None:
        rooms = dataset.scene_points_list
    room_labels = getattr(dataset, "room_labels", None)
    if room_labels is None:
        room_labels = dataset.semantic_labels_list

    lp_rooms, lo_rooms, lc_rooms = [], [], []
    non_index = []
    for r, (pts, labels) in enumerate(zip(rooms, room_labels)):
        pts = np.asarray(pts)[:, :3]
        if downsample:
            # Feature columns must stay per-full-resolution-point (the
            # dataset gathers them with the same point indices as xyz), so
            # downsampling is a speed knob only: compute PCA features on the
            # voxel centroids, then scatter each voxel's features back to
            # every full-res point in it via the voxel inverse map.
            centroids, _, inverse = voxel_downsample(
                pts, np.asarray(labels), return_inverse=True)
            lp, lo, lc, non = geometric_features(centroids)
            if non:
                bad = np.isin(inverse, np.asarray(non))
                non = np.flatnonzero(bad).tolist()
            lp, lo, lc = lp[inverse], lo[inverse], lc[inverse]
        else:
            lp, lo, lc, non = geometric_features(pts)
        lp_rooms.append(lp)
        lo_rooms.append(lo)
        lc_rooms.append(lc)
        non_index.extend((r, i) for i in non)
    return lp_rooms, lo_rooms, lc_rooms, non_index


GEO_FEATURE_NAMES = ("Planarity", "Omnivariance", "Surface variation")


def attach_geofeatures(dataset, feature_list: Sequence[str],
                       downsample: bool = False) -> None:
    """Compute and append requested geometric features to a dataset in place
    (mirrors the CLI wiring at sem_seg_training.py:449-470, fixed to be
    per-room)."""
    wanted = [f for f in GEO_FEATURE_NAMES if f in feature_list]
    if not wanted:
        return
    lp, lo, lc, non_index = cal_geofeature(dataset, downsample)
    by_name = {"Planarity": lp, "Omnivariance": lo, "Surface variation": lc}
    for name in wanted:
        rooms_cols = by_name[name]
        for r, col in enumerate(rooms_cols):
            dataset.extra_features_data[r].append(col)
        dataset.feature_name.append(name)
        dataset.num_extra_features += 1
    dataset.non_index = sorted({r for r, _ in non_index})
    if dataset.non_index:
        dataset.filtered_update()
