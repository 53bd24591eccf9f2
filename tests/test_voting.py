"""Voting inference tests: vote pooling semantics, whole-scene coverage,
and the run_testing report, on synthetic tiles with a real (untrained) model."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tumseg import models
from tumseg.data.dataset import TestGridDataset
from tumseg.data.las import write_las
from tumseg.infer.voting import InferenceRunner, _scatter_votes, run_testing
from tumseg.viz.writers import read_labels_txt


@pytest.fixture
def scene(tmp_path):
    r = np.random.default_rng(0)
    n = 9000
    xyz = np.stack([r.uniform(0, 4, n), r.uniform(0, 2, n),
                    r.uniform(0, 6, n)], 1)
    labels = r.choice([1, 2, 3, 7], n)
    p = str(tmp_path / "scene.las")
    write_las(p, xyz, labels)
    return p


def test_scatter_votes_matches_loop_oracle():
    r = np.random.default_rng(1)
    n_scene, C, B, N = 50, 4, 3, 16
    idx = r.integers(0, n_scene, (B, N)).astype(np.int32)
    pred = r.integers(0, C, (B, N)).astype(np.int32)
    keep = r.random((B, N)) > 0.3

    pool = np.zeros((n_scene, C), dtype=np.float32)
    for b in range(B):
        for n in range(N):
            if keep[b, n]:
                pool[idx[b, n], pred[b, n]] += 1

    got = _scatter_votes(jnp.zeros((n_scene, C), jnp.float32),
                         jnp.asarray(idx), jnp.asarray(pred), jnp.asarray(keep))
    np.testing.assert_array_equal(np.asarray(got), pool)


@pytest.fixture
def runner_and_ds(scene):
    ds = TestGridDataset(las_file_list=[scene], num_classes=8,
                         block_points=512, class8=True, color=False, seed=0)
    model = models.get_module("pointnet_sem_seg")
    var = model.init(jax.random.PRNGKey(0), 8, 0)
    runner = InferenceRunner(model, var, num_classes=8, batch_size=4)
    return runner, ds


def test_predict_blocks_pads_and_trims(runner_and_ds):
    runner, ds = runner_and_ds
    data, _, _, _ = ds[0]
    preds = runner.predict_blocks(data)
    assert preds.shape == data.shape[:2]
    assert preds.min() >= 0 and preds.max() < 8


def test_infer_scene_covers_every_point(runner_and_ds):
    runner, ds = runner_and_ds
    labels = runner.infer_scene(ds, 0, num_votes=2)
    n_scene = ds.semantic_labels_list[0].shape[0]
    assert labels.shape == (n_scene,)
    assert labels.min() >= 0 and labels.max() < 8


def test_device_featurizer_matches_host_path(scene):
    """The on-device channel builder (index-only uploads) must produce the
    same predictions as the host-featurized path for the same RNG stream
    (host builds in f64, device in f32 — predictions must still agree)."""
    ds_a = TestGridDataset(las_file_list=[scene], num_classes=8,
                           block_points=512, class8=True, color=False, seed=3)
    ds_b = TestGridDataset(las_file_list=[scene], num_classes=8,
                           block_points=512, class8=True, color=False, seed=3)
    model = models.get_module("pointnet_sem_seg")
    var = model.init(jax.random.PRNGKey(0), 8, 0)
    host = InferenceRunner(model, var, num_classes=8, batch_size=4,
                           device_features=False)
    dev = InferenceRunner(model, var, num_classes=8, batch_size=4,
                          device_features=True)
    a = host.infer_scene(ds_a, 0, num_votes=1)
    b = dev.infer_scene(ds_b, 0, num_votes=1)
    assert (a == b).mean() > 0.999  # f64-vs-f32 channel ulps only


def test_device_featurizer_extra_features(tmp_path):
    """Device featurizer with RGB (color /255) + a raw extra column."""
    r = np.random.default_rng(4)
    n = 6000
    xyz = np.stack([r.uniform(0, 2, n), r.uniform(0, 1.5, n),
                    r.uniform(0, 2, n)], 1)
    p = str(tmp_path / "rgb.las")
    write_las(p, xyz, r.choice([1, 2, 3, 7], n),
              rgb=r.integers(0, 256, (n, 3)).astype(np.uint16),
              extra={"Planarity": r.random(n).astype(np.float32)})
    ds = TestGridDataset(las_file_list=[p], feature_list=["Planarity"],
                         num_classes=8, block_points=256, class8=True,
                         color=True, seed=0)
    ds2 = TestGridDataset(las_file_list=[p], feature_list=["Planarity"],
                          num_classes=8, block_points=256, class8=True,
                          color=True, seed=0)
    model = models.get_module("pointnet_sem_seg")
    var = model.init(jax.random.PRNGKey(0), 8, 4)
    host = InferenceRunner(model, var, num_classes=8, batch_size=4,
                           device_features=False)
    dev = InferenceRunner(model, var, num_classes=8, batch_size=4,
                          device_features=True)
    a = host.infer_scene(ds, 0, num_votes=1)
    b = dev.infer_scene(ds2, 0, num_votes=1)
    assert (a == b).mean() > 0.999


def test_infer_scene_deterministic_model_votes_agree(runner_and_ds):
    # with 1 vote vs 3 votes the argmax should mostly agree for a fixed model
    runner, ds = runner_and_ds
    a = runner.infer_scene(ds, 0, num_votes=1)
    b = runner.infer_scene(ds, 0, num_votes=3)
    assert (a == b).mean() > 0.5  # untrained model, stochastic blocks


def test_infer_scene_no_gt_gate(runner_and_ds):
    """gt_weight_gate=False must not read ground-truth weights at all and
    still cover every point (the no-GT-leak inference mode)."""
    runner, ds = runner_and_ds
    a = runner.infer_scene(ds, 0, num_votes=1, gt_weight_gate=False)
    assert a.shape == ds.semantic_labels_list[0].shape
    assert a.min() >= 0 and a.max() < 8


def test_run_testing_report(tmp_path, runner_and_ds):
    from tumseg.utils.labels import LABEL2COLOR_8, seg_label_to_cat

    runner, ds = runner_and_ds
    logs = []
    out = run_testing(ds, runner, num_votes=1, visual_dir=str(tmp_path),
                      visual=True, seg_label_to_cat=seg_label_to_cat(True),
                      label2color=LABEL2COLOR_8, log_string=logs.append)
    assert 0.0 <= out["miou"] <= 1.0
    assert len(out["per_scene_miou"]) == 1
    txt = read_labels_txt(str(tmp_path / "scene.txt"))
    assert txt.shape[0] == ds.semantic_labels_list[0].shape[0]
    pred_obj = (tmp_path / "scene_pred.obj").read_text().splitlines()
    assert pred_obj[0].startswith("v ") and len(pred_obj[0].split()) == 7
    assert (tmp_path / "scene_gt.obj").exists()
    assert any("EVALUATION WHOLE SCENE" in str(s) for s in logs)


def test_runner_on_mesh(scene):
    from tumseg.parallel import make_mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    ds = TestGridDataset(las_file_list=[scene], num_classes=8,
                         block_points=512, class8=True, color=False, seed=0)
    model = models.get_module("pointnet_sem_seg")
    var = model.init(jax.random.PRNGKey(0), 8, 0)
    mesh = make_mesh(8)
    runner = InferenceRunner(model, var, num_classes=8, batch_size=8, mesh=mesh)
    labels = runner.infer_scene(ds, 0, num_votes=1)
    assert labels.shape == ds.semantic_labels_list[0].shape
    # sharded result == single-device result (same RNG stream)
    ds2 = TestGridDataset(las_file_list=[scene], num_classes=8,
                          block_points=512, class8=True, color=False, seed=0)
    single = InferenceRunner(model, var, num_classes=8, batch_size=8)
    labels_1dev = single.infer_scene(ds2, 0, num_votes=1)
    assert (labels == labels_1dev).mean() > 0.999


def test_runner_on_mesh_device_features(scene):
    """The shard_map-wrapped featurized forward (blocks sharded, scene
    replicated) must match the host-featurized mesh path."""
    from tumseg.parallel import make_mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    model = models.get_module("pointnet_sem_seg")
    var = model.init(jax.random.PRNGKey(0), 8, 0)
    mesh = make_mesh(8)
    ds = TestGridDataset(las_file_list=[scene], num_classes=8,
                         block_points=512, class8=True, color=False, seed=1)
    ds2 = TestGridDataset(las_file_list=[scene], num_classes=8,
                          block_points=512, class8=True, color=False, seed=1)
    dev = InferenceRunner(model, var, num_classes=8, batch_size=8, mesh=mesh,
                          device_features=True)
    host = InferenceRunner(model, var, num_classes=8, batch_size=8, mesh=mesh,
                           device_features=False)
    a = dev.infer_scene(ds, 0, num_votes=1)
    b = host.infer_scene(ds2, 0, num_votes=1)
    assert (a == b).mean() > 0.999


def test_runner_mesh_batch_size_validation(scene):
    from tumseg.parallel import make_mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    model = models.get_module("pointnet_sem_seg")
    var = model.init(jax.random.PRNGKey(0), 8, 0)
    with pytest.raises(ValueError, match="multiple of the mesh"):
        InferenceRunner(model, var, num_classes=8, batch_size=6,
                        mesh=make_mesh(8))


# ---- device-side re-blocking (per-vote upload -> one PRNG fold-in) ----

def _tiny_scene(n=2500, seed=0):
    r = np.random.default_rng(seed)
    xyz = np.stack([r.uniform(0, 3, n), r.uniform(0, 2, n),
                    r.uniform(0, 5, n)], 1)
    labels = r.integers(0, 8, n)
    ds = TestGridDataset(num_classes=8, block_points=256, seed=0)
    ds.scene_points_list = [xyz]
    ds.semantic_labels_list = [labels]
    ds.file_list = ["scene.las"]
    ds.labelweights = np.ones(8, dtype=np.float32)
    return ds


def test_device_reblock_cell_membership_and_coverage():
    from tumseg.infer.voting import _build_reblock_arrays, _reblock_on_device

    ds = _tiny_scene()
    cells = ds.grid_structure(0)
    fb, st, ct, sz, _, segments, order = _build_reblock_arrays(cells, 256)
    # the grouped layout is a permutation of the cells, grouped by block
    # count (ascending), every cell present exactly once
    assert sorted(order.tolist()) == list(range(len(cells)))
    assert sum(n for _, n in segments) == len(cells)
    assert [k for k, _ in segments] == sorted({k for k, _ in segments})
    L = fb.shape[0]
    jsz = jnp.asarray(sz)
    starts_pos = jnp.repeat(jnp.asarray(st), jsz, total_repeat_length=L)
    counts_pos = jnp.repeat(jnp.asarray(ct), jsz, total_repeat_length=L)
    cell_rank = jnp.repeat(jnp.arange(len(sz), dtype=jnp.int32), jsz,
                           total_repeat_length=L)
    flat = np.asarray(_reblock_on_device(
        jax.random.PRNGKey(3), jnp.asarray(fb), starts_pos, counts_pos,
        cell_rank, 256, segments)).reshape(-1)
    # the global-sort fallback (segments=None) must produce the same
    # per-cell membership (identical fills: same key stream)
    flat_global = np.asarray(_reblock_on_device(
        jax.random.PRNGKey(3), jnp.asarray(fb), starts_pos, counts_pos,
        cell_rank, 256)).reshape(-1)

    pos = 0
    for (cand, _, _), s in zip([cells[i] for i in order], sz):
        region = set(flat[pos:pos + s].tolist())
        assert region == set(flat_global[pos:pos + s].tolist())
        pos += s
        cs = set(cand.tolist())
        assert region <= cs      # fills only draw in-cell candidates
        assert cs <= region      # every original candidate still votes
    # deterministic given the key
    flat2 = np.asarray(_reblock_on_device(
        jax.random.PRNGKey(3), jnp.asarray(fb), starts_pos, counts_pos,
        cell_rank, 256, segments)).reshape(-1)
    np.testing.assert_array_equal(flat, flat2)


def test_device_reblock_runner_end_to_end():
    from tumseg import models
    from tumseg.infer.voting import InferenceRunner

    ds = _tiny_scene()
    model = models.get_module("pointnet_sem_seg")
    variables = model.init(jax.random.PRNGKey(0), 8, 0)
    runner = InferenceRunner(model, variables, num_classes=8, batch_size=4,
                             device_features=True, device_reblock=True)
    assert runner.device_reblock
    pred = runner.infer_scene(ds, 0, num_votes=2)
    assert pred.shape == (len(ds.semantic_labels_list[0]),)
    assert ((pred >= 0) & (pred < 8)).all()
    # gate off must also work (and the pool sees every point >= once)
    pred2 = runner.infer_scene(ds, 0, num_votes=1, gt_weight_gate=False)
    assert pred2.shape == pred.shape


def test_device_reblock_on_mesh_matches_single_device():
    """The shard_map'd vote scan (block axis sharded, psum'd pool
    increments) must produce the same labels as the single-device scan:
    same PRNG fold-in -> same blocks, and the vote scatter is additive so
    the device partitioning cannot change the pool."""
    from tumseg import models
    from tumseg.infer.voting import InferenceRunner
    from tumseg.parallel import make_mesh

    ds = _tiny_scene()
    model = models.get_module("pointnet_sem_seg")
    variables = model.init(jax.random.PRNGKey(0), 8, 0)
    single = InferenceRunner(model, variables, num_classes=8, batch_size=8,
                             device_features=True, device_reblock=True)
    sharded = InferenceRunner(model, variables, num_classes=8, batch_size=8,
                              mesh=make_mesh(8), device_features=True,
                              device_reblock=True)
    assert sharded.device_reblock and sharded.mesh is not None
    a = single.infer_scene(ds, 0, num_votes=2)
    b = sharded.infer_scene(ds, 0, num_votes=2)
    np.testing.assert_array_equal(a, b)


def test_runner_cache_invalidates_on_scene_replacement():
    """The runner's per-scene device caches key on (id(dataset), scene) but
    validate by source-array identity: replacing a scene's points (or a
    recycled dataset id after GC) must rebuild the tensors, not serve the
    previous scene's."""
    from tumseg import models
    from tumseg.infer.voting import InferenceRunner

    ds = _tiny_scene()
    model = models.get_module("pointnet_sem_seg")
    variables = model.init(jax.random.PRNGKey(0), 8, 0)
    runner = InferenceRunner(model, variables, num_classes=8, batch_size=4,
                             device_features=True, device_reblock=True)
    xyz_a, *_ = runner._scene_tensors(ds, 0)
    # replace the scene with a different one in the SAME dataset (same
    # bucket-padded device shape, different content)
    ds2 = _tiny_scene(n=1800, seed=1)
    ds.scene_points_list[0] = ds2.scene_points_list[0]
    ds.semantic_labels_list[0] = ds2.semantic_labels_list[0]
    xyz_b, *_ = runner._scene_tensors(ds, 0)
    assert not np.array_equal(np.asarray(xyz_b[:100]),
                              np.asarray(xyz_a[:100]))
    np.testing.assert_allclose(np.asarray(xyz_b[:1800]),
                               ds2.scene_points_list[0][:, :3], rtol=1e-6)
    pred = runner.infer_scene(ds, 0, num_votes=1)
    assert pred.shape == (1800,)


def test_device_reblock_gt_gate_with_zero_and_inf_weights():
    """The gate moved from per-chunk vote masking to one post-hoc mask of
    the finished pool; with weights that actually gate (0 and inf entries)
    the result must equal masking the ungated prediction: gated points'
    pools zero out, so their argmax is 0 (reference localfunctions.py:344
    semantics — such rows never receive countable votes)."""
    from tumseg import models
    from tumseg.infer.voting import InferenceRunner

    ds = _tiny_scene()
    ds.labelweights = np.array([1, 0, 1, np.inf, 1, 1, 1, 1], np.float32)
    model = models.get_module("pointnet_sem_seg")
    variables = model.init(jax.random.PRNGKey(0), 8, 0)
    runner = InferenceRunner(model, variables, num_classes=8, batch_size=4,
                             device_features=True, device_reblock=True)
    gated = runner.infer_scene(ds, 0, num_votes=2, gt_weight_gate=True)
    ungated = runner.infer_scene(ds, 0, num_votes=2, gt_weight_gate=False)
    labels = ds.semantic_labels_list[0]
    smpw = ds.labelweights[labels]
    keep = (smpw != 0) & ~np.isinf(smpw)
    np.testing.assert_array_equal(gated, np.where(keep, ungated, 0))
    assert (~keep).any() and keep.any()  # the gate actually fired


def test_scene_bucketing_shares_compiled_shapes():
    """Scenes with different point/block counts must land on identical
    device shapes (scene bucket + 4*bs block granule), so ONE compiled
    vote scan serves them all — a fresh compile per facade costs minutes
    through this image's tunnel. Predictions stay per-scene sized."""
    from tumseg import models
    from tumseg.infer.voting import InferenceRunner

    model = models.get_module("pointnet_sem_seg")
    variables = model.init(jax.random.PRNGKey(0), 8, 0)
    runner = InferenceRunner(model, variables, num_classes=8, batch_size=4,
                             device_features=True, device_reblock=True)
    ds_a, ds_b = _tiny_scene(n=2500, seed=0), _tiny_scene(n=2600, seed=5)
    xyz_a, extra_a, *_ = runner._scene_tensors(ds_a, 0)
    shp_a = (xyz_a.shape, extra_a.shape)
    ga = runner._grid_tensors(ds_a, 0)
    xyz_b, extra_b, *_ = runner._scene_tensors(ds_b, 0)
    gb = runner._grid_tensors(ds_b, 0)
    assert (xyz_b.shape, extra_b.shape) == shp_a
    assert ga[4].shape == gb[4].shape          # offsets_pad: same nb_pad
    assert ga[6] == gb[6]                      # nb_pad bucket equal
    pa = runner.infer_scene(ds_a, 0, num_votes=1)
    pb = runner.infer_scene(ds_b, 0, num_votes=1)
    assert pa.shape == (2500,) and pb.shape == (2600,)


def test_grid_structure_cache_identity_and_invalidation():
    ds = _tiny_scene()
    c1 = ds.grid_structure(0)
    assert ds.grid_structure(0) is c1  # cached
    # same seed, fresh dataset -> identical stochastic blocking
    ds_b = _tiny_scene()
    ia, oa = ds.grid_indices(0)
    ib, ob = ds_b.grid_indices(0)
    np.testing.assert_array_equal(ia, ib)
    np.testing.assert_array_equal(oa, ob)
    # replacing the scene array invalidates the cache
    ds.scene_points_list[0] = ds.scene_points_list[0].copy()
    assert ds.grid_structure(0) is not c1


def test_runner_cache_concurrent_single_build():
    """_cached under concurrency: many threads missing the same scene must
    produce ONE build (losers wait on the owner's event), bounded eviction
    must never drop an in-progress entry, and a failed build must surface
    in every thread rather than a None deref."""
    import threading

    from tumseg import models
    from tumseg.infer.voting import InferenceRunner

    ds = _tiny_scene()
    model = models.get_module("pointnet_sem_seg")
    variables = model.init(jax.random.PRNGKey(0), 8, 0)
    runner = InferenceRunner(model, variables, num_classes=8, batch_size=4)

    builds = []
    gate = threading.Event()

    def build():
        builds.append(1)
        gate.wait(5.0)  # hold the build so every thread piles up on it
        return "value"

    results, errors = [], []

    def worker():
        try:
            results.append(
                runner._cached(runner._scene_cache, ds, 0, build))
        except Exception as e:  # pragma: no cover - failure diagnostics
            errors.append(e)

    threads = [threading.Thread(target=worker) for _ in range(6)]
    for t in threads:
        t.start()
    gate.set()
    for t in threads:
        t.join(10.0)
    assert not errors
    assert results == ["value"] * 6
    assert len(builds) == 1  # one build despite 6 concurrent misses

    # a failing build must raise in the waiter too, then allow a rebuild
    runner._scene_cache.clear()

    def bad_build():
        raise RuntimeError("boom")

    with pytest.raises(RuntimeError):
        runner._cached(runner._scene_cache, ds, 0, bad_build)
    # the poisoned entry must not satisfy later lookups
    assert runner._cached(runner._scene_cache, ds, 0, lambda: 7) == 7


def test_vote_scatter_modes_identical():
    """DESIGN.md 2b: the three vote-accumulation lowerings (in-scan
    scatter, post-scan sort+unique-scatter, post-scan bulk scatter) are the
    same math — labels AND pools must be identical (same PRNG fold-ins ->
    same blocks -> same predictions; accumulation is exact f32 counting)."""
    from tumseg import models
    from tumseg.infer.voting import InferenceRunner

    ds = _tiny_scene()
    model = models.get_module("pointnet_sem_seg")
    variables = model.init(jax.random.PRNGKey(0), 8, 0)
    labels = {}
    for mode in ("scan", "sort", "bulk"):
        r = InferenceRunner(model, variables, num_classes=8, batch_size=4,
                            device_features=True, device_reblock=True)
        r.vote_scatter = mode
        labels[mode] = r.infer_scene(ds, 0, num_votes=2)
    np.testing.assert_array_equal(labels["scan"], labels["sort"])
    np.testing.assert_array_equal(labels["scan"], labels["bulk"])


def test_vote_scatter_modes_on_mesh():
    """The sort/bulk restructures keep the mesh path's psum merge: each
    device aggregates its local blocks' keys, pools psum-merge — labels
    must match the single-device scan path."""
    from tumseg import models
    from tumseg.infer.voting import InferenceRunner
    from tumseg.parallel import make_mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    ds = _tiny_scene()
    model = models.get_module("pointnet_sem_seg")
    variables = model.init(jax.random.PRNGKey(0), 8, 0)
    base = InferenceRunner(model, variables, num_classes=8, batch_size=8,
                           device_features=True, device_reblock=True)
    want = base.infer_scene(ds, 0, num_votes=2)
    for mode in ("sort", "bulk"):
        r = InferenceRunner(model, variables, num_classes=8, batch_size=8,
                            mesh=make_mesh(8), device_features=True,
                            device_reblock=True)
        r.vote_scatter = mode
        np.testing.assert_array_equal(want, r.infer_scene(ds, 0,
                                                          num_votes=2))


def test_sorted_histogram_matches_bincount():
    from tumseg.infer.voting import _sorted_histogram

    r = np.random.default_rng(0)
    keys = r.integers(0, 50, 4096).astype(np.int32)
    got = np.asarray(_sorted_histogram(jnp.asarray(keys), 50))
    np.testing.assert_array_equal(got, np.bincount(keys, minlength=50))
    # all-identical keys (single run) and a single element
    got = np.asarray(_sorted_histogram(jnp.full((64,), 7, jnp.int32), 50))
    np.testing.assert_array_equal(got, np.where(np.arange(50) == 7, 64, 0))
    got = np.asarray(_sorted_histogram(jnp.asarray([3], jnp.int32), 5))
    np.testing.assert_array_equal(got, [0, 0, 0, 1, 0])
