"""Model-level tests: shapes, losses, BN stat flow, determinism, grads."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tumseg import models
from tumseg.nn import layers as L


@pytest.fixture(params=["pointnet2_sem_seg", "pointnet2_sem_seg_msg",
                        "pointnet_sem_seg"])
def model(request):
    return models.get_module(request.param)


def _input(rng, B=2, N=256, C=6):
    return jnp.array(rng.random((B, N, C)).astype(np.float32))


def test_forward_shapes(model, rng):
    var = model.init(jax.random.PRNGKey(0), num_classes=8, num_extra_features=0)
    x = _input(rng)
    logp, aux, new_stats = model.apply(var, x, training=False)
    assert logp.shape == (2, 256, 8)
    # log_softmax rows sum to 1 in prob space
    np.testing.assert_allclose(np.exp(np.asarray(logp)).sum(-1), 1.0, atol=1e-5)
    assert jax.tree_util.tree_structure(new_stats) == jax.tree_util.tree_structure(
        var["batch_stats"])


def test_extra_features_channel_contract(model, rng):
    var = model.init(jax.random.PRNGKey(0), num_classes=8, num_extra_features=3)
    x = _input(rng, C=9)
    logp, _, _ = model.apply(var, x, training=False)
    assert logp.shape == (2, 256, 8)


def test_loss_finite_and_weighted(model, rng):
    var = model.init(jax.random.PRNGKey(0), num_classes=8, num_extra_features=0)
    x = _input(rng)
    target = jnp.array(rng.integers(0, 8, (2, 256)))
    weight = jnp.array(np.linspace(0.5, 2.0, 8).astype(np.float32))
    logp, aux, _ = model.apply(var, x, training=False)
    lv = model.loss(logp, target, aux, weight)
    assert np.isfinite(float(lv))
    # uniform weights reduce to plain mean NLL
    lu = model.loss(logp, target, aux, jnp.ones(8))
    picked = np.take_along_axis(np.asarray(logp).reshape(-1, 8),
                                np.asarray(target).reshape(-1, 1), 1)
    if model.__name__.endswith("pointnet2_sem_seg"):
        np.testing.assert_allclose(float(lu), -picked.mean(), rtol=1e-5)


def test_bn_stats_update_only_in_training(model, rng):
    var = model.init(jax.random.PRNGKey(0), num_classes=8, num_extra_features=0)
    x = _input(rng)
    _, _, s_eval = model.apply(var, x, training=False)
    leaves0 = jax.tree_util.tree_leaves(var["batch_stats"])
    leaves_eval = jax.tree_util.tree_leaves(s_eval)
    for a, b in zip(leaves0, leaves_eval):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    _, _, s_train = model.apply(var, x, training=True, bn_momentum=0.1,
                                rngs={"dropout": jax.random.PRNGKey(1)})
    changed = any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(leaves0, jax.tree_util.tree_leaves(s_train)))
    assert changed


def test_train_step_grad(model, rng):
    var = model.init(jax.random.PRNGKey(0), num_classes=8, num_extra_features=0)
    x = _input(rng)
    target = jnp.array(rng.integers(0, 8, (2, 256)))
    weight = jnp.ones(8)

    def loss_fn(params):
        logp, aux, _ = model.apply(
            {"params": params, "batch_stats": var["batch_stats"]}, x,
            training=True, rngs={"dropout": jax.random.PRNGKey(2),
                                 "fps": jax.random.PRNGKey(3)})
        return model.loss(logp, target, aux, weight)

    g = jax.grad(loss_fn)(var["params"])
    norms = [float(jnp.sum(jnp.abs(leaf))) for leaf in jax.tree_util.tree_leaves(g)]
    assert all(np.isfinite(norms))
    assert sum(n > 0 for n in norms) > len(norms) * 0.5  # most params get signal


def test_eval_deterministic(model, rng):
    var = model.init(jax.random.PRNGKey(0), num_classes=8, num_extra_features=0)
    x = _input(rng)
    a, _, _ = model.apply(var, x, training=False)
    b, _, _ = model.apply(var, x, training=False)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_batch_norm_torch_semantics():
    # biased var for normalization, unbiased for running stats
    x = jnp.array(np.random.default_rng(0).random((4, 16, 8)).astype(np.float32))
    p, s = L.batchnorm_init(8)
    y, new_s = L.batch_norm(p, s, x, training=True, momentum=0.1)
    flat = np.asarray(x).reshape(-1, 8)
    np.testing.assert_allclose(np.asarray(y),
                               ((flat - flat.mean(0)) / np.sqrt(flat.var(0) + 1e-5)
                                ).reshape(4, 16, 8), atol=1e-4)
    np.testing.assert_allclose(np.asarray(new_s["mean"]), 0.1 * flat.mean(0),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(new_s["var"]),
                               0.9 * 1.0 + 0.1 * flat.var(0, ddof=1), atol=1e-5)


def test_weighted_nll_matches_torch_formula():
    r = np.random.default_rng(1)
    logits = r.random((32, 5)).astype(np.float32)
    logp = np.log(np.exp(logits) / np.exp(logits).sum(1, keepdims=True))
    tgt = r.integers(0, 5, 32)
    w = r.random(5).astype(np.float32) + 0.5
    got = float(L.weighted_nll_loss(jnp.array(logp), jnp.array(tgt), jnp.array(w)))
    want = -(w[tgt] * logp[np.arange(32), tgt]).sum() / w[tgt].sum()
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_feature_transform_regularizer_zero_for_orthogonal():
    eye = jnp.broadcast_to(jnp.eye(64), (3, 64, 64))
    assert float(L.feature_transform_regularizer(eye)) < 1e-5


def test_msg_set_abstraction_layer(rng):
    """Multi-scale grouping SA (reference pointnet2_utils.py:205-262):
    per-radius MLPs concatenated over scales."""
    import jax.numpy as jnp

    key = jax.random.PRNGKey(0)
    params, stats = L.set_abstraction_msg_init(
        key, npoint=32, radius_list=[0.1, 0.2], nsample_list=[8, 16],
        in_channel=5, mlp_list=[[16, 16], [16, 32]])
    cfg = dict(npoint=32, radius_list=[0.1, 0.2], nsample_list=[8, 16])
    xyz = jnp.array(rng.random((2, 128, 3)).astype(np.float32))
    feats = jnp.array(rng.random((2, 128, 5)).astype(np.float32))
    new_xyz, new_points, new_stats = L.set_abstraction_msg(
        params, stats, cfg, xyz, feats, training=True, momentum=0.1)
    assert new_xyz.shape == (2, 32, 3)
    assert new_points.shape == (2, 32, 16 + 32)  # concat over scales
    assert len(new_stats) == 2


def test_pointnet_encoder_global_feat(rng):
    """global_feat=True returns the 1024-dim pooled vector
    (reference pointnet_utils.py:129-130)."""
    import jax.numpy as jnp

    params, stats = L.pointnet_encoder_init(jax.random.PRNGKey(0), 6,
                                            feature_transform=True)
    x = jnp.array(rng.random((2, 64, 6)).astype(np.float32))
    feat, trans, trans_feat, _ = L.pointnet_encoder(
        params, stats, x, global_feat=True, feature_transform=True,
        training=False, momentum=0.1)
    assert feat.shape == (2, 1024)
    assert trans.shape == (2, 3, 3)
    assert trans_feat.shape == (2, 64, 64)


def test_registry():
    # geo_trial has the live signature/channels upstream -> pure alias
    assert models.get_module("pointnet2_sem_seg_geo_trial").__name__.endswith(
        ".pointnet2_sem_seg")
    with pytest.raises(ValueError):
        models.get_module("nope")


@pytest.mark.parametrize("name,fixed_extra", [
    ("pointnet2_sem_seg_original", 3),   # in_channel 9+3 upstream
    ("pointnet2_sem_seg_trial", 0),      # in_channel 6+3 upstream
    ("pointnet_sem_seg_original", 3),    # encoder channel=9 upstream
])
def test_frozen_variants_pin_channel_contract(name, fixed_extra):
    """The frozen historical variants fix their input channel count upstream
    (models/extra/*.py); selecting them must build exactly that net and
    reject mismatched feature counts instead of silently adapting."""
    mod = models.get_module(name)
    key = jax.random.PRNGKey(0)
    var = mod.init(key, 8, fixed_extra)
    x = jnp.zeros((1, 64, 6 + fixed_extra), jnp.float32)
    logp, aux, _ = mod.apply(var, x, training=False)
    assert logp.shape == (1, 64, 8)
    with pytest.raises(ValueError, match="frozen variant"):
        mod.init(key, 8, fixed_extra + 1)
    # the pinned net IS the live architecture at that feature count
    live = models.get_module(name.replace("_original", "").replace("_trial", ""))
    live_var = live.init(key, 8, fixed_extra)
    assert jax.tree_util.tree_structure(var) == \
        jax.tree_util.tree_structure(live_var)
