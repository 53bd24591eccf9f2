"""Functional NN layers with explicit parameter pytrees.

Design notes (TPU-first):
- channels-last everywhere: pointwise "1x1 conv" stacks are batched matmuls
  ``einsum('...c,cd->...d')`` that XLA tiles straight onto the MXU, and the
  elementwise BN/ReLU epilogues fuse into them.
- BatchNorm is functional: ``batch_stats`` live in a separate pytree and the
  momentum is a *traced scalar*, so the reference's per-epoch BN-momentum
  decay schedule (/root/reference/localfunctions.py:179-195) never triggers
  a recompile.
- torch semantic parity: BN normalizes with the biased batch variance but
  accumulates the *unbiased* variance into the running stats, eps=1e-5,
  ``running = (1 - m) * running + m * batch`` — matching torch.nn.BatchNorm.
- Parameter trees mirror the reference's module names (sa1, mlp_convs.0, …)
  so torch checkpoints port mechanically (see tools/port_torch_checkpoint.py).

Reference layer semantics: /root/reference/models/pointnet2_utils.py:161-315
(SA/FP) and /root/reference/models/pointnet_utils.py:10-133 (STN/encoder).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from tumseg import ops

Pytree = Dict


# --------------------------------------------------------------------------
# primitives
# --------------------------------------------------------------------------

def dense_init(key, in_dim: int, out_dim: int) -> Pytree:
    """Xavier-normal weight + zero bias, the reference's weights_init
    (/root/reference/sem_seg_training.py:553-560) — applied upstream to
    Conv2d and Linear layers only."""
    std = jnp.sqrt(2.0 / (in_dim + out_dim))
    w = std * jax.random.normal(key, (in_dim, out_dim), dtype=jnp.float32)
    return {"w": w, "b": jnp.zeros((out_dim,), dtype=jnp.float32)}


def dense_init_torch_default(key, in_dim: int, out_dim: int) -> Pytree:
    """torch's default Conv1d/Linear init: kaiming_uniform(a=sqrt(5)) =
    U(+-1/sqrt(fan_in)) for the weight AND the bias. The reference's
    weights_init only re-inits Conv2d/Linear, so its Conv1d layers (all FP
    stages, the segmentation heads, the PointNet encoder convs) train from
    THIS distribution — replicating it matters for trained-model mIoU
    parity (tools/miou_parity.py)."""
    bound = 1.0 / jnp.sqrt(jnp.float32(in_dim))
    kw, kb = jax.random.split(key)
    w = jax.random.uniform(kw, (in_dim, out_dim), dtype=jnp.float32,
                           minval=-bound, maxval=bound)
    b = jax.random.uniform(kb, (out_dim,), dtype=jnp.float32,
                           minval=-bound, maxval=bound)
    return {"w": w, "b": b}


def dense(params: Pytree, x: jnp.ndarray,
          compute_dtype=None) -> jnp.ndarray:
    """Pointwise linear over the last axis (the 1x1 conv / Linear of the
    reference). fp32 accumulation regardless of compute dtype."""
    w, b = params["w"], params["b"]
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        w = w.astype(compute_dtype)
    y = jnp.einsum("...c,cd->...d", x, w, preferred_element_type=jnp.float32)
    return y + b.astype(y.dtype)


def batchnorm_init(dim: int) -> Tuple[Pytree, Pytree]:
    params = {"scale": jnp.ones((dim,), jnp.float32),
              "bias": jnp.zeros((dim,), jnp.float32)}
    stats = {"mean": jnp.zeros((dim,), jnp.float32),
             "var": jnp.ones((dim,), jnp.float32)}
    return params, stats


def batch_norm(params: Pytree, stats: Pytree, x: jnp.ndarray, *,
               training: bool, momentum,
               axis_name: Optional[str] = None) -> Tuple[jnp.ndarray, Pytree]:
    """Per-channel (last axis) batch norm with torch-compatible running-stat
    updates. Returns (y, new_stats); stats pass through unchanged in eval.

    ``axis_name``: when running under shard_map with the batch sharded over
    a mesh axis, pass its name — batch statistics are then pmean'd across
    devices so sharded training matches single-device semantics exactly.
    """
    eps = 1e-5
    x32 = x.astype(jnp.float32)
    reduce_axes = tuple(range(x.ndim - 1))
    if training:
        mean = jnp.mean(x32, axis=reduce_axes)
        sqmean = jnp.mean(jnp.square(x32), axis=reduce_axes)
        n = 1
        for a in reduce_axes:
            n *= x.shape[a]
        if axis_name is not None:
            mean = jax.lax.pmean(mean, axis_name)
            sqmean = jax.lax.pmean(sqmean, axis_name)
            n = n * jax.lax.axis_size(axis_name)  # static mesh size
        var = sqmean - jnp.square(mean)
        unbiased = var * (n / max(n - 1, 1))
        new_stats = {
            "mean": (1.0 - momentum) * stats["mean"] + momentum * mean,
            "var": (1.0 - momentum) * stats["var"] + momentum * unbiased,
        }
    else:
        mean, var = stats["mean"], stats["var"]
        new_stats = stats
    inv = jax.lax.rsqrt(var + eps) * params["scale"]
    y = (x32 - mean) * inv + params["bias"]
    return y.astype(x.dtype), new_stats


def dropout(key, x: jnp.ndarray, rate: float, training: bool) -> jnp.ndarray:
    if not training or rate == 0.0:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(key, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0).astype(x.dtype)


# --------------------------------------------------------------------------
# shared MLP stack: [dense -> BN -> ReLU] * L over the last axis
# --------------------------------------------------------------------------

def mlp_stack_init(key, in_dim: int, dims: Sequence[int],
                   torch_default: bool = False) -> Tuple[List, List]:
    """torch_default=True mirrors layers the reference builds as Conv1d
    (untouched by its weights_init); False mirrors its xavier'd Conv2d."""
    init = dense_init_torch_default if torch_default else dense_init
    params, stats = [], []
    last = in_dim
    for i, out in enumerate(dims):
        k = jax.random.fold_in(key, i)
        bn_p, bn_s = batchnorm_init(out)
        params.append({"conv": init(k, last, out), "bn": bn_p})
        stats.append(bn_s)
        last = out
    return params, stats


def mlp_stack(params: List, stats: List, x: jnp.ndarray, *, training: bool,
              momentum, compute_dtype=None,
              axis_name=None) -> Tuple[jnp.ndarray, List]:
    new_stats = []
    for i, (layer_p, layer_s) in enumerate(zip(params, stats)):
        x = dense(layer_p["conv"], x, compute_dtype=compute_dtype)
        x, s = batch_norm(layer_p["bn"], layer_s, x,
                          training=training, momentum=momentum,
                          axis_name=axis_name)
        new_stats.append(s)
        x = jax.nn.relu(x)
        if compute_dtype is not None and i + 1 < len(params):
            # store inter-layer activations in the compute dtype: the next
            # dense would cast anyway, so values are identical, but the
            # HBM-resident tensor (the real cost of the [B,S,K,C] stages)
            # halves
            x = x.astype(compute_dtype)
    return x, new_stats


# --------------------------------------------------------------------------
# PointNet++ set abstraction (SSG + MSG) and feature propagation
# --------------------------------------------------------------------------

def set_abstraction_init(key, in_channel: int, mlp: Sequence[int]):
    return mlp_stack_init(key, in_channel, mlp)


def set_abstraction(params, stats, cfg: dict, xyz: jnp.ndarray,
                    points: Optional[jnp.ndarray], *, training: bool,
                    momentum, fps_start=None, compute_dtype=None,
                    axis_name=None, fast_gather=None):
    """SSG set abstraction (reference pointnet2_utils.py:161-202), but in
    channels-last: xyz [B, N, 3], points [B, N, D] ->
    (new_xyz [B, S, 3], new_points [B, S, mlp[-1]], new_stats).

    The grouped tensor is [B, S, K, C]; the shared MLP contracts C on the MXU
    and the K-max reduction happens on the VPU without leaving fp32.
    """
    if cfg.get("group_all"):
        new_xyz, grouped = ops.sample_and_group_all(xyz, points)
    else:
        if fast_gather is None:
            fast_gather = compute_dtype is not None
        new_xyz, grouped = ops.sample_and_group(
            cfg["npoint"], cfg["radius"], cfg["nsample"], xyz, points,
            fps_start=fps_start, fast_gather=fast_gather)
    feat, new_stats = mlp_stack(params, stats, grouped, training=training,
                                momentum=momentum, compute_dtype=compute_dtype,
                                axis_name=axis_name)
    new_points = jnp.max(feat, axis=2)                      # max over K
    return new_xyz, new_points, new_stats


def set_abstraction_msg_init(key, npoint: int, radius_list, nsample_list,
                             in_channel: int, mlp_list):
    """Multi-scale grouping SA (reference pointnet2_utils.py:205-262)."""
    params, stats = [], []
    for i, mlp in enumerate(mlp_list):
        p, s = mlp_stack_init(jax.random.fold_in(key, i), in_channel + 3, mlp)
        params.append(p)
        stats.append(s)
    return params, stats


def set_abstraction_msg(params, stats, cfg: dict, xyz: jnp.ndarray,
                        points: Optional[jnp.ndarray], *, training: bool,
                        momentum, fps_start=None, compute_dtype=None,
                        axis_name=None, fast_gather=None):
    """MSG: one FPS, then per-radius ball-query + MLP + K-max, concatenated
    over scales on the channel axis (reference pointnet2_utils.py:205-262).

    TPU path: each radius's neighborhood gather runs through the same fused
    one-hot-contraction grouping kernel as SSG (ops.group_neighborhoods
    takes arbitrary K), so no XLA dynamic gather appears anywhere in the MSG
    forward. Channel order matches the reference's MSG concat —
    [points, centered xyz] — so torch MSG weights port unchanged.
    """
    if fast_gather is None:
        fast_gather = compute_dtype is not None
    S = cfg["npoint"]
    fps_idx = ops.farthest_point_sample(xyz, S, start=fps_start)
    new_xyz = ops.gather_rows(xyz, fps_idx)
    src = jnp.concatenate([xyz, points], axis=-1) if points is not None else xyz
    outs, new_stats = [], []
    groups = ops.msg_ball_groups(cfg["radius_list"], cfg["nsample_list"],
                                 xyz, new_xyz, src, fast_gather=fast_gather)
    for i, grouped in enumerate(groups):
        if points is not None:
            # kernel emits [centered xyz, points]; MSG's reference order is
            # [points, centered xyz]
            grouped = jnp.concatenate([grouped[..., 3:], grouped[..., :3]],
                                      axis=-1)
        feat, s = mlp_stack(params[i], stats[i], grouped, training=training,
                            momentum=momentum, compute_dtype=compute_dtype,
                            axis_name=axis_name)
        outs.append(jnp.max(feat, axis=2))
        new_stats.append(s)
    return new_xyz, jnp.concatenate(outs, axis=-1), new_stats


def feature_propagation_init(key, in_channel: int, mlp: Sequence[int]):
    # FP MLPs are Conv1d in the reference (pointnet2_utils.py:271-275):
    # its weights_init never touches them, so they keep torch defaults
    return mlp_stack_init(key, in_channel, mlp, torch_default=True)


def feature_propagation(params, stats, xyz1, xyz2, points1, points2, *,
                        training: bool, momentum, compute_dtype=None,
                        axis_name=None, fast_gather=None):
    """3-NN inverse-distance interpolation + skip concat + pointwise MLP
    (reference pointnet2_utils.py:265-315), channels-last:
    xyz1 [B, N, 3], xyz2 [B, S, 3], points1 [B, N, D1]|None, points2 [B, S, D2].
    """
    S = xyz2.shape[1]
    if S == 1:
        interpolated = jnp.broadcast_to(
            points2, (points2.shape[0], xyz1.shape[1], points2.shape[2]))
    else:
        if fast_gather is None:
            fast_gather = compute_dtype is not None
        interpolated = ops.three_interpolate(
            xyz1, xyz2, points2, fast_gather=fast_gather)
    if points1 is not None:
        new_points = jnp.concatenate([points1, interpolated], axis=-1)
    else:
        new_points = interpolated
    return mlp_stack(params, stats, new_points, training=training,
                     momentum=momentum, compute_dtype=compute_dtype,
                     axis_name=axis_name)


# --------------------------------------------------------------------------
# PointNet encoder blocks (STN3d / STNkd / encoder)
# --------------------------------------------------------------------------

def _stn_init(key, channel: int, k: int):
    keys = jax.random.split(key, 6)
    # reference STN: convs are Conv1d (torch-default init), fcs are Linear
    # (xavier'd by weights_init) — pointnet_utils.py:12-22
    params = {
        "conv1": dense_init_torch_default(keys[0], channel, 64),
        "conv2": dense_init_torch_default(keys[1], 64, 128),
        "conv3": dense_init_torch_default(keys[2], 128, 1024),
        "fc1": dense_init(keys[3], 1024, 512),
        "fc2": dense_init(keys[4], 512, 256),
        "fc3": dense_init(keys[5], 256, k * k),
    }
    stats = {}
    for i, dim in enumerate([64, 128, 1024, 512, 256], start=1):
        p, s = batchnorm_init(dim)
        params[f"bn{i}"] = p
        stats[f"bn{i}"] = s
    return params, stats


def stn_init(key, channel: int) -> Tuple[Pytree, Pytree]:
    """STN3d (reference pointnet_utils.py:10-45): input transform net."""
    return _stn_init(key, channel, 3)


def stnkd_init(key, k: int = 64) -> Tuple[Pytree, Pytree]:
    """STNkd (reference pointnet_utils.py:48-85): feature transform net."""
    return _stn_init(key, k, k)


def stn_apply(params, stats, x: jnp.ndarray, k: int, *, training: bool,
              momentum, compute_dtype=None, axis_name=None):
    """x [B, N, C] -> transform [B, k, k]; returns (transform, new_stats)."""
    new_stats = {}

    def block(name_conv, name_bn, h):
        h = dense(params[name_conv], h, compute_dtype=compute_dtype)
        h, new_stats[name_bn] = batch_norm(
            params[name_bn], stats[name_bn], h, training=training,
            momentum=momentum, axis_name=axis_name)
        return jax.nn.relu(h)

    h = block("conv1", "bn1", x)
    h = block("conv2", "bn2", h)
    h = block("conv3", "bn3", h)
    h = jnp.max(h, axis=1)                                  # global max-pool
    h = block("fc1", "bn4", h)
    h = block("fc2", "bn5", h)
    h = dense(params["fc3"], h, compute_dtype=compute_dtype)
    iden = jnp.eye(k, dtype=h.dtype).reshape(1, k * k)
    h = h + iden
    return h.reshape(-1, k, k), new_stats


def pointnet_encoder_init(key, channel: int, feature_transform: bool = True):
    keys = jax.random.split(key, 5)
    params: Pytree = {}
    stats: Pytree = {}
    params["stn"], stats["stn"] = stn_init(keys[0], channel)
    # encoder convs are Conv1d upstream -> torch-default init
    params["conv1"] = dense_init_torch_default(keys[1], channel, 64)
    params["conv2"] = dense_init_torch_default(keys[2], 64, 128)
    params["conv3"] = dense_init_torch_default(keys[3], 128, 1024)
    for i, dim in enumerate([64, 128, 1024], start=1):
        p, s = batchnorm_init(dim)
        params[f"bn{i}"] = p
        stats[f"bn{i}"] = s
    if feature_transform:
        params["fstn"], stats["fstn"] = stnkd_init(keys[4], 64)
    return params, stats


def pointnet_encoder(params, stats, x: jnp.ndarray, *, global_feat: bool,
                     feature_transform: bool, training: bool, momentum,
                     compute_dtype=None, axis_name=None):
    """PointNet encoder (reference pointnet_utils.py:88-133), channels-last.

    x [B, N, C] (C = 3 coords + extra feature channels).
    Returns (features, trans, trans_feat, new_stats):
      features [B, N, 1088] when global_feat=False (global 1024 tiled + 64
      point feats), or [B, 1024] when global_feat=True.
    """
    B, N, D = x.shape
    new_stats = {}
    trans, new_stats["stn"] = stn_apply(
        params["stn"], stats["stn"], x, 3, training=training,
        momentum=momentum, compute_dtype=compute_dtype, axis_name=axis_name)
    coords, extra = x[..., :3], x[..., 3:]
    coords = jnp.einsum("bnc,bck->bnk", coords, trans,
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST)
    h = jnp.concatenate([coords, extra], axis=-1) if D > 3 else coords

    h = dense(params["conv1"], h, compute_dtype=compute_dtype)
    h, new_stats["bn1"] = batch_norm(params["bn1"], stats["bn1"], h,
                                     training=training, momentum=momentum,
                                     axis_name=axis_name)
    h = jax.nn.relu(h)

    if feature_transform:
        trans_feat, new_stats["fstn"] = stn_apply(
            params["fstn"], stats["fstn"], h, 64, training=training,
            momentum=momentum, compute_dtype=compute_dtype,
            axis_name=axis_name)
        h = jnp.einsum("bnc,bck->bnk", h, trans_feat,
                       preferred_element_type=jnp.float32)
    else:
        trans_feat = None

    pointfeat = h
    h = dense(params["conv2"], h, compute_dtype=compute_dtype)
    h, new_stats["bn2"] = batch_norm(params["bn2"], stats["bn2"], h,
                                     training=training, momentum=momentum,
                                     axis_name=axis_name)
    h = jax.nn.relu(h)
    h = dense(params["conv3"], h, compute_dtype=compute_dtype)
    h, new_stats["bn3"] = batch_norm(params["bn3"], stats["bn3"], h,
                                     training=training, momentum=momentum,
                                     axis_name=axis_name)
    global_feat_vec = jnp.max(h, axis=1)                    # [B, 1024]
    if global_feat:
        return global_feat_vec, trans, trans_feat, new_stats
    tiled = jnp.broadcast_to(global_feat_vec[:, None, :], (B, N, 1024))
    return (jnp.concatenate([tiled, pointfeat], axis=-1), trans, trans_feat,
            new_stats)


def feature_transform_regularizer(trans: jnp.ndarray) -> jnp.ndarray:
    """mean_b ||A_b A_b^T - I||_F (reference pointnet_utils.py:136-142)."""
    d = trans.shape[1]
    eye = jnp.eye(d, dtype=trans.dtype)
    gram = jnp.einsum("bij,bkj->bik", trans, trans,
                      preferred_element_type=jnp.float32)
    return jnp.mean(jnp.sqrt(jnp.sum(jnp.square(gram - eye), axis=(1, 2))))


# --------------------------------------------------------------------------
# losses
# --------------------------------------------------------------------------

def weighted_nll_loss(log_probs: jnp.ndarray, target: jnp.ndarray,
                      weight: jnp.ndarray, axis_name=None) -> jnp.ndarray:
    """torch.nn.functional.nll_loss(weight=...) semantics: per-sample loss
    -w[t] * logp[t], reduced as sum / sum(w[t]).

    log_probs [M, C], target [M] int, weight [C]. With ``axis_name`` the
    numerator and denominator are psum'd over the mesh axis so a sharded
    batch yields the exact global loss.
    """
    w = weight[target]
    picked = jnp.take_along_axis(log_probs, target[:, None], axis=1)[:, 0]
    num = jnp.sum(w * picked)
    den = jnp.sum(w)
    if axis_name is not None:
        num = jax.lax.psum(num, axis_name)
        den = jax.lax.psum(den, axis_name)
    return -num / den
