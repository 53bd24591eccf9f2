"""PointNet++ multi-scale-grouping (MSG) semantic segmentation model.

The reference ships the MSG layer (models/pointnet2_utils.py:205-262) but no
live MSG segmentation model; this follows the standard Pointnet2 MSG
sem-seg configuration (two radii per stage) on top of tumseg's
set_abstraction_msg, sharing the FP/head structure with the SSG model.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from tumseg.nn import layers as L

SA_CFGS = [
    dict(npoint=1024, radius_list=[0.05, 0.1], nsample_list=[16, 32],
         mlp_list=[[16, 16, 32], [32, 32, 64]]),
    dict(npoint=256, radius_list=[0.1, 0.2], nsample_list=[16, 32],
         mlp_list=[[64, 64, 128], [64, 96, 128]]),
    dict(npoint=64, radius_list=[0.2, 0.4], nsample_list=[16, 32],
         mlp_list=[[128, 196, 256], [128, 196, 256]]),
    dict(npoint=16, radius_list=[0.4, 0.8], nsample_list=[16, 32],
         mlp_list=[[256, 256, 512], [256, 384, 512]]),
]
FP_CFGS = [
    dict(in_channel=512 + 512 + 256 + 256, mlp=[256, 256]),   # fp4
    dict(in_channel=128 + 128 + 256, mlp=[256, 256]),          # fp3
    dict(in_channel=32 + 64 + 256, mlp=[256, 128]),            # fp2
    dict(in_channel=128, mlp=[128, 128, 128]),                 # fp1
]
DROPOUT_RATE = 0.5


def _stage_out(cfg) -> int:
    return sum(m[-1] for m in cfg["mlp_list"])


def init(key, num_classes: int, num_extra_features: int) -> Dict:
    keys = jax.random.split(key, 10)
    params: Dict = {}
    stats: Dict = {}
    in_ch = 6 + num_extra_features  # MSG layer adds the +3 internally
    for i, cfg in enumerate(SA_CFGS, start=1):
        params[f"sa{i}"], stats[f"sa{i}"] = L.set_abstraction_msg_init(
            keys[i - 1], cfg["npoint"], cfg["radius_list"],
            cfg["nsample_list"], in_ch, cfg["mlp_list"])
        in_ch = _stage_out(cfg)
    for i, cfg in zip([4, 3, 2, 1], FP_CFGS):
        params[f"fp{i}"], stats[f"fp{i}"] = L.feature_propagation_init(
            keys[3 + i], cfg["in_channel"], cfg["mlp"])
    params["conv1"] = L.dense_init(keys[8], 128, 128)
    params["bn1"], stats["bn1"] = L.batchnorm_init(128)
    params["conv2"] = L.dense_init(keys[9], 128, num_classes)
    return {"params": params, "batch_stats": stats}


def apply(variables: Dict, x: jnp.ndarray, *, training: bool = False,
          bn_momentum=0.1, rngs: Optional[Dict] = None, compute_dtype=None,
          axis_name=None, fast_gather=None):
    """x [B, N, 6+extra] -> (log_probs [B, N, C], l4_points, new_stats)."""
    params, stats = variables["params"], variables["batch_stats"]
    new_stats: Dict = {}
    rngs = rngs or {}

    l_xyz = [x[..., :3]]
    l_points = [x]
    for i, cfg in enumerate(SA_CFGS, start=1):
        fps_start = None
        if "fps" in rngs:
            fps_start = jax.random.randint(
                jax.random.fold_in(rngs["fps"], i), (x.shape[0],), 0,
                l_xyz[-1].shape[1])
        nxyz, npts, new_stats[f"sa{i}"] = L.set_abstraction_msg(
            params[f"sa{i}"], stats[f"sa{i}"], cfg, l_xyz[-1], l_points[-1],
            training=training, momentum=bn_momentum, fps_start=fps_start,
            compute_dtype=compute_dtype, axis_name=axis_name,
            fast_gather=fast_gather)
        l_xyz.append(nxyz)
        l_points.append(npts)

    feat = l_points[4]
    for i, lvl in zip([4, 3, 2, 1], [3, 2, 1, 0]):
        skip = l_points[lvl] if lvl > 0 else None
        feat, new_stats[f"fp{i}"] = L.feature_propagation(
            params[f"fp{i}"], stats[f"fp{i}"], l_xyz[lvl], l_xyz[lvl + 1],
            skip, feat, training=training, momentum=bn_momentum,
            compute_dtype=compute_dtype, axis_name=axis_name,
            fast_gather=fast_gather)

    h = L.dense(params["conv1"], feat, compute_dtype=compute_dtype)
    h, new_stats["bn1"] = L.batch_norm(params["bn1"], stats["bn1"], h,
                                       training=training,
                                       momentum=bn_momentum,
                                       axis_name=axis_name)
    h = jax.nn.relu(h)
    if training and "dropout" in rngs:
        h = L.dropout(rngs["dropout"], h, DROPOUT_RATE, training)
    h = L.dense(params["conv2"], h, compute_dtype=compute_dtype)
    log_probs = jax.nn.log_softmax(h.astype(jnp.float32), axis=-1)
    return log_probs, l_points[4], new_stats


def loss(pred: jnp.ndarray, target: jnp.ndarray, trans_feat, weight,
         axis_name=None):
    C = pred.shape[-1]
    return L.weighted_nll_loss(pred.reshape(-1, C), target.reshape(-1),
                               weight, axis_name=axis_name)
