"""PointNet++ (SSG) semantic segmentation model, TPU-native.

Architecture parity: /root/reference/models/pointnet2_sem_seg.py:6-50 —
4 set-abstraction stages (1024/256/64/16 centroids, radius .1/.2/.4/.8,
K=32) + 4 feature-propagation stages + Conv(128)->BN->ReLU->Dropout(.5)
-> Conv(num_classes) -> log_softmax head, weighted NLL loss.

Differences by design (not behavior): channels-last [B, N, C] layout, fused
pointwise-MLP matmuls on the MXU, functional batch stats with traced BN
momentum, explicit RNG threading for dropout and the stochastic FPS start.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from tumseg.nn import layers as L

SA_CFGS = [
    dict(npoint=1024, radius=0.1, nsample=32, mlp=[32, 32, 64]),
    dict(npoint=256, radius=0.2, nsample=32, mlp=[64, 64, 128]),
    dict(npoint=64, radius=0.4, nsample=32, mlp=[128, 128, 256]),
    dict(npoint=16, radius=0.8, nsample=32, mlp=[256, 256, 512]),
]
FP_CFGS = [
    dict(in_channel=768, mlp=[256, 256]),       # fp4
    dict(in_channel=384, mlp=[256, 256]),       # fp3
    dict(in_channel=320, mlp=[256, 128]),       # fp2
    dict(in_channel=128, mlp=[128, 128, 128]),  # fp1
]
DROPOUT_RATE = 0.5


def init(key, num_classes: int, num_extra_features: int) -> Dict:
    """Build the parameter/batch-stats pytrees.

    Input channel contract matches the reference exactly: the raw point
    feature vector has 6 + num_extra_features channels and sa1 additionally
    sees the 3 group-relative coords (models/pointnet2_sem_seg.py:9).
    """
    keys = jax.random.split(key, 10)
    params: Dict = {}
    stats: Dict = {}
    in_ch = 6 + 3 + num_extra_features
    for i, cfg in enumerate(SA_CFGS, start=1):
        params[f"sa{i}"], stats[f"sa{i}"] = L.set_abstraction_init(
            keys[i - 1], in_ch, cfg["mlp"])
        in_ch = cfg["mlp"][-1] + 3
    for i, cfg in zip([4, 3, 2, 1], FP_CFGS):
        params[f"fp{i}"], stats[f"fp{i}"] = L.feature_propagation_init(
            keys[3 + i], cfg["in_channel"], cfg["mlp"])
    # head convs are Conv1d upstream: untouched by the reference's
    # weights_init, so torch-default init (see L.dense_init_torch_default)
    params["conv1"] = L.dense_init_torch_default(keys[8], 128, 128)
    params["bn1"], stats["bn1"] = L.batchnorm_init(128)
    params["conv2"] = L.dense_init_torch_default(keys[9], 128, num_classes)
    return {"params": params, "batch_stats": stats}


def apply(variables: Dict, x: jnp.ndarray, *, training: bool = False,
          bn_momentum=0.1, rngs: Optional[Dict] = None,
          compute_dtype=None, axis_name=None, fast_gather=None):
    """Forward pass.

    x: [B, N, 6 + extra] channels-last (cols 0-2 block-relative xyz, 3-5
    room-normalized xyz, then extra features).
    Returns (log_probs [B, N, num_classes], l4_points [B, 16, 512],
    new_batch_stats).
    """
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
        nxyz, npts, new_stats[f"sa{i}"] = L.set_abstraction(
            params[f"sa{i}"], stats[f"sa{i}"], cfg, l_xyz[-1], l_points[-1],
            training=training, momentum=bn_momentum, fps_start=fps_start,
            compute_dtype=compute_dtype, axis_name=axis_name,
            fast_gather=fast_gather)
        l_xyz.append(nxyz)
        l_points.append(npts)

    # feature propagation: fp4(l3<-l4) ... fp1(l0<-l1, skip=None)
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
                                       training=training, momentum=bn_momentum,
                                       axis_name=axis_name)
    h = jax.nn.relu(h)
    if training and "dropout" in rngs:
        h = L.dropout(rngs["dropout"], h, DROPOUT_RATE, training)
    h = L.dense(params["conv2"], h, compute_dtype=compute_dtype)
    log_probs = jax.nn.log_softmax(h.astype(jnp.float32), axis=-1)
    return log_probs, l_points[4], new_stats


def loss(pred: jnp.ndarray, target: jnp.ndarray, trans_feat, weight,
         axis_name=None):
    """Weighted NLL over flattened points (models/pointnet2_sem_seg.py:44-50;
    trans_feat is accepted and ignored, as in the reference)."""
    C = pred.shape[-1]
    return L.weighted_nll_loss(pred.reshape(-1, C), target.reshape(-1), weight,
                               axis_name=axis_name)
