"""PointNet semantic segmentation model (STN + encoder + conv head).

Architecture parity: /root/reference/models/pointnet_sem_seg.py:9-45 —
PointNetEncoder(global_feat=False, feature_transform=True,
channel=6+extra), head 1088->512->256->128->num_classes with BN+ReLU,
log_softmax, loss = weighted NLL + 0.001 * ||A A^T - I|| regularizer.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from tumseg.nn import layers as L


def init(key, num_classes: int, num_extra_features: int) -> Dict:
    keys = jax.random.split(key, 5)
    channel = 6 + num_extra_features
    params: Dict = {}
    stats: Dict = {}
    params["feat"], stats["feat"] = L.pointnet_encoder_init(
        keys[0], channel, feature_transform=True)
    dims = [(1088, 512), (512, 256), (256, 128), (128, num_classes)]
    for i, (din, dout) in enumerate(dims, start=1):
        # head convs are Conv1d upstream (pointnet_sem_seg.py:16-19):
        # untouched by the reference's weights_init -> torch-default init
        params[f"conv{i}"] = L.dense_init_torch_default(keys[i], din, dout)
        if i < 4:
            params[f"bn{i}"], stats[f"bn{i}"] = L.batchnorm_init(dout)
    return {"params": params, "batch_stats": stats}


def apply(variables: Dict, x: jnp.ndarray, *, training: bool = False,
          bn_momentum=0.1, rngs: Optional[Dict] = None, compute_dtype=None,
          axis_name=None, fast_gather=None):
    """x [B, N, 6+extra] -> (log_probs [B, N, k], trans_feat [B, 64, 64],
    new_batch_stats)."""
    params, stats = variables["params"], variables["batch_stats"]
    new_stats: Dict = {}
    h, _trans, trans_feat, new_stats["feat"] = L.pointnet_encoder(
        params["feat"], stats["feat"], x, global_feat=False,
        feature_transform=True, training=training, momentum=bn_momentum,
        compute_dtype=compute_dtype, axis_name=axis_name)
    for i in range(1, 4):
        h = L.dense(params[f"conv{i}"], h, compute_dtype=compute_dtype)
        h, new_stats[f"bn{i}"] = L.batch_norm(
            params[f"bn{i}"], stats[f"bn{i}"], h, training=training,
            momentum=bn_momentum, axis_name=axis_name)
        h = jax.nn.relu(h)
    h = L.dense(params["conv4"], h, compute_dtype=compute_dtype)
    log_probs = jax.nn.log_softmax(h.astype(jnp.float32), axis=-1)
    return log_probs, trans_feat, new_stats


MAT_DIFF_LOSS_SCALE = 0.001


def loss(pred: jnp.ndarray, target: jnp.ndarray, trans_feat, weight,
         axis_name=None):
    """NLL + 0.001 * feature-transform orthogonality regularizer
    (models/pointnet_sem_seg.py:36-45)."""
    import jax

    C = pred.shape[-1]
    nll = L.weighted_nll_loss(pred.reshape(-1, C), target.reshape(-1), weight,
                              axis_name=axis_name)
    reg = L.feature_transform_regularizer(trans_feat)
    if axis_name is not None:  # batch mean of the per-cloud norms, globally
        reg = jax.lax.pmean(reg, axis_name)
    return nll + MAT_DIFF_LOSS_SCALE * reg
