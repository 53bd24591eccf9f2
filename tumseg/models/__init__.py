"""Model registry: models are addressed by name, matching the reference's
``importlib.import_module(args.model)`` convention
(/root/reference/sem_seg_training.py:542). Each model module exposes
``init(key, num_classes, num_extra_features)``, ``apply(variables, x, ...)``
and ``loss(pred, target, trans_feat, weight)``."""

from __future__ import annotations

import importlib
from types import ModuleType

_ALIASES = {
    # reference's frozen experiment variants resolve to the live models
    "pointnet2_sem_seg_original": "pointnet2_sem_seg",
    "pointnet2_sem_seg_trial": "pointnet2_sem_seg",
    "pointnet2_sem_seg_geo_trial": "pointnet2_sem_seg",
    "pointnet_sem_seg_original": "pointnet_sem_seg",
}

AVAILABLE = ["pointnet2_sem_seg", "pointnet2_sem_seg_msg", "pointnet_sem_seg"]


def get_module(name: str) -> ModuleType:
    name = _ALIASES.get(name, name)
    if name not in AVAILABLE:
        raise ValueError(f"unknown model {name!r}; available: {AVAILABLE}")
    return importlib.import_module(f"tumseg.models.{name}")
