"""Model registry: models are addressed by name, matching the reference's
``importlib.import_module(args.model)`` convention
(/root/reference/sem_seg_training.py:542). Each model module exposes
``init(key, num_classes, num_extra_features)``, ``apply(variables, x, ...)``
and ``loss(pred, target, trans_feat, weight)``."""

from __future__ import annotations

import importlib
from types import ModuleType

_ALIASES = {
    # geo_trial has the live signature AND channel contract upstream
    # (models/extra/pointnet2_sem_seg_geo_trial.py:7-9) — a pure alias; the
    # other frozen variants pin their channel counts and get real modules
    # (see tumseg/models/_frozen.py)
    "pointnet2_sem_seg_geo_trial": "pointnet2_sem_seg",
}

AVAILABLE = ["pointnet2_sem_seg", "pointnet2_sem_seg_msg", "pointnet_sem_seg",
             "pointnet2_sem_seg_original", "pointnet2_sem_seg_trial",
             "pointnet_sem_seg_original"]


def get_module(name: str) -> ModuleType:
    name = _ALIASES.get(name, name)
    if name not in AVAILABLE:
        raise ValueError(f"unknown model {name!r}; available: {AVAILABLE}")
    return importlib.import_module(f"tumseg.models.{name}")
