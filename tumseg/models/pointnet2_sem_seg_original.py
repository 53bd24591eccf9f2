"""Frozen variant: PointNet++ SSG with the input contract fixed at 9 point
channels (6 base + 3 extras), mirroring
/root/reference/models/extra/pointnet2_sem_seg_original.py:6-9 where
``get_model(num_classes)`` hard-codes ``in_channel = 9 + 3`` and takes no
``num_extra_features``. See tumseg/models/_frozen.py for the rationale."""

from tumseg.models import _frozen
from tumseg.models import pointnet2_sem_seg as _live

FIXED_EXTRA_FEATURES = 3

init = _frozen.pinned_init(_live, "pointnet2_sem_seg_original",
                           FIXED_EXTRA_FEATURES)
apply = _live.apply
loss = _live.loss
