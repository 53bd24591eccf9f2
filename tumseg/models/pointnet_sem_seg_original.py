"""Frozen variant: PointNet semantic segmentation with the encoder channel
count fixed at 9 (6 base + 3 extras), mirroring
/root/reference/models/extra/pointnet_sem_seg_original.py:10-13 where
``get_model(num_class)`` hard-codes ``channel=9``. See
tumseg/models/_frozen.py for the rationale."""

from tumseg.models import _frozen
from tumseg.models import pointnet_sem_seg as _live

FIXED_EXTRA_FEATURES = 3

init = _frozen.pinned_init(_live, "pointnet_sem_seg_original",
                           FIXED_EXTRA_FEATURES)
apply = _live.apply
loss = _live.loss
