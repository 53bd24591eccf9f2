"""Frozen variant: PointNet++ SSG with the input contract fixed at 6 point
channels (no extras), mirroring
/root/reference/models/extra/pointnet2_sem_seg_trial.py:44-47 where the
active ``get_model(num_classes)`` hard-codes ``in_channel = 6 + 3``. See
tumseg/models/_frozen.py for the rationale."""

from tumseg.models import _frozen
from tumseg.models import pointnet2_sem_seg as _live

FIXED_EXTRA_FEATURES = 0

init = _frozen.pinned_init(_live, "pointnet2_sem_seg_trial",
                           FIXED_EXTRA_FEATURES)
apply = _live.apply
loss = _live.loss
