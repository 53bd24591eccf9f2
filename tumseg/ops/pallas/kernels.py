"""Pallas TPU kernels for the hot point-cloud ops. Ops not yet ported raise
NotImplementedError so the dispatcher (tumseg.ops) falls back to the XLA
compositions in tumseg.ops.core."""

from __future__ import annotations

from tumseg.ops.pallas.ballquery import query_ball_point  # noqa: F401
from tumseg.ops.pallas.fps import farthest_point_sample  # noqa: F401
from tumseg.ops.pallas.group import group_points  # noqa: F401
from tumseg.ops.pallas.interpolate import weighted_interpolate  # noqa: F401
from tumseg.ops.pallas.threenn import three_nn  # noqa: F401
