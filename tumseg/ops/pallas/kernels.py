"""Pallas TPU kernels for the hot point-cloud ops. Ops not yet ported raise
NotImplementedError so the dispatcher (tumseg.ops) falls back to the XLA
compositions in tumseg.ops.core."""

from __future__ import annotations

from tumseg.ops.pallas.fps import farthest_point_sample  # noqa: F401


def query_ball_point(radius, nsample, xyz, new_xyz):
    raise NotImplementedError
