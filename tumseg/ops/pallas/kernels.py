"""Pallas TPU kernels for the hot point-cloud ops (filled in incrementally;
ops not yet ported raise NotImplementedError so the dispatcher falls back to
the XLA compositions in tumseg.ops.core)."""

from __future__ import annotations


def farthest_point_sample(xyz, npoint, start=None):
    raise NotImplementedError


def query_ball_point(radius, nsample, xyz, new_xyz):
    raise NotImplementedError
