"""Pallas kernel parity tests (run in interpreter mode on CPU; the same
kernels compile natively on TPU where the dispatcher selects them)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tumseg.ops import core as xla_ops


@pytest.fixture(autouse=True)
def _interpret_mode():
    """Pallas TPU kernels run under the interpreter on CPU."""
    from jax.experimental.pallas import tpu as pltpu

    with pltpu.force_tpu_interpret_mode():
        yield


@pytest.mark.parametrize("B,N,npoint", [(2, 128, 16), (3, 100, 32), (1, 64, 64)])
def test_fps_pallas_matches_xla(B, N, npoint):
    from tumseg.ops.pallas.fps import farthest_point_sample as fps_pallas

    r = np.random.default_rng(0)
    xyz = jnp.asarray(r.random((B, N, 3)), jnp.float32)
    start = jnp.asarray(r.integers(0, N, B), jnp.int32)
    want = np.asarray(xla_ops.farthest_point_sample(xyz, npoint, start=start))
    got = np.asarray(fps_pallas(xyz, npoint, start=start))
    np.testing.assert_array_equal(got, want)


def test_fps_pallas_default_start():
    from tumseg.ops.pallas.fps import farthest_point_sample as fps_pallas

    r = np.random.default_rng(1)
    xyz = jnp.asarray(r.random((2, 96, 3)), jnp.float32)
    want = np.asarray(xla_ops.farthest_point_sample(xyz, 24))
    got = np.asarray(fps_pallas(xyz, 24))
    np.testing.assert_array_equal(got, want)


def test_fps_pallas_batch_tiling():
    """Batches larger than one VMEM tile split over the grid."""
    from tumseg.ops.pallas import fps as fps_mod

    r = np.random.default_rng(2)
    xyz = jnp.asarray(r.random((5, 64, 3)), jnp.float32)
    old = fps_mod._VMEM_PLANE_BUDGET
    try:
        fps_mod._VMEM_PLANE_BUDGET = 2 * 64  # force b_tile=2 -> grid of 3
        got = np.asarray(fps_mod.farthest_point_sample(xyz, 8))
    finally:
        fps_mod._VMEM_PLANE_BUDGET = old
    want = np.asarray(xla_ops.farthest_point_sample(xyz, 8))
    np.testing.assert_array_equal(got, want)
