"""Segmentation metric tallies, computed on device as [C]-vector sums so the
eval step stays one fused XLA program (the reference tallies with NumPy
histograms per batch, localfunctions.py:275-281)."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def confusion_tallies(pred: jnp.ndarray, target: jnp.ndarray,
                      num_classes: int):
    """pred/target [...] int -> dict of [C] tallies:
    seen (gt count), predicted (pred count), correct (pred==gt count).
    IoU denominator = seen + predicted - correct (|pred ∪ gt| per class).
    """
    pred = pred.reshape(-1)
    target = target.reshape(-1)
    seen = jnp.zeros(num_classes, jnp.int32).at[target].add(1)
    predicted = jnp.zeros(num_classes, jnp.int32).at[pred].add(1)
    correct = jnp.zeros(num_classes, jnp.int32).at[target].add(
        (pred == target).astype(jnp.int32))
    return {"seen": seen, "predicted": predicted, "correct": correct}


def iou_from_tallies(tallies) -> np.ndarray:
    """Per-class IoU with the reference's +1e-6 denominator smoothing
    (localfunctions.py:284)."""
    seen = np.asarray(tallies["seen"], dtype=np.float64)
    predicted = np.asarray(tallies["predicted"], dtype=np.float64)
    correct = np.asarray(tallies["correct"], dtype=np.float64)
    denom = seen + predicted - correct
    return correct / (denom + 1e-6)


def miou_from_tallies(tallies) -> float:
    return float(np.mean(iou_from_tallies(tallies)))


def accuracy_from_tallies(tallies, total_seen: int) -> float:
    return float(np.asarray(tallies["correct"]).sum() / float(total_seen))


def class_avg_accuracy(tallies) -> float:
    seen = np.asarray(tallies["seen"], dtype=np.float64)
    correct = np.asarray(tallies["correct"], dtype=np.float64)
    return float(np.mean(correct / (seen + 1e-6)))


def zero_tallies(num_classes: int):
    z = np.zeros(num_classes, dtype=np.int64)
    return {"seen": z.copy(), "predicted": z.copy(), "correct": z.copy()}


def accumulate(acc, tallies):
    # device-side adds: an np.asarray here would force a host readback per
    # eval batch (the report-side helpers materialize once at epoch end).
    # Device tallies are int32 — fine within one eval epoch (2^31 points =
    # 524K blocks); whole-test-set totals use accumulate_host instead.
    for k in acc:
        acc[k] = acc[k] + tallies[k]
    return acc


def accumulate_host(acc, tallies):
    """int64 host-side accumulation for unbounded totals (whole-test-set
    aggregation in run_testing, one readback per scene — already paid for
    the per-scene report)."""
    for k in acc:
        acc[k] = np.asarray(acc[k]) + np.asarray(tallies[k], dtype=np.int64)
    return acc
