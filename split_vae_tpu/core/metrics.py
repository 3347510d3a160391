"""Streaming metrics (host-side running means over device scalars).

Equivalent of the reference's tf.keras.metrics.Mean / Accuracy pools
(vae/trainer.py:99-118, spair/trainer.py:123-132), but the per-step metric
dict comes back from the jitted step as device scalars; conversion happens at
logging cadence only (one sync per interval, not per step).
"""

from __future__ import annotations

from typing import Dict

import jax
import numpy as np


class MeanMetrics:
    """Running mean per key; accepts device or host scalars."""

    def __init__(self):
        self._sums: Dict[str, float] = {}
        self._counts: Dict[str, int] = {}
        self._pending = []

    def update(self, metrics: Dict) -> None:
        # Defer device->host transfer: stash the dict, drain lazily.
        self._pending.append(metrics)

    def _drain(self) -> None:
        if not self._pending:
            return
        host = jax.device_get(self._pending)
        self._pending = []
        for metrics in host:
            for k, v in metrics.items():
                v = float(np.asarray(v))
                self._sums[k] = self._sums.get(k, 0.0) + v
                self._counts[k] = self._counts.get(k, 0) + 1

    def result(self) -> Dict[str, float]:
        self._drain()
        return {k: self._sums[k] / max(self._counts[k], 1) for k in self._sums}

    def reset(self) -> None:
        self._pending = []
        self._sums.clear()
        self._counts.clear()


class AccuracyMetric:
    """Categorical accuracy over (one-hot or int labels, logits/probs)."""

    def __init__(self):
        self.correct = 0
        self.total = 0

    def update(self, labels, preds) -> None:
        labels = np.asarray(jax.device_get(labels))
        preds = np.asarray(jax.device_get(preds))
        if labels.ndim > 1:
            labels = labels.argmax(axis=-1)
        if preds.ndim > 1:
            preds = preds.argmax(axis=-1)
        self.correct += int((labels == preds).sum())
        self.total += int(labels.shape[0])

    def result(self) -> float:
        return self.correct / self.total if self.total else 0.0

    def reset(self) -> None:
        self.correct = 0
        self.total = 0


def linear_assignment(labels: np.ndarray, pred: np.ndarray) -> np.ndarray:
    """Majority-vote cluster -> class relabeling (vae/trainer.py:40-67).

    labels: one-hot [N, num_class]; pred: logits/probs [N, num_cluster].
    Returns one-hot predicted classes [N, num_class].
    """
    labels = np.asarray(labels)
    pred = np.asarray(pred)
    num_class = labels.shape[1]
    num_cluster = pred.shape[1]
    lab = labels.argmax(axis=1)
    cluster = pred.argmax(axis=1)
    cluster_pred = np.zeros_like(lab)
    for i in range(num_cluster):
        members = lab[cluster == i]
        if members.size:
            vals, counts = np.unique(members, return_counts=True)
            cluster_pred[cluster == i] = vals[counts.argmax()]
    return np.eye(num_class, dtype=np.float32)[cluster_pred]
