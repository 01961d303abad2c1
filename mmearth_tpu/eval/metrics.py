"""Dataset-overall eval metrics (torchmetrics equivalents).

The reference computes metrics over the whole split via accumulating
torchmetrics collections, not minibatch averages (engine_finetune.py:29-53,
195-198, README.md:25).  These are streaming accumulators with jittable
`update` batch-statistics, accumulated in numpy on host.

Per-dataset mapping (engine_finetune.py:44-51):
  m-eurosat / m-so2sat / m-brick-kiln -> multiclass Accuracy (micro)
  m-bigearthnet -> multilabel F1 (micro, threshold 0.5 on sigmoid logits)
  m-cashew-plant / m-SA-crop-type -> multiclass Jaccard (macro)
"""
from __future__ import annotations

import numpy as np


class MulticlassAccuracy:
    """Micro accuracy: argmax(logits) == label."""

    def __init__(self, num_classes: int):
        self.num_classes = num_classes
        self.reset()

    def reset(self):
        self.correct = 0
        self.total = 0

    def update(self, logits: np.ndarray, labels: np.ndarray):
        preds = np.asarray(logits).argmax(axis=-1).reshape(-1)
        labels = np.asarray(labels).reshape(-1)
        self.correct += int((preds == labels).sum())
        self.total += labels.size

    def compute(self) -> float:
        return self.correct / max(self.total, 1)


class MultilabelF1Micro:
    """Micro F1 over all (sample, label) pairs; preds = sigmoid(logit) > 0.5,
    i.e. logit > 0."""

    def __init__(self, num_labels: int):
        self.num_labels = num_labels
        self.reset()

    def reset(self):
        self.tp = 0
        self.fp = 0
        self.fn = 0

    def update(self, logits: np.ndarray, labels: np.ndarray):
        preds = np.asarray(logits) > 0
        labels = np.asarray(labels) > 0.5
        self.tp += int((preds & labels).sum())
        self.fp += int((preds & ~labels).sum())
        self.fn += int((~preds & labels).sum())

    def compute(self) -> float:
        denom = 2 * self.tp + self.fp + self.fn
        return 2 * self.tp / denom if denom else 0.0


class MulticlassJaccardMacro:
    """Macro-averaged IoU from an accumulated confusion matrix.  Classes with
    zero union are excluded from the mean (torchmetrics semantics)."""

    def __init__(self, num_classes: int):
        self.num_classes = num_classes
        self.reset()

    def reset(self):
        self.confusion = np.zeros((self.num_classes, self.num_classes), dtype=np.int64)

    def update(self, logits: np.ndarray, labels: np.ndarray):
        """logits: (..., C); labels: (...) int."""
        preds = np.asarray(logits).argmax(axis=-1).reshape(-1)
        labels = np.asarray(labels).reshape(-1)
        valid = (labels >= 0) & (labels < self.num_classes)
        idx = labels[valid] * self.num_classes + preds[valid]
        self.confusion += np.bincount(
            idx, minlength=self.num_classes ** 2
        ).reshape(self.num_classes, self.num_classes)

    def compute(self) -> float:
        tp = np.diag(self.confusion).astype(np.float64)
        fp = self.confusion.sum(axis=0) - tp
        fn = self.confusion.sum(axis=1) - tp
        union = tp + fp + fn
        present = union > 0
        if not present.any():
            return 0.0
        iou = np.where(present, tp / np.maximum(union, 1), 0.0)
        return float(iou[present].mean())


# ---------------------------------------------------------------------------
# device-side sufficient statistics (jittable): ship O(C^2) scalars to host
# instead of full logit tensors.
# ---------------------------------------------------------------------------
def batch_stats_fn(dataset: str, num_classes: int):
    import jax.numpy as jnp

    kind = METRIC_BY_DATASET[dataset][1]

    def accuracy_stats(logits, labels):
        preds = jnp.argmax(logits, axis=-1).reshape(-1)
        labels = labels.reshape(-1)
        return {"correct": jnp.sum(preds == labels), "total": labels.size}

    def f1_stats(logits, labels):
        preds = logits > 0
        lab = labels > 0.5
        return {
            "tp": jnp.sum(preds & lab),
            "fp": jnp.sum(preds & ~lab),
            "fn": jnp.sum(~preds & lab),
        }

    def jaccard_stats(logits, labels):
        preds = jnp.argmax(logits, axis=-1).reshape(-1)
        labels = labels.reshape(-1)
        valid = (labels >= 0) & (labels < num_classes)
        idx = jnp.where(valid, labels * num_classes + preds, 0)
        conf = jnp.zeros((num_classes * num_classes,), jnp.int32).at[idx].add(
            valid.astype(jnp.int32)
        )
        return {"confusion": conf.reshape(num_classes, num_classes)}

    return {
        MulticlassAccuracy: accuracy_stats,
        MultilabelF1Micro: f1_stats,
        MulticlassJaccardMacro: jaccard_stats,
    }[kind]


def _acc_update_stats(self, stats):
    self.correct += int(stats["correct"])
    self.total += int(stats["total"])


def _f1_update_stats(self, stats):
    self.tp += int(stats["tp"])
    self.fp += int(stats["fp"])
    self.fn += int(stats["fn"])


def _jac_update_stats(self, stats):
    self.confusion += np.asarray(stats["confusion"]).astype(np.int64)


MulticlassAccuracy.update_stats = _acc_update_stats
MultilabelF1Micro.update_stats = _f1_update_stats
MulticlassJaccardMacro.update_stats = _jac_update_stats


METRIC_BY_DATASET = {
    "m-eurosat": ("Accuracy", MulticlassAccuracy),
    "m-so2sat": ("Accuracy", MulticlassAccuracy),
    "m-brick-kiln": ("Accuracy", MulticlassAccuracy),
    "m-bigearthnet": ("F1Score", MultilabelF1Micro),
    "m-cashew-plant": ("Jaccard", MulticlassJaccardMacro),
    "m-SA-crop-type": ("Jaccard", MulticlassJaccardMacro),
}


def metric_for(dataset: str, num_classes: int):
    name, cls = METRIC_BY_DATASET[dataset]
    return name, cls(num_classes)
