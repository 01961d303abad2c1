"""Metric logging: stdout meters + optional TensorBoard/W&B.

Lean TPU-friendly replacement for the reference's SmoothedValue/MetricLogger/
TensorboardLogger/WandbLogger stack (helpers.py:48-289): metrics stay on
device as jax arrays during the step and are only materialized at print time
(no per-step device->host sync, unlike the reference's loss.item() every
iteration, engine_pretrain.py:78).
"""
from __future__ import annotations

import datetime
import time
from collections import defaultdict
from typing import Mapping


class Meter:
    def __init__(self):
        self.total = 0.0
        self.count = 0
        self.value = 0.0

    def update(self, v: float, n: int = 1):
        self.value = v
        self.total += v * n
        self.count += n

    @property
    def avg(self):
        return self.total / max(self.count, 1)


class MetricLogger:
    def __init__(self, print_freq: int = 20, header: str = ""):
        self.meters = defaultdict(Meter)
        self.print_freq = print_freq
        self.header = header

    def update(self, n: int = 1, **kwargs):
        for k, v in kwargs.items():
            self.meters[k].update(float(v), n)

    def log_every(self, iterable, total: int | None = None):
        total = total if total is not None else len(iterable)
        start = time.time()
        t0 = start
        for i, item in enumerate(iterable):
            yield i, item
            if i % self.print_freq == 0 or i == total - 1:
                now = time.time()
                it_time = (now - t0) / max(i % self.print_freq + 1, 1)
                eta = datetime.timedelta(seconds=int(it_time * (total - i - 1)))
                stats = "  ".join(f"{k}: {m.value:.4f} ({m.avg:.4f})" for k, m in self.meters.items())
                print(f"{self.header} [{i}/{total}]  eta: {eta}  {stats}  time: {it_time:.4f}s")
                t0 = now

    def averages(self) -> dict[str, float]:
        return {k: m.avg for k, m in self.meters.items()}


class TensorboardWriter:
    """tensorboardX wrapper with the reference's epoch_1000x step calibration
    (helpers.py:209-232, engine_pretrain.py:105-113)."""

    def __init__(self, log_dir: str):
        from tensorboardX import SummaryWriter

        self.writer = SummaryWriter(logdir=log_dir)

    def log(self, metrics: Mapping[str, float], epoch_frac: float, head: str = "train"):
        step = int(epoch_frac * 1000)
        for k, v in metrics.items():
            self.writer.add_scalar(f"{head}/{k}", v, step)

    def flush(self):
        self.writer.flush()


def maybe_wandb(enabled: bool, project: str, run_name: str | None, config: dict):
    """W&B is optional in this image; gate cleanly (reference calls wandb
    directly, main_pretrain.py:183-197)."""
    if not enabled:
        return None
    try:
        import wandb

        wandb.init(project=project, name=run_name, config=config)
        return wandb
    except ImportError:
        print("wandb not installed; continuing without it")
        return None
