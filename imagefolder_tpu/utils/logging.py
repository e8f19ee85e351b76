"""Logging/observability (collapses the reference's three stacks —
print-hijack + file tee ``utils/misc.py:40-112``, TensorboardLogger
``utils/misc.py:127-180``, wandb in ``vq_loss.py:150`` — into one module).

Primary-host-gated text logging, a MetricLogger-style smoothed-meter with
ETA, optional wandb/tensorboard sinks (soft imports), and jax.profiler trace
hooks (the reference has no profiler; SURVEY §5)."""

from __future__ import annotations

import contextlib
import logging
import sys
import time
from collections import defaultdict, deque
from pathlib import Path
from typing import Optional

import jax

__all__ = ["create_logger", "MetricMeter", "MetricLogger", "Tracker",
           "flatten_metrics", "profile_trace"]


def flatten_metrics(metrics: dict) -> dict:
    """Host-float view of a device metrics dict. Array-valued entries — e.g.
    the (P, S) per-scale codebook usage (reference logs usage per scale,
    quant.py:137-143) — expand into indexed scalars (``key/i_j``)."""
    import numpy as np

    out = {}
    for k, v in metrics.items():
        a = np.asarray(v)
        if a.ndim == 0:
            out[k] = float(a)
        else:
            for idx in np.ndindex(a.shape):
                out[f"{k}/" + "_".join(map(str, idx))] = float(a[idx])
    return out


def create_logger(log_dir: Optional[str] = None, name: str = "imagefolder_tpu"):
    """Rank-0 file+stream logger (reference utils/logger.py:32-46)."""
    logger = logging.getLogger(name)
    logger.setLevel(logging.INFO)
    logger.propagate = False
    if logger.handlers:
        return logger
    fmt = logging.Formatter(
        "[%(asctime)s] %(message)s", datefmt="%Y-%m-%d %H:%M:%S")
    if jax.process_index() == 0:
        sh = logging.StreamHandler(sys.stdout)
        sh.setFormatter(fmt)
        logger.addHandler(sh)
        if log_dir:
            Path(log_dir).mkdir(parents=True, exist_ok=True)
            fh = logging.FileHandler(Path(log_dir) / "log.txt")
            fh.setFormatter(fmt)
            logger.addHandler(fh)
    else:
        logger.addHandler(logging.NullHandler())
    return logger


class MetricMeter:
    """SmoothedValue (reference utils/misc.py:183-220)."""

    def __init__(self, window: int = 30):
        self.window = deque(maxlen=window)
        self.total = 0.0
        self.count = 0

    def update(self, value, n: int = 1):
        v = float(value)
        self.window.append(v)
        self.total += v * n
        self.count += n

    @property
    def avg(self):
        return sum(self.window) / max(len(self.window), 1)

    @property
    def global_avg(self):
        return self.total / max(self.count, 1)


class MetricLogger:
    """Iteration logger with ETA (reference utils/misc.py:285-337)."""

    def __init__(self, logger=None, log_every: int = 100):
        self.meters = defaultdict(MetricMeter)
        self.logger = logger or create_logger()
        self.log_every = log_every
        self._t0 = time.time()
        self._step0 = 0

    def update(self, **kwargs):
        for k, v in kwargs.items():
            self.meters[k].update(v)

    def log(self, step: int, total_steps: Optional[int] = None, prefix: str = ""):
        if step % self.log_every:
            return
        dt = time.time() - self._t0
        sps = (step - self._step0) / dt if dt > 0 else 0.0
        self._t0, self._step0 = time.time(), step
        msg = " ".join(f"{k}: {m.avg:.4f}" for k, m in sorted(self.meters.items()))
        eta = ""
        if total_steps and sps > 0:
            secs = (total_steps - step) / sps
            eta = f" eta: {secs / 3600:.1f}h"
        self.logger.info(f"{prefix}step {step} ({sps:.2f} it/s){eta} | {msg}")


class Tracker:
    """Optional wandb / tensorboard sink; no-ops when unavailable or not
    primary host."""

    def __init__(self, project: str = "imagefolder_tpu", log_dir=None,
                 use_wandb: bool = False, use_tb: bool = False, config=None):
        self.wandb = None
        self.tb = None
        if jax.process_index() != 0:
            return
        if use_wandb:
            try:
                import wandb

                self.wandb = wandb.init(project=project, config=config)
            except Exception:
                self.wandb = None
        if use_tb and log_dir:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self.tb = SummaryWriter(log_dir)
            except Exception:
                self.tb = None

    def log(self, metrics: dict, step: int):
        if self.wandb is not None:
            self.wandb.log(metrics, step=step)
        if self.tb is not None:
            for k, v in metrics.items():
                self.tb.add_scalar(k, float(v), step)

    def log_image(self, tag: str, img_uint8_hwc, step: int):
        """Image grids (reference wandb.Image recon grids xqgan_train.py:513,
        TensorboardLogger.log_image utils/misc.py:162-166)."""
        if self.wandb is not None:
            import wandb

            self.wandb.log({tag: [wandb.Image(img_uint8_hwc)]}, step=step)
        if self.tb is not None:
            self.tb.add_image(tag, img_uint8_hwc, step, dataformats="HWC")


@contextlib.contextmanager
def profile_trace(log_dir: str, enabled: bool = True):
    """jax.profiler trace window (TPU-native replacement for the reference's
    wall-clock-only counters)."""
    if not enabled or jax.process_index() != 0:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
