"""Observability: process-0 logging, TensorBoard + JSONL metrics, timers.

(reference relies on Lightning/rich for this; reference: src/utils/pylogger.py,
src/utils/utils.py:143-184)
"""
from __future__ import annotations

import json
import logging
import time
from contextlib import contextmanager
from pathlib import Path
from typing import Optional


def get_logger(name: str = "packppi") -> logging.Logger:
    """Logger that only emits on process 0 of a multi-process run."""
    logger = logging.getLogger(name)
    if not logger.handlers:
        h = logging.StreamHandler()
        h.setFormatter(logging.Formatter("[%(asctime)s %(levelname)s] %(message)s", "%H:%M:%S"))
        logger.addHandler(h)
        logger.setLevel(logging.INFO)
        logger.propagate = False
    try:
        import jax
        if jax.process_index() != 0:
            logger.setLevel(logging.ERROR)
    except Exception:
        pass
    return logger


class MetricLogger:
    """Scalar metrics to TensorBoard (if available) + metrics.jsonl."""

    def __init__(self, log_dir: str, use_tensorboard: bool = True):
        self.log_dir = Path(log_dir)
        self.log_dir.mkdir(parents=True, exist_ok=True)
        self.jsonl = open(self.log_dir / "metrics.jsonl", "a")
        self.tb = None
        if use_tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter
                self.tb = SummaryWriter(str(self.log_dir / "tb"))
            except Exception:
                pass

    def log(self, step: int, metrics: dict, prefix: str = "") -> None:
        record = {"step": int(step)}
        for k, v in metrics.items():
            name = f"{prefix}{k}"
            v = float(v)
            record[name] = v
            if self.tb:
                self.tb.add_scalar(name, v, step)
        self.jsonl.write(json.dumps(record) + "\n")
        self.jsonl.flush()

    def close(self):
        if self.tb:
            self.tb.close()
        self.jsonl.close()


@contextmanager
def timed(label: str, logger: Optional[logging.Logger] = None):
    t0 = time.perf_counter()
    yield
    msg = f"{label}: {time.perf_counter() - t0:.2f}s"
    (logger or get_logger()).info(msg)


@contextmanager
def time_limit(seconds: int):
    """SIGALRM-based hard wall-clock limit for host-side steps (e.g. external
    tool subprocess hangs). Raises TimeoutError."""
    import signal

    def handler(signum, frame):
        raise TimeoutError(f"exceeded {seconds}s time limit")

    old = signal.signal(signal.SIGALRM, handler)
    signal.alarm(seconds)
    try:
        yield
    finally:
        signal.alarm(0)
        signal.signal(signal.SIGALRM, old)


@contextmanager
def device_trace(log_dir: Optional[str]):
    """jax.profiler trace for TensorBoard's profile plugin (no-op if dir
    unset)."""
    if not log_dir:
        yield
        return
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
