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


class WandbBackend:
    """Optional wandb-style experiment logger (reference:
    configs/logger/wandb.yaml). If the real ``wandb`` package is importable
    it logs through it (offline mode unless WANDB_API_KEY is set); otherwise
    it writes ``wandb/history.jsonl`` in wandb's history-row schema
    (``{"_step": n, "_timestamp": t, "_runtime": s, <metric>: v}``) plus a
    ``wandb-metadata.json`` — the files `wandb sync` / downstream tooling
    consume — so the logging surface exists without the dependency."""

    def __init__(self, log_dir: Path, run_config: Optional[dict] = None,
                 project: str = "packppi-tpu"):
        self._t0 = time.time()
        self._wandb = None
        try:
            import os

            import wandb  # type: ignore
            mode = "online" if os.environ.get("WANDB_API_KEY") else "offline"
            self._wandb = wandb.init(project=project, dir=str(log_dir),
                                     config=run_config or {}, mode=mode)
        except Exception:
            d = Path(log_dir) / "wandb"
            d.mkdir(parents=True, exist_ok=True)
            (d / "wandb-metadata.json").write_text(json.dumps(
                {"project": project, "startedAt": self._t0,
                 "config": run_config or {}}, default=str))
            self._hist = open(d / "history.jsonl", "a")

    def log(self, step: int, record: dict) -> None:
        if self._wandb is not None:
            self._wandb.log(record, step=step)
            return
        now = time.time()
        row = {"_step": int(step), "_timestamp": now,
               "_runtime": now - self._t0, **record}
        self._hist.write(json.dumps(row) + "\n")
        self._hist.flush()

    def close(self):
        if self._wandb is not None:
            self._wandb.finish()
        else:
            self._hist.close()


class MetricLogger:
    """Scalar metrics fan-out: metrics.jsonl always; TensorBoard and/or a
    wandb-style backend per ``backends`` (reference: configs/logger/ — the
    reference offers tensorboard/wandb/csv/mlflow Lightning loggers; here
    jsonl is the csv-equivalent and is always on)."""

    def __init__(self, log_dir: str, use_tensorboard: bool = True,
                 backends=("tensorboard",), run_config: Optional[dict] = None):
        self.log_dir = Path(log_dir)
        self.log_dir.mkdir(parents=True, exist_ok=True)
        self.jsonl = open(self.log_dir / "metrics.jsonl", "a")
        self.tb = None
        self.wandb = None
        backends = tuple(backends or ())
        if use_tensorboard and "tensorboard" in backends:
            try:
                from torch.utils.tensorboard import SummaryWriter
                self.tb = SummaryWriter(str(self.log_dir / "tb"))
            except Exception:
                pass
        if "wandb" in backends:
            self.wandb = WandbBackend(self.log_dir, run_config)

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
        if self.wandb:
            self.wandb.log(step, {k: v for k, v in record.items() if k != "step"})

    def close(self):
        if self.tb:
            self.tb.close()
        if self.wandb:
            self.wandb.close()
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
