"""Observability: structured logging + scalar metrics + profiling hooks.

The reference uses python logging (stream + stdout.txt file) and TensorBoard
scalars that are effectively disabled in scripted runs (tb_logger=None under
--ni, main.py:224-243; SURVEY.md C22). Here:

* ``setup_logging`` — stream + file handler with the same uniform format;
* ``ScalarLogger`` — JSONL scalar stream (always on, greppable) with an
  optional TensorBoard mirror when the package exists;
* ``device_memory_stats`` — the TPU equivalent of the reference's CUDA
  memory printouts (classification_train_separately.py:701-703);
* ``trace`` — context manager around jax.profiler for on-demand traces
  (the subsystem the reference lacks, SURVEY.md section 5).
"""

from __future__ import annotations

import contextlib
import json
import logging
import os
import time
from typing import Dict, Optional

FORMAT = "%(levelname)s - %(filename)s - %(asctime)s - %(message)s"


def setup_logging(log_dir: Optional[str] = None, verbose: str = "INFO") -> logging.Logger:
    logger = logging.getLogger("ladine_tpu")
    logger.setLevel(getattr(logging, verbose.upper(), logging.INFO))
    logger.propagate = False  # avoid duplicate lines via the root logger
    logger.handlers.clear()
    sh = logging.StreamHandler()
    sh.setFormatter(logging.Formatter(FORMAT))
    logger.addHandler(sh)
    if log_dir:
        os.makedirs(log_dir, exist_ok=True)
        fh = logging.FileHandler(os.path.join(log_dir, "stdout.txt"))
        fh.setFormatter(logging.Formatter(FORMAT))
        logger.addHandler(fh)
    return logger


class ScalarLogger:
    """Append-only scalars.jsonl; mirrors to TensorBoard when available."""

    def __init__(self, log_dir: Optional[str], use_tensorboard: bool = True):
        self.log_dir = log_dir
        self._file = None
        self._tb = None
        if log_dir:
            os.makedirs(log_dir, exist_ok=True)
            self._file = open(os.path.join(log_dir, "scalars.jsonl"), "a")
            if use_tensorboard:
                try:
                    from torch.utils.tensorboard import SummaryWriter

                    self._tb = SummaryWriter(log_dir=os.path.join(log_dir, "tensorboard"))
                except Exception:
                    self._tb = None

    def add_scalar(self, tag: str, value: float, global_step: int) -> None:
        if self._file:
            self._file.write(
                json.dumps({"tag": tag, "value": float(value), "step": int(global_step), "ts": time.time()})
                + "\n"
            )
            self._file.flush()
        if self._tb:
            self._tb.add_scalar(tag, value, global_step)

    def close(self) -> None:
        if self._file:
            self._file.close()
        if self._tb:
            self._tb.close()


def device_memory_stats() -> Dict[str, float]:
    """Per-device memory stats in GiB (TPU equivalent of the reference's
    torch.cuda.memory_allocated printouts)."""
    import jax

    out = {}
    for d in jax.devices():
        try:
            stats = d.memory_stats() or {}
            out[str(d)] = {
                "bytes_in_use_gib": stats.get("bytes_in_use", 0) / 2**30,
                "peak_bytes_gib": stats.get("peak_bytes_in_use", 0) / 2**30,
            }
        except Exception:
            out[str(d)] = {}
    return out


@contextlib.contextmanager
def trace(log_dir: str, enabled: bool = True):
    """jax.profiler trace context — view with TensorBoard or xprof."""
    import jax

    if not enabled:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
