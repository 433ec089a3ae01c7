"""Dynamic micro-batching for serving: coalesce concurrent requests into one
device call.

The serving profile (docs/DESIGN.md §7) shows a fixed ~43 ms per dispatch
(guidance forward + host round trip) on top of the per-image scan cost —
single-image requests therefore waste most of the chip. `MicroBatcher` lets
many threads call ``predict`` concurrently; a collector thread coalesces
whatever arrives within ``max_wait_ms`` (up to ``max_batch`` images), runs
ONE Predictor call, and scatters the per-instance outputs back.

Batch shapes are padded up to power-of-two buckets so XLA compiles a handful
of programs instead of one per arrival pattern (`Predictor.predict` caches
per shape). Padding rows are discarded before scattering.

The reference has no serving layer at all (SURVEY.md: research pipeline);
this is part of the TPU build's production surface alongside
``infer/serve.py`` and ``examples/serve_http.py``.
"""

from __future__ import annotations

import threading
from typing import Any, Callable, Dict, List, Optional

import numpy as np


def _bucket(n: int, max_batch: int) -> int:
    b = 1
    while b < n:
        b *= 2
    return min(b, max_batch)


class MicroBatcher:
    """Thread-safe dynamic batching around a per-instance predict function.

    predict_fn: (images (B, H, W, 3)) -> dict of arrays with leading axis B.
    """

    def __init__(
        self,
        predict_fn: Callable[[np.ndarray], Dict[str, np.ndarray]],
        max_batch: int = 70,
        max_wait_ms: float = 10.0,
    ):
        if max_batch < 1:
            raise ValueError("max_batch must be >= 1")
        self._fn = predict_fn
        self.max_batch = max_batch
        self.max_wait = max_wait_ms / 1e3
        self._lock = threading.Lock()
        self._nonempty = threading.Condition(self._lock)
        self._queue: List[dict] = []
        self._closed = False
        self._worker = threading.Thread(target=self._loop, daemon=True)
        self._worker.start()
        # observability: how well coalescing works
        self.calls = 0
        self.requests = 0
        self.images = 0

    @staticmethod
    def bucket_sizes(max_batch: int) -> List[int]:
        """Every batch shape the batcher can dispatch at this cap — the
        exact ``batch_sizes`` an AOT bundle (Predictor.export_serving)
        needs to sit behind a MicroBatcher: powers of two up to the cap,
        plus the (possibly non-power-of-two) cap itself."""
        return sorted({_bucket(n, max_batch) for n in range(1, max_batch + 1)})

    # ------------------------------------------------------------- client

    def predict(self, images: np.ndarray) -> Dict[str, np.ndarray]:
        """Blocks until the coalesced batch containing these images runs.
        Safe to call from many threads; each caller gets only its rows."""
        images = np.asarray(images, np.float32)
        if images.ndim != 4:
            raise ValueError(f"expected (B, H, W, 3) images, got {images.shape}")
        if len(images) > self.max_batch:
            # split oversized requests into max_batch chunks sequentially
            outs = [self.predict(images[i : i + self.max_batch])
                    for i in range(0, len(images), self.max_batch)]
            return {k: np.concatenate([o[k] for o in outs]) for k in outs[0]}
        item = {"images": images, "event": threading.Event(), "result": None}
        with self._nonempty:
            if self._closed:
                raise RuntimeError("MicroBatcher is closed")
            self._queue.append(item)
            self._nonempty.notify()
        item["event"].wait()
        if isinstance(item["result"], BaseException):
            raise item["result"]
        return item["result"]

    def close(self) -> None:
        with self._nonempty:
            self._closed = True
            self._nonempty.notify()
        self._worker.join(timeout=5)

    def stats(self) -> Dict[str, float]:
        return {
            "device_calls": self.calls,
            "requests": self.requests,
            "images": self.images,
            "avg_requests_per_call": self.requests / max(self.calls, 1),
        }

    # ------------------------------------------------------------- worker

    def _take_batch(self) -> Optional[List[dict]]:
        """Wait for the first request, then linger up to max_wait for
        co-riders (or until max_batch images are queued)."""
        import time

        with self._nonempty:
            while not self._queue and not self._closed:
                self._nonempty.wait()
            if self._closed and not self._queue:
                return None
            deadline = time.time() + self.max_wait
            while True:
                n = sum(len(i["images"]) for i in self._queue)
                remaining = deadline - time.time()
                if n >= self.max_batch or remaining <= 0 or self._closed:
                    break
                self._nonempty.wait(timeout=remaining)
            batch: List[dict] = []
            total = 0
            while self._queue and total + len(self._queue[0]["images"]) <= self.max_batch:
                item = self._queue.pop(0)
                total += len(item["images"])
                batch.append(item)
            if not batch:  # head request alone exceeds max_batch — impossible
                batch.append(self._queue.pop(0))  # (predict() splits first)
            return batch

    def _loop(self) -> None:
        while True:
            batch = self._take_batch()
            if batch is None:
                return
            try:
                images = np.concatenate([i["images"] for i in batch])
                n = len(images)
                b = _bucket(n, self.max_batch)
                if b > n:  # pad to the bucket so compiled shapes stay few
                    pad = np.broadcast_to(images[-1:], (b - n,) + images.shape[1:])
                    images = np.concatenate([images, pad])
                out = self._fn(images)
                self.calls += 1
                self.requests += len(batch)
                self.images += n
                start = 0
                for item in batch:
                    k = len(item["images"])
                    item["result"] = {key: np.asarray(v[start : start + k])
                                      for key, v in out.items()}
                    start += k
                    item["event"].set()
            except BaseException as e:  # surface errors to ALL waiting callers
                for item in batch:
                    if item["result"] is None:
                        item["result"] = e
                        item["event"].set()
