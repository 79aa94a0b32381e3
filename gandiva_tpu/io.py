"""Streaming batch IO: overlap host-side Arrow conversion with device compute.

The reference's deployment streams record batches through compiled kernels
(Make once / Evaluate many, gandiva.pyx:634-636) with the Java engine doing
IO on its own threads (SURVEY.md §3.5). Here the host-side work per batch —
dictionary encoding, validity-bitmap unpack (native C++ when available),
padding, host→device transfer — runs on a background thread a batch ahead of
the device, so conversion cost hides behind TPU execution.

``evaluate_stream`` drives any compiled plan (Projector / Filter /
FilterProject) over an iterable of pyarrow batches.
"""
from __future__ import annotations

import queue
import threading
from typing import Callable, Iterable, Iterator, Optional

from .batch import Batch, from_arrow


class BatchPrefetcher:
    """Iterator wrapper: converts upcoming pyarrow batches to device Batches
    on a worker thread, ``depth`` batches ahead."""

    _SENTINEL = object()

    def __init__(self, batches: Iterable, depth: int = 2,
                 pad_to: Optional[int] = None,
                 convert: Optional[Callable] = None):
        self._convert = convert or (lambda b: from_arrow(b, pad_to=pad_to))
        self._q: "queue.Queue" = queue.Queue(maxsize=max(1, depth))
        self._err: Optional[BaseException] = None
        self._thread = threading.Thread(
            target=self._worker, args=(iter(batches),), daemon=True)
        self._thread.start()

    def _worker(self, it):
        try:
            for b in it:
                self._q.put(self._convert(b))
        except BaseException as e:  # surfaced on the consumer side
            self._err = e
        finally:
            self._q.put(self._SENTINEL)

    def __iter__(self) -> Iterator[Batch]:
        while True:
            item = self._q.get()
            if item is self._SENTINEL:
                if self._err is not None:
                    raise self._err
                return
            yield item


def evaluate_stream(plan, batches: Iterable, depth: int = 2,
                    pad_to: Optional[int] = None, device_only: bool = False):
    """Evaluate a compiled plan over a stream of pyarrow record batches.

    Yields the plan's evaluate() result per batch (or evaluate_device()
    results when ``device_only`` — no host transfer of outputs, for
    engine-internal pipelines). Conversion runs one batch ahead on a
    worker thread; the device queue keeps the TPU busy.
    """
    for dev_batch in BatchPrefetcher(batches, depth=depth, pad_to=pad_to):
        if device_only:
            yield plan.evaluate_device(dev_batch)
        else:
            yield plan.evaluate(dev_batch)
