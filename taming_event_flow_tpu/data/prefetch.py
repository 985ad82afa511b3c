"""Host-side pipeline: background window production.

The reference trains strictly synchronously — the torch DataLoader is forced
to ``num_workers: 0`` because the dataset object carries mutable cross-
iteration state (reference ``configs/parser.py:95,98``), so every window's
HDF5 decode + rectification + augmentation + encoding serializes with the
optimizer step. Here the whole *stateful stream* (one producer thread owns
the loader exclusively) runs ahead of the device: the training loop consumes
fully-assembled windows from a bounded queue while the TPU crunches the
previous one. numpy/h5py/cv2 release the GIL during their heavy parts, so
production genuinely overlaps device wait time.

The producer communicates through ordered events, preserving the streaming
protocol exactly (lane resets BEFORE the windows that follow them, epoch
boundaries between windows).
"""

from __future__ import annotations

import queue
import threading
from typing import Iterable, Iterator


class Prefetcher:
    """Run ``iterable`` in a daemon thread, ``depth`` items ahead.

    Exceptions raised by the producer re-raise in the consumer at the point
    of ``next()``. Iteration order is preserved exactly.
    """

    _END = object()

    def __init__(self, iterable: Iterable, depth: int = 3):
        self._queue: queue.Queue = queue.Queue(maxsize=depth)
        self._iterable = iterable
        self._closed = False
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def _run(self):
        try:
            for item in self._iterable:
                self._queue.put(item)
                if self._closed:
                    return
        except BaseException as e:  # noqa: BLE001 — re-raised consumer-side
            self._queue.put(e)
        # always terminate the stream so a consumer that keeps iterating
        # after an error (or races close()) never blocks on a dead producer
        self._queue.put(self._END)

    def close(self):
        """Release the producer thread (it may be blocked on the bounded
        queue holding loader/file state). Safe to call more than once."""
        self._closed = True
        while self._thread.is_alive():
            try:
                self._queue.get_nowait()
            except queue.Empty:
                self._thread.join(timeout=0.05)

    def __iter__(self) -> Iterator:
        while True:
            item = self._queue.get()
            if item is self._END:
                return
            if isinstance(item, BaseException):
                raise item
            yield item
