"""TensorBoard mirror for training scalars.

The reference logs the epoch loss to a ``SummaryWriter`` alongside MLflow
(reference ``train_flow.py:37,90``) and replays the prior run's loss history
into TensorBoard on warm start (reference ``utils/utils.py:33-44``). This
module mirrors that capability against the file-store run layout: events are
written under ``<run>/artifacts/tensorboard/`` so each run's TB data travels
with its tracked artifacts (``tensorboard --logdir <store>/<exp>`` browses
every run).

TensorBoard is optional — when no writer backend is importable the mirror
degrades to a no-op and training proceeds unaffected.
"""

from __future__ import annotations

from typing import Optional

from .store import default_store


def _writer_cls():
    try:
        from torch.utils.tensorboard import SummaryWriter

        return SummaryWriter
    except Exception:
        try:
            from tensorboardX import SummaryWriter

            return SummaryWriter
        except Exception:
            return None


class TensorBoardMirror:
    """Scalar mirror bound to a tracked run (no-op without tensorboard)."""

    def __init__(self, run_id: str, logdir: Optional[str] = None):
        cls = _writer_cls()
        if logdir is None:
            logdir = default_store().artifact_dir(run_id, "tensorboard")
        self._writer = cls(log_dir=logdir) if cls is not None else None

    @property
    def enabled(self) -> bool:
        return self._writer is not None

    def add_scalar(self, tag: str, value: float, step: int):
        if self._writer is not None:
            self._writer.add_scalar(tag, value, step)

    def replay(self, run_id: str, key: str = "loss", tag: str = "loss"):
        """Replay a prior run's metric history (warm-start continuity,
        reference ``utils/utils.py:33-44``)."""
        if self._writer is None:
            return 0
        n = 0
        for _, value, step in default_store().read_metric(run_id, key):
            self._writer.add_scalar(tag, value, step)
            n += 1
        return n

    def flush(self):
        if self._writer is not None:
            self._writer.flush()

    def close(self):
        if self._writer is not None:
            self._writer.close()
            self._writer = None
