"""Observability: git-diff snapshots and device profiling.

The reference logs ``git diff`` as a run artifact (reference
``utils/utils.py:99-105``) and ships ``torch-tb-profiler`` in requirements
without wiring it (reference ``requirements.txt:5``; SURVEY §5). Here
profiling is first-class: :func:`profile_trace` wraps a region in a
``jax.profiler`` trace usable with TensorBoard/XProf or Perfetto.
"""

from __future__ import annotations

import contextlib
import os
import subprocess
import tempfile
from typing import Optional

from ..tracking.store import default_store


def save_diff(fname: str = "git_diff.txt", run_id: Optional[str] = None):
    """Snapshot the working-tree diff into the active run's artifacts."""
    try:
        diff = subprocess.run(
            ["git", "diff"], capture_output=True, text=True, timeout=30,
        ).stdout
    except Exception:
        diff = ""
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, fname)
        with open(path, "w") as f:
            f.write(diff)
        try:
            default_store().log_artifact(path, run_id=run_id)
        except (RuntimeError, KeyError):
            pass


@contextlib.contextmanager
def profile_trace(logdir: Optional[str]):
    """Wrap a region in a ``jax.profiler`` trace when ``logdir`` is set."""
    if not logdir:
        yield
        return
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str):
    """Named sub-region inside a device trace."""
    import jax

    with jax.profiler.TraceAnnotation(name):
        yield


_SENTINEL = object()


class SectionTimer:
    """Accumulating wall-clock breakdown of a host loop.

    The eval/train loops interleave host work (loader waits, numpy
    assembly), async device dispatches, and blocking readbacks; a device
    profile shows none of the host side. ``SectionTimer`` attributes wall
    time to named sections with near-zero overhead::

        tm = SectionTimer()
        with tm("wait_batch"):
            batch = next(stream)
        ...
        print(tm.report())
    """

    def __init__(self):
        self.totals: dict = {}
        self.counts: dict = {}

    @contextlib.contextmanager
    def __call__(self, name: str):
        import time

        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def wrap(self, iterable, name: str):
        """Yield from ``iterable``, attributing each ``next()`` wait to
        ``name`` (e.g. time spent blocked on a prefetch producer)."""
        it = iter(iterable)
        while True:
            with self(name):
                item = next(it, _SENTINEL)
            if item is _SENTINEL:
                return
            yield item

    def report(self) -> str:
        total = sum(self.totals.values())
        lines = [f"section breakdown ({total:.2f}s timed):"]
        for name, t in sorted(self.totals.items(), key=lambda kv: -kv[1]):
            n = self.counts[name]
            lines.append(
                f"  {name:24s} {t:9.2f}s  ({t / max(n, 1) * 1e3:8.2f} ms "
                f"x {n})"
            )
        return "\n".join(lines)
