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
