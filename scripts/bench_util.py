"""Shared honest-timing helper for device benchmarks.

On this remote-TPU (axon) stack, ``jax.block_until_ready`` returns when the
buffer is *dispatched*, not when the device finishes (verified with a
profiler trace: a 49 ms device fusion measured "0.02 ms" through
block_until_ready). The only reliable sync is a host readback, which must
wait for the producing program — and, since the device executes its queue in
order, for everything enqueued before it.
"""

import time

import jax
import numpy as np


def sync(out):
    """Force true device completion of ``out`` (and all prior work)."""
    leaves = [l for l in jax.tree.leaves(out) if hasattr(l, "dtype")]
    x = leaves[0]
    np.asarray(jax.device_get(x.ravel()[:1]))


def timeit(fn, *args, iters: int = 20):
    out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / iters
