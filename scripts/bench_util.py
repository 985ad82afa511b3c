"""Shared honest-timing helper for device benchmarks.

On this remote-TPU (axon) stack, ``jax.block_until_ready`` returns when the
buffer is *dispatched*, not when the device finishes (verified with a
profiler trace: a 49 ms device fusion measured "0.02 ms" through
block_until_ready). The only reliable sync is a host readback, which must
wait for the producing program — and, since the device executes its queue in
order, for everything enqueued before it.
"""

import hashlib
import pathlib
import time

import jax
import numpy as np


def code_state_cache_dir(prefix: str, *extra_files: str) -> str:
    """Persistent-XLA-cache dir keyed on the COMPUTE-RELEVANT code state.

    Two code versions must never share serialized executables (CLAUDE.md;
    the round-4 stale-executable incident: a shared dir served a stale
    binary whose metadata cited deleted source files, silently timing the
    wrong program). Content-hashes the package sources, the CLI entry
    points, any ``extra_files`` the caller's programs depend on, and the
    jax/jaxlib versions — same recipe as ``bench.py._code_state_digest``.
    """
    import jaxlib

    root = pathlib.Path(__file__).resolve().parent.parent
    h = hashlib.sha256()
    h.update(f"jax={jax.__version__} jaxlib={jaxlib.__version__}".encode())
    files = sorted(root.glob("taming_event_flow_tpu/**/*.py"))
    files += [root / "train_flow.py", root / "eval_flow.py"]
    files += [pathlib.Path(f).resolve() for f in extra_files]
    for p in files:
        h.update(str(p).encode())
        h.update(p.read_bytes())
    return f"{prefix}_{h.hexdigest()[:12]}"


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


def synthetic_events(rng, shape, res):
    """Shared synthetic event factory: ``[..., N, 4]`` (ts, y, x, p) +
    ``[..., N, 2]`` polarity mask (the layout every bench script needs)."""
    import jax.numpy as jnp

    ev = np.zeros(shape + (4,), np.float32)
    ev[..., 0] = rng.uniform(0, 1, shape)
    ev[..., 1] = rng.integers(0, res[0], shape)
    ev[..., 2] = rng.integers(0, res[1], shape)
    ev[..., 3] = rng.choice([-1.0, 1.0], shape)
    pol = np.stack([(ev[..., 3] > 0), (ev[..., 3] < 0)], -1)
    return jnp.asarray(ev), jnp.asarray(pol, jnp.float32)


def synthetic_window(rng, passes, batch, n, res):
    """Pass-stacked training window dict (net_input + events + masks)."""
    import jax.numpy as jnp

    ev, pol = synthetic_events(rng, (passes, batch, n), res)
    return {
        "net_input": jnp.asarray(
            rng.normal(size=(passes, batch, res[0], res[1], 2)), np.float32
        ),
        "event_list": ev,
        "pol_mask": pol,
        "grad_mask": jnp.ones((passes, batch, n, 1), np.float32),
    }
