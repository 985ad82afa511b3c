"""Is TPU scatter-add runtime data-dependent? Same program, different index
distributions."""

import time

import numpy as np

import jax
import jax.numpy as jnp

RES = (480, 640)
HW = RES[0] * RES[1]
M = 4 * HW


def timeit(fn, *args, iters=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def splat(idx, w3):
    buf = jnp.zeros((1, HW, 3), jnp.float32)
    return buf.at[jnp.arange(1)[:, None], idx].add(w3, mode="drop")


def main():
    rng = np.random.default_rng(0)
    print("device:", jax.devices()[0])
    w3 = jnp.asarray(rng.random((1, M, 3)), jnp.float32)
    f = jax.jit(splat)

    cases = {
        "uniform random": rng.integers(0, HW, M),
        "near-identity x4": np.concatenate(
            [np.arange(HW)] * 4
        ) + rng.integers(0, 2, M),
        "identity x4 interleaved": np.repeat(np.arange(HW), 4),
        "all-same-index": np.zeros(M, np.int64),
        "sorted unique-ish": np.sort(rng.integers(0, HW, M)),
    }
    for name, idx in cases.items():
        idx = jnp.asarray(np.clip(idx, 0, HW - 1)[None], jnp.int32)
        t = timeit(f, idx, w3)
        print(f"{name}: {t*1e3:.2f} ms")


if __name__ == "__main__":
    main()
