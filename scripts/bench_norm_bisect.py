"""The scatter is fast; post-processing its output is not. Find which
normalization form is slow."""

import time

import numpy as np

import jax
import jax.numpy as jnp

from taming_event_flow_tpu.metrics.validation import (
    _purge,
    forward_prop_flow_once,
)
from taming_event_flow_tpu.ops import get_interpolation

RES = (480, 640)
HW = RES[0] * RES[1]


def timeit(fn, *args, iters=30):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def run_splat(fa, g):
    warped = g + fa
    ones = jnp.ones((1, HW, 1), jnp.float32)
    warped, mask = _purge(warped, ones, RES)
    idx, w = get_interpolation(warped, RES)
    mask4 = jnp.concatenate([mask] * 4, axis=1)
    flow4 = jnp.concatenate([fa] * 4, axis=1)
    w = w * mask4
    w3 = jnp.concatenate([w, w * flow4[..., 0:1], w * flow4[..., 1:2]], -1)
    buf = jnp.zeros((1, HW, 3), jnp.float32)
    return buf.at[jnp.arange(1)[:, None], idx].add(w3, mode="drop")


def main():
    rng = np.random.default_rng(0)
    print("device:", jax.devices()[0])
    fa = jnp.asarray(rng.normal(size=(1, HW, 2)), jnp.float32)
    g = jnp.asarray(
        np.stack(
            [np.repeat(np.arange(RES[0]), RES[1]),
             np.tile(np.arange(RES[1]), RES[0])], -1,
        )[None].astype(np.float32)
    )

    variants = {
        "raw buf": lambda fa, g: run_splat(fa, g),
        "divide keep [B,HW,3]": lambda fa, g: (
            lambda b: b / (b[..., 0:1] + 1e-9)
        )(run_splat(fa, g)),
        "slice+div+concat [B,HW,2]": lambda fa, g: (
            lambda b: jnp.concatenate(
                [b[..., 2:3] / (b[..., 0:1] + 1e-9),
                 b[..., 1:2] / (b[..., 0:1] + 1e-9)], -1,
            )
        )(run_splat(fa, g)),
        "reshape to map [B,H,W,2]": lambda fa, g: (
            lambda b: jnp.concatenate(
                [b[..., 2:3] / (b[..., 0:1] + 1e-9),
                 b[..., 1:2] / (b[..., 0:1] + 1e-9)], -1,
            ).reshape(1, RES[0], RES[1], 2)
        )(run_splat(fa, g)),
        "sum only": lambda fa, g: jnp.sum(run_splat(fa, g)),
        "real fpo": lambda fa_unused, g_unused: None,  # replaced below
    }
    fmap = jnp.asarray(rng.normal(size=(1, RES[0], RES[1], 2)), jnp.float32)
    for name, fn in variants.items():
        if name == "real fpo":
            t = timeit(
                jax.jit(lambda m: forward_prop_flow_once(m, RES)), fmap
            )
        else:
            t = timeit(jax.jit(fn), fa, g)
        print(f"{name}: {t*1e3:.2f} ms")


if __name__ == "__main__":
    main()
