"""Bisect forward_prop_flow_once: which piece costs 50 ms/map?"""

import time

import numpy as np

import jax
import jax.numpy as jnp

from taming_event_flow_tpu.metrics.validation import (
    forward_prop_flow_once,
    _grid,
    _purge,
)
from taming_event_flow_tpu.ops import get_interpolation

RES = (480, 640)
HW = RES[0] * RES[1]


def timeit(fn, *args, iters=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def core(flow_at, grid, dt=1.0):
    """Flat-in / flat-out core: warp grid, purge, splat, normalize."""
    b = flow_at.shape[0]
    warped = grid + dt * flow_at
    ones = jnp.ones((b, HW, 1), jnp.float32)
    warped, mask = _purge(warped, ones, RES)
    idx, w = get_interpolation(warped, RES)
    mask4 = jnp.concatenate([mask] * 4, axis=1)
    flow4 = jnp.concatenate([flow_at] * 4, axis=1)
    w = w * mask4
    w3 = jnp.concatenate([w, w * flow4[..., 0:1], w * flow4[..., 1:2]], -1)
    buf = jnp.zeros((b, HW, 3), jnp.float32)
    buf = buf.at[jnp.arange(b)[:, None], idx].add(w3, mode="drop")
    wsum = buf[..., 0:1]
    return jnp.concatenate(
        [buf[..., 2:3] / (wsum + 1e-9), buf[..., 1:2] / (wsum + 1e-9)], -1
    )


def main():
    rng = np.random.default_rng(0)
    print("device:", jax.devices()[0])

    fmap = jnp.asarray(rng.normal(size=(1, RES[0], RES[1], 2)), jnp.float32)
    flow_at_flat = jnp.asarray(
        rng.normal(size=(1, HW, 2)), jnp.float32
    )
    grid_arg = jnp.asarray(np.asarray(_grid(RES)), jnp.float32)

    t = timeit(jax.jit(lambda m: forward_prop_flow_once(m, RES)), fmap)
    print(f"A current fpo ([1,480,640,2] in/out): {t*1e3:.2f} ms")

    t = timeit(jax.jit(lambda fa, g: core(fa, g)), flow_at_flat, grid_arg)
    print(f"B flat core (flat args): {t*1e3:.2f} ms")

    def c_variant(m, g):
        fm = m.reshape(1, HW, 2)
        flow_at = jnp.stack([fm[..., 1], fm[..., 0]], axis=-1)
        return core(flow_at, g)

    t = timeit(jax.jit(c_variant), fmap, grid_arg)
    print(f"C map-in flat-out: {t*1e3:.2f} ms")

    def d_variant(m, g):
        out = c_variant(m, g)
        return out.reshape(1, RES[0], RES[1], 2)

    t = timeit(jax.jit(d_variant), fmap, grid_arg)
    print(f"D map-in map-out: {t*1e3:.2f} ms")

    def e_variant(m):
        fm = m.reshape(1, HW, 2)
        flow_at = jnp.stack([fm[..., 1], fm[..., 0]], axis=-1)
        return core(flow_at, _grid(RES))
    t = timeit(jax.jit(e_variant), fmap)
    print(f"E map-in flat-out, iota grid inside: {t*1e3:.2f} ms")

    # vmap over 10 maps of the best flat variant
    maps10 = jnp.broadcast_to(fmap, (10, 1, RES[0], RES[1], 2))
    t = timeit(jax.jit(lambda ms, g: jax.vmap(
        lambda m: d_variant(m, g))(ms)), maps10, grid_arg)
    print(f"F vmap10 of D: {t*1e3:.2f} ms")


if __name__ == "__main__":
    main()
