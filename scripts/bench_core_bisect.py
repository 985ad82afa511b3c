"""Delete pieces of the slow splat 'core' until it becomes fast."""

import time

import numpy as np

import jax
import jax.numpy as jnp

from taming_event_flow_tpu.metrics.validation import _purge
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


def splat(idx, w3):
    buf = jnp.zeros((1, HW, 3), jnp.float32)
    return buf.at[jnp.arange(1)[:, None], idx].add(w3, mode="drop")


def main():
    rng = np.random.default_rng(0)
    print("device:", jax.devices()[0])
    flow_at = jnp.asarray(rng.normal(size=(1, HW, 2)), jnp.float32)
    grid = jnp.asarray(
        np.stack(
            [np.repeat(np.arange(RES[0]), RES[1]),
             np.tile(np.arange(RES[1]), RES[0])], -1,
        )[None].astype(np.float32)
    )
    loc_arg = jnp.asarray(
        np.stack([rng.uniform(0, RES[0] - 1, (1, HW)),
                  rng.uniform(0, RES[1] - 1, (1, HW))], -1), jnp.float32)

    def v1_full(fa, g):
        warped = g + fa
        ones = jnp.ones((1, HW, 1), jnp.float32)
        warped, mask = _purge(warped, ones, RES)
        idx, w = get_interpolation(warped, RES)
        mask4 = jnp.concatenate([mask] * 4, axis=1)
        flow4 = jnp.concatenate([fa] * 4, axis=1)
        w = w * mask4
        w3 = jnp.concatenate([w, w * flow4[..., 0:1], w * flow4[..., 1:2]], -1)
        return splat(idx, w3)

    def v2_loc_arg(l, fa):
        # same but warped positions given directly (no grid add)
        ones = jnp.ones((1, HW, 1), jnp.float32)
        warped, mask = _purge(l, ones, RES)
        idx, w = get_interpolation(warped, RES)
        mask4 = jnp.concatenate([mask] * 4, axis=1)
        flow4 = jnp.concatenate([fa] * 4, axis=1)
        w = w * mask4
        w3 = jnp.concatenate([w, w * flow4[..., 0:1], w * flow4[..., 1:2]], -1)
        return splat(idx, w3)

    def v3_no_purge(fa, g):
        warped = g + fa
        idx, w = get_interpolation(warped, RES)
        flow4 = jnp.concatenate([fa] * 4, axis=1)
        w3 = jnp.concatenate([w, w * flow4[..., 0:1], w * flow4[..., 1:2]], -1)
        return splat(idx, w3)

    def v4_no_scatter(fa, g):
        warped = g + fa
        ones = jnp.ones((1, HW, 1), jnp.float32)
        warped, mask = _purge(warped, ones, RES)
        idx, w = get_interpolation(warped, RES)
        mask4 = jnp.concatenate([mask] * 4, axis=1)
        flow4 = jnp.concatenate([fa] * 4, axis=1)
        w = w * mask4
        w3 = jnp.concatenate([w, w * flow4[..., 0:1], w * flow4[..., 1:2]], -1)
        return jnp.sum(w3) + jnp.sum(idx)

    def v5_scatter_w_only(fa, g):
        warped = g + fa
        idx, w = get_interpolation(warped, RES)
        w3 = jnp.concatenate([w, w, w], -1)
        return splat(idx, w3)

    def v6_interp_only(fa, g):
        warped = g + fa
        idx, w = get_interpolation(warped, RES)
        return jnp.sum(w) + jnp.sum(idx)

    for name, fn, args in [
        ("v1 full (slow baseline)", v1_full, (flow_at, grid)),
        ("v2 warped as arg", v2_loc_arg, (loc_arg, flow_at)),
        ("v3 no purge", v3_no_purge, (flow_at, grid)),
        ("v4 no scatter", v4_no_scatter, (flow_at, grid)),
        ("v5 scatter w only", v5_scatter_w_only, (flow_at, grid)),
        ("v6 interp only", v6_interp_only, (flow_at, grid)),
    ]:
        t = timeit(jax.jit(fn), *args)
        print(f"{name}: {t*1e3:.2f} ms")


if __name__ == "__main__":
    main()
