"""Bisect: why is get_event_flow slow in the eval composite but raw
bilinear fast? Suspect: NHWC channel slice fused into the gather."""

import time

import numpy as np

import jax
import jax.numpy as jnp

from taming_event_flow_tpu.ops import get_event_flow
from taming_event_flow_tpu.ops.warp import bilinear_sample

RES = (480, 640)
HW = RES[0] * RES[1]


def timeit(fn, *args, iters=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    rng = np.random.default_rng(0)
    print("device:", jax.devices()[0])
    fmap = jnp.asarray(rng.random((1, RES[0], RES[1], 2)), jnp.float32)
    loc = jnp.asarray(
        np.stack(
            [rng.uniform(0, RES[0] - 1, (1, 307200)),
             rng.uniform(0, RES[1] - 1, (1, 307200))], -1,
        ),
        jnp.float32,
    )

    t = timeit(jax.jit(get_event_flow), fmap, loc)
    print(f"get_event_flow (x+y channels): {t*1e3:.2f} ms")

    t = timeit(jax.jit(lambda f, l: bilinear_sample(f[..., 0], l)), fmap, loc)
    print(f"bilinear_sample on channel slice: {t*1e3:.2f} ms")

    img = jnp.array(np.asarray(fmap)[..., 0])
    t = timeit(jax.jit(bilinear_sample), img, loc)
    print(f"bilinear_sample on contiguous map: {t*1e3:.2f} ms")

    def with_barrier(f, l):
        ch = jax.lax.optimization_barrier(f[..., 0])
        return bilinear_sample(ch, l)

    t = timeit(jax.jit(with_barrier), fmap, loc)
    print(f"bilinear_sample slice+barrier: {t*1e3:.2f} ms")

    # gather both channels at once: [B, HW, 2] table, row gather of 2-wide
    def both(f, l):
        h, w = RES
        y, x = l[..., 0], l[..., 1]
        y0, x0 = jnp.floor(y), jnp.floor(x)
        fm = f.reshape(1, HW, 2)
        out = 0.0
        for yy, xx, ww in [
            (y0, x0, (1 - (y - y0)) * (1 - (x - x0))),
            (y0, x0 + 1, (1 - (y - y0)) * (x - x0)),
            (y0 + 1, x0, (y - y0) * (1 - (x - x0))),
            (y0 + 1, x0 + 1, (y - y0) * (x - x0)),
        ]:
            valid = (yy >= 0) & (yy <= h - 1) & (xx >= 0) & (xx <= w - 1)
            yi = jnp.clip(yy, 0, h - 1).astype(jnp.int32)
            xi = jnp.clip(xx, 0, w - 1).astype(jnp.int32)
            flat = yi * w + xi
            vals = jnp.take_along_axis(
                fm, flat[..., None], axis=1
            )  # [B, N, 2]
            out = out + vals * (ww * valid.astype(jnp.float32))[..., None]
        return out

    t = timeit(jax.jit(both), fmap, loc)
    print(f"2-channel tap gather: {t*1e3:.2f} ms")


if __name__ == "__main__":
    main()
