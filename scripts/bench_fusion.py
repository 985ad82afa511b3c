"""Isolate the composite-function slowdown: gather/scatter fused with their
index-producing elementwise code vs separated by optimization_barrier."""

import time

import numpy as np

import jax
import jax.numpy as jnp

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


def bilinear_raw(img_flat, loc, barrier: bool):
    h, w = RES
    y, x = loc[..., 0], loc[..., 1]
    y0, x0 = jnp.floor(y), jnp.floor(x)
    taps = []
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
        wv = ww * valid.astype(jnp.float32)
        if barrier:
            flat, wv = jax.lax.optimization_barrier((flat, wv))
        vals = jnp.take_along_axis(img_flat, flat, axis=1)
        taps.append(vals * wv)
    return sum(taps)


def scatter_ctx(loc, vals, barrier: bool):
    """get_interpolation-style 4-tap splat computed from float locations."""
    h, w = RES
    y, x = loc[..., 0:1], loc[..., 1:2]
    ty, lx = jnp.floor(y), jnp.floor(x)
    idx_yx = jnp.concatenate(
        [
            jnp.concatenate([ty, lx], -1),
            jnp.concatenate([ty, lx + 1], -1),
            jnp.concatenate([ty + 1, lx], -1),
            jnp.concatenate([ty + 1, lx + 1], -1),
        ],
        axis=1,
    )
    tiled = jnp.concatenate([loc] * 4, axis=1)
    wgt = jnp.prod(jnp.maximum(0.0, 1 - jnp.abs(tiled - idx_yx)), -1, keepdims=True)
    inside = (
        (idx_yx[..., 0:1] >= 0) & (idx_yx[..., 0:1] < h)
        & (idx_yx[..., 1:2] >= 0) & (idx_yx[..., 1:2] < w)
    ).astype(jnp.float32)
    idx_yx = idx_yx * inside
    wgt = wgt * inside
    flat = (idx_yx[..., 0] * w + idx_yx[..., 1]).astype(jnp.int32)
    v4 = jnp.concatenate([vals] * 4, axis=1) * wgt
    w3 = jnp.concatenate([wgt, v4, v4], axis=-1)
    if barrier:
        flat, w3 = jax.lax.optimization_barrier((flat, w3))
    buf = jnp.zeros((loc.shape[0], HW, 3), jnp.float32)
    return buf.at[jnp.arange(loc.shape[0])[:, None], flat].add(w3, mode="drop")


def main():
    rng = np.random.default_rng(0)
    print("device:", jax.devices()[0])
    img = jnp.asarray(rng.random((1, HW)), jnp.float32)
    loc = jnp.asarray(
        np.stack(
            [rng.uniform(0, RES[0] - 1, (1, 307200)),
             rng.uniform(0, RES[1] - 1, (1, 307200))], -1,
        ),
        jnp.float32,
    )
    for barrier in [False, True]:
        t = timeit(jax.jit(lambda i, l: bilinear_raw(i, l, barrier)), img, loc)
        print(f"bilinear composite barrier={barrier}: {t*1e3:.2f} ms")

    vals = jnp.asarray(rng.random((1, 307200, 1)), jnp.float32)
    for barrier in [False, True]:
        t = timeit(jax.jit(lambda l, v: scatter_ctx(l, v, barrier)), loc, vals)
        print(f"splat composite barrier={barrier}: {t*1e3:.2f} ms")


if __name__ == "__main__":
    main()
