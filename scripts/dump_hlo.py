"""Dump optimized HLO for the fast (scatter_ctx) vs slow (fpo core) splat
programs and grep for serialization markers (while/sort/scatter variants)."""

import re

import numpy as np

import jax
import jax.numpy as jnp

from taming_event_flow_tpu.metrics.validation import _grid, _purge
from taming_event_flow_tpu.ops import get_interpolation

RES = (480, 640)
HW = RES[0] * RES[1]


def core(flow_at, grid):
    b = flow_at.shape[0]
    warped = grid + flow_at
    ones = jnp.ones((b, HW, 1), jnp.float32)
    warped, mask = _purge(warped, ones, RES)
    idx, w = get_interpolation(warped, RES)
    mask4 = jnp.concatenate([mask] * 4, axis=1)
    flow4 = jnp.concatenate([flow_at] * 4, axis=1)
    w = w * mask4
    w3 = jnp.concatenate([w, w * flow4[..., 0:1], w * flow4[..., 1:2]], -1)
    buf = jnp.zeros((b, HW, 3), jnp.float32)
    buf = buf.at[jnp.arange(b)[:, None], idx].add(w3, mode="drop")
    return buf


def ctx(loc, vals):
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
    wgt = jnp.prod(jnp.maximum(0.0, 1 - jnp.abs(tiled - idx_yx)), -1,
                   keepdims=True)
    inside = (
        (idx_yx[..., 0:1] >= 0) & (idx_yx[..., 0:1] < h)
        & (idx_yx[..., 1:2] >= 0) & (idx_yx[..., 1:2] < w)
    ).astype(jnp.float32)
    idx_yx = idx_yx * inside
    wgt = wgt * inside
    flat = (idx_yx[..., 0] * w + idx_yx[..., 1]).astype(jnp.int32)
    v4 = jnp.concatenate([vals] * 4, axis=1) * wgt
    w3 = jnp.concatenate([wgt, v4, v4], axis=-1)
    buf = jnp.zeros((loc.shape[0], HW, 3), jnp.float32)
    return buf.at[jnp.arange(loc.shape[0])[:, None], flat].add(
        w3, mode="drop"
    )


def summarize(name, compiled):
    txt = compiled.as_text()
    with open(f"/tmp/{name}.hlo", "w") as f:
        f.write(txt)
    ops = re.findall(r"= \S+ ([a-z\-]+)[(<.]", txt)
    from collections import Counter

    counts = Counter(ops)
    interesting = {
        k: v for k, v in counts.items()
        if k in ("while", "sort", "scatter", "gather", "all-reduce",
                 "dynamic-update-slice", "dynamic-slice", "reduce-window",
                 "select-and-scatter", "custom-call")
    }
    print(name, "op counts:", dict(counts.most_common(12)))
    print(name, "interesting:", interesting)
    m = re.search(r"scatter[^\n]*", txt)
    if m:
        print(name, "first scatter line:", m.group(0)[:300])


def main():
    rng = np.random.default_rng(0)
    flow_at = jnp.asarray(rng.normal(size=(1, HW, 2)), jnp.float32)
    grid = jnp.asarray(np.asarray(_grid(RES)), jnp.float32)
    loc = jnp.asarray(
        np.stack([rng.uniform(0, RES[0] - 1, (1, HW)),
                  rng.uniform(0, RES[1] - 1, (1, HW))], -1), jnp.float32)
    vals = jnp.asarray(rng.random((1, HW, 1)), jnp.float32)

    slow = jax.jit(core).lower(flow_at, grid).compile()
    summarize("slow_core", slow)
    fast = jax.jit(ctx).lower(loc, vals).compile()
    summarize("fast_ctx", fast)


if __name__ == "__main__":
    main()
