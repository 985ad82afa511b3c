"""Microbenchmark: IWE splat backends on the device.

Compares
  * ``scatter``: batched XLA scatter-add (current ops/warp.py path)
  * ``onehot``: MXU one-hot matmul accumulation (chunked comparisons)
for training-shaped (128x128) and eval-shaped (480x640) splats, fwd and
fwd+bwd (grad w.r.t. weights).

Run on the real TPU:  python scripts/bench_splat.py
"""

import time

import numpy as np

import jax
import jax.numpy as jnp


def timeit(fn, *args, iters=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def scatter_splat(idx, w4, hw):
    b = idx.shape[0]
    buf = jnp.zeros((b, hw, w4.shape[-1]), w4.dtype)
    return buf.at[jnp.arange(b)[:, None], idx].add(w4, mode="drop")


def onehot_splat(idx, w4, hw, tile=2048):
    """sum_e w[e] * onehot(idx[e]) via MXU matmuls over hw tiles."""
    b, m = idx.shape
    c = w4.shape[-1]
    n_tiles = (hw + tile - 1) // tile
    hw_pad = n_tiles * tile

    def per_batch(idx_b, w_b):
        def body(_, t):
            base = t * tile
            cols = base + jax.lax.broadcasted_iota(jnp.int32, (1, tile), 1)
            onehot = (idx_b[:, None] == cols).astype(w_b.dtype)  # [M, tile]
            out = jnp.dot(w_b.T, onehot, preferred_element_type=jnp.float32)
            return None, out  # [C, tile]

        _, tiles = jax.lax.scan(body, None, jnp.arange(n_tiles))
        # tiles: [n_tiles, C, tile] -> [hw_pad, C]
        return jnp.transpose(tiles, (0, 2, 1)).reshape(hw_pad, c)[:hw]

    return jax.vmap(per_batch)(idx, w4)


def main():
    rng = np.random.default_rng(0)
    print("device:", jax.devices()[0])
    for name, (hw_res, m) in {
        "train(128x128, 4x10x8192 pts)": ((128, 128), 4 * 10 * 8192),
        "eval(480x640, 4x200k pts)": ((480, 640), 4 * 200_000),
    }.items():
        hw = hw_res[0] * hw_res[1]
        idx = jnp.asarray(rng.integers(0, hw, (1, m)), jnp.int32)
        w4 = jnp.asarray(rng.random((1, m, 4)), jnp.float32)

        f_sc = jax.jit(lambda i, w: scatter_splat(i, w, hw))
        t_sc = timeit(f_sc, idx, w4)

        if hw <= 128 * 128:
            f_oh = jax.jit(lambda i, w: onehot_splat(i, w, hw))
            t_oh = timeit(f_oh, idx, w4)
        else:
            t_oh = float("nan")

        # gradient w.r.t. weights (the training path)
        g_sc = jax.jit(jax.grad(lambda w, i: scatter_splat(i, w, hw).sum()))
        tg_sc = timeit(g_sc, w4, idx)
        if hw <= 128 * 128:
            g_oh = jax.jit(jax.grad(lambda w, i: onehot_splat(i, w, hw).sum()))
            tg_oh = timeit(g_oh, w4, idx)
        else:
            tg_oh = float("nan")

        print(
            f"{name}: scatter {t_sc*1e3:.2f}ms (grad {tg_sc*1e3:.2f}) | "
            f"onehot {t_oh*1e3:.2f}ms (grad {tg_oh*1e3:.2f}) | "
            f"scatter {m/t_sc/1e6:.0f} Mpts/s"
        )


if __name__ == "__main__":
    main()
