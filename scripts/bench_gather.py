"""Microbenchmark: 1-D gather strategies on TPU for large pixel tables.

The eval path's bilinear samples gather from a 307k-entry (480x640) table.
Variants:
  v1 native    jnp.take_along_axis on [B, T]
  v2 row128    gather 128-lane rows + one-hot lane select (current)
  v3 take0     jnp.take(axis=0) on [R, 128] (batch folded)
  v4 tile8x128 gather (8,128) tiles + sublane & lane one-hots
  v5 row128bf  row gather with a bf16 table
"""

import time

import numpy as np

import jax
import jax.numpy as jnp

LANE = 128


def timeit(fn, *args, iters=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def v1_native(table, idx):
    return jnp.take_along_axis(table, idx, axis=1)


def v2_row128(table, idx):
    b, t = table.shape
    rows = -(-t // LANE)
    tab = jnp.pad(table, ((0, 0), (0, rows * LANE - t))).reshape(b, rows, LANE)
    row, lane = idx // LANE, idx % LANE
    g = jnp.take_along_axis(tab, row[:, :, None], axis=1)
    onehot = (
        lane[:, :, None]
        == jax.lax.broadcasted_iota(jnp.int32, (1, 1, LANE), 2)
    ).astype(table.dtype)
    return jnp.sum(g * onehot, axis=-1)


def v3_take0(table, idx):
    b, t = table.shape
    rows = -(-t // LANE)
    tab = jnp.pad(table, ((0, 0), (0, rows * LANE - t))).reshape(
        b * rows, LANE
    )
    row = idx // LANE + (jnp.arange(b)[:, None] * rows)
    lane = idx % LANE
    g = jnp.take(tab, row.reshape(-1), axis=0).reshape(b, -1, LANE)
    onehot = (
        lane[:, :, None]
        == jax.lax.broadcasted_iota(jnp.int32, (1, 1, LANE), 2)
    ).astype(table.dtype)
    return jnp.sum(g * onehot, axis=-1)


def v4_tile(table, idx):
    b, t = table.shape
    tile = 8 * LANE
    rows = -(-t // tile)
    tab = jnp.pad(table, ((0, 0), (0, rows * tile - t))).reshape(
        b, rows, 8, LANE
    )
    row = idx // tile
    sub = (idx % tile) // LANE
    lane = idx % LANE
    g = jnp.take_along_axis(
        tab, row[:, :, None, None], axis=1
    )  # [B, N, 8, 128]
    oh_sub = (
        sub[:, :, None]
        == jax.lax.broadcasted_iota(jnp.int32, (1, 1, 8), 2)
    ).astype(table.dtype)
    g = jnp.einsum("bnsl,bns->bnl", g, oh_sub)
    oh_lane = (
        lane[:, :, None]
        == jax.lax.broadcasted_iota(jnp.int32, (1, 1, LANE), 2)
    ).astype(table.dtype)
    return jnp.sum(g * oh_lane, axis=-1)


def v5_row128_bf16(table, idx):
    return v2_row128(table.astype(jnp.bfloat16), idx).astype(jnp.float32)


def main():
    rng = np.random.default_rng(0)
    print("device:", jax.devices()[0])
    for t, m in [(480 * 640, 327_680), (128 * 128, 327_680),
                 (480 * 640, 1_310_720)]:
        table = jnp.asarray(rng.random((1, t)), jnp.float32)
        idx = jnp.asarray(rng.integers(0, t, (1, m)), jnp.int32)
        line = [f"T={t} M={m}:"]
        for name, fn in [("native", v1_native), ("row128", v2_row128),
                         ("take0", v3_take0), ("tile8x128", v4_tile),
                         ("row128bf", v5_row128_bf16)]:
            try:
                dt = timeit(jax.jit(fn), table, idx)
                line.append(f"{name} {dt*1e3:.2f}ms ({m/dt/1e6:.0f}Mpt/s)")
            except Exception as e:  # pragma: no cover
                line.append(f"{name} FAIL({type(e).__name__})")
        print(" | ".join(line))


def bench_scatters():
    """Scatter-add variants: width and index-layout sensitivity."""
    rng = np.random.default_rng(0)
    hw = 480 * 640
    m = 1_228_800  # 4 taps x 307k grid points (forward_prop shape)

    idx_rand = jnp.asarray(rng.integers(0, hw, (1, m)), jnp.int32)
    # near-sorted indices like forward_prop (4 nearly-identity quarters)
    base = np.arange(hw, dtype=np.int64)
    q = np.clip(base + rng.integers(-640, 640, hw), 0, hw - 1)
    idx_sorted = jnp.asarray(
        np.concatenate([q, q + 1, q, q + 1]).clip(0, hw - 1)[None, :m],
        jnp.int32,
    )

    for width in [1, 2, 3, 4, 8]:
        w = jnp.asarray(rng.random((1, m, width)), jnp.float32)

        def scat(i, v, width=width):
            buf = jnp.zeros((1, hw, width), jnp.float32)
            return buf.at[jnp.arange(1)[:, None], i].add(v, mode="drop")

        t_r = timeit(jax.jit(scat), idx_rand, w)
        t_s = timeit(jax.jit(scat), idx_sorted, w)
        print(
            f"scatter width={width}: random {t_r*1e3:.2f}ms | "
            f"near-sorted {t_s*1e3:.2f}ms"
        )

    # batch-squeezed variant (no leading batch dim)
    w = jnp.asarray(rng.random((m, 4)), jnp.float32)

    def scat_nobatch(i, v):
        return jnp.zeros((hw, 4), jnp.float32).at[i[0]].add(v, mode="drop")

    t = timeit(jax.jit(scat_nobatch), idx_rand, w)
    print(f"scatter width=4 (no batch dim): {t*1e3:.2f}ms")


if __name__ == "__main__":
    main()
    bench_scatters()
