"""Honest (readback-synced) re-measurement of every hot path.

Covers: train step, eval val-update + pieces, scatter/gather primitives at
train and eval scales, and MXU one-hot splat alternative — all in one TPU
session with the readback-sync timeit.
"""

import numpy as np

import jax
import jax.numpy as jnp

from bench_util import timeit

TRAIN_RES = (128, 128)
EVAL_RES = (480, 640)


def train_step_bench(rng):
    from taming_event_flow_tpu.models import RecEVFlowNet
    from taming_event_flow_tpu.objectives import LossConfig
    from taming_event_flow_tpu.training import build_optimizer, make_train_step
    from taming_event_flow_tpu.training.step import init_train_state

    res, passes, batch, n = TRAIN_RES, 10, 1, 8192
    model = RecEVFlowNet(num_bins=2, final_w_scale=0.01)
    cfg = LossConfig(res=res, passes_loss=passes)
    opt = build_optimizer({"name": "Adam", "lr": 1e-5}, clip_grad=100.0)
    state = init_train_state(model, opt, batch, res[0], res[1], 2)
    step = make_train_step(model, opt, cfg, "Iterative", 32.0, donate=False)

    ev = np.zeros((passes, batch, n, 4), np.float32)
    ev[..., 0] = rng.uniform(0, 1, (passes, batch, n))
    ev[..., 1] = rng.integers(0, res[0], (passes, batch, n))
    ev[..., 2] = rng.integers(0, res[1], (passes, batch, n))
    ev[..., 3] = rng.choice([-1.0, 1.0], (passes, batch, n))
    window = {
        "net_input": jnp.asarray(
            rng.normal(size=(passes, batch, res[0], res[1], 2)), jnp.float32
        ),
        "event_list": jnp.asarray(ev),
        "pol_mask": jnp.asarray(
            np.stack([(ev[..., 3] > 0), (ev[..., 3] < 0)], -1), jnp.float32
        ),
        "grad_mask": jnp.ones((passes, batch, n, 1), jnp.float32),
    }
    t = timeit(step, state, window, iters=10)
    print(f"TRAIN full step (128x128 P=10 N=8192): {t*1e3:.2f} ms")


def primitive_bench(rng):
    for res, n_pts, tag in [
        (TRAIN_RES, 4 * 10 * 8192, "train"),
        (EVAL_RES, 4 * 307200, "eval"),
    ]:
        hw = res[0] * res[1]
        idx = jnp.asarray(rng.integers(0, hw, (1, n_pts)), jnp.int32)
        w4 = jnp.asarray(rng.random((1, n_pts, 4)), jnp.float32)

        def scat(i, v):
            buf = jnp.zeros((1, hw, 4), jnp.float32)
            return buf.at[jnp.arange(1)[:, None], i].add(v, mode="drop")

        t = timeit(jax.jit(scat), idx, w4, iters=10)
        print(
            f"scatter[{tag}] {n_pts} pts -> {hw}x4: {t*1e3:.2f} ms "
            f"({n_pts/t/1e6:.0f} Mupd/s)"
        )

        table = jnp.asarray(rng.random((1, hw)), jnp.float32)
        f_nat = jax.jit(lambda tb, i: jnp.take_along_axis(tb, i, axis=1))
        t = timeit(f_nat, table, idx, iters=10)
        print(
            f"gather-native[{tag}]: {t*1e3:.2f} ms ({n_pts/t/1e6:.0f} Mpt/s)"
        )

        from taming_event_flow_tpu.ops.warp import gather_pixels

        f_rg = jax.jit(gather_pixels)
        t = timeit(f_rg, table, idx, iters=10)
        print(
            f"gather-ours[{tag}]: {t*1e3:.2f} ms ({n_pts/t/1e6:.0f} Mpt/s)"
        )

        from taming_event_flow_tpu.ops.mxu_lookup import gather_mxu, splat_mxu

        t = timeit(jax.jit(gather_mxu), table, idx, iters=10)
        print(
            f"gather-mxu[{tag}]: {t*1e3:.2f} ms ({n_pts/t/1e6:.0f} Mpt/s)"
        )
        t = timeit(jax.jit(lambda i, v: splat_mxu(i, v, hw)), idx, w4,
                   iters=10)
        print(
            f"splat-mxu[{tag}]: {t*1e3:.2f} ms ({n_pts/t/1e6:.0f} Mupd/s)"
        )
        g = jax.jit(jax.grad(
            lambda v, i: jnp.sum(splat_mxu(i, v, hw) ** 2), argnums=0))
        t = timeit(g, w4, idx, iters=10)
        print(f"splat-mxu-grad[{tag}]: {t*1e3:.2f} ms")

    # MXU one-hot splat alternative at train scale
    hw = TRAIN_RES[0] * TRAIN_RES[1]
    m = 4 * 10 * 8192
    idx = jnp.asarray(rng.integers(0, hw, (1, m)), jnp.int32)
    w4 = jnp.asarray(rng.random((1, m, 4)), jnp.float32)

    def onehot_splat(i, v):
        tile = 2048
        n_tiles = hw // tile

        def body(_, t):
            cols = t * tile + jax.lax.broadcasted_iota(
                jnp.int32, (1, tile), 1
            )
            oh = (i[0][:, None] == cols).astype(jnp.bfloat16)
            out = jnp.dot(
                v[0].astype(jnp.bfloat16).T, oh,
                preferred_element_type=jnp.float32,
            )
            return None, out

        _, tiles = jax.lax.scan(body, None, jnp.arange(n_tiles))
        return jnp.transpose(tiles, (0, 2, 1)).reshape(hw, 4)

    t = timeit(jax.jit(onehot_splat), idx, w4, iters=5)
    print(
        f"onehot-MXU splat[train] {m} pts: {t*1e3:.2f} ms "
        f"({m/t/1e6:.0f} Mupd/s)"
    )


def eval_bench(rng):
    from taming_event_flow_tpu.metrics import IterativeValidation, ValConfig
    from taming_event_flow_tpu.metrics.validation import (
        forward_prop_flow_once,
    )

    res, P, N = EVAL_RES, 10, 32768
    val = IterativeValidation(ValConfig(res=res, passes=P), 1, N)
    flow = jnp.asarray(rng.normal(size=(1, res[0], res[1], 2)), jnp.float32)
    ev = np.zeros((1, N, 4), np.float32)
    ev[..., 0] = rng.uniform(0, 1, (1, N))
    ev[..., 1] = rng.integers(0, res[0], (1, N))
    ev[..., 2] = rng.integers(0, res[1], (1, N))
    ev[..., 3] = rng.choice([-1.0, 1.0], (1, N))
    ev = jnp.asarray(ev)
    pol = jnp.asarray(
        np.stack([(np.asarray(ev)[..., 3] > 0),
                  (np.asarray(ev)[..., 3] < 0)], -1), jnp.float32)
    emask = jnp.ones((1, res[0], res[1], 1), jnp.float32)

    upd = jax.jit(val.update)
    t = timeit(upd, val.init(), flow, ev, pol, emask, iters=5)
    print(f"EVAL full val update (480x640 P=10 N=32768): {t*1e3:.2f} ms")

    f1 = jax.jit(lambda m: forward_prop_flow_once(m, res))
    t = timeit(f1, flow, iters=5)
    print(f"EVAL forward_prop_flow_once: {t*1e3:.2f} ms")


def main():
    rng = np.random.default_rng(0)
    print("device:", jax.devices()[0])
    primitive_bench(rng)
    train_step_bench(rng)
    eval_bench(rng)


if __name__ == "__main__":
    main()
