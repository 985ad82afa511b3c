"""Ablate the DSEC-shape (480x640) eval pass: model fwd vs val-update parts.

All device arrays are passed as explicit jit ARGUMENTS (closed-over arrays
become HLO constants and distort timings badly — see bench_ablate history).
"""

import os
import sys
import time
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _sync(out):
    # block_until_ready returns at DISPATCH on the tunneled-TPU stack; a
    # one-element host readback is the true completion barrier (CLAUDE.md)
    leaves = [l for l in jax.tree.leaves(out) if hasattr(l, "dtype")]
    np.asarray(jax.device_get(leaves[0].ravel()[:1]))


def timeit(fn, *args, iters=10):
    out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / iters


def main():
    from taming_event_flow_tpu.models import RecEVFlowNet
    from taming_event_flow_tpu.metrics import IterativeValidation, ValConfig
    from taming_event_flow_tpu.metrics.validation import (
        forward_prop_flow_once,
    )
    from taming_event_flow_tpu.ops import get_event_flow

    res = (480, 640)
    passes, n = 10, 32768
    rng = np.random.default_rng(0)
    print("device:", jax.devices()[0])

    model = RecEVFlowNet(num_bins=2)
    carry = model.init_state(1, res[0], res[1])
    x = jnp.zeros((1, res[0], res[1], 2), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x, carry)["params"]

    fwd = jax.jit(
        lambda p, c, xx: model.apply({"params": p}, xx, c, train=False)
    )
    t = timeit(fwd, params, carry, x)
    print(f"model fwd 480x640 f32: {t*1e3:.2f} ms")

    # the DSEC submission path (configs/eval_dsec.yml): bf16 model forward
    bf16 = partial(jax.tree.map, lambda a: a.astype(jnp.bfloat16)
                   if a.dtype == jnp.float32 else a)
    fwd_bf16 = jax.jit(
        lambda p, c, xx: model.apply({"params": p}, xx, c, train=False)
    )
    t = timeit(fwd_bf16, bf16(params), bf16(carry), bf16(x))
    print(f"model fwd 480x640 bf16: {t*1e3:.2f} ms")

    # headless/submission validation config: no fw-prop maps, no bw re-warp
    val_sub = IterativeValidation(
        ValConfig(res=res, passes=passes, track_fw_prop=False,
                  track_bw=False), 1, n)
    vstate_sub = val_sub.init()

    val = IterativeValidation(ValConfig(res=res, passes=passes), 1, n)
    vstate = val.init()
    flow = jnp.asarray(rng.normal(size=(1, res[0], res[1], 2)), jnp.float32)
    ev = np.zeros((1, n, 4), np.float32)
    ev[..., 0] = rng.uniform(0, 1, (1, n))
    ev[..., 1] = rng.integers(0, res[0], (1, n))
    ev[..., 2] = rng.integers(0, res[1], (1, n))
    ev[..., 3] = rng.choice([-1.0, 1.0], (1, n))
    ev = jnp.asarray(ev)
    pol = jnp.asarray(
        np.stack([(np.asarray(ev)[..., 3] > 0),
                  (np.asarray(ev)[..., 3] < 0)], -1), jnp.float32)
    emask = jnp.ones((1, res[0], res[1], 1), jnp.float32)

    upd = jax.jit(val.update)
    t = timeit(upd, vstate, flow, ev, pol, emask)
    print(f"full val update: {t*1e3:.2f} ms")

    upd_sub = jax.jit(val_sub.update)
    t = timeit(upd_sub, vstate_sub, flow, ev, pol, emask)
    print(f"submission val update (no fw-prop/bw): {t*1e3:.2f} ms")

    # pieces
    f_prop1 = jax.jit(lambda m: forward_prop_flow_once(m, res))
    t = timeit(f_prop1, flow)
    print(f"forward_prop_flow_once (1 map): {t*1e3:.2f} ms")

    f_propP = jax.jit(
        lambda maps: jax.vmap(lambda m: forward_prop_flow_once(m, res))(maps)
    )
    maps = jnp.broadcast_to(flow, (passes, 1, res[0], res[1], 2))
    t = timeit(f_propP, maps)
    print(f"forward_prop_flow_once (vmap {passes} maps): {t*1e3:.2f} ms")

    fwl = jnp.asarray(rng.uniform(0, 479, (passes, 1, n, 2)), jnp.float32)

    def fw_gather(fl, floc):
        pp, bb, nn, _ = floc.shape
        lb = jnp.transpose(floc, (1, 0, 2, 3)).reshape(bb, pp * nn, 2)
        return get_event_flow(fl, lb)

    t = timeit(jax.jit(fw_gather), flow, fwl)
    print(f"fw gather ({passes * n} events): {t*1e3:.2f} ms")

    def bw_scan(fl_maps, loc0, pol0, ts0):
        def bw_step(carryv, tau):
            bl, bm, bts = carryv
            bflow = get_event_flow(fl_maps[tau], bl)
            tau_f = tau.astype(jnp.float32)
            nl = bl + (tau_f - bts) * bflow
            inside = (
                (nl[..., 0:1] >= 0) & (nl[..., 0:1] <= res[0] - 1.0)
                & (nl[..., 1:2] >= 0) & (nl[..., 1:2] <= res[1] - 1.0)
            ).astype(jnp.float32)
            return (nl * inside, bm * inside,
                    jnp.full_like(bts, tau_f)), None

        (bl, bm, _), _ = jax.lax.scan(
            bw_step, (loc0, pol0, ts0),
            jnp.arange(passes, dtype=jnp.int32), reverse=True,
        )
        return bl, bm

    ts0 = ev[..., 0:1]
    t = timeit(jax.jit(bw_scan), maps, ev[..., 1:3], pol, ts0)
    print(f"bw scan ({passes} steps x {n} events): {t*1e3:.2f} ms")

    # grid flow sample + accum part
    def accum(fl, indices):
        b = fl.shape[0]
        cur = get_event_flow(fl, indices.reshape(b, -1, 2))
        return cur

    grid = jnp.zeros((1, res[0], res[1], 2), jnp.float32)
    t = timeit(jax.jit(accum), flow, grid)
    print(f"grid flow sample (307k px): {t*1e3:.2f} ms")


if __name__ == "__main__":
    main()
