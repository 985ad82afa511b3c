"""TPU benchmark: fused Pallas splat/gather vs XLA paths, plus the
end-to-end eval update (DSEC 480x640) and train step (128x128) under each
backend. One process, everything batched (TPU init is minutes)."""

import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

import numpy as np
import jax
import jax.numpy as jnp

from bench_util import timeit
from taming_event_flow_tpu.ops import (
    gather_values,
    splat_values,
    set_warp_backend,
)


def sync(x):
    leaves = [l for l in jax.tree.leaves(x) if hasattr(l, "dtype")]
    np.asarray(jax.device_get(leaves[0].ravel()[:1]))


def bench(fn, *args, iters=20):
    out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / iters


def kernel_microbench():
    rng = np.random.default_rng(0)
    print("== kernel microbench (DSEC 480x640) ==", flush=True)
    res = (480, 640)
    for m, c in [(32768, 1), (131072, 3), (307200, 3), (327680, 4)]:
        loc = jnp.asarray(
            np.stack([rng.uniform(0, res[0] - 1, (1, m)),
                      rng.uniform(0, res[1] - 1, (1, m))], -1), jnp.float32)
        vals = jnp.asarray(rng.normal(size=(1, m, c)), jnp.float32)
        maps = jnp.asarray(rng.normal(size=(1, res[0], res[1], c)), jnp.float32)

        for backend in ["xla", "pallas"]:
            set_warp_backend(backend)
            f_s = jax.jit(lambda l, v: splat_values(l, v, res))
            f_g = jax.jit(gather_values)
            ts = bench(f_s, loc, vals)
            tg = bench(f_g, maps, loc)
            print(f"M={m:7d} C={c} {backend:6s}: splat {ts*1e3:8.2f} ms "
                  f"({m*c/ts/1e6:8.1f} Mval/s)  gather {tg*1e3:8.2f} ms "
                  f"({m*c/tg/1e6:8.1f} Mval/s)", flush=True)
    set_warp_backend("auto")


def correctness():
    """On-TPU numerical equivalence pallas vs xla (fwd + grads).

    The interpret-mode tests cover semantics off-TPU; this guards the actual
    Mosaic lowering (f32 path via HIGHEST so diffs are roundoff-level)."""
    from taming_event_flow_tpu.ops.precision import set_matmul_precision

    print("== on-TPU correctness (pallas vs xla, HIGHEST) ==", flush=True)
    set_matmul_precision("highest")
    rng = np.random.default_rng(1)
    res = (200, 300)  # > 16384 px, non-multiple of the 128 tile
    m, c = 5000, 2
    loc = jnp.asarray(
        np.stack([rng.uniform(-2, res[0] + 1, (2, m)),
                  rng.uniform(-2, res[1] + 1, (2, m))], -1), jnp.float32)
    vals = jnp.asarray(rng.normal(size=(2, m, c)), jnp.float32)
    maps = jnp.asarray(rng.normal(size=(2, res[0], res[1], c)), jnp.float32)

    outs = {}
    for backend in ["xla", "pallas"]:
        set_warp_backend(backend)

        def f(l, v, mp):
            s = splat_values(l, v, res)
            g = gather_values(mp, l)
            return jnp.sum(s * s) + jnp.sum(g * g)

        val, grads = jax.jit(jax.value_and_grad(f, argnums=(0, 1, 2)))(
            loc, vals, maps)
        outs[backend] = (np.asarray(val), [np.asarray(g) for g in grads])
    dv = abs(outs["xla"][0] - outs["pallas"][0]) / (abs(outs["xla"][0]) + 1e-9)
    dg = max(
        np.max(np.abs(a - b)) / (np.max(np.abs(a)) + 1e-9)
        for a, b in zip(outs["xla"][1], outs["pallas"][1])
    )
    print(f"value rel diff {dv:.2e}   max grad rel diff {dg:.2e}", flush=True)
    assert dv < 1e-4 and dg < 1e-4, (dv, dg)
    set_matmul_precision("default")
    set_warp_backend("auto")
    print("correctness OK", flush=True)


def train_scale_microbench():
    """128x128 (single-tile) shapes the TBPTT step actually runs: forward
    AND value_and_grad of splat/gather under each backend."""
    rng = np.random.default_rng(0)
    print("== train-scale microbench (128x128, fwd + grad) ==", flush=True)
    res = (128, 128)
    for b, m, c in [(1, 81920, 2), (8, 81920, 2), (1, 61440, 4),
                    (8, 61440, 4)]:
        loc = jnp.asarray(
            np.stack([rng.uniform(0, res[0] - 1, (b, m)),
                      rng.uniform(0, res[1] - 1, (b, m))], -1), jnp.float32)
        vals = jnp.asarray(rng.normal(size=(b, m, c)), jnp.float32)
        maps = jnp.asarray(rng.normal(size=(b, res[0], res[1], c)),
                           jnp.float32)

        for backend in ["xla", "pallas"]:
            set_warp_backend(backend)
            f_s = jax.jit(lambda l, v: splat_values(l, v, res))
            f_g = jax.jit(gather_values)
            g_s = jax.jit(jax.grad(
                lambda l, v: jnp.sum(splat_values(l, v, res) ** 2),
                argnums=(0, 1)))
            g_g = jax.jit(jax.grad(
                lambda mp, l: jnp.sum(gather_values(mp, l) ** 2),
                argnums=(0, 1)))
            ts = bench(f_s, loc, vals)
            tg = bench(f_g, maps, loc)
            tgs = bench(g_s, loc, vals)
            tgg = bench(g_g, maps, loc)
            print(f"B={b} M={m:6d} C={c} {backend:6s}: "
                  f"splat {ts*1e3:7.2f}  gather {tg*1e3:7.2f}  "
                  f"grad(splat) {tgs*1e3:7.2f}  grad(gather) {tgg*1e3:7.2f} ms",
                  flush=True)
    set_warp_backend("auto")


def eval_update_bench():
    print("== eval update (DSEC 480x640, P=10, N=32768) ==", flush=True)
    from taming_event_flow_tpu.metrics import IterativeValidation, ValConfig

    res, passes, n = (480, 640), 10, 32768
    rng = np.random.default_rng(0)
    ev = np.zeros((1, n, 4), np.float32)
    ev[..., 0] = rng.uniform(0, 1, (1, n))
    ev[..., 1] = rng.integers(0, res[0], (1, n))
    ev[..., 2] = rng.integers(0, res[1], (1, n))
    ev[..., 3] = rng.choice([-1.0, 1.0], (1, n))
    ev = jnp.asarray(ev)
    pol = jnp.asarray(np.stack([(np.asarray(ev)[..., 3] > 0),
                                (np.asarray(ev)[..., 3] < 0)], -1), jnp.float32)
    emask = jnp.ones((1, res[0], res[1], 1), jnp.float32)
    flow = jnp.asarray(rng.normal(size=(1, res[0], res[1], 2)) * 8.0,
                       jnp.float32)

    for backend in ["pallas", "xla"]:
        set_warp_backend(backend)
        val = IterativeValidation(ValConfig(res=res, passes=passes), 1, n)
        update = jax.jit(val.update)
        vstate = val.init()
        t0 = time.perf_counter()
        vs = update(vstate, flow, ev, pol, emask)
        sync(vs.fw_loc)
        compile_s = time.perf_counter() - t0
        t = bench(lambda s: update(s, flow, ev, pol, emask), vs, iters=10)
        print(f"{backend:6s}: update {t*1e3:8.2f} ms/pass "
              f"(compile {compile_s:.1f}s) -> {1.0/(passes*t):6.2f} GT fps",
              flush=True)
        # metric reducers once
        t_rsat = bench(jax.jit(val.rsat), vs, iters=5)
        t_fwl = bench(jax.jit(val.fwl), vs, iters=5)
        print(f"        rsat {t_rsat*1e3:.2f} ms  fwl {t_fwl*1e3:.2f} ms",
              flush=True)
    set_warp_backend("auto")


def train_step_bench():
    print("== train step (128x128, P=10, N=8192) ==", flush=True)
    from taming_event_flow_tpu.models import RecEVFlowNet
    from taming_event_flow_tpu.objectives import LossConfig
    from taming_event_flow_tpu.training import build_optimizer, make_train_step
    from taming_event_flow_tpu.training.step import init_train_state

    res, passes, n = (128, 128), 10, 8192
    rng = np.random.default_rng(0)
    for batch in [1, 8]:
        ev = np.zeros((passes, batch, n, 4), np.float32)
        ev[..., 0] = rng.uniform(0, 1, (passes, batch, n))
        ev[..., 1] = rng.integers(0, res[0], (passes, batch, n))
        ev[..., 2] = rng.integers(0, res[1], (passes, batch, n))
        ev[..., 3] = rng.choice([-1.0, 1.0], (passes, batch, n))
        window = {
            "net_input": jnp.asarray(
                rng.normal(size=(passes, batch, res[0], res[1], 2)),
                jnp.float32),
            "event_list": jnp.asarray(ev),
            "pol_mask": jnp.asarray(
                np.stack([(ev[..., 3] > 0), (ev[..., 3] < 0)], -1),
                jnp.float32),
            "grad_mask": jnp.ones((passes, batch, n, 1), jnp.float32),
        }
        for backend in ["xla", "pallas"]:
            set_warp_backend(backend)
            model = RecEVFlowNet(num_bins=2, final_w_scale=0.01)
            cfg = LossConfig(res=res, passes_loss=passes)
            opt = build_optimizer({"name": "Adam", "lr": 1e-5},
                                  clip_grad=100.0)
            state = init_train_state(model, opt, batch, res[0], res[1], 2)
            step = make_train_step(model, opt, cfg, "Iterative", 32.0,
                                   donate=False)
            try:
                t0 = time.perf_counter()
                s1, loss = step(state, window)
                sync(loss)
                compile_s = time.perf_counter() - t0
                t = bench(lambda st: step(st, window)[1], state, iters=10)
            except Exception as e:  # forced-pallas can OOM the compiler
                print(f"B={batch} {backend:6s}: FAILED "
                      f"{type(e).__name__}", flush=True)
                continue
            print(f"B={batch} {backend:6s}: {t*1e3:8.2f} ms/step "
                  f"loss={float(loss):.6f} (compile {compile_s:.1f}s)",
                  flush=True)
    set_warp_backend("auto")


if __name__ == "__main__":
    print("device:", jax.devices()[0], flush=True)
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "correctness"):
        correctness()
    if which in ("all", "kernels"):
        kernel_microbench()
    if which in ("all", "trainscale"):
        train_scale_microbench()
    if which in ("all", "eval"):
        eval_update_bench()
    if which in ("all", "train"):
        train_step_bench()
