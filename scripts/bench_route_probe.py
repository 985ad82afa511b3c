"""Probe the costs that decide the routed (sorted-CSR) warp kernel design:

1. eval update at DSEC shapes WITHOUT fw-prop maps (the submission path —
   ``ValConfig.track_fw_prop=False``) under pallas/xla backends.
2. ``lax.sort`` of event streams by tile key (the routing precondition).
3. model forward alone at 480x640 (f32 vs bf16 compute).
4. gather/splat at routed-equivalent sizes for context.
"""

import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

import numpy as np
import jax
import jax.numpy as jnp

from taming_event_flow_tpu.ops import set_warp_backend


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


def eval_update_nofwprop():
    print("== eval update, track_fw_prop=False (DSEC submission path) ==",
          flush=True)
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
                                (np.asarray(ev)[..., 3] < 0)], -1),
                      jnp.float32)
    emask = jnp.ones((1, res[0], res[1], 1), jnp.float32)
    flow = jnp.asarray(rng.normal(size=(1, res[0], res[1], 2)) * 8.0,
                       jnp.float32)

    for backend in ["auto", "pallas", "xla"]:
        set_warp_backend(backend)
        val = IterativeValidation(
            ValConfig(res=res, passes=passes, track_fw_prop=False), 1, n)
        update = jax.jit(val.update)
        vstate = val.init()
        vs = update(vstate, flow, ev, pol, emask)
        sync(vs.fw_loc)
        t = bench(lambda s: update(s, flow, ev, pol, emask), vs, iters=10)
        print(f"{backend:6s}: update {t*1e3:8.2f} ms/pass "
              f"-> {1.0/(passes*t):6.2f} GT fps", flush=True)
    set_warp_backend("auto")


def sort_cost():
    print("== lax.sort: tile-key routing precondition ==", flush=True)
    rng = np.random.default_rng(0)
    for m in [32768, 327680]:
        keys = jnp.asarray(rng.integers(0, 20, (1, m)), jnp.int32)
        y = jnp.asarray(rng.uniform(0, 480, (1, m)), jnp.float32)
        x = jnp.asarray(rng.uniform(0, 640, (1, m)), jnp.float32)
        v = jnp.asarray(rng.normal(size=(1, m)), jnp.float32)
        w = jnp.asarray(rng.normal(size=(1, m)), jnp.float32)

        f = jax.jit(lambda k, a, b, c, d: jax.lax.sort(
            (k, a, b, c, d), dimension=1, num_keys=1))
        t = bench(f, keys, y, x, v, w)
        print(f"M={m:7d}: sort(key+4 payloads) {t*1e3:8.2f} ms", flush=True)
        # cumsum/segment bookkeeping (tiny)
        g = jax.jit(lambda k: jnp.cumsum(
            jax.ops.segment_sum(jnp.ones_like(k[0]), k[0], num_segments=20)))
        t2 = bench(g, keys)
        print(f"          counts+cumsum {t2*1e3:8.2f} ms", flush=True)


def model_forward():
    print("== model forward 480x640 (f32 vs bf16 compute) ==", flush=True)
    from taming_event_flow_tpu.models import RecEVFlowNet
    from taming_event_flow_tpu.training import make_forward_fn

    for dtype in ["float32", "bfloat16"]:
        model = RecEVFlowNet(num_bins=2, compute_dtype=dtype)
        carry = model.init_state(1, 480, 640)
        x = jnp.zeros((1, 480, 640, 2), jnp.float32)
        params = model.init(jax.random.PRNGKey(0), x, carry)["params"]
        fwd = make_forward_fn(model)
        t = bench(lambda p, c, xx: fwd(p, c, xx)[0], params, carry, x,
                  iters=10)
        print(f"{dtype:9s}: forward {t*1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    print("device:", jax.devices()[0], flush=True)
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "update"):
        eval_update_nofwprop()
    if which in ("all", "sort"):
        sort_cost()
    if which in ("all", "model"):
        model_forward()
