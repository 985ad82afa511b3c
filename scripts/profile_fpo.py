"""Profile the slow-context fpo call and print top device ops from the
Chrome trace. Reproduces bench_eval_ablate's context (model + update built
first) where fpo measures ~53 ms."""

import glob
import gzip
import json
import time

import numpy as np

import jax
import jax.numpy as jnp

from taming_event_flow_tpu.models import RecEVFlowNet
from taming_event_flow_tpu.metrics import IterativeValidation, ValConfig
from taming_event_flow_tpu.metrics.validation import forward_prop_flow_once

RES = (480, 640)
P, N = 10, 32768


def timeit(fn, *args, iters=10):
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

    # context: build model + val update first (as in bench_eval_ablate)
    model = RecEVFlowNet(num_bins=2)
    carry = model.init_state(1, RES[0], RES[1])
    x = jnp.zeros((1, RES[0], RES[1], 2), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x, carry)["params"]
    fwd = jax.jit(lambda p, c, xx: model.apply({"params": p}, xx, c, train=False))
    jax.block_until_ready(fwd(params, carry, x))

    val = IterativeValidation(ValConfig(res=RES, passes=P), 1, N)
    vstate = val.init()
    flow = jnp.asarray(rng.normal(size=(1, RES[0], RES[1], 2)), jnp.float32)
    ev = jnp.zeros((1, N, 4), jnp.float32)
    pol = jnp.zeros((1, N, 2), jnp.float32)
    emask = jnp.ones((1, RES[0], RES[1], 1), jnp.float32)
    upd = jax.jit(val.update)
    jax.block_until_ready(upd(vstate, flow, ev, pol, emask))

    f1 = jax.jit(lambda m: forward_prop_flow_once(m, RES))
    t = timeit(f1, flow)
    print(f"fpo in this context: {t*1e3:.2f} ms")

    jax.profiler.start_trace("/tmp/jaxtrace")
    for _ in range(3):
        out = f1(flow)
    jax.block_until_ready(out)
    jax.profiler.stop_trace()

    files = glob.glob("/tmp/jaxtrace/**/*.trace.json.gz", recursive=True)
    print("trace files:", files)
    if files:
        with gzip.open(files[-1], "rt") as f:
            trace = json.load(f)
        events = [
            e for e in trace.get("traceEvents", [])
            if e.get("ph") == "X" and e.get("dur", 0) > 0
        ]
        events.sort(key=lambda e: -e["dur"])
        seen = 0
        for e in events:
            name = e.get("name", "?")
            if name.startswith("jit_") or True:
                print(f"{e['dur']/1e3:10.3f} ms  {name[:110]}")
                seen += 1
            if seen >= 25:
                break


if __name__ == "__main__":
    main()
