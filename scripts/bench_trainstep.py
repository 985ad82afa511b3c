"""Reference-config train-step timing (B=8 headline + B=1), readback-synced.

The quick standalone version of bench.py's training entries for iterating
on step-time optimizations (one TPU process, ~2 compiles).
"""

import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")
import numpy as np, jax, jax.numpy as jnp
from taming_event_flow_tpu.models import RecEVFlowNet
from taming_event_flow_tpu.objectives import LossConfig
from taming_event_flow_tpu.training import build_optimizer, make_train_step
from taming_event_flow_tpu.training.step import init_train_state

def sync(x):
    leaves = [l for l in jax.tree.leaves(x) if hasattr(l, "dtype")]
    np.asarray(jax.device_get(leaves[0].ravel()[:1]))

for batch in (8, 1):
    res, passes, n = (128, 128), 10, 8192
    from bench_util import synthetic_window

    rng = np.random.default_rng(0)
    window = synthetic_window(rng, passes, batch, n, res)
    model = RecEVFlowNet(num_bins=2, final_w_scale=0.01)
    cfg = LossConfig(res=res, passes_loss=passes)
    opt = build_optimizer({"name": "Adam", "lr": 1e-5}, clip_grad=100.0)
    state = init_train_state(model, opt, batch, res[0], res[1], 2)
    step = make_train_step(model, opt, cfg, "Iterative", 32.0, donate=False)
    t0 = time.perf_counter(); s1, loss = step(state, window); sync(loss)
    print(f"B={batch} compile {time.perf_counter()-t0:.0f}s", flush=True)
    t0 = time.perf_counter()
    for _ in range(10): s1, loss = step(state, window)
    sync(loss)
    dt = (time.perf_counter()-t0)/10
    print(f"B={batch}: {dt*1e3:.2f} ms/step  {passes*n*batch*passes*4/dt/1e6:.1f} Mev/s  loss={float(loss):.6f}", flush=True)
