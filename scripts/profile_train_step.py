"""Profile the full train step; print top device ops by total time."""

import glob
import gzip
import json
from collections import defaultdict

import numpy as np

import jax
import jax.numpy as jnp

import sys

sys.path.insert(0, "/root/repo/scripts")
sys.path.insert(0, "/root/repo")
from bench_util import sync

from taming_event_flow_tpu.models import RecEVFlowNet
from taming_event_flow_tpu.objectives import LossConfig
from taming_event_flow_tpu.training import build_optimizer, make_train_step
from taming_event_flow_tpu.training.step import init_train_state


def main():
    res, passes, batch, n = (128, 128), 10, 8, 8192
    model = RecEVFlowNet(num_bins=2, final_w_scale=0.01)
    cfg = LossConfig(res=res, passes_loss=passes)
    opt = build_optimizer({"name": "Adam", "lr": 1e-5}, clip_grad=100.0)
    state = init_train_state(model, opt, batch, res[0], res[1], 2)
    step = make_train_step(model, opt, cfg, "Iterative", 32.0, donate=False)
    rng = np.random.default_rng(0)
    ev = np.zeros((passes, batch, n, 4), np.float32)
    ev[..., 0] = rng.uniform(0, 1, (passes, batch, n))
    ev[..., 1] = rng.integers(0, res[0], (passes, batch, n))
    ev[..., 2] = rng.integers(0, res[1], (passes, batch, n))
    ev[..., 3] = rng.choice([-1.0, 1.0], (passes, batch, n))
    window = {
        "net_input": jnp.asarray(
            rng.normal(size=(passes, batch, res[0], res[1], 2)), jnp.float32),
        "event_list": jnp.asarray(ev),
        "pol_mask": jnp.asarray(
            np.stack([(ev[..., 3] > 0), (ev[..., 3] < 0)], -1), jnp.float32),
        "grad_mask": jnp.ones((passes, batch, n, 1), jnp.float32),
    }
    out = step(state, window)
    sync(out)

    import shutil

    shutil.rmtree("/tmp/traintrace", ignore_errors=True)  # stale traces
    jax.profiler.start_trace("/tmp/traintrace")
    out = step(state, window)
    sync(out)
    jax.profiler.stop_trace()

    files = glob.glob("/tmp/traintrace/**/*.trace.json.gz", recursive=True)
    with gzip.open(files[-1], "rt") as f:
        trace = json.load(f)

    cat_total = defaultdict(float)
    op_total = defaultdict(float)
    for e in trace.get("traceEvents", []):
        if e.get("ph") != "X":
            continue
        args = e.get("args", {})
        if "hlo_category" not in args:
            continue
        dur = e["dur"] / 1e3
        cat_total[args["hlo_category"]] += dur
        op_total[e.get("name", "?")] += dur

    print("=== by HLO category (ms) ===")
    for k, v in sorted(cat_total.items(), key=lambda kv: -kv[1]):
        print(f"{v:9.2f}  {k}")
    print("=== top ops (ms) ===")
    for k, v in sorted(op_total.items(), key=lambda kv: -kv[1])[:20]:
        print(f"{v:9.2f}  {k[:90]}")


if __name__ == "__main__":
    main()
