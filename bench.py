"""Benchmark: event-warping throughput of the iterative contrast-max core.

Measures the end-to-end hot path of training — the full jitted TBPTT window
step (RecEVFlowNet scan + iterative warp table + fused IWE splats + grad +
Adam) at the reference's training configuration (128x128, P=10 passes,
batch 1..8), and reports warped-events throughput in Mevents/s.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

``vs_baseline`` is value / 100 Mevents/s — the north-star throughput target
from BASELINE.json (the reference publishes no numbers of its own;
BASELINE.md documents that gap).
"""

import json
import time

import numpy as np


def _sync(out):
    """True device-completion sync: host readback of one element.

    block_until_ready returns at dispatch on this remote-TPU stack (verified
    by profiler trace), so all timing uses an explicit readback barrier.
    """
    import jax

    leaves = [l for l in jax.tree.leaves(out) if hasattr(l, "dtype")]
    np.asarray(jax.device_get(leaves[0].ravel()[:1]))


def bench_dsec_inference():
    """DSEC-Flow benchmark shape: 480x640, gtflow window=0.1 (10 ms of
    events per pass, 10 passes per GT frame). Measures model forward + the
    Iterative validation update per pass and reports GT-frames/s."""
    import jax
    import jax.numpy as jnp

    from taming_event_flow_tpu.models import RecEVFlowNet
    from taming_event_flow_tpu.metrics import IterativeValidation, ValConfig
    from taming_event_flow_tpu.training import make_forward_fn

    res = (480, 640)
    passes = 10
    n_events = 32768

    model = RecEVFlowNet(num_bins=2)
    carry = model.init_state(1, res[0], res[1])
    x = jnp.zeros((1, res[0], res[1], 2), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x, carry)["params"]
    forward = make_forward_fn(model)

    val = IterativeValidation(ValConfig(res=res, passes=passes), 1, n_events)
    vstate = val.init()
    update = jax.jit(val.update, donate_argnums=(0,))

    rng = np.random.default_rng(0)
    ev = np.zeros((1, n_events, 4), np.float32)
    ev[..., 0] = rng.uniform(0, 1, (1, n_events))
    ev[..., 1] = rng.integers(0, res[0], (1, n_events))
    ev[..., 2] = rng.integers(0, res[1], (1, n_events))
    ev[..., 3] = rng.choice([-1.0, 1.0], (1, n_events))
    ev = jnp.asarray(ev)
    pol = jnp.asarray(
        np.stack([(np.asarray(ev)[..., 3] > 0),
                  (np.asarray(ev)[..., 3] < 0)], -1), jnp.float32
    )
    emask = jnp.ones((1, res[0], res[1], 1), jnp.float32)

    # warmup
    flows, carry = forward(params, carry, x)
    vstate = update(vstate, flows[-1], ev, pol, emask)
    _sync(vstate.fw_loc)

    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        flows, carry = forward(params, carry, x)
        vstate = update(vstate, flows[-1], ev, pol, emask)
    _sync(vstate.fw_loc)
    per_pass = (time.perf_counter() - t0) / iters
    return {
        "pass_ms": round(per_pass * 1e3, 2),
        "gt_frames_per_s": round(1.0 / (passes * per_pass), 2),
        "model_passes_per_s": round(1.0 / per_pass, 1),
    }


def main():
    import jax
    import jax.numpy as jnp

    from taming_event_flow_tpu.models import RecEVFlowNet
    from taming_event_flow_tpu.objectives import LossConfig
    from taming_event_flow_tpu.training import build_optimizer, make_train_step
    from taming_event_flow_tpu.training.step import init_train_state

    res = (128, 128)
    passes = 10
    batch = 1
    n_events = 8192  # ~ typical 10 ms window at 128x128 crops

    model = RecEVFlowNet(num_bins=2, final_w_scale=0.01)
    cfg = LossConfig(res=res, passes_loss=passes, scales_loss=1,
                     iterative_mode="two")
    opt = build_optimizer({"name": "Adam", "lr": 1e-5}, clip_grad=100.0)
    state = init_train_state(model, opt, batch, res[0], res[1], 2)
    step = make_train_step(model, opt, cfg, "Iterative", flow_scaling=32.0)

    rng = np.random.default_rng(0)
    ev = np.zeros((passes, batch, n_events, 4), np.float32)
    ev[..., 0] = rng.uniform(0, 1, (passes, batch, n_events))
    ev[..., 1] = rng.integers(0, res[0], (passes, batch, n_events))
    ev[..., 2] = rng.integers(0, res[1], (passes, batch, n_events))
    ev[..., 3] = rng.choice([-1.0, 1.0], (passes, batch, n_events))
    window = {
        "net_input": jnp.asarray(
            rng.normal(size=(passes, batch, res[0], res[1], 2)),
            jnp.float32,
        ),
        "event_list": jnp.asarray(ev),
        "pol_mask": jnp.asarray(
            np.stack([(ev[..., 3] > 0), (ev[..., 3] < 0)], -1), jnp.float32
        ),
        "grad_mask": jnp.ones((passes, batch, n_events, 1), jnp.float32),
    }

    # warmup / compile
    state, loss = step(state, window)
    _sync(loss)

    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        state, loss = step(state, window)
    _sync(loss)
    dt = (time.perf_counter() - t0) / iters

    # events warped per optimizer step: P windows x N events, each warped
    # through ~P flow maps (fw+bw), across 4 flow scales
    warps_per_step = passes * n_events * batch * passes * 4
    mevents_per_s = warps_per_step / dt / 1e6

    dsec = bench_dsec_inference()

    print(json.dumps({
        "metric": "iterative_cm_train_warp_throughput",
        "value": round(mevents_per_s, 2),
        "unit": "Mevents/s",
        "vs_baseline": round(mevents_per_s / 100.0, 3),
        "detail": {
            "train_step_ms": round(dt * 1e3, 2),
            "res": list(res),
            "passes": passes,
            "batch": batch,
            "events_per_window": n_events,
            "device": str(jax.devices()[0]),
            "dsec_480x640_inference": dsec,
        },
    }))


if __name__ == "__main__":
    main()
