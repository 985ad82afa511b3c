"""Ablation: where does the training step's time go on device?

Measures, at the reference train config (128x128, P=10, N=8192, B=1):
  * full step (model scan + iterative loss + grad + Adam)
  * model-scan-only value+grad (loss = sum of flows)
  * loss-only value+grad (flows are inputs)
  * the fused IWE splat alone (fwd / fwd+grad)

Run on the TPU:  python scripts/bench_ablate.py
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


def main():
    from taming_event_flow_tpu.models import RecEVFlowNet
    from taming_event_flow_tpu.objectives import LossConfig, iterative_loss
    from taming_event_flow_tpu.objectives.base import iwe_with_ts
    from taming_event_flow_tpu.training import build_optimizer, make_train_step
    from taming_event_flow_tpu.training.step import init_train_state

    res = (128, 128)
    passes, batch, n = 10, 1, 8192
    rng = np.random.default_rng(0)

    model = RecEVFlowNet(num_bins=2, final_w_scale=0.01)
    cfg = LossConfig(res=res, passes_loss=passes)
    opt = build_optimizer({"name": "Adam", "lr": 1e-5}, clip_grad=100.0)
    state = init_train_state(model, opt, batch, res[0], res[1], 2)

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

    print("device:", jax.devices()[0])

    # full step
    step = make_train_step(model, opt, cfg, "Iterative", 32.0, donate=False)
    t_full = timeit(step, state, window)
    print(f"full step: {t_full*1e3:.2f} ms")

    # NOTE: every device array below is an explicit jit ARGUMENT — arrays
    # closed over by a jitted fn are baked as HLO constants, which distorts
    # timings by orders of magnitude on this stack.

    # model-only
    def model_only(params, carry, net_input):
        def body(c, x):
            flows, nc = model.apply({"params": params}, x, c)
            return nc, flows

        _, flows = jax.lax.scan(body, carry, net_input)
        return jnp.sum(flows)

    g_model = jax.jit(jax.grad(model_only))
    t_model = timeit(g_model, state.params, state.carry, window["net_input"])
    print(f"model scan value+grad: {t_model*1e3:.2f} ms")

    # loss-only
    flows0 = jnp.asarray(
        rng.normal(size=(passes, 4, batch, res[0], res[1], 2)) * 2,
        jnp.float32,
    )

    def loss_only(flows, ev, pm, gm):
        return iterative_loss(flows, ev, pm, gm, cfg)

    g_loss = jax.jit(jax.value_and_grad(loss_only))
    t_loss = timeit(
        g_loss, flows0, window["event_list"], window["pol_mask"],
        window["grad_mask"],
    )
    print(f"iterative loss value+grad: {t_loss*1e3:.2f} ms")

    # splat-only (one tref-scale accumulation: 10 windows x N events)
    loc = jnp.asarray(
        rng.uniform(0, res[0] - 1, (batch, 10 * n, 2)), jnp.float32
    )
    pm = jnp.asarray(rng.integers(0, 2, (batch, 10 * n, 2)), jnp.float32)
    ts = jnp.asarray(rng.uniform(0, 1, (batch, 10 * n, 1)), jnp.float32)

    f_splat = jax.jit(lambda l, p, t: iwe_with_ts(l, p, t, res))
    t_splat = timeit(f_splat, loc, pm, ts)
    g_splat = jax.jit(
        jax.grad(
            lambda l, p, t: sum(jnp.sum(o) for o in iwe_with_ts(l, p, t, res))
        )
    )
    tg_splat = timeit(g_splat, loc, pm, ts)
    print(
        f"fused splat (81920 pts -> 128x128x4): fwd {t_splat*1e3:.3f} ms, "
        f"fwd+grad {tg_splat*1e3:.3f} ms"
    )


if __name__ == "__main__":
    main()
