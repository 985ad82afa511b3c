"""Decompose the B=8 train step: model scan (fwd+bwd) alone vs loss alone.

Settles where the 592 ms goes — the bf16-conv null result says the
convolutions are NOT the bottleneck despite the trace's 'convolution
fusion' attribution.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp


def sync(x):
    leaves = [l for l in jax.tree.leaves(x) if hasattr(l, "dtype")]
    np.asarray(jax.device_get(leaves[0].ravel()[:1]))


def bench(fn, *args, iters=10):
    out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / iters


def main():
    from taming_event_flow_tpu.models import RecEVFlowNet
    from taming_event_flow_tpu.objectives import LossConfig, iterative_loss
    from taming_event_flow_tpu.training.step import init_train_state
    from taming_event_flow_tpu.training import build_optimizer

    res, passes, batch, n = (128, 128), 10, 8, 8192
    rng = np.random.default_rng(0)
    model = RecEVFlowNet(num_bins=2, final_w_scale=0.01)
    cfg = LossConfig(res=res, passes_loss=passes)
    opt = build_optimizer({"name": "Adam", "lr": 1e-5}, clip_grad=100.0)
    state = init_train_state(model, opt, batch, res[0], res[1], 2)

    from bench_util import synthetic_window

    w = synthetic_window(rng, passes, batch, n, res)
    net, ev, pol, gmask = (w["net_input"], w["event_list"], w["pol_mask"],
                           w["grad_mask"])

    print("device:", jax.devices()[0], flush=True)

    def model_scan(params, carry, xs):
        def body(c, x):
            flows, nc = model.apply({"params": params}, x, c)
            return nc, flows * 32.0
        return jax.lax.scan(body, carry, xs)

    # model scan forward only
    f_fwd = jax.jit(lambda p, c, xs: model_scan(p, c, xs)[1])
    t = bench(f_fwd, state.params, state.carry, net)
    print(f"model scan fwd           : {t*1e3:8.2f} ms", flush=True)

    # model scan fwd+bwd (dummy scalar loss on flows)
    f_fb = jax.jit(jax.grad(
        lambda p, c, xs: jnp.sum(model_scan(p, c, xs)[1] ** 2)))
    t = bench(f_fb, state.params, state.carry, net)
    print(f"model scan fwd+bwd       : {t*1e3:8.2f} ms", flush=True)

    # loss alone on precomputed flows: fwd and fwd+bwd. CLAUDE.md rule:
    # all device arrays ride as explicit jit ARGUMENTS (closures become HLO
    # constants and distort timings on this stack)
    flows = f_fwd(state.params, state.carry, net)
    loss_f = jax.jit(
        lambda fl, e, p_, g: iterative_loss(fl, e, p_, g, cfg))
    t = bench(loss_f, flows, ev, pol, gmask)
    print(f"iterative loss fwd       : {t*1e3:8.2f} ms", flush=True)
    loss_g = jax.jit(jax.grad(
        lambda fl, e, p_, g: iterative_loss(fl, e, p_, g, cfg)))
    t = bench(loss_g, flows, ev, pol, gmask)
    print(f"iterative loss fwd+bwd   : {t*1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
