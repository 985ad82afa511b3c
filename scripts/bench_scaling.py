"""Train-step scaling across batch size and events/window (honest sync)."""
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo/scripts")
from bench_util import timeit

from taming_event_flow_tpu.models import RecEVFlowNet
from taming_event_flow_tpu.objectives import LossConfig
from taming_event_flow_tpu.training import build_optimizer, make_train_step
from taming_event_flow_tpu.training.step import init_train_state


def run(batch, n, passes=10, res=(128, 128)):
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
    t = timeit(step, state, window, iters=5)
    warps = passes * n * batch * passes * 4
    print(f"B={batch} N={n}: {t*1e3:.1f} ms/step | "
          f"{warps/t/1e6:.0f} Mev/s warped | "
          f"{batch/t:.1f} samples/s")


if __name__ == "__main__":
    print("device:", jax.devices()[0])
    run(1, 8192)
    run(1, 32768)
    run(4, 8192)
    run(8, 8192)
