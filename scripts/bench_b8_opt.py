"""B=8 train-step optimization matrix (TPU): model compute dtype x
warp remat x scan unroll.

Profile (scripts/profile_train_step.py, B=8): convolution fusions ~55% of
step time — f32 convs lower to multi-pass bf16 on the MXU, so bf16 compute
(the TPU counterpart of the reference's TF32-on-A100 torch convs) is the
headline lever. Warp scans ~35%; remat trades their backward recompute for
table memory.
"""

import itertools
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

import numpy as np
import jax
import jax.numpy as jnp


def sync(x):
    leaves = [l for l in jax.tree.leaves(x) if hasattr(l, "dtype")]
    np.asarray(jax.device_get(leaves[0].ravel()[:1]))


def main():
    from taming_event_flow_tpu.models import RecEVFlowNet
    from taming_event_flow_tpu.objectives import LossConfig
    from taming_event_flow_tpu.training import build_optimizer, make_train_step
    from taming_event_flow_tpu.training.step import init_train_state

    res, passes, batch, n = (128, 128), 10, 8, 8192
    from bench_util import synthetic_window

    rng = np.random.default_rng(0)
    window = synthetic_window(rng, passes, batch, n, res)

    print("device:", jax.devices()[0], flush=True)
    base_loss = None
    for dtype, remat, unroll in itertools.product(
            [None, "bfloat16"], [True, False], [1, 2]):
        model = RecEVFlowNet(num_bins=2, final_w_scale=0.01,
                             compute_dtype=dtype)
        cfg = LossConfig(res=res, passes_loss=passes, warp_remat=remat,
                         scan_unroll=unroll)
        opt = build_optimizer({"name": "Adam", "lr": 1e-5}, clip_grad=100.0)
        state = init_train_state(model, opt, batch, res[0], res[1], 2)
        step = make_train_step(model, opt, cfg, "Iterative", 32.0,
                               donate=False)
        t0 = time.perf_counter()
        try:
            s1, loss = step(state, window)
            sync(loss)
        except Exception as e:  # e.g. OOM with remat off
            print(f"dtype={dtype} remat={remat} unroll={unroll}: "
                  f"FAILED {type(e).__name__}", flush=True)
            continue
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        iters = 10
        for _ in range(iters):
            s1, loss = step(state, window)
        sync(loss)
        dt = (time.perf_counter() - t0) / iters
        lv = float(loss)
        if base_loss is None:
            base_loss = lv
        mev = passes * n * batch * passes * 4 / dt / 1e6
        print(f"dtype={str(dtype):9s} remat={int(remat)} unroll={unroll}: "
              f"{dt*1e3:7.2f} ms/step  {mev:6.1f} Mev/s  "
              f"loss={lv:.6f} (d={lv-base_loss:+.2e})  "
              f"compile {compile_s:.0f}s", flush=True)


if __name__ == "__main__":
    main()
