"""Grid: compute_dtype x scan unroll on the train step (subprocesses)."""
import os
import subprocess
import sys

CHILD = """
import numpy as np, jax, jax.numpy as jnp, sys, os
sys.path.insert(0, "/root/repo"); sys.path.insert(0, "/root/repo/scripts")
from bench_util import timeit
from taming_event_flow_tpu.models import RecEVFlowNet
from taming_event_flow_tpu.objectives import LossConfig
from taming_event_flow_tpu.training import build_optimizer, make_train_step
from taming_event_flow_tpu.training.step import init_train_state
res, passes, batch, n = (128,128), 10, 1, 8192
cd = os.environ.get("TEF_BENCH_CDTYPE") or None
model = RecEVFlowNet(num_bins=2, final_w_scale=0.01, compute_dtype=cd)
cfg = LossConfig(res=res, passes_loss=passes,
                 scan_unroll=int(os.environ.get("TEF_SCAN_UNROLL", "1")))
opt = build_optimizer({"name":"Adam","lr":1e-5}, clip_grad=100.0)
state = init_train_state(model, opt, batch, res[0], res[1], 2)
step = make_train_step(model, opt, cfg, "Iterative", 32.0, donate=False)
rng = np.random.default_rng(0)
ev = np.zeros((passes,batch,n,4), np.float32)
ev[...,0]=rng.uniform(0,1,(passes,batch,n)); ev[...,1]=rng.integers(0,res[0],(passes,batch,n))
ev[...,2]=rng.integers(0,res[1],(passes,batch,n)); ev[...,3]=rng.choice([-1.,1.],(passes,batch,n))
window={"net_input":jnp.asarray(rng.normal(size=(passes,batch,res[0],res[1],2)),jnp.float32),
        "event_list":jnp.asarray(ev),
        "pol_mask":jnp.asarray(np.stack([(ev[...,3]>0),(ev[...,3]<0)],-1),jnp.float32),
        "grad_mask":jnp.ones((passes,batch,n,1),jnp.float32)}
t = timeit(step, state, window, iters=10)
_, loss = step(state, window)
print(f"RESULT {t*1e3:.2f} ms loss={float(loss):.6f}")
"""


def main():
    for cdtype in ["", "bfloat16"]:
        for unroll in ["1", "10"]:
            env = dict(os.environ)
            env["TEF_BENCH_CDTYPE"] = cdtype
            env["TEF_SCAN_UNROLL"] = unroll
            out = subprocess.run([sys.executable, "-c", CHILD], env=env,
                                 capture_output=True, text=True)
            line = [l for l in out.stdout.splitlines() if "RESULT" in l]
            print(f"cdtype={cdtype or 'f32'} unroll={unroll}: "
                  f"{line[0] if line else 'FAILED: ' + out.stderr[-200:]}")


if __name__ == "__main__":
    main()
