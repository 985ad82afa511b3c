"""Where does the eval CLI's window_call time go?

The corrected DSEC protocol run (window 0.1, 11 windows) measured
window_call at ~3.3 s/window while the device forward is ~69 ms/window —
and window_call wraps ONLY the jit dispatch (no sync). This study rebuilds
the EXACT window program the CLI dispatches (EvalPipeline at the DSEC
submission config) and separates:

  * trace/compile amortization: jit cache size across calls (a per-call
    retrace would explain seconds of host time per dispatch)
  * dispatch-only time (call returns, no sync) per window
  * device completion time per window (call + one-element readback)
  * staged H2D upload time (producer-side jnp.asarray of a packed window)
  * the extras ablation: same program without in-program metrics

Run on the real chip:  python scripts/bench_window_breakdown.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    import jax
    import jax.numpy as jnp

    from bench_util import sync

    from taming_event_flow_tpu.models import RecEVFlowNet
    from taming_event_flow_tpu.pipeline import EvalPipeline

    res, passes, n_pad = (480, 640), 10, 32768
    config = {
        "data": {"mode": "gtflow", "passes_loss": passes, "voxel": None,
                 "window": 0.1},
        "loader": {"resolution": list(res), "n_events_pad": n_pad},
        "loss": {"flow_scaling": 32, "round_ts": False},
        "metrics": {"warping": "Iterative", "name": ["FWL", "RSAT", "AEE"],
                    "inference_dtype": "bfloat16"},
        "vis": {"store": True, "show": ["flow_bw"]},
        "runtime": {"packed_wire": True},
    }

    print("device:", jax.devices()[0], flush=True)
    rng = np.random.default_rng(0)

    model = RecEVFlowNet(num_bins=2)
    carry = model.init_state(1, res[0], res[1])
    x0 = jnp.zeros((1, res[0], res[1], 2))
    params = model.init(jax.random.PRNGKey(0), x0, carry)["params"]

    pipe = EvalPipeline(config, model, params, auto_shard=False)
    assert pipe.windowed and pipe.use_extras and pipe.packed_wire

    def host_window(seed):
        r = np.random.default_rng(seed)
        ts = np.sort(r.uniform(0, 1, (passes, 1, n_pad, 1)), axis=2)
        y = r.uniform(0, res[0] - 1, (passes, 1, n_pad, 1))
        x = r.uniform(0, res[1] - 1, (passes, 1, n_pad, 1))
        p = r.choice([-1.0, 1.0], (passes, 1, n_pad, 1))
        bufs = []
        for t in range(passes):
            ev = np.concatenate([ts[t], y[t], x[t], p[t]], -1)
            bufs.append({
                "event_list": ev.astype(np.float32),
                "gtflow": r.normal(size=(1, res[0], res[1], 2)).astype(
                    np.float32),
            })
        return bufs

    # --- staged H2D upload (what the producer thread does per window)
    bufs = host_window(0)
    t0 = time.perf_counter()
    staged = pipe.stage_window(bufs)
    sync([s for s in staged if hasattr(s, "dtype")])
    t_stage_cold = time.perf_counter() - t0

    # warm the program
    flow = pipe.run_window(staged)
    sync(flow)
    sync(list(pipe.window_mets.values()))
    cache0 = pipe._window_step._cache_size()

    stage_ts, disp_ts, done_ts = [], [], []
    for i in range(1, 9):
        bufs = host_window(i)
        t0 = time.perf_counter()
        staged = pipe.stage_window(bufs)
        sync([s for s in staged if hasattr(s, "dtype")])
        t1 = time.perf_counter()
        pipe.vstate_stale = False
        flow = pipe.run_window(staged)
        t2 = time.perf_counter()
        sync(flow)
        sync(list(pipe.window_mets.values()))
        t3 = time.perf_counter()
        stage_ts.append(t1 - t0)
        disp_ts.append(t2 - t1)
        done_ts.append(t3 - t2)
    cache1 = pipe._window_step._cache_size()

    print(f"jit cache size: {cache0} -> {cache1} "
          f"({'RETRACING' if cache1 > cache0 else 'stable'})")
    print(f"stage+H2D (synced)      : cold {t_stage_cold*1e3:8.1f} ms, "
          f"warm p50 {np.median(stage_ts)*1e3:8.1f} ms")
    print(f"window dispatch (no sync): p50 {np.median(disp_ts)*1e3:8.1f} ms")
    print(f"window completion after  : p50 {np.median(done_ts)*1e3:8.1f} ms")
    print(f"=> device window (disp+completion) p50 "
          f"{np.median(np.array(disp_ts)+np.array(done_ts))*1e3:8.1f} ms")

    # --- ablation: the same window program WITHOUT in-program metrics
    from taming_event_flow_tpu.training import make_eval_window_step

    plain = make_eval_window_step(
        model, pipe.criteria, pipe.flow_scaling,
        inference_dtype=pipe.inference_dtype, reset_first=True, extras=None,
    )
    xs, evs, pols, emasks, aux, raw, ridx = staged

    # vstate/carry are DONATED by the program: thread the outputs back in
    # (re-passing a donated-away buffer is a backend error)
    vstate, carry = pipe.vstate, pipe.carry
    vstate, carry, flow = plain(vstate, carry, pipe.params, xs, evs, pols,
                                emasks, raw=raw, ridx=ridx)
    sync(flow)
    t0 = time.perf_counter()
    for _ in range(5):
        vstate, carry, flow = plain(vstate, carry, pipe.params, xs, evs,
                                    pols, emasks, raw=raw, ridx=ridx)
        sync(flow)
    print(f"window w/o extras (call+sync): "
          f"{(time.perf_counter()-t0)/5*1e3:8.1f} ms")

    # --- the extras reducers standalone (what extras adds)
    red = pipe._reducers
    t0 = time.perf_counter()
    for _ in range(5):
        fb = red["window_flow_bw"](vstate)
        u = red["flow_bw_u16"](fb * passes)
        a = red["aee"](fb * passes, aux, event_mask=None)
        r_ = red["rsat"](vstate)
        f_ = red["fwl"](vstate)
        sync([u, a, r_, f_])
    print(f"reducers standalone (call+sync): "
          f"{(time.perf_counter()-t0)/5*1e3:8.1f} ms")
    print(f"loadavg: {os.getloadavg()}")


if __name__ == "__main__":
    main()
