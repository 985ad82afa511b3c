"""Measure the torch reference's operational wall-clocks (BASELINE.md).

The reference publishes no performance numbers (BASELINE.md); this script
produces the missing denominators by running the reference implementation
itself (``/root/reference``, importable CPU-side in this image — the same
harness the oracle parity tests use) at the three BASELINE.md configs:

  (a) MVSEC eval protocol step:  260x346, 1 pass/window, model forward +
      ``loss/flow_val.py`` Iterative update          (eval_mvsec.yml)
  (b) DSEC benchmark inference:  480x640, 10 passes, forward + update
                                                     (eval_dsec.yml)
  (c) training step:             128x128, batch 8, passes_loss 10 — 10
      forwards + Iterative loss + backward + Adam    (train_flow.yml)

Hardware caveat, recorded with the numbers: this image has no CUDA GPU, so
these are torch-CPU wall-clocks on the host (single socket). They give a
like-for-like "same code, this machine" floor; the paper-era GPU numbers
remain unpublished upstream.

Usage: python scripts/bench_reference_torch.py [quick]
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/reference")
sys.path.insert(0, "/root/repo")

from tests.oracle import shim_reference_deps  # noqa: E402

shim_reference_deps()

import torch  # noqa: E402


def synth_events(rng, b, n, res):
    ev = np.zeros((b, n, 4), np.float32)
    ev[..., 0] = np.sort(rng.uniform(0, 1, (b, n)), axis=-1)
    ev[..., 1] = rng.integers(0, res[0], (b, n))
    ev[..., 2] = rng.integers(0, res[1], (b, n))
    ev[..., 3] = rng.choice([-1.0, 1.0], (b, n))
    pol = np.stack([(ev[..., 3] > 0), (ev[..., 3] < 0)], -1).astype(np.float32)
    return torch.from_numpy(ev), torch.from_numpy(pol)


def bench_eval(res, passes, n_events, iters):
    """Model forward + Iterative validation update per pass."""
    from loss.flow_val import Iterative
    from models.model import RecEVFlowNet

    config = {
        "loader": {"resolution": list(res), "batch_size": 1},
        "data": {"passes_loss": passes},
        "loss": {"round_ts": False, "flow_scaling": 32},
        "metrics": {"warping": "Iterative", "name": ["FWL", "RSAT"]},
        "vis": {"mask_output": False},
    }
    torch.manual_seed(0)
    model = RecEVFlowNet({}, num_bins=2).eval()
    criteria = Iterative(config, torch.device("cpu"))
    rng = np.random.default_rng(0)
    ev, pol = synth_events(rng, 1, n_events, res)
    mask = torch.ones((1, 1, res[0], res[1]))
    x = torch.randn(1, 2, res[0], res[1])

    def one_pass():
        out = model(x)
        flow = [f * 32.0 for f in out["flow"]]
        criteria.update(flow, ev.clone(), pol.clone(), mask)
        if criteria.num_passes == passes:
            criteria.reset()

    with torch.no_grad():
        one_pass()  # warmup
        criteria.reset()
        model.reset_states()
        t0 = time.perf_counter()
        done = 0
        while done < iters:
            one_pass()
            done += 1
        dt = (time.perf_counter() - t0) / done
    return {"pass_ms": round(dt * 1e3, 1),
            "model_passes_per_s": round(1.0 / dt, 2),
            "gt_frames_per_s": round(1.0 / (passes * dt), 2),
            "events_per_pass": n_events}


def bench_train(batch, res, passes, n_events, iters):
    """Full reference optimizer step: P forwards + Iterative loss +
    backward + Adam (reference ``train_flow.py:80-156``)."""
    from loss.flow import Iterative
    from models.model import RecEVFlowNet

    config = {
        "loader": {"resolution": list(res), "batch_size": batch},
        "data": {"passes_loss": passes, "scales_loss": 1},
        "loss": {"iterative_mode": "two", "round_ts": False,
                 "flow_spat_smooth_weight": None,
                 "flow_temp_smooth_weight": None},
    }
    torch.manual_seed(0)
    model = RecEVFlowNet({"final_w_scale": 0.01}, num_bins=2)
    loss_fn = Iterative(config, torch.device("cpu"))
    optimizer = torch.optim.Adam(model.parameters(), lr=1e-5)
    rng = np.random.default_rng(0)

    def one_step():
        optimizer.zero_grad()
        loss_fn.reset()
        model.reset_states()
        for p in range(passes):
            x = torch.randn(batch, 2, res[0], res[1])
            out = model(x)
            flow = [f * 32.0 for f in out["flow"]]
            ev, pol = synth_events(rng, batch, n_events, res)
            loss_fn.update(flow, ev, pol,
                           ev[:, :0].clone(), pol[:, :0].clone())
        loss = loss_fn()
        loss.backward()
        torch.nn.utils.clip_grad_norm_(model.parameters(), 100.0)
        optimizer.step()
        model.detach_states()
        return float(loss.detach())

    one_step()  # warmup
    t0 = time.perf_counter()
    for _ in range(iters):
        one_step()
    dt = (time.perf_counter() - t0) / iters
    warps = passes * n_events * batch * passes * 4
    return {"step_ms": round(dt * 1e3, 1),
            "mevents_per_s": round(warps / dt / 1e6, 2),
            "batch": batch, "events_per_window": n_events}


def main():
    quick = len(sys.argv) > 1 and sys.argv[1] == "quick"
    torch.set_num_threads(torch.get_num_threads())
    out = {
        "device": f"torch-cpu x{torch.get_num_threads()} threads",
        "mvsec_260x346_eval": bench_eval(
            (260, 346), 1, 16384, 3 if quick else 10),
        "dsec_480x640_inference": bench_eval(
            (480, 640), 10, 32768, 3 if quick else 10),
        "train_b8_128": bench_train(
            8, (128, 128), 10, 8192, 1 if quick else 3),
        "train_b1_128": bench_train(
            1, (128, 128), 10, 8192, 1 if quick else 3),
    }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
