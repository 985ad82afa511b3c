"""Low-latency streaming flow inference — the deployment loop.

The paper's headline use case (reference README.md:1-19) is *sequential,
low-latency* optical flow: a recurrent model consumes ~10 ms event slices
and emits a flow map per slice with O(1) state. This example is that loop,
reduced to its essentials:

    python examples/streaming_inference.py [--runid ID --path_mlflow DIR]
                                           [--torch_checkpoint model.pth]
                                           [--height 480 --width 640]
                                           [--n_events 32768] [--passes 200]

Without a checkpoint it streams synthetic events through a fresh model —
enough to measure the latency envelope on the attached accelerator.

What it demonstrates:
  * the fused inference pass (`training.make_forward_fn`): model forward in
    ONE jitted program, recurrent carry threaded functionally;
  * static shapes: event slices arrive zero-padded to a fixed cap, so the
    program compiles exactly once;
  * latency accounting that respects this stack (dispatch is async — the
    readback is the honest sync point).

Reference anatomy this mirrors: the eval loop's forward-only path
(reference ``eval_flow.py:90-92``) minus metrics/visualization.

Measured on the tunneled dev TPU v5e (in the TPU-owning process — a
second process attaching to the same tunneled chip multiplexes
catastrophically, ~24x slower): 480x640, 32768 events/slice -> p50
94.9 ms/pass end-to-end, dominated by the full flow-map D2H readback
(~60 ms for 2.4 MB); the on-device forward itself is ~6.6 ms.
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--runid", default="", help="tracked run to restore")
    ap.add_argument("--path_mlflow", default="")
    ap.add_argument("--torch_checkpoint", default="",
                    help="reference model.pth to import")
    ap.add_argument("--height", type=int, default=480)
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--n_events", type=int, default=32768)
    ap.add_argument("--passes", type=int, default=200)
    ap.add_argument("--flow_scaling", type=float, default=32.0)
    ap.add_argument("--wire", choices=["f32", "u16"], default="f32",
                    help="flow-map readback format: u16 ships the DSEC "
                         "16-bit lattice (half the D2H bytes; <= 1/256 px "
                         "quantization — utils/visualization.flow_to_u16)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from taming_event_flow_tpu.models import build_model
    from taming_event_flow_tpu.ops.encodings import events_to_channels
    from taming_event_flow_tpu.training import make_forward_fn

    res = (args.height, args.width)
    model_cfg = {"name": "RecEVFlowNet"}
    num_bins = 2
    if args.runid:
        # reconstruct the run's model config (the eval CLI's pattern,
        # eval_flow.py) — a default template would shape-mismatch runs
        # trained with non-default arch kwargs or voxel input
        from taming_event_flow_tpu import tracking
        from taming_event_flow_tpu.configs import YAMLParser

        tracking.set_tracking_uri(args.path_mlflow)
        run_cfg = YAMLParser().merge_configs(
            tracking.get_run(args.runid).data.params)
        model_cfg = dict(run_cfg["model"])
        if run_cfg["data"].get("voxel") is not None:
            num_bins = run_cfg["data"]["voxel"]
            raise SystemExit(
                "this example streams the count encoding; run with a "
                f"count-input checkpoint (run {args.runid} trained on "
                f"{num_bins}-bin voxels)"
            )

    model = build_model(model_cfg, num_bins=num_bins)
    carry = model.init_state(1, res[0], res[1])
    x0 = jnp.zeros((1, res[0], res[1], num_bins))
    params = model.init(jax.random.PRNGKey(0), x0, carry)["params"]

    if args.torch_checkpoint:
        from taming_event_flow_tpu.tracking import (
            load_reference_torch_checkpoint,
        )

        params = load_reference_torch_checkpoint(args.torch_checkpoint)
        print(f"imported torch checkpoint {args.torch_checkpoint}")
    elif args.runid:
        from taming_event_flow_tpu.tracking import load_checkpoint

        template = {"params": params, "opt_state": None,
                    "step": np.int64(0), "epoch": np.int64(0)}
        restored, _ = load_checkpoint(args.runid, template)
        if restored is None:
            raise SystemExit(f"no checkpoint for run {args.runid}")
        params = restored["params"]
        print(f"restored run {args.runid}")
    # commit once: numpy leaves would re-upload on every dispatch
    params = jax.device_put(params)

    forward = make_forward_fn(model, flow_scaling=args.flow_scaling)

    # encode an event slice into the per-polarity count representation on
    # device (ops/encodings.py) and run the pass — one fused dispatch each
    @jax.jit
    def encode(ev):
        img = events_to_channels(
            ev[0, :, 2], ev[0, :, 1], ev[0, :, 3], res
        )
        return img[None]

    rng = np.random.default_rng(0)

    def synthetic_slice():
        ev = np.zeros((1, args.n_events, 4), np.float32)
        ev[..., 0] = np.sort(rng.uniform(0, 1, (1, args.n_events)))
        ev[..., 1] = rng.integers(0, res[0], (1, args.n_events))
        ev[..., 2] = rng.integers(0, res[1], (1, args.n_events))
        ev[..., 3] = rng.choice([-1.0, 1.0], (1, args.n_events))
        return ev

    if args.wire == "u16":
        # ship the DSEC PNG lattice over the wire (half the D2H bytes on
        # the dominant cost of this loop); decode on host is exact on the
        # lattice, so total error is the <= 1/256 px quantization
        from taming_event_flow_tpu.utils.visualization import (
            flow_to_u16,
            u16_to_flow,
        )

        quant = jax.jit(flow_to_u16)

        def read_map(f):
            return u16_to_flow(np.asarray(quant(f)))
    else:
        def read_map(f):
            return np.asarray(f)

    # warm up / compile
    ev = synthetic_slice()
    x = encode(jnp.asarray(ev))
    flows, carry = forward(params, carry, x)
    read_map(flows[-1])  # compile the readback path too
    np.asarray(flows[-1][..., :1, :1, :])  # sync

    lat = []
    for k in range(args.passes):
        ev = synthetic_slice()  # stand-in for the camera driver
        t0 = time.perf_counter()
        x = encode(jnp.asarray(ev))
        flows, carry = forward(params, carry, x)
        flow = read_map(flows[-1])  # the consumer reads the map
        lat.append(time.perf_counter() - t0)
    lat_ms = np.array(lat) * 1e3
    print(
        f"{args.passes} passes at {res[0]}x{res[1]}, "
        f"{args.n_events} events/slice:\n"
        f"  latency p50 {np.percentile(lat_ms, 50):.2f} ms   "
        f"p99 {np.percentile(lat_ms, 99):.2f} ms   "
        f"mean {lat_ms.mean():.2f} ms "
        f"({1e3 / lat_ms.mean():.1f} flow maps/s)\n"
        f"  (each pass = encode + recurrent forward + full-map readback; "
        f"flow shape {flow.shape})"
    )


if __name__ == "__main__":
    main()
