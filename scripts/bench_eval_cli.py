"""End-to-end eval wall-clock through the REAL CLI (`eval_flow.test`) at a
benchmark protocol's shapes on synthetic data (round-3b methodology: the
whole pipeline — loader, staging, H2D wire, dispatch, metric readbacks —
not just the device step).

Protocols:
    dsec   480x640, gtflow window 0.1 (10 passes per GT frame, the
           reference protocol), passes_loss 10, 32k events/pass
    mvsec  260x346, gtflow window 1 frame, passes_loss 1 (metrics every
           pass), 16k events/pass

Trains the full-size model briefly at small resolution first (the model is
fully convolutional, so the checkpoint evaluates at any resolution); reuse
with --runid to skip. One-time compiles land in a persistent XLA cache
keyed on the code state (never shared across code versions — CLAUDE.md).

    python scripts/bench_eval_cli.py [dsec|mvsec] [--runid ID]
"""

import argparse
import os
import sys
import time

import yaml

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

PROTOCOLS = {
    # res, passes_loss, gtflow window, events/pass, n GT frames, n_events_pad
    # window follows the reference protocol: DSEC = 0.1 GT frame per pass
    # (10 passes per frame, reference configs/eval_dsec.yml:4), MVSEC = a
    # full frame per pass (passes_loss 1, reference configs/eval_mvsec.yml)
    "dsec": ((480, 640), 10, 0.1, 32768, 12, 32768),
    "mvsec": ((260, 346), 1, 1, 16384, 60, 16384),
}


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("protocol", nargs="?", default="dsec",
                    choices=sorted(PROTOCOLS))
    ap.add_argument("--runid", default="")
    ap.add_argument("--workdir", default="/tmp/bench_eval_cli")
    ap.add_argument("--no-packed-wire", action="store_true",
                    help="A/B: ship plain wire formats")
    ap.add_argument("--sync-store", action="store_true",
                    help="A/B: disable the PNG writeback thread")
    ap.add_argument("--sync-metrics", action="store_true",
                    help="A/B: boundary metric readbacks on the dispatch "
                         "loop (disable the metrics-reader thread)")
    ap.add_argument("--probe", action="store_true",
                    help="decompose the window dispatch stall "
                         "(runtime.probe_wire drains)")
    args = ap.parse_args(argv)

    res, passes, window, ev_per_pass, n_frames, n_pad = (
        PROTOCOLS[args.protocol])
    root = os.path.abspath(args.workdir)
    os.makedirs(root, exist_ok=True)
    os.chdir(root)

    from bench_util import code_state_cache_dir

    from taming_event_flow_tpu.configs import YAMLParser
    from taming_event_flow_tpu.data.synthetic import write_synthetic_h5
    import eval_flow
    import train_flow

    # never share a persistent cache dir across code states (CLAUDE.md)
    cache_dir = code_state_cache_dir("/tmp/bench_xla_cache",
                                     os.path.abspath(__file__))
    print(f"xla cache: {cache_dir}")

    def cfg_path(name, d):
        p = os.path.join(root, name)
        with open(p, "w") as f:
            yaml.safe_dump(d, f)
        return p

    runid = args.runid
    if not runid:
        # brief full-size-model training at small res for a real checkpoint
        tds = os.path.join(root, "train_data")
        os.makedirs(tds, exist_ok=True)
        write_synthetic_h5(os.path.join(tds, "seq0.h5"), n_events=60000,
                           res=(64, 64), seed=3)
        tcfg = cfg_path("train.yml", {
            "experiment": "bench_eval_cli",
            "data": {"path": tds, "mode": "events", "window": 4096,
                     "passes_loss": 4, "scales_loss": 1, "voxel": None,
                     "cache": False},
            "model": {"name": "RecEVFlowNet", "final_w_scale": 0.01},
            "loss": {"warping": "Iterative", "iterative_mode": "two",
                     "round_ts": False, "flow_scaling": 32,
                     "clip_grad": 100.0},
            "optimizer": {"name": "Adam", "lr": 0.0001},
            "loader": {"n_epochs": 1, "batch_size": 1,
                       "resolution": [64, 64], "augment": [],
                       "augment_prob": [], "max_num_grad_events": None,
                       "seed": 11},
            "runtime": {"compilation_cache": cache_dir},
            "vis": {"verbose": False, "enabled": False, "store": False},
        })
        runid = train_flow.train(
            argparse.Namespace(config=tcfg, path_mlflow=root,
                               path_cache="", prev_runid=""),
            YAMLParser(tcfg),
        )
        print(f"trained checkpoint run {runid}")

    ds = os.path.join(root, f"eval_data_{args.protocol}")
    seq = os.path.join(ds, "seq0.h5")
    if not os.path.isfile(seq):
        write_synthetic_h5(
            seq, n_events=ev_per_pass * passes * n_frames, res=res,
            duration=float(n_frames), n_flow_frames=n_frames, seed=5,
        )

    ecfg = cfg_path(f"eval_{args.protocol}.yml", {
        "data": {"path": ds, "mode": "gtflow", "window": window,
                 "passes_loss": passes, "cache": False},
        "loader": {"resolution": list(res), "augment": [],
                   "max_num_grad_events": None, "n_events_pad": n_pad,
                   "seed": 11},
        "metrics": {"warping": "Iterative", "name": ["FWL", "RSAT", "AEE"]},
        "runtime": {"compilation_cache": cache_dir,
                    "packed_wire": not args.no_packed_wire,
                    "async_metrics": not args.sync_metrics,
                    "probe_wire": args.probe},
        "vis": {"enabled": False, "store": args.protocol == "dsec",
                "bars": False, "mask_output": False, "dynamic": False,
                "verbose": True, "async_store": not args.sync_store,
                "show": ["flow_bw"] if args.protocol == "dsec" else None},
    })
    # the loader streams (n_frames - 1) GT-frame intervals of 1/window
    # passes each (the last frame bounds the final interval)
    n_passes = int(round((n_frames - 1) / window))
    t0 = time.perf_counter()
    eval_flow.test(
        argparse.Namespace(
            runid=runid, config=ecfg, path_mlflow=root,
            path_results=os.path.join(root, "results") + "/",
        ),
        YAMLParser(ecfg),
    )
    wall = time.perf_counter() - t0
    print(f"\n{args.protocol}: {wall:.1f}s for ~{n_passes} passes "
          f"({wall / n_passes * 1e3:.0f} ms/pass incl. startup+compile; "
          f"re-run with --runid {runid} for the cached number)")
    return runid


if __name__ == "__main__":
    main()
