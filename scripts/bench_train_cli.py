"""End-to-end training wall-clock through the REAL CLI (`train_flow.train`)
at the reference training configuration on synthetic data.

Measures what BENCH's device-step number deliberately excludes: loader
production, window staging, H2D wire, dispatch python, and readbacks — the
round-3b attribution target (README). Prints the per-step wall and the
consumer loop's SectionTimer breakdown (vis.verbose).

Uses the persistent compilation cache, keyed on the CODE STATE like
bench.py (a fixed shared dir served STALE executables across code
versions -- the CLAUDE.md cache lesson): the first invocation per code
state pays the B=8 train-program compile; repeat runs measure steady
state. Run standalone (single TPU process, per CLAUDE.md):

    python scripts/bench_train_cli.py [--steps-per-epoch 20] [--epochs 2]
"""

import argparse
import os
import sys
import time

import yaml

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RES = (128, 128)
N_EVENTS_WINDOW = 8192
PASSES = 10
BATCH = 8


def build_dataset(root, steps_per_epoch):
    from taming_event_flow_tpu.data.synthetic import write_synthetic_h5

    n_windows = steps_per_epoch * PASSES
    n_events = n_windows * N_EVENTS_WINDOW
    paths = []
    for i in range(BATCH):
        p = os.path.join(root, f"seq{i}.h5")
        if not os.path.isfile(p):
            write_synthetic_h5(p, n_events=n_events, res=RES,
                               duration=float(n_windows), seed=i)
        paths.append(p)
    return root


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps-per-epoch", type=int, default=20)
    ap.add_argument("--epochs", type=int, default=2)
    ap.add_argument("--no-packed-wire", action="store_true",
                    help="A/B: ship plain f32 windows")
    args = ap.parse_args(argv)

    ds = "/tmp/bench_train_ds"
    os.makedirs(ds, exist_ok=True)
    build_dataset(ds, args.steps_per_epoch)

    import bench

    cache_dir = f"/tmp/bench_xla_cache_{bench._code_state_digest()}"
    cfg = {
        "experiment": "bench_cli",
        "data": {"path": ds, "mode": "events", "window": N_EVENTS_WINDOW,
                 "passes_loss": PASSES, "scales_loss": 1, "voxel": None,
                 "cache": False},
        "model": {"name": "RecEVFlowNet", "final_w_scale": 0.01},
        "loss": {"warping": "Iterative", "iterative_mode": "two",
                 "round_ts": False, "flow_scaling": 32,
                 "flow_spat_smooth_weight": None,
                 "flow_temp_smooth_weight": None, "clip_grad": 100.0},
        "optimizer": {"name": "Adam", "lr": 0.00001},
        "loader": {"n_epochs": args.epochs, "batch_size": BATCH,
                   "resolution": list(RES), "augment": [],
                   "augment_prob": [], "max_num_grad_events": 10000,
                   "n_events_pad": N_EVENTS_WINDOW, "seed": 7},
        "runtime": {"compilation_cache": cache_dir,
                    "packed_wire": not args.no_packed_wire},
        "vis": {"verbose": True, "enabled": False, "store": False},
    }
    run_root = "/tmp/bench_train_cli"
    os.makedirs(run_root, exist_ok=True)
    cfg_path = os.path.join(run_root, "train.yml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)
    os.chdir(run_root)

    from taming_event_flow_tpu.configs import YAMLParser
    import train_flow

    cli_args = argparse.Namespace(config=cfg_path, path_mlflow=run_root,
                                  path_cache="", prev_runid="")
    n_steps = args.steps_per_epoch * args.epochs
    t0 = time.perf_counter()
    train_flow.train(cli_args, YAMLParser(cfg_path))
    wall = time.perf_counter() - t0
    print(f"\ntotal: {wall:.1f}s for {n_steps} steps "
          f"({wall / n_steps * 1e3:.0f} ms/step incl. compile; "
          f"re-run for the cached-compile number)")


if __name__ == "__main__":
    main()
