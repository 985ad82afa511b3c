"""bf16-inference metric-impact study (README roadmap item).

Question: does running the model forward in bfloat16 at eval time
(``metrics.inference_dtype: bfloat16`` — measured 6.6 -> 5.9 ms at DSEC
480x640) move the reported metrics? The warp/metric pipeline stays f32
either way; the only perturbation is the flow maps (<=0.14 px observed).

Method: train a short synthetic run (or reuse one via --runid), then run
the full eval CLI twice — f32 and bf16 forward — on the same data and
report per-sequence FWL / RSAT / AEE deltas.

Usage:  python scripts/study_bf16_eval.py [workdir]
(CPU-friendly; uses the same synthetic harness as the e2e tests.)
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("workdir", nargs="?", default="/tmp/bf16_study")
    ap.add_argument("--res", type=int, nargs=2, default=[64, 64])
    ap.add_argument("--passes", type=int, default=4)
    args = ap.parse_args()

    import yaml

    from taming_event_flow_tpu.configs import YAMLParser
    from taming_event_flow_tpu.data.synthetic import write_synthetic_h5
    import train_flow
    import eval_flow

    root = os.path.abspath(args.workdir)
    ds = os.path.join(root, "data")
    os.makedirs(ds, exist_ok=True)
    res = tuple(args.res)
    for i, seed in enumerate((3, 4)):
        write_synthetic_h5(
            os.path.join(ds, f"seq{i}.h5"), n_events=6000, res=res,
            n_flow_frames=16, seed=seed,
        )

    def cfg_path(name, d):
        p = os.path.join(root, name)
        with open(p, "w") as f:
            yaml.safe_dump(d, f)
        return p

    train_cfg = cfg_path("train.yml", {
        "experiment": "bf16study",
        "data": {"path": ds, "mode": "time", "window": 0.1,
                 "passes_loss": args.passes, "scales_loss": 1,
                 "voxel": None, "cache": False},
        "model": {"name": "RecEVFlowNet", "base_channels": 16,
                  "num_encoders": 2, "num_residual_blocks": 1,
                  "min_size": 4, "final_w_scale": 0.01},
        "loss": {"warping": "Iterative", "iterative_mode": "two",
                 "round_ts": False, "flow_scaling": 16,
                 "clip_grad": 100.0},
        "optimizer": {"name": "Adam", "lr": 0.0002},
        "loader": {"n_epochs": 3, "batch_size": 1,
                   "resolution": list(res), "augment": [],
                   "augment_prob": [], "max_num_grad_events": None,
                   "seed": 11},
        "vis": {"verbose": False, "enabled": False, "store": False},
    })
    os.chdir(root)
    runid = train_flow.train(
        argparse.Namespace(config=train_cfg, path_mlflow=root,
                           path_cache="", prev_runid=""),
        YAMLParser(train_cfg),
    )
    print(f"trained {runid}")

    results = {}
    for tag, dtype in (("f32", None), ("bf16", "bfloat16")):
        metrics = {"warping": "Iterative", "name": ["FWL", "RSAT", "AEE"]}
        if dtype:
            metrics["inference_dtype"] = dtype
        ecfg = cfg_path(f"eval_{tag}.yml", {
            "data": {"path": ds, "mode": "gtflow", "window": 1,
                     "passes_loss": args.passes, "cache": False},
            "loader": {"resolution": list(res), "augment": [],
                       "max_num_grad_events": None, "seed": 11},
            "metrics": metrics,
            "vis": {"enabled": False, "store": False, "bars": False,
                    "mask_output": False, "dynamic": False},
        })
        results[tag] = eval_flow.test(
            argparse.Namespace(
                runid=runid, config=ecfg, path_mlflow=root,
                path_results=os.path.join(root, f"results_{tag}") + "/",
            ),
            YAMLParser(ecfg),
        )

    print(f"\n{'metric':8s} {'seq':8s} {'f32':>12s} {'bf16':>12s} "
          f"{'rel diff':>10s}")
    worst = 0.0
    for metric in ("FWL", "RSAT", "AEE"):
        for seq in results["f32"][metric]:
            a = float(results["f32"][metric][seq])
            b = float(results["bf16"][metric][seq])
            rel = abs(b - a) / (abs(a) + 1e-12)
            worst = max(worst, rel)
            print(f"{metric:8s} {seq:8s} {a:12.6f} {b:12.6f} {rel:10.2e}")
    print(f"\nworst relative metric change: {worst:.2e}")


if __name__ == "__main__":
    main()
