"""Cold-start story: scripts/precompile.py primes the persistent XLA cache
with the CLI's real programs — a later process at the same shapes compiles
nothing new (pure cache hits)."""

import os
import re
import subprocess
import sys

import pytest
import yaml

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _tiny_cfgs(root):
    res = [32, 32]
    train = {
        "experiment": "pc",
        "data": {"path": "unused", "mode": "time", "window": 0.2,
                 "passes_loss": 2, "scales_loss": 1, "voxel": None,
                 "cache": False},
        "model": {"name": "RecEVFlowNet", "base_channels": 8,
                  "num_encoders": 2, "num_residual_blocks": 1,
                  "min_size": 4, "final_w_scale": 0.01},
        "loss": {"warping": "Iterative", "iterative_mode": "two",
                 "round_ts": False, "flow_scaling": 8, "clip_grad": 100.0},
        "optimizer": {"name": "Adam", "lr": 0.0001},
        "loader": {"n_epochs": 1, "batch_size": 1, "resolution": res,
                   "augment": [], "augment_prob": [],
                   "max_num_grad_events": None, "n_events_pad": 512,
                   "seed": 3},
        "vis": {"verbose": False, "enabled": False, "store": False},
    }
    ev = {
        "data": {"path": "unused", "mode": "gtflow", "window": 1,
                 "passes_loss": 2, "cache": False},
        "loader": {"resolution": res, "augment": [],
                   "max_num_grad_events": None, "n_events_pad": 512,
                   "seed": None},
        "metrics": {"warping": "Iterative", "name": ["FWL", "RSAT", "AEE"]},
        "vis": {"enabled": False, "store": False, "bars": False,
                "mask_output": False, "dynamic": False,
                "show": ["flow_bw"]},
    }
    tp = os.path.join(root, "train.yml")
    ep = os.path.join(root, "eval.yml")
    with open(tp, "w") as f:
        yaml.safe_dump(train, f)
    with open(ep, "w") as f:
        yaml.safe_dump(ev, f)
    return tp, ep


def _run(cache, tp, ep, workdir):
    # PYTHONPATH=REPO only: drops the axon sitecustomize so the subprocess
    # initializes the CPU backend (verify-skill recipe)
    env = dict(os.environ, PYTHONPATH=REPO, JAX_PLATFORMS="cpu")
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "precompile.py"),
         "--train", tp, "--eval", ep, "--cache", cache,
         "--workdir", workdir, "--keep"],
        env=env, capture_output=True, text=True, timeout=900,
    )
    assert out.returncode == 0, out.stdout[-4000:] + out.stderr[-3000:]
    m = re.search(r"(\d+) new cache entries \((\d+) total\)", out.stdout)
    assert m, out.stdout[-2000:]
    return int(m.group(1)), int(m.group(2))


@pytest.mark.slow
def test_precompile_second_run_is_all_hits(tmp_path):
    cache = str(tmp_path / "cache")
    tp, ep = _tiny_cfgs(str(tmp_path))

    new1, total1 = _run(cache, tp, ep, str(tmp_path / "w1"))
    assert new1 > 0 and total1 == new1  # cold: real programs were cached

    # fresh process, fresh scratch data, same shapes: every compile must
    # come from the cache — zero new entries
    new2, total2 = _run(cache, tp, ep, str(tmp_path / "w2"))
    assert new2 == 0, f"expected pure cache hits, got {new2} new entries"
    assert total2 == total1
