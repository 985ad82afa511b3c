"""Result/config logging helpers for the eval pipeline.

Counterparts of the reference helpers (reference ``utils/mlflow.py:8-41``,
``utils/utils.py:52-58,125-134``): per-eval-id YAML config/metric files in
the results tree, attached to the tracked run as artifacts.
"""

from __future__ import annotations

import os
from typing import Dict

import yaml

from .store import default_store


def create_model_dir(path_results: str, runid: str) -> str:
    d = os.path.join(path_results, runid)
    os.makedirs(d, exist_ok=True)
    print(f"Results stored at {d}\n")
    return d


def next_eval_id(path_results: str) -> int:
    eval_id = 0
    for f in os.listdir(path_results):
        if f.endswith(".yml"):
            try:
                tmp = int(f.split(".")[0].split("_")[-1])
            except ValueError:
                continue
            eval_id = max(eval_id, tmp + 1)
    return eval_id


def log_config(path_results: str, runid: str, config: Dict) -> int:
    """Write ``eval_<id>.yml`` and attach it to the run; returns eval id."""
    eval_id = next_eval_id(path_results)
    path = os.path.join(path_results, f"eval_{eval_id}.yml")
    with open(path, "w") as f:
        yaml.safe_dump(config, f, default_flow_style=False)
    try:
        default_store().log_artifact(path, run_id=runid)
    except KeyError:
        pass
    return eval_id


def log_results(runid: str, results: Dict, path_results: str, eval_id: int):
    """Write ``metrics_<id>.yml`` and attach it to the run."""
    path = os.path.join(path_results, f"metrics_{eval_id}.yml")
    with open(path, "w") as f:
        yaml.safe_dump(results, f, default_flow_style=False)
    try:
        default_store().log_artifact(path, run_id=runid)
    except KeyError:
        pass


def initialize_quant_results(results: Dict, filename: str, metrics) -> Dict:
    if filename not in results:
        results[filename] = {}
    for metric in metrics:
        results[filename].setdefault(metric, {"metric": 0.0, "it": 0})
    return results
