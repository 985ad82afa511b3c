"""YAML config system.

Same config surface as the reference parser (reference
``configs/parser.py:7-137``): defaults, recursive dict merge, seeding, and
eval-time reconstruction of a train config from tracked run params. Two
deliberate changes:

  * tracked param strings are parsed with ``ast.literal_eval`` — the
    reference round-trips them through ``eval()`` (``parser.py:113-129``),
  * device selection is JAX-native (platform comes from ``JAX_PLATFORMS``);
    there is no ``num_workers`` pin because the loader is an in-process
    iterator with no shared-state hazard.
"""

from __future__ import annotations

import ast
import random
from typing import Any, Dict, Optional

import numpy as np
import yaml


DEFAULTS: Dict[str, Any] = {
    "experiment": "Default",
    "data": {
        "mode": "events",
        "window": 5000,
        "voxel": None,
        "cache": False,
        "passes_loss": 1,
        "scales_loss": 1,
    },
    "loader": {
        "resolution": [180, 240],
        "batch_size": 1,
        "n_epochs": 500,
        "augment": [],
        "augment_prob": [],
        "max_num_grad_events": None,
        "n_events_pad": None,
        "gpu": 0,
        "seed": 42,
    },
    "model": {},
    "parallel": {
        # device-mesh shape for training: data-parallel lanes x event-axis
        # shards (parallel/event.py). Null data = all remaining devices;
        # event > 1 shards the per-window event lists and psum-merges
        # partial IWEs over ICI.
        "data": None,
        "event": 1,
    },
    "loss": {
        "flow_scaling": 32,
        "round_ts": False,
        "iterative_mode": "two",
        "flow_spat_smooth_weight": None,
        "flow_temp_smooth_weight": None,
        "clip_grad": None,
        # performance knobs (read at trace time, never from the environment)
        "matmul_precision": "default",  # default | high | highest (~f32)
        "warp_remat": False,  # remat warp-scan steps (memory vs speed)
        "scan_unroll": 1,  # unroll factor for warp/model scans
        "warp_backend": "auto",  # auto | xla | pallas (ops/backend.py)
        "batched_sweep": False,  # tref-batched IWE sweep (objectives/iterative.py)
        "triangular_warp": True,  # ragged warp table (objectives/iterative.py)
    },
    "metrics": {},
    "optimizer": {"name": "Adam", "lr": 1e-5},
    "runtime": {
        # persistent XLA compilation cache directory (None disables). TPU
        # compiles of the windowed train/eval programs take tens of seconds
        # per process; with a cache dir, repeat runs at the same shapes
        # skip them entirely.
        "compilation_cache": None,
    },
    "vis": {
        "enabled": False,
        "bars": False,
        "store": False,
        "verbose": False,
        "px": 400,
        "mask_output": False,
        "dynamic": False,
        "show": None,
    },
}


def deep_merge(dst: Dict, src: Dict) -> Dict:
    """Recursively merge ``src`` into ``dst`` (reference ``parser.py:73-87``)."""
    for key, val in src.items():
        if isinstance(val, dict):
            node = dst.setdefault(key, {})
            if isinstance(node, dict):
                deep_merge(node, val)
            else:
                dst[key] = val
        else:
            dst[key] = val
    return dst


def _copy(d):
    return yaml.safe_load(yaml.safe_dump(d))


class YAMLParser:
    def __init__(self, config_path: Optional[str] = None):
        self._config = _copy(DEFAULTS)
        self._explicit: Dict[str, Any] = {}
        if config_path is not None:
            self.parse_config(config_path)
        if self._config["loader"].get("seed") is not None:
            self.init_seeds()

    def parse_config(self, path: str):
        with open(path) as f:
            loaded = yaml.safe_load(f) or {}
        deep_merge(self._explicit, _copy(loaded))
        deep_merge(self._config, loaded)

    @property
    def config(self) -> Dict:
        return self._config

    def update(self, config_path: str):
        self._config = _copy(DEFAULTS)
        self.parse_config(config_path)

    def init_seeds(self):
        seed = self._config["loader"]["seed"]
        np.random.seed(seed)
        random.seed(seed)

    def merge_configs(self, run_params: Dict[str, str]) -> Dict:
        """Rebuild a train-time config from tracked (stringified) params,
        then overwrite with this parser's *explicit* eval-file settings
        (precedence: defaults < train params < eval yaml; reference
        ``parser.py:113-129``)."""
        parsed: Dict[str, Any] = {}
        for key, val in run_params.items():
            if isinstance(val, str) and len(val) > 0 and val[0] == "{":
                parsed[key] = ast.literal_eval(val)
            else:
                parsed[key] = val
        config = _copy(DEFAULTS)
        deep_merge(config, parsed)
        deep_merge(config, _copy(self._explicit))
        return config

    @staticmethod
    def apply_runtime(config: Dict) -> None:
        """Apply process-level runtime settings (currently the persistent
        XLA compilation cache). Must run before the first compile; safe to
        call more than once."""
        runtime = config.get("runtime") or {}
        cache_dir = runtime.get("compilation_cache")
        if cache_dir:
            import jax

            jax.config.update("jax_compilation_cache_dir", str(cache_dir))
            # cache every program worth caching, not only >1 s compiles.
            # ``persistent_cache_min_compile_secs: 0`` persists EVERYTHING —
            # what scripts/precompile.py uses so a primed cache is complete
            # (borderline ~0.1 s compiles otherwise flip between written/
            # not-written across runs under host load).
            jax.config.update(
                "jax_persistent_cache_min_compile_time_secs",
                float(runtime.get("persistent_cache_min_compile_secs", 0.1)),
            )

    @staticmethod
    def combine_entries(config: Dict) -> Dict:
        """Kept for CLI-contract compatibility (reference ``parser.py:131-137``
        is a no-op placeholder for tracking-backend param-length limits)."""
        return config
