"""Checkpoint save/restore addressed by tracking run id.

The reference checkpoints by pickling the whole torch module into the run's
artifact tree and warm-starts by run id (reference ``utils/utils.py:9-61``,
``train_flow.py:63,92-95``). Here checkpoints are flax msgpack blobs of
``(params, opt_state, step, epoch)`` under ``artifacts/model/`` — optimizer
moments included, which the reference loses on resume (it restarts Adam).
Pretrained *reference* checkpoints (``model.pth``) are importable through
the layout converter in :mod:`..models.port`.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional, Tuple

import numpy as np
from flax import serialization

from .store import default_store


CKPT_NAME = "checkpoint.msgpack"


def save_checkpoint(run_id: str, params: Any, opt_state: Any = None,
                    step: int = 0, epoch: int = 0,
                    store=None) -> str:
    store = store or default_store()
    d = store.artifact_dir(run_id, "model")
    path = os.path.join(d, CKPT_NAME)
    blob = serialization.to_bytes(
        {
            "params": params,
            "opt_state": opt_state,
            "step": np.int64(step),
            "epoch": np.int64(epoch),
        }
    )
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(blob)
    os.replace(tmp, path)
    return path


def load_checkpoint(run_id: str, template: Dict[str, Any],
                    store=None) -> Tuple[Optional[Dict[str, Any]], int]:
    """Restore a checkpoint into ``template``'s structure.

    :return: ``(state_dict | None, starting_epoch)`` — mirrors the reference
        ``load_model`` contract of silently warm-starting when possible
        (``utils/utils.py:9-49``).
    """
    store = store or default_store()
    try:
        run = store.get_run(run_id)
    except (KeyError, TypeError):
        return None, 0
    path = os.path.join(run.info.artifact_uri, "model", CKPT_NAME)
    if not os.path.isfile(path):
        print(f"No model found at {run_id}")
        return None, 0
    with open(path, "rb") as f:
        restored = serialization.from_bytes(template, f.read())
    print(f"Model restored from {run_id}")
    return restored, int(restored.get("epoch", 0))


def load_reference_torch_checkpoint(path: str) -> Dict:
    """Import a reference ``model.pth`` (pickled torch module or state_dict)
    as flax params. Requires torch; the reference package must be importable
    when the file pickles the module object itself."""
    import torch

    from ..models.port import torch_state_dict_to_flax

    obj = torch.load(path, map_location="cpu", weights_only=False)
    state_dict = obj if isinstance(obj, dict) else obj.state_dict()
    return torch_state_dict_to_flax(
        {k: v.detach().cpu().numpy() for k, v in state_dict.items()}
    )
