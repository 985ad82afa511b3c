"""Host-side window assembly: collect P loader batches into one pass-stacked
device window with a common static event-axis length."""

from __future__ import annotations

from typing import Dict, List

import numpy as np


def stack_window(batches: List[Dict[str, np.ndarray]]) -> Dict[str, np.ndarray]:
    """Stack P collated batches into ``[P, B, ...]`` arrays for the train
    step, re-padding ragged event tensors to the window's max bucket."""
    ragged = ["event_list", "event_list_pol_mask", "grad_mask"]
    n = max(b["event_list"].shape[1] for b in batches)

    def pad(arr):
        k = arr.shape[1]
        if k == n:
            return arr
        padded = np.zeros((arr.shape[0], n) + arr.shape[2:], arr.dtype)
        padded[:, :k] = arr
        return padded

    return {
        "net_input": np.stack([b["net_input"] for b in batches]),
        "event_list": np.stack([pad(b["event_list"]) for b in batches]),
        "pol_mask": np.stack(
            [pad(b["event_list_pol_mask"]) for b in batches]
        ),
        "grad_mask": np.stack([pad(b["grad_mask"]) for b in batches]),
    }


def pad_batch_events(batch: Dict[str, np.ndarray], n: int):
    """Re-pad one batch's ragged event tensors to length ``n`` (>= current)."""
    out = dict(batch)
    for key in ["event_list", "event_list_pol_mask", "grad_mask"]:
        if key in out:
            arr = out[key]
            if arr.shape[1] < n:
                padded = np.zeros(
                    (arr.shape[0], n) + arr.shape[2:], arr.dtype
                )
                padded[:, : arr.shape[1]] = arr
                out[key] = padded
    return out
