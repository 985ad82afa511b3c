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


class WindowGrouper:
    """Mirror of the eval consumer's window-grouping state machine.

    The prefetch producer pre-stages a GT window's device inputs exactly
    when the consumer's ``wbuf`` will reach ``passes`` cleanly. That
    requires replaying the consumer's transitions (``eval_flow.test``'s
    loop) on the producer side:

      * ``new_seq``  — partial window dropped, counters reset;
      * ``ts_jump``  — buffered passes flushed per-pass (the recovery then
        runs per-pass until the boundary), so the mirror's pass counter
        ACCUMULATES across a jump — a second jump during recovery must not
        reset it while the consumer keeps counting;
      * a clean P-th batch completes a window (stage point), after which
        the consumer's boundary block resets its counter.

    ``feed`` returns the buffered batch list exactly when a full clean
    window formed (the staging point), else ``None``.
    """

    def __init__(self, passes: int):
        self.passes = passes
        self.buf: List = []
        self.pd = 0  # mirror of the consumer's passes_done

    def feed(self, batch, new_seq: bool, ts_jump: bool):
        if new_seq:
            self.buf.clear()
            self.pd = 0
        if ts_jump:
            self.pd += len(self.buf)
            self.buf.clear()
        out = None
        if self.pd == 0:
            self.buf.append(batch)
            if len(self.buf) == self.passes:
                out = list(self.buf)
                self.buf.clear()
                self.pd = self.passes
        else:
            self.pd += 1
        if self.pd == self.passes:
            self.pd = 0
        return out
