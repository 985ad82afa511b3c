"""Host-side window assembly: collect P loader batches into one pass-stacked
device window with a common static event-axis length."""

from __future__ import annotations

from typing import Dict, List

import numpy as np


def pack_net_input(net: np.ndarray) -> np.ndarray:
    """Narrow an integer-valued (count-encoding) net input to the smallest
    dtype that holds it exactly — uint8 covers the typical per-pixel event
    counts, uint16 the heavy tail; values past 65535 stay f32. The device
    programs cast back to f32 (exact for integers in range)."""
    m = net.max()
    if m < 256:
        return net.astype(np.uint8)
    if m < np.iinfo(np.uint16).max + 1:
        return net.astype(np.uint16)
    return net


def stack_window(
    batches: List[Dict[str, np.ndarray]],
    packed: bool = False,
    net_compact: bool = False,
    derive_net: bool = False,
) -> Dict[str, np.ndarray]:
    """Stack P collated batches into ``[P, B, ...]`` arrays for the train
    step, re-padding ragged event tensors to the window's max bucket.

    ``packed=True`` emits the packed WIRE format (every wire byte costs
    host CPU on the tunneled-device stack — the endpoint serializes on the
    same core as the producer), exact by construction
    (:func:`taming_event_flow_tpu.training.step.unpack_window` restores the
    plain window on device):

      * ``event_txy`` ``[P,B,N,3]`` f32 + ``event_p`` ``[P,B,N]`` int8
        replace ``event_list`` (polarity is ±1/0, ``data/base.py``);
      * ``pol_mask`` is not shipped at all — it is ``[p>0, p<0]`` of the
        polarity column, the loader's own construction
        (``data/base.py assemble_sample``);
      * ``grad_mask`` ships as bool (values are 0/1 by construction);
      * with ``net_compact`` (count-encoding mode: integer counts, nearest
        remap — ``data/base.py events_to_channels_np``/``remap``) the net
        input ships as uint8/uint16 when it fits
        (:func:`pack_net_input`). Voxel-mode inputs are fractional —
        leave ``net_compact`` off;
      * with ``derive_net`` (count mode, non-rectified lanes only — with
        rectification a lane's gather map can change mid-window on
        rollover) the net input is not shipped at all: the device step
        rebuilds it from the event lists
        (``ops/encodings.derive_count_input``). Exact for integer
        counts; padding rows carry p=0 and contribute nothing.

    At the reference training config the wire drops 28.8 -> 14.4 MB per
    optimizer step.
    """
    n = max(b["event_list"].shape[1] for b in batches)

    def pad(arr):
        k = arr.shape[1]
        if k == n:
            return arr
        padded = np.zeros((arr.shape[0], n) + arr.shape[2:], arr.dtype)
        padded[:, :k] = arr
        return padded

    if not packed:
        return {
            "net_input": np.stack([b["net_input"] for b in batches]),
            "event_list": np.stack([pad(b["event_list"]) for b in batches]),
            "pol_mask": np.stack(
                [pad(b["event_list_pol_mask"]) for b in batches]
            ),
            "grad_mask": np.stack([pad(b["grad_mask"]) for b in batches]),
        }

    p_ct, b_ct = len(batches), batches[0]["event_list"].shape[0]
    txy = np.zeros((p_ct, b_ct, n, 3), np.float32)
    pol = np.zeros((p_ct, b_ct, n), np.int8)
    grad = np.zeros((p_ct, b_ct, n, 1), bool)
    for i, b in enumerate(batches):
        ev = b["event_list"]
        k = ev.shape[1]
        txy[i, :, :k] = ev[..., :3]
        pol[i, :, :k] = ev[..., 3]
        grad[i, :, :k] = b["grad_mask"] != 0
    if derive_net:
        return {"event_txy": txy, "event_p": pol, "grad_mask": grad}
    net = np.stack([b["net_input"] for b in batches])
    if net_compact:
        net = pack_net_input(net)
    return {
        "net_input": net,
        "event_txy": txy,
        "event_p": pol,
        "grad_mask": grad,
    }


def pad_batch_events(batch: Dict[str, np.ndarray], n: int):
    """Re-pad one batch's ragged event tensors to length ``n`` (>= current)."""
    out = dict(batch)
    for key in ["event_list", "event_list_pol_mask", "grad_mask",
                "event_raw_xy"]:
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
