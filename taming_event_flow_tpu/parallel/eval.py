"""Event-sharded evaluation: multi-chip inference for large-map protocols.

Eval runs at batch 1 (the reference forces it, ``eval_flow.py:30``), so the
only parallel axis with real work on it is the EVENT dimension of the
validation slot state. Everything per-event in ``IterativeValidation.update``
(incremental forward warps, the backward re-warp scan, purging) is
embarrassingly parallel across that axis; flow maps and the pixel-space
accumulators are tiny and stay replicated.

This module uses plain GSPMD — ``NamedSharding`` annotations on the slot
state + ``jit`` — rather than ``shard_map``: XLA propagates the event-axis
sharding through the elementwise warp math with zero collectives in
``update``, and inserts the gather/reduce collectives for the window-level
metric reducers (FWL/RSAT splats) on its own. That is the scaling-book
recipe: pick a mesh, annotate, let the compiler place the communication.

Constraint: ``round_ts`` must be off (its global ``min`` over events would
silently become a per-shard min under sharding; the default protocols never
enable it at eval).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

EVAL_EVENT_AXIS = "event"

# ValState fields whose axis 2 is the event dimension ([P, B, N, ...])
_EVENT_FIELDS = (
    "event_ts", "event_loc", "pol_mask",
    "fw_loc", "fw_ts", "fw_mask", "bw_loc", "bw_mask",
)


def make_eval_mesh(n_devices: Optional[int] = None,
                   devices: Optional[Sequence] = None) -> Mesh:
    """1-D mesh over the event axis for sharded evaluation."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (EVAL_EVENT_AXIS,))


def shard_val_state(state, mesh: Mesh, round_ts: bool = False):
    """Place a ``ValState``: event-dim buffers shard on N, rest replicated.

    :param round_ts: pass the protocol's ``round_ts`` flag — sharding is
        refused when it is on (the global ts ``min`` would silently become a
        per-shard min; see module docstring).
    """
    if round_ts:
        raise ValueError(
            "round_ts is incompatible with event-axis sharding: its global "
            "min over events would become a per-shard min. Run unsharded."
        )
    ev = NamedSharding(mesh, P(None, None, EVAL_EVENT_AXIS))
    rep = NamedSharding(mesh, P())
    placed = {}
    for name, leaf in state._asdict().items():
        sh = ev if name in _EVENT_FIELDS else rep
        placed[name] = jax.device_put(leaf, sh)
    return type(state)(**placed)


def shard_eval_batch(event_list, pol_mask, mesh: Mesh):
    """Place per-pass event inputs (``[B, N, ...]``) sharded on N."""
    sh = NamedSharding(mesh, P(None, EVAL_EVENT_AXIS))
    return jax.device_put(event_list, sh), jax.device_put(pol_mask, sh)


def shard_eval_window(event_lists, pol_masks, mesh: Mesh):
    """Place pass-stacked event inputs (``[P, B, N, ...]``) sharded on N
    (the windowed eval path, ``training.make_eval_window_step``)."""
    sh = NamedSharding(mesh, P(None, None, EVAL_EVENT_AXIS))
    return jax.device_put(event_lists, sh), jax.device_put(pol_masks, sh)


def _state_specs(state) -> "object":
    """Per-field PartitionSpecs for a ``ValState`` under the event mesh."""
    return type(state)(**{
        name: P(None, None, EVAL_EVENT_AXIS) if name in _EVENT_FIELDS
        else P()
        for name in state._fields
    })


def make_sharded_reducers(criteria, mesh: Mesh, template_state):
    """Jitted ``shard_map`` wrappers for the window-level metric reducers.

    Under the event-sharded slot state the reducers' splats see only local
    shards; each wrapper runs the reducer per shard with
    ``event_axis=EVAL_EVENT_AXIS`` (partial IWEs ``psum``-merged before any
    normalization — exact) — so the splat backends, Pallas included, run
    on LOCAL data and never block GSPMD propagation.

    :return: dict with jitted ``fwl(state)``, ``rsat(state)``,
        ``window_events(state)``, ``window_iwe_fw(state)``,
        ``window_iwe_bw(state)`` callables. The vis-facing ``window_iwe``
        accessors are included because the raw ``criteria`` methods splat
        the event-dim (sharded) slot buffers — calling them outside
        ``shard_map`` would put an opaque Pallas splat in GSPMD's way
        (``window_flow`` reads only replicated pixel-space accumulators and
        stays safe to call raw).
    """
    from jax import shard_map

    specs = _state_specs(template_state)

    def wrap(fn, out_spec=P()):
        inner = shard_map(
            fn, mesh=mesh, in_specs=(specs,), out_specs=out_spec,
            check_vma=False,
        )
        return jax.jit(inner)

    return {
        "fwl": wrap(lambda s: criteria.fwl(s, event_axis=EVAL_EVENT_AXIS)),
        "rsat": wrap(
            lambda s: criteria.rsat(s, event_axis=EVAL_EVENT_AXIS)
        ),
        "rsat_fwl": wrap(
            lambda s: criteria.rsat_fwl(s, event_axis=EVAL_EVENT_AXIS),
            out_spec=(P(), P()),
        ),
        "window_events": wrap(
            lambda s: criteria.window_events(
                s, event_axis=EVAL_EVENT_AXIS
            )
        ),
        "window_iwe_fw": wrap(
            lambda s: criteria.window_iwe(
                s, mode="forward", event_axis=EVAL_EVENT_AXIS
            )
        ),
        "window_iwe_bw": wrap(
            lambda s: criteria.window_iwe(
                s, mode="backward", event_axis=EVAL_EVENT_AXIS
            )
        ),
    }
