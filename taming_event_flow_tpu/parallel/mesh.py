"""Data-parallel device mesh utilities.

The reference is strictly single-device (its "batch parallelism" is B
independent file lanes inside one process, reference
``dataloader/h5.py:53-55,268-270``; device pick at ``configs/parser.py:89-95``).
This module supplies the distributed component the TPU build introduces:

  * a 1-D ``jax.sharding.Mesh`` over the ``data`` axis (ICI within a pod,
    DCN across pods via ``jax.distributed``),
  * ``NamedSharding`` placement helpers for pass-stacked windows
    (``[P, B, ...]`` arrays shard on the batch axis),
  * gradient all-reduce falls out of ``jit`` over sharded inputs — XLA
    inserts the ``psum`` over ICI; no hand-written collectives needed.

The batch axis is the natural parallel axis here: every lane is an
independent event-stream, recurrent carry included, so the only cross-device
communication in the whole training step is the gradient reduction.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


DATA_AXIS = "data"


def make_mesh(n_devices: Optional[int] = None,
              devices: Optional[Sequence] = None) -> Mesh:
    """1-D data-parallel mesh over the available (or given) devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def batch_sharding(mesh: Mesh, batch_axis: int = 1) -> NamedSharding:
    """Sharding for a pass-stacked window array ``[P, B, ...]``:
    batch axis over the data mesh axis, everything else replicated."""
    spec = [None] * (batch_axis + 1)
    spec[batch_axis] = DATA_AXIS
    return NamedSharding(mesh, P(*spec))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_window(window: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    """Place a pass-stacked window dict on the mesh (shard on batch)."""
    sh = batch_sharding(mesh, batch_axis=1)
    return {k: jax.device_put(v, sh) for k, v in window.items()}


def shard_state(state, mesh: Mesh):
    """Replicate params/opt-state; shard the recurrent carry on batch."""
    rep = replicate(mesh)
    carry_sh = batch_sharding(mesh, batch_axis=0)
    return type(state)(
        params=jax.device_put(state.params, rep),
        opt_state=jax.device_put(state.opt_state, rep),
        carry=jax.tree.map(lambda x: jax.device_put(x, carry_sh), state.carry),
        step=jax.device_put(state.step, rep),
    )
