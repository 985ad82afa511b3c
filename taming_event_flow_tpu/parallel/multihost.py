"""Multi-host (DCN-spanning) data parallelism.

The reference is single-process/single-device by design (reference
``configs/parser.py:89-95``); this is the blueprint's own new-surface plan
(SURVEY §5 "Distributed communication backend"): the ``data`` axis rides ICI
within a host and DCN across hosts via ``jax.distributed``, while the
``event`` axis — whose IWE ``psum`` fires several times per loss window —
stays strictly host-internal.

Design:

* :func:`init_distributed` wires ``jax.distributed.initialize`` from the
  YAML ``parallel`` section or the standard env vars. After it returns,
  ``jax.devices()`` is the GLOBAL device list (ordered by process), and the
  existing :func:`..parallel.event.make_event_parallel_train_step` runs
  unmodified over a global mesh — ``shard_map``/``jit`` compile the same
  program on every host and XLA routes the data-axis gradient ``psum``
  hierarchically (ICI reduce per host, DCN all-reduce across hosts).

* :func:`make_multihost_event_mesh` lays the ``(data, event)`` grid out so
  the event axis never crosses a process boundary: ``jax.devices()`` groups
  devices by process, so a row-major reshape to ``(n_data, n_event)`` with
  ``n_event`` dividing ``local_device_count`` keeps each event ring inside
  one host. The frequent collective stays on ICI; only the once-per-window
  gradient reduction spans DCN.

* Batch lanes partition across hosts: each process streams
  ``B_global / process_count`` lanes of the H5 dataset (the host window
  producer is already per-lane, so this is a pure slicing decision —
  :func:`local_lane_range`), and :func:`globalize_window` assembles the
  global ``[P, B_global, ...]`` arrays from per-process local shards via
  ``jax.make_array_from_process_local_data`` — no host ever materializes
  another host's lanes. The FILE list is partitioned too
  (``H5Loader(file_shard=(process_index, process_count))``): each host
  streams a round-robin shard of the identically-permuted file list, so
  sequence rollover (``max(local file_idx) + 1``) never collides with
  another host's files and one global epoch — every host's
  ``seq_num >= len(local files)``, AND-ed in lockstep — is exactly one
  pass over the dataset. Static event buckets (``loader.n_events_pad``,
  enforced by the CLI) keep the per-host program shapes identical; without
  them each host would bucket to its own local max and the cross-host
  gradient psum would deadlock on shape-divergent programs.

Tested by ``tests/test_multihost.py``: a real 2-process CPU cluster
(the ``jax.distributed`` local-cluster analog of the 8-CPU virtual mesh)
must produce bit-identical losses/params to the single-process run of the
same global batch.
"""

from __future__ import annotations

import os
from typing import Dict, Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..training.step import TrainState
from .event import EVENT_AXIS, _state_specs, _window_specs
from .mesh import DATA_AXIS


def init_distributed(parallel_cfg: Optional[Dict] = None) -> bool:
    """Initialize the multi-process runtime if configured.

    Sources, in precedence order:
      1. YAML ``parallel`` section keys ``coordinator`` (``"host:port"``),
         ``num_processes``, ``process_id``;
      2. env vars ``JAX_COORDINATOR_ADDRESS`` / ``JAX_NUM_PROCESSES`` /
         ``JAX_PROCESS_ID`` (also settable by cluster launchers).

    :return: True when a multi-process runtime was initialized (or already
        is), False for the plain single-process path.

    Must run BEFORE anything touches a jax backend (``jax.devices()``,
    ``jax.process_count()`` — both force single-process initialization), so
    the already-initialized probe uses ``jax.distributed.is_initialized``.
    """
    if jax.distributed.is_initialized():
        return jax.process_count() > 1
    cfg = dict(parallel_cfg or {})
    coord = cfg.get("coordinator") or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    if not coord:
        return False
    num = int(cfg.get("num_processes")
              or os.environ.get("JAX_NUM_PROCESSES", 0))
    pid = cfg.get("process_id")
    if pid is None:
        pid = os.environ.get("JAX_PROCESS_ID")
    if num <= 1 or pid is None:
        return False
    jax.distributed.initialize(
        coordinator_address=coord, num_processes=num, process_id=int(pid)
    )
    return jax.process_count() > 1


def make_multihost_event_mesh(n_event: int = 1) -> Mesh:
    """Global ``(data, event)`` mesh with the event axis host-internal.

    ``jax.devices()`` orders devices by owning process, so the row-major
    ``(n_data, n_event)`` reshape keeps every event ring inside one host iff
    ``n_event`` divides the per-host device count — enforced here.
    """
    local = jax.local_device_count()
    if n_event < 1 or local % n_event != 0:
        raise ValueError(
            f"event axis ({n_event}) must divide the per-host device count "
            f"({local}) so its psum stays on ICI"
        )
    devices = jax.devices()
    n_data = len(devices) // n_event
    grid = np.asarray(devices).reshape(n_data, n_event)
    return Mesh(grid, (DATA_AXIS, EVENT_AXIS))


def local_lane_range(global_batch: int) -> Tuple[int, int]:
    """This process's slice of the global batch lanes.

    :return: ``(start, stop)`` lane indices; every process must stream the
        same number of lanes (``global_batch % process_count == 0``).
    """
    n_proc = jax.process_count()
    if global_batch % n_proc != 0:
        raise ValueError(
            f"global batch {global_batch} must split evenly over "
            f"{n_proc} processes"
        )
    per = global_batch // n_proc
    start = jax.process_index() * per
    return start, start + per


def globalize_window(local_window: Dict, mesh: Mesh,
                     global_batch: int) -> Dict:
    """Assemble global ``[P, B_global, ...]`` window arrays from this
    process's local lane shard ``[P, B_local, ...]``."""
    specs = _window_specs()
    out = {}
    for k, v in local_window.items():
        v = np.asarray(v)
        global_shape = (v.shape[0], global_batch) + v.shape[2:]
        out[k] = jax.make_array_from_process_local_data(
            NamedSharding(mesh, specs[k]), v, global_shape
        )
    return out


def exchange_flags(new_seq_local: np.ndarray,
                   epoch_done_local: bool) -> Tuple[np.ndarray, bool]:
    """Per-batch global sync of the window producer's control flags.

    Each host's loader advances its own lanes, so sequence rollovers and
    epoch boundaries happen at different local steps — but every process
    must take IDENTICAL control decisions (drop-partial-window, carry reset,
    epoch rollover) or the compiled step's collectives deadlock. One tiny
    ``process_allgather`` per batch makes the flags global:

    :param new_seq_local: ``[B_local]`` bool — this host's lane resets.
    :param epoch_done_local: this host's lanes all finished their epoch.
    :return: ``(new_seq_global [B_global], epoch_done_all)`` — the global
        reset mask (process-ordered, matching the lane partition) and
        whether EVERY host finished (epoch barrier).
    """
    from jax.experimental import multihost_utils

    flags = np.concatenate(
        [np.asarray(new_seq_local, np.float32),
         np.asarray([epoch_done_local], np.float32)]
    )
    gathered = np.asarray(multihost_utils.process_allgather(flags))
    return (
        gathered[:, :-1].reshape(-1) > 0,
        bool(gathered[:, -1].all()),
    )


def globalize_state(state: TrainState, mesh: Mesh,
                    global_batch: int) -> TrainState:
    """Place a fresh train state globally: params and optimizer state
    replicated (every process must hold identical copies — same init seed),
    the recurrent carry sharded on the data axis (this process contributes
    its own lanes, built with the LOCAL batch size).
    """
    specs = _state_specs()

    def put_rep(leaf):
        leaf = np.asarray(leaf)
        return jax.make_array_from_process_local_data(
            NamedSharding(mesh, P()), leaf, leaf.shape
        )

    def put_carry(leaf):
        leaf = np.asarray(leaf)  # [B_local, ...]
        global_shape = (global_batch,) + leaf.shape[1:]
        return jax.make_array_from_process_local_data(
            NamedSharding(mesh, specs.carry), leaf, global_shape
        )

    return TrainState(
        params=jax.tree.map(put_rep, state.params),
        opt_state=jax.tree.map(put_rep, state.opt_state),
        carry=jax.tree.map(put_carry, state.carry),
        step=put_rep(np.asarray(state.step)),
    )
