"""Event-axis ("sequence") parallelism for the contrast-max training step.

The reference has no distributed anything (SURVEY §2 row 19); its long-
sequence axis is temporal streaming. The honest sequence-parallel analog for
this workload is the EVENT dimension: the IWE splat is a plain sum over
events, so the per-window event list can be sharded across chips, each chip
splats its shard into a full-resolution partial IWE, and one ``psum`` over
ICI merges the partials before the focus-loss normalization
(``objectives/base.iwe_with_ts``). Everything upstream of the splat (flow
gathers, propagation, purging) is per-event independent and needs no
communication at all.

The 2-D mesh composes this with data parallelism:

  * ``data`` axis — batch lanes (independent event streams, carry included);
    the only collective is the gradient all-reduce.
  * ``event`` axis — each lane's event list split into N/E chunks; the only
    collectives are the per-IWE ``psum``s (a few [B_local, H, W, 4] arrays
    per loss window) and the gradient all-reduce.

The model forward runs replicated across the ``event`` axis (its FLOPs are
small next to the warp pipeline at scale; replication avoids any activation
collective). Gradients are ``psum``'d over BOTH axes: the event-axis psum is
exact because each device's backward covers only its shard's cotangent path
(the loss-side ``pmean`` routes one unit of cotangent through each shard —
see ``iterative_loss``'s ``event_axis`` note).

Zero-padding composability: padding events carry zero polarity masks, so an
uneven final shard contributes nothing — identical to the single-device
padding contract.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..objectives import LossConfig, LOSS_REGISTRY
from ..training.step import TrainState
from .mesh import DATA_AXIS

EVENT_AXIS = "event"


def make_event_mesh(n_data: int, n_event: int, devices=None) -> Mesh:
    """2-D ``(data, event)`` mesh over ``n_data * n_event`` devices.

    The event axis should map to the fastest (innermost-ICI) device ring:
    its psum moves [B_local, H, W, 4] IWEs every loss window, while the data
    axis only all-reduces gradients once per step.
    """
    if devices is None:
        devices = jax.devices()
    need = n_data * n_event
    if len(devices) < need:
        raise ValueError(
            f"need {need} devices for a {n_data}x{n_event} mesh, "
            f"have {len(devices)}"
        )
    grid = np.asarray(devices[:need]).reshape(n_data, n_event)
    return Mesh(grid, (DATA_AXIS, EVENT_AXIS))


def _window_specs() -> Dict[str, P]:
    return {
        "net_input": P(None, DATA_AXIS),  # [P, B, H, W, C]
        "event_list": P(None, DATA_AXIS, EVENT_AXIS),  # [P, B, N, 4]
        "pol_mask": P(None, DATA_AXIS, EVENT_AXIS),
        "grad_mask": P(None, DATA_AXIS, EVENT_AXIS),
    }


def _state_specs() -> TrainState:
    return TrainState(
        params=P(),
        opt_state=P(),
        carry=P(DATA_AXIS),
        step=P(),
    )


def shard_window_2d(window: Dict, mesh: Mesh) -> Dict:
    """Place a pass-stacked window on the 2-D mesh (batch x event)."""
    specs = _window_specs()
    return {
        k: jax.device_put(v, NamedSharding(mesh, specs[k]))
        for k, v in window.items()
    }


def shard_state_2d(state: TrainState, mesh: Mesh) -> TrainState:
    """Replicate params/opt-state; shard the carry on the data axis."""
    rep = NamedSharding(mesh, P())
    carry_sh = NamedSharding(mesh, P(DATA_AXIS))
    return TrainState(
        params=jax.device_put(state.params, rep),
        opt_state=jax.device_put(state.opt_state, rep),
        carry=jax.tree.map(lambda x: jax.device_put(x, carry_sh), state.carry),
        step=jax.device_put(state.step, rep),
    )


def make_event_parallel_train_step(
    model,
    optimizer,
    loss_cfg: LossConfig,
    mesh: Mesh,
    warping: str = "Iterative",
    flow_scaling: float = 32.0,
) -> Callable:
    """Jitted TBPTT window step over a ``(data, event)`` mesh.

    Same contract as :func:`..training.step.make_train_step` — call with a
    state/window placed by :func:`shard_state_2d` / :func:`shard_window_2d`.
    Requires ``B % n_data == 0`` and ``N % n_event == 0``.
    """
    loss_fn = LOSS_REGISTRY[warping]

    def step(state: TrainState, window: Dict[str, jnp.ndarray]):
        def compute_loss(params):
            def body(carry, x):
                flows, new_carry = model.apply({"params": params}, x, carry)
                return new_carry, flows * flow_scaling

            new_carry, flows = jax.lax.scan(
                body, state.carry, window["net_input"],
                unroll=loss_cfg.scan_unroll,
            )
            loss = loss_fn(
                flows,
                window["event_list"],
                window["pol_mask"],
                window["grad_mask"],
                loss_cfg,
                event_axis=EVENT_AXIS,
            )
            return loss, new_carry

        (loss, new_carry), grads = jax.value_and_grad(
            compute_loss, has_aux=True
        )(state.params)
        # data axis: conventional DP sum. Event axis: jax transposes psum to
        # psum, so the loss's IWE/pmean collectives hand every shard an
        # E-fold cotangent (the replicated forward is re-summed); each
        # device's local grad is E x its shard's true contribution —
        # uniformly, for the event-dependent AND replicated (smoothness)
        # paths alike. pmean over the event axis (sum / E) is therefore
        # exact; pinned by tests/test_parallel_event.py against the
        # single-device step.
        grads = jax.lax.psum(grads, DATA_AXIS)
        grads = jax.lax.pmean(grads, EVENT_AXIS)
        updates, new_opt = optimizer.update(grads, state.opt_state,
                                            state.params)
        new_params = optax.apply_updates(state.params, updates)
        loss = jax.lax.psum(loss, DATA_AXIS)
        return (
            TrainState(new_params, new_opt, new_carry, state.step + 1),
            loss,
        )

    sharded = jax.shard_map(
        step,
        mesh=mesh,
        in_specs=(_state_specs(), _window_specs()),
        out_specs=(_state_specs(), P()),
        check_vma=False,
    )
    return jax.jit(sharded)
