"""Event-axis (sequence) parallelism: 2-D (data x event) mesh equivalence.

The IWE splat is a sum over events, so sharding the event dimension and
psum-merging partial IWEs must reproduce the single-device loss AND
gradients exactly up to float reduction order (see
``parallel/event.py``). Runs on the 8-virtual-CPU platform from conftest.
"""

import numpy as np

import jax
import jax.numpy as jnp

from taming_event_flow_tpu.objectives import LossConfig
from taming_event_flow_tpu.parallel.event import (
    make_event_mesh,
    make_event_parallel_train_step,
    shard_state_2d,
    shard_window_2d,
)
from taming_event_flow_tpu.training import build_optimizer, make_train_step
from taming_event_flow_tpu.training.step import init_train_state

from .test_training import RES, make_window, tiny_model


def _setup(rng, warping="Iterative"):
    batch = 2
    model = tiny_model()
    cfg = LossConfig(res=RES, passes_loss=3, scales_loss=1,
                     iterative_mode="two")
    opt = build_optimizer({"name": "Adam", "lr": 1e-3}, clip_grad=100.0)
    state = init_train_state(model, opt, batch, RES[0], RES[1], 2)
    window = {k: jnp.asarray(v) for k, v in make_window(rng, batch).items()}
    return model, cfg, opt, state, window


def test_event_parallel_matches_single_device(rng):
    model, cfg, opt, state, window = _setup(rng)
    ref_step = make_train_step(model, opt, cfg, "Iterative",
                               flow_scaling=4.0, donate=False)
    ref_state, ref_loss = ref_step(state, window)

    mesh = make_event_mesh(2, 4)
    ep_step = make_event_parallel_train_step(
        model, opt, cfg, mesh, "Iterative", flow_scaling=4.0
    )
    ep_state, ep_loss = ep_step(
        shard_state_2d(state, mesh), shard_window_2d(window, mesh)
    )

    np.testing.assert_allclose(float(ep_loss), float(ref_loss), rtol=1e-4)
    for a, b in zip(jax.tree.leaves(ep_state.params),
                    jax.tree.leaves(ref_state.params)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-3, atol=1e-6
        )
    for a, b in zip(jax.tree.leaves(ep_state.carry),
                    jax.tree.leaves(ref_state.carry)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-5
        )


def test_event_parallel_linear_loss(rng):
    """The Linear loss composes with the event axis the same way."""
    model, cfg, opt, state, window = _setup(rng)
    ref_step = make_train_step(model, opt, cfg, "Linear",
                               flow_scaling=4.0, donate=False)
    _, ref_loss = ref_step(state, window)

    mesh = make_event_mesh(1, 8)
    ep_step = make_event_parallel_train_step(
        model, opt, cfg, mesh, "Linear", flow_scaling=4.0
    )
    # 1-lane data axis x 8-way event split
    batch1 = {k: v[:, :1] for k, v in window.items()}
    state1 = init_train_state(
        model, build_optimizer({"name": "Adam", "lr": 1e-3}, 100.0),
        1, RES[0], RES[1], 2,
    )
    ref1 = make_train_step(model, build_optimizer(
        {"name": "Adam", "lr": 1e-3}, 100.0), cfg, "Linear",
        flow_scaling=4.0, donate=False)
    _, ref_loss1 = ref1(state1, batch1)
    _, ep_loss1 = ep_step(
        shard_state_2d(state1, mesh), shard_window_2d(batch1, mesh)
    )
    np.testing.assert_allclose(float(ep_loss1), float(ref_loss1), rtol=1e-4)


def test_event_parallel_smoothness_terms(rng):
    """Non-event loss terms (spatial/temporal smoothness) stay exact under
    the event-axis pmean (they are replicated work, not sharded work)."""
    model, _, opt, state, window = _setup(rng)
    cfg = LossConfig(res=RES, passes_loss=3, scales_loss=1,
                     iterative_mode="two",
                     flow_spat_smooth_weight=0.1,
                     flow_temp_smooth_weight=0.1)
    ref_step = make_train_step(model, opt, cfg, "Iterative",
                               flow_scaling=4.0, donate=False)
    ref_state, ref_loss = ref_step(state, window)

    mesh = make_event_mesh(2, 4)
    ep_step = make_event_parallel_train_step(
        model, opt, cfg, mesh, "Iterative", flow_scaling=4.0
    )
    ep_state, ep_loss = ep_step(
        shard_state_2d(state, mesh), shard_window_2d(window, mesh)
    )
    np.testing.assert_allclose(float(ep_loss), float(ref_loss), rtol=1e-4)
    for a, b in zip(jax.tree.leaves(ep_state.params),
                    jax.tree.leaves(ref_state.params)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-3, atol=1e-6
        )
