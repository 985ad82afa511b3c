"""Value + gradient parity of the contrast-max losses vs the torch reference."""

import copy

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from taming_event_flow_tpu.objectives import (
    LossConfig,
    iterative_loss,
    linear_loss,
)

from .oracle import requires_reference, torch_from

RES = (8, 10)
B = 1
N_GRAD = 12
N_DET = 6
N = N_GRAD + N_DET
S = 2  # flow scales


def ref_config(passes, scales=1, mode="two", round_ts=False,
               spat=None, temp=None):
    return {
        "loader": {"resolution": list(RES), "batch_size": B},
        "data": {"passes_loss": passes, "scales_loss": scales},
        "loss": {
            "iterative_mode": mode,
            "round_ts": round_ts,
            "flow_spat_smooth_weight": spat,
            "flow_temp_smooth_weight": temp,
        },
    }


def make_inputs(rng, passes):
    """Random flows + events; returns jax-side and torch-side views."""
    flows = rng.normal(size=(passes, S, B, RES[0], RES[1], 2)).astype(
        np.float32
    ) * 1.5
    events = np.zeros((passes, B, N, 4), np.float32)
    events[..., 0] = rng.uniform(0, 1, (passes, B, N))
    # loader contract: window ts starts at 0 (dataloader/base.py:168-169);
    # anchor both the grad and detached subsets so round_ts parity holds
    events[:, :, 0, 0] = 0.0
    events[:, :, N_GRAD, 0] = 0.0
    events[..., 1] = rng.integers(0, RES[0], (passes, B, N))
    events[..., 2] = rng.integers(0, RES[1], (passes, B, N))
    events[..., 3] = rng.choice([-1.0, 1.0], (passes, B, N))
    pol = np.stack(
        [(events[..., 3] > 0), (events[..., 3] < 0)], axis=-1
    ).astype(np.float32)
    grad_mask = np.zeros((passes, B, N, 1), np.float32)
    grad_mask[:, :, :N_GRAD] = 1.0
    return flows, events, pol, grad_mask


def run_reference(loss_cls, config, flows, events, pol, grad_mask,
                  want_grad=True):
    """Drive the reference loss: P updates then forward()."""
    import torch

    passes = flows.shape[0]
    config = copy.deepcopy(config)
    crit = loss_cls(config, torch.device("cpu"))

    tflows = torch.from_numpy(
        np.moveaxis(flows, -1, 3).copy()  # [P,S,B,2,H,W]
    ).requires_grad_(want_grad)

    for p in range(passes):
        flow_list = [tflows[p, i] for i in range(S)]
        ev = torch_from(events[p, :, :N_GRAD]).clone()
        pm = torch_from(pol[p, :, :N_GRAD]).clone()
        dev = torch_from(events[p, :, N_GRAD:]).clone()
        dpm = torch_from(pol[p, :, N_GRAD:]).clone()
        crit.update(flow_list, ev, pm, dev, dpm)

    loss = crit()
    grad = None
    if want_grad:
        loss.backward()
        grad = np.moveaxis(tflows.grad.numpy(), 3, -1)  # back to [...,2] last
    return float(loss.detach()), grad


@requires_reference
@pytest.mark.parametrize(
    "passes,scales,mode,round_ts",
    [
        (4, 1, "two", False),
        (4, 2, "two", False),
        (4, 1, "one", False),
        (3, 1, "one", True),
    ],
)
def test_iterative_loss_value_and_grad_parity(rng, passes, scales, mode, round_ts):
    from loss.flow import Iterative as RefIterative

    eff_passes = passes * 2 if mode == "four" else passes
    flows, events, pol, grad_mask = make_inputs(rng, eff_passes)

    cfg = LossConfig(
        res=RES, passes_loss=eff_passes, scales_loss=scales,
        iterative_mode=mode, round_ts=round_ts,
    )

    def jax_loss(f):
        return iterative_loss(
            f, jnp.asarray(events), jnp.asarray(pol),
            jnp.asarray(grad_mask), cfg,
        )

    ours, ours_grad = jax.value_and_grad(jax_loss)(jnp.asarray(flows))
    ref, ref_grad = run_reference(
        RefIterative, ref_config(passes, scales, mode, round_ts),
        flows, events, pol, grad_mask,
    )

    np.testing.assert_allclose(float(ours), ref, rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(ours_grad), ref_grad, rtol=2e-3, atol=2e-5
    )


@requires_reference
@pytest.mark.parametrize("scales", [1, 2])
def test_linear_loss_value_and_grad_parity(rng, scales):
    from loss.flow import Linear as RefLinear

    passes = 4
    flows, events, pol, grad_mask = make_inputs(rng, passes)

    cfg = LossConfig(
        res=RES, passes_loss=passes, scales_loss=scales,
        iterative_mode="two", round_ts=False,
    )

    def jax_loss(f):
        return linear_loss(
            f, jnp.asarray(events), jnp.asarray(pol),
            jnp.asarray(grad_mask), cfg,
        )

    ours, ours_grad = jax.value_and_grad(jax_loss)(jnp.asarray(flows))
    ref, ref_grad = run_reference(
        RefLinear, ref_config(passes, scales), flows, events, pol, grad_mask
    )

    np.testing.assert_allclose(float(ours), ref, rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(ours_grad), ref_grad, rtol=2e-3, atol=2e-5
    )


@requires_reference
def test_iterative_loss_smoothness_parity(rng):
    from loss.flow import Iterative as RefIterative

    passes = 3
    flows, events, pol, grad_mask = make_inputs(rng, passes)
    cfg = LossConfig(
        res=RES, passes_loss=passes, scales_loss=1, iterative_mode="two",
        flow_spat_smooth_weight=0.5, flow_temp_smooth_weight=0.3,
    )

    ours = float(
        iterative_loss(
            jnp.asarray(flows), jnp.asarray(events), jnp.asarray(pol),
            jnp.asarray(grad_mask), cfg,
        )
    )
    ref, _ = run_reference(
        RefIterative,
        ref_config(passes, 1, "two", spat=0.5, temp=0.3),
        flows, events, pol, grad_mask, want_grad=False,
    )
    np.testing.assert_allclose(ours, ref, rtol=5e-4, atol=1e-5)


def test_iterative_mode_four_self_consistency(rng):
    """Mode "four" cannot be parity-tested: the reference crashes on it with
    border compensation enabled (its shared masks are only built for
    ``t in [low_tref, high_tref - 1)`` but read from ``low_extreme <
    low_tref`` — ``loss/flow.py:671-694``). We implement the documented
    intent (shared masks over the whole deblurring window) and check
    finiteness + differentiability."""
    passes = 8  # mode four doubles the configured 4
    flows, events, pol, grad_mask = make_inputs(rng, passes)
    cfg = LossConfig(
        res=RES, passes_loss=passes, scales_loss=1, iterative_mode="four"
    )
    val, grad = jax.value_and_grad(
        lambda f: iterative_loss(
            f, jnp.asarray(events), jnp.asarray(pol),
            jnp.asarray(grad_mask), cfg,
        )
    )(jnp.asarray(flows))
    assert np.isfinite(float(val))
    assert np.all(np.isfinite(np.asarray(grad)))
    assert float(jnp.abs(grad).sum()) > 0


def test_iterative_loss_padding_invariance(rng):
    """Extra zero-padded events must not change the loss."""
    passes = 3
    flows, events, pol, grad_mask = make_inputs(rng, passes)
    cfg = LossConfig(res=RES, passes_loss=passes)

    base = float(
        iterative_loss(
            jnp.asarray(flows), jnp.asarray(events), jnp.asarray(pol),
            jnp.asarray(grad_mask), cfg,
        )
    )
    pad = 7
    events_p = np.concatenate(
        [events, np.zeros((passes, B, pad, 4), np.float32)], axis=2
    )
    pol_p = np.concatenate(
        [pol, np.zeros((passes, B, pad, 2), np.float32)], axis=2
    )
    gm_p = np.concatenate(
        [grad_mask, np.zeros((passes, B, pad, 1), np.float32)], axis=2
    )
    padded = float(
        iterative_loss(
            jnp.asarray(flows), jnp.asarray(events_p), jnp.asarray(pol_p),
            jnp.asarray(gm_p), cfg,
        )
    )
    np.testing.assert_allclose(base, padded, rtol=1e-6)


def test_iterative_loss_jits(rng):
    passes = 3
    flows, events, pol, grad_mask = make_inputs(rng, passes)
    cfg = LossConfig(res=RES, passes_loss=passes)
    f = jax.jit(
        lambda fl: iterative_loss(
            fl, jnp.asarray(events), jnp.asarray(pol),
            jnp.asarray(grad_mask), cfg,
        )
    )
    v1 = float(f(jnp.asarray(flows)))
    v2 = float(f(jnp.asarray(flows)))
    assert np.isfinite(v1) and v1 == v2


@requires_reference
def test_iterative_loss_parity_batch2(rng):
    """Batched lanes (B=2): values and grads still match the reference."""
    from loss.flow import Iterative as RefIterative
    import copy as _copy

    passes, b = 3, 2
    flows = rng.normal(size=(passes, S, b, RES[0], RES[1], 2)).astype(
        np.float32
    )
    events = np.zeros((passes, b, N, 4), np.float32)
    events[..., 0] = rng.uniform(0, 1, (passes, b, N))
    events[..., 0, 0] = 0.0
    events[..., 1] = rng.integers(0, RES[0], (passes, b, N))
    events[..., 2] = rng.integers(0, RES[1], (passes, b, N))
    events[..., 3] = rng.choice([-1.0, 1.0], (passes, b, N))
    pol = np.stack([(events[..., 3] > 0), (events[..., 3] < 0)], -1).astype(
        np.float32
    )
    grad_mask = np.ones((passes, b, N, 1), np.float32)
    grad_mask[:, :, N_GRAD:] = 0.0

    cfg = LossConfig(res=RES, passes_loss=passes)
    ours, ours_grad = jax.value_and_grad(
        lambda f: iterative_loss(
            f, jnp.asarray(events), jnp.asarray(pol),
            jnp.asarray(grad_mask), cfg,
        )
    )(jnp.asarray(flows))

    import torch

    config = _copy.deepcopy(ref_config(passes))
    config["loader"]["batch_size"] = b
    crit = RefIterative(config, torch.device("cpu"))
    tflows = torch.from_numpy(np.moveaxis(flows, -1, 3).copy()).requires_grad_()
    for p in range(passes):
        crit.update(
            [tflows[p, i] for i in range(S)],
            torch_from(events[p, :, :N_GRAD]).clone(),
            torch_from(pol[p, :, :N_GRAD]).clone(),
            torch_from(events[p, :, N_GRAD:]).clone(),
            torch_from(pol[p, :, N_GRAD:]).clone(),
        )
    ref = crit()
    ref.backward()
    np.testing.assert_allclose(float(ours), float(ref.detach()), rtol=2e-4)
    np.testing.assert_allclose(
        np.asarray(ours_grad), np.moveaxis(tflows.grad.numpy(), 3, -1),
        rtol=2e-3, atol=2e-5,
    )


@pytest.mark.parametrize(
    "passes,scales,mode,border",
    [
        (4, 1, "two", True),
        (4, 2, "two", True),
        (4, 1, "one", False),
        (2, 1, "four", True),
    ],
)
def test_batched_sweep_matches_looped(rng, passes, scales, mode, border):
    """The tref-batched IWE sweep is the looped sweep, exactly (values and
    flow gradients) — the masking/extent algebra is equivalent."""
    eff_passes = passes * 2 if mode == "four" else passes
    flows, events, pol, grad_mask = make_inputs(rng, eff_passes)

    def run(batched):
        cfg = LossConfig(
            res=RES, passes_loss=eff_passes, scales_loss=scales,
            iterative_mode=mode, border_compensation=border,
            batched_sweep=batched,
        )
        return jax.value_and_grad(
            lambda f: iterative_loss(
                f, jnp.asarray(events), jnp.asarray(pol),
                jnp.asarray(grad_mask), cfg,
            )
        )(jnp.asarray(flows))

    loss_b, grad_b = run(True)
    loss_l, grad_l = run(False)
    np.testing.assert_allclose(float(loss_b), float(loss_l), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(grad_b), np.asarray(grad_l), rtol=1e-5, atol=1e-7
    )


@pytest.mark.parametrize(
    "passes,scales,mode,border",
    [
        (4, 1, "two", True),
        (4, 2, "two", True),
        (3, 1, "one", False),
        (2, 1, "four", True),
    ],
)
def test_triangular_warp_matches_scan(rng, passes, scales, mode, border):
    """The ragged-unrolled warp table equals the scan-built one: same loss,
    same flow gradients (the discarded half of the scan's work never feeds
    the sweep)."""
    eff_passes = passes * 2 if mode == "four" else passes
    flows, events, pol, grad_mask = make_inputs(rng, eff_passes)

    def run(tri):
        cfg = LossConfig(
            res=RES, passes_loss=eff_passes, scales_loss=scales,
            iterative_mode=mode, border_compensation=border,
            triangular_warp=tri,
        )
        return jax.value_and_grad(
            lambda f: iterative_loss(
                f, jnp.asarray(events), jnp.asarray(pol),
                jnp.asarray(grad_mask), cfg,
            )
        )(jnp.asarray(flows))

    loss_t, grad_t = run(True)
    loss_s, grad_s = run(False)
    np.testing.assert_allclose(float(loss_t), float(loss_s), rtol=1e-6)
    # atol covers float-reassociation noise on near-zero elements (the
    # ragged gathers contract at different batch widths)
    np.testing.assert_allclose(
        np.asarray(grad_t), np.asarray(grad_s), rtol=1e-5, atol=5e-6
    )
