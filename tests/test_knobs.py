"""Performance knobs (loss.matmul_precision / warp_remat / scan_unroll) are
config-driven and numerically equivalent across settings."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from taming_event_flow_tpu.objectives import LossConfig, iterative_loss
from taming_event_flow_tpu.ops.precision import (
    get_matmul_precision,
    set_matmul_precision,
)

RES = (8, 10)
B, N, P, S = 1, 16, 4, 1


def make_inputs(rng):
    flows = rng.normal(size=(P, S, B, RES[0], RES[1], 2)).astype(np.float32)
    events = np.zeros((P, B, N, 4), np.float32)
    events[..., 0] = rng.uniform(0, 1, (P, B, N))
    events[:, :, 0, 0] = 0.0
    events[..., 1] = rng.integers(0, RES[0], (P, B, N))
    events[..., 2] = rng.integers(0, RES[1], (P, B, N))
    events[..., 3] = rng.choice([-1.0, 1.0], (P, B, N))
    pol = np.stack([(events[..., 3] > 0), (events[..., 3] < 0)], -1).astype(
        np.float32
    )
    grad_mask = np.ones((P, B, N, 1), np.float32)
    return map(jnp.asarray, (flows, events, pol, grad_mask))


def loss_and_grad(flows, events, pol, grad_mask, **kw):
    cfg = LossConfig(res=RES, passes_loss=P, scales_loss=1, **kw)

    def f(fl):
        return iterative_loss(fl, events, pol, grad_mask, cfg)

    return jax.value_and_grad(f)(flows)


@pytest.mark.parametrize("triangular", [True, False])
@pytest.mark.parametrize("remat", [True, False])
@pytest.mark.parametrize("unroll", [1, 2])
def test_remat_unroll_equivalence(rng, remat, unroll, triangular):
    """warp_remat / scan_unroll leave loss AND grads unchanged on BOTH
    warp-table formulations (remat is jax.checkpoint per timeline step in
    the triangular path, per scan step in the lax.scan path)."""
    flows, events, pol, grad_mask = make_inputs(rng)
    base_v, base_g = loss_and_grad(flows, events, pol, grad_mask)
    v, g = loss_and_grad(
        flows, events, pol, grad_mask, warp_remat=remat, scan_unroll=unroll,
        triangular_warp=triangular,
    )
    assert np.isfinite(float(v))
    np.testing.assert_allclose(float(v), float(base_v), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(g), np.asarray(base_g), rtol=1e-5, atol=1e-6
    )


@pytest.mark.parametrize("precision", ["default", "high", "highest"])
def test_matmul_precision_settings(rng, precision):
    flows, events, pol, grad_mask = make_inputs(rng)
    base_v, _ = loss_and_grad(flows, events, pol, grad_mask)
    prev = get_matmul_precision()
    try:
        set_matmul_precision(precision)
        v, g = loss_and_grad(flows, events, pol, grad_mask)
    finally:
        # restore for the rest of the suite
        for name, val in (
            ("default", jax.lax.Precision.DEFAULT),
            ("high", jax.lax.Precision.HIGH),
            ("highest", jax.lax.Precision.HIGHEST),
        ):
            if val == prev:
                set_matmul_precision(name)
    assert np.isfinite(float(v))
    assert np.all(np.isfinite(np.asarray(g)))
    # bf16 MXU passes may differ slightly on accelerators; on CPU all modes
    # run f32 so the values agree tightly either way
    np.testing.assert_allclose(float(v), float(base_v), rtol=1e-2)


def test_set_matmul_precision_rejects_unknown():
    with pytest.raises(ValueError):
        set_matmul_precision("fp8ish")


def test_config_defaults_expose_knobs():
    from taming_event_flow_tpu.configs.parser import DEFAULTS

    loss = DEFAULTS["loss"]
    assert loss["matmul_precision"] == "default"
    assert loss["warp_remat"] is False
    assert loss["scan_unroll"] == 1
    assert loss["warp_backend"] == "auto"
    assert loss["batched_sweep"] is False
    assert loss["triangular_warp"] is True
