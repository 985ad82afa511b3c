"""Parity tests of the validation state machine + FWL/RSAT/AEE metrics."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from taming_event_flow_tpu.metrics import (
    ValConfig,
    IterativeValidation,
    LinearValidation,
    compute_aee,
)

from .oracle import requires_reference, torch_from, to_np, iwe_to_np

RES = (8, 10)
B = 1
N = 24
P = 3


def make_pass(rng):
    flow = rng.normal(size=(B, RES[0], RES[1], 2)).astype(np.float32) * 1.2
    ev = np.zeros((B, N, 4), np.float32)
    ev[..., 0] = np.sort(rng.uniform(0, 1, (B, N)), axis=-1)
    ev[..., 0, 0] = 0.0
    ev[..., 1] = rng.integers(0, RES[0], (B, N))
    ev[..., 2] = rng.integers(0, RES[1], (B, N))
    ev[..., 3] = rng.choice([-1.0, 1.0], (B, N))
    pol = np.stack([(ev[..., 3] > 0), (ev[..., 3] < 0)], -1).astype(np.float32)
    emask = (rng.uniform(size=(B, RES[0], RES[1], 1)) > 0.5).astype(np.float32)
    return flow, ev, pol, emask


def ref_val_config():
    return {
        "loader": {"resolution": list(RES), "batch_size": B},
        "loss": {"round_ts": False},
        "vis": {"mask_output": False},
        "metrics": {},
    }


def drive_both(rng, val_cls, ref_cls):
    import torch

    cfg = ValConfig(res=RES, passes=P)
    val = val_cls(cfg, B, N)
    state = val.init()
    crit = ref_cls(ref_val_config(), torch.device("cpu"))

    update = jax.jit(val.update)
    for _ in range(P):
        flow, ev, pol, emask = make_pass(rng)
        state = update(state, jnp.asarray(flow), jnp.asarray(ev),
                       jnp.asarray(pol), jnp.asarray(emask))
        tflow = torch_from(np.moveaxis(flow, -1, 1))
        crit.update(
            [tflow], torch_from(ev).clone(), torch_from(pol).clone(),
            torch_from(np.moveaxis(emask, -1, 1)).clone(),
        )
    return val, state, crit


@requires_reference
def test_iterative_validation_parity(rng):
    from loss.flow_val import Iterative as RefVal

    val, state, crit = drive_both(rng, IterativeValidation, RefVal)

    # deblurring metrics
    np.testing.assert_allclose(
        float(val.rsat(state)[0]), float(crit.rsat()[0]), rtol=1e-4
    )
    np.testing.assert_allclose(
        float(val.fwl(state)), float(crit.fwl()), rtol=1e-4
    )

    # window accessors
    np.testing.assert_allclose(
        np.asarray(val.window_events(state)),
        iwe_to_np(crit.window_events()), atol=1e-4,
    )
    for mode in ["forward", "backward"]:
        np.testing.assert_allclose(
            np.asarray(val.window_iwe(state, mode=mode)),
            iwe_to_np(crit.window_iwe(mode=mode)), atol=1e-4,
            err_msg=f"window_iwe {mode}",
        )
        np.testing.assert_allclose(
            np.asarray(val.window_flow(state, mode=mode, mask=False)),
            iwe_to_np(crit.window_flow(mode=mode, mask=False)),
            atol=1e-4, rtol=1e-4, err_msg=f"window_flow {mode}",
        )
    # plain averaged flow with event masking
    np.testing.assert_allclose(
        np.asarray(val.window_flow(state, mode=None, mask=True)),
        iwe_to_np(crit.window_flow(mode=None, mask=True)),
        atol=1e-4, rtol=1e-4,
    )


@requires_reference
def test_linear_validation_parity(rng):
    from loss.flow_val import Linear as RefVal

    val, state, crit = drive_both(rng, LinearValidation, RefVal)

    np.testing.assert_allclose(
        float(val.rsat(state)[0]), float(crit.rsat()[0]), rtol=1e-4
    )
    np.testing.assert_allclose(
        float(val.fwl(state)), float(crit.fwl()), rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(val.window_iwe(state)),
        iwe_to_np(crit.window_iwe()), atol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(val.window_flow(state, mask=False)),
        iwe_to_np(crit.window_flow(mask=False)), atol=1e-4, rtol=1e-4,
    )


@requires_reference
def test_compute_aee_parity(rng):
    import torch
    from loss.flow_val import Iterative as RefVal

    pred = rng.normal(size=(B, RES[0], RES[1], 2)).astype(np.float32) * 3
    gt = rng.normal(size=(B, RES[0], RES[1], 2)).astype(np.float32) * 3
    gt[0, :2, :2, :] = 0.0  # invalid-GT pixels
    emask = (rng.uniform(size=(B, RES[0], RES[1], 2)) > 0.4).astype(np.float32)

    # no mask
    ours = float(compute_aee(jnp.asarray(pred), jnp.asarray(gt)))
    crit = RefVal(ref_val_config(), torch.device("cpu"))
    ref = float(
        crit.compute_aee(
            torch_from(np.moveaxis(pred, -1, 1)),
            torch_from(np.moveaxis(gt, -1, 1)),
        )
    )
    np.testing.assert_allclose(ours, ref, rtol=1e-5)

    # with event mask + crops (MVSEC protocol)
    cfg2 = ref_val_config()
    cfg2["metrics"] = {"res_aee": [6, 8], "vertical_crop_aee": 5}
    crit2 = RefVal(cfg2, torch.device("cpu"))
    ref2 = float(
        crit2.compute_aee(
            torch_from(np.moveaxis(pred, -1, 1)),
            torch_from(np.moveaxis(gt, -1, 1)),
            mask=torch_from(np.moveaxis(emask, -1, 1)),
        )
    )
    ours2 = float(
        compute_aee(
            jnp.asarray(pred), jnp.asarray(gt), event_mask=jnp.asarray(emask),
            res_aee=(6, 8), vertical_crop_aee=5,
        )
    )
    np.testing.assert_allclose(ours2, ref2, rtol=1e-5)


def test_validation_padding_invariance(rng):
    cfg = ValConfig(res=RES, passes=P)
    val = IterativeValidation(cfg, B, N)
    val_p = IterativeValidation(cfg, B, N + 5)
    state, state_p = val.init(), val_p.init()
    for _ in range(P):
        flow, ev, pol, emask = make_pass(rng)
        ev_p = np.concatenate([ev, np.zeros((B, 5, 4), np.float32)], 1)
        pol_p = np.concatenate([pol, np.zeros((B, 5, 2), np.float32)], 1)
        state = val.update(state, jnp.asarray(flow), jnp.asarray(ev),
                           jnp.asarray(pol), jnp.asarray(emask))
        state_p = val_p.update(state_p, jnp.asarray(flow), jnp.asarray(ev_p),
                               jnp.asarray(pol_p), jnp.asarray(emask))
    np.testing.assert_allclose(
        float(val.rsat(state)[0]), float(val_p.rsat(state_p)[0]), rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(val.window_iwe(state, "backward")),
        np.asarray(val_p.window_iwe(state_p, "backward")), atol=1e-5,
    )


@pytest.mark.parametrize("val_cls", [IterativeValidation, LinearValidation])
def test_fused_rsat_fwl_matches_separate(rng, val_cls):
    """``rsat_fwl`` (both metrics from RSAT's two shared splats) must equal
    the separate reducers: RSAT identically (same splat path), FWL bitwise
    (per-polarity count images are exact small-integer f32 sums, so adding
    the planes equals splatting the summed values)."""
    cfg = ValConfig(res=RES, passes=P)
    val = val_cls(cfg, B, N)
    state = val.init()
    update = jax.jit(val.update)
    for _ in range(P):
        flow, ev, pol, emask = make_pass(rng)
        state = update(state, jnp.asarray(flow), jnp.asarray(ev),
                       jnp.asarray(pol), jnp.asarray(emask))
    rsat_f, fwl_f = jax.jit(val.rsat_fwl)(state)
    np.testing.assert_array_equal(
        np.asarray(rsat_f), np.asarray(jax.jit(val.rsat)(state))
    )
    np.testing.assert_array_equal(
        np.asarray(fwl_f), np.asarray(jax.jit(val.fwl)(state))
    )


def test_update_n_active_specialization_matches_masked(rng):
    """The statically-specialized update (n_active=k slot slice) must equal
    the single-program masked update bit-for-bit at every pass position,
    for both tracking configs."""
    import functools

    for track in (False, True):
        cfg = ValConfig(res=RES, passes=P, track_fw_prop=track,
                        track_bw=track)
        val = IterativeValidation(cfg, B, N)
        s_masked = val.init()
        s_spec = val.init()
        upd_masked = jax.jit(val.update)
        for k in range(1, P + 1):
            flow, ev, pol, emask = make_pass(rng)
            args = (jnp.asarray(flow), jnp.asarray(ev), jnp.asarray(pol),
                    jnp.asarray(emask))
            s_masked = upd_masked(s_masked, *args)
            s_spec = jax.jit(
                functools.partial(val.update, n_active=k)
            )(s_spec, *args)
            for name in s_masked._fields:
                np.testing.assert_array_equal(
                    np.asarray(getattr(s_masked, name)),
                    np.asarray(getattr(s_spec, name)),
                    err_msg=f"track={track} pass {k} field {name}",
                )
