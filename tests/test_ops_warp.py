"""Unit + reference-parity tests for the event-warping op library."""

import numpy as np
import pytest

import jax.numpy as jnp

from taming_event_flow_tpu.ops import (
    event_propagation,
    bilinear_sample,
    get_event_flow,
    purge_unfeasible,
    get_interpolation,
    interpolate,
    iwe_from_events,
    deblur_events,
    compute_pol_iwe,
)

from .oracle import requires_reference, torch_from, to_np, flow_map_to_torch, iwe_to_np

RES = (8, 10)


def random_events(rng, b=2, n=32, res=RES):
    ts = rng.uniform(0, 1, size=(b, n, 1)).astype(np.float32)
    ys = rng.uniform(0, res[0] - 1, size=(b, n, 1)).astype(np.float32)
    xs = rng.uniform(0, res[1] - 1, size=(b, n, 1)).astype(np.float32)
    ps = rng.choice([-1.0, 1.0], size=(b, n, 1)).astype(np.float32)
    ev = np.concatenate([ts, ys, xs, ps], axis=-1)
    pm = np.concatenate([(ps > 0), (ps < 0)], axis=-1).astype(np.float32)
    return ev, pm


def test_event_propagation_golden():
    ts = jnp.array([[[0.0], [0.5]]])
    loc = jnp.array([[[1.0, 2.0], [3.0, 4.0]]])
    flow = jnp.array([[[1.0, -1.0], [2.0, 2.0]]])
    out = event_propagation(ts, loc, flow, 1.0)
    np.testing.assert_allclose(
        np.asarray(out), [[[2.0, 1.0], [4.0, 5.0]]], atol=1e-6
    )


def test_bilinear_sample_golden():
    img = jnp.arange(12, dtype=jnp.float32).reshape(1, 3, 4)
    loc = jnp.array([[[0.0, 0.0], [1.0, 2.0], [0.5, 0.5], [2.0, 3.0]]])
    out = np.asarray(bilinear_sample(img, loc))[0]
    np.testing.assert_allclose(out, [0.0, 6.0, 2.5, 11.0], atol=1e-5)


def test_bilinear_sample_out_of_range_is_zero_padded():
    img = jnp.ones((1, 3, 4), dtype=jnp.float32)
    loc = jnp.array([[[-1.0, 0.0], [0.0, -1.0], [3.0, 0.0], [2.5, 3.5]]])
    out = np.asarray(bilinear_sample(img, loc))[0]
    # fully OOB -> 0; partially OOB taps contribute zero
    assert out[0] == 0.0 and out[1] == 0.0 and out[2] == 0.0
    assert 0.0 < out[3] < 1.0


def test_purge_unfeasible_golden():
    loc = jnp.array([[[0.0, 0.0], [7.0, 9.0], [-0.1, 3.0], [4.0, 9.5]]])
    pm = jnp.ones((1, 4, 2))
    loc2, pm2 = purge_unfeasible(loc, pm, RES)
    np.testing.assert_allclose(np.asarray(pm2)[0, :, 0], [1, 1, 0, 0])
    np.testing.assert_allclose(np.asarray(loc2)[0, 2], [0.0, 0.0])


def test_get_interpolation_integer_loc_single_tap():
    loc = jnp.array([[[2.0, 3.0]]])
    idx, w = get_interpolation(loc, RES)
    idx = np.asarray(idx)[0]
    w = np.asarray(w)[0, :, 0]
    # top-left tap has full weight at idx 2*10+3, others zero weight
    assert idx[0] == 23
    np.testing.assert_allclose(w, [1.0, 0.0, 0.0, 0.0], atol=1e-6)


def test_interpolate_bilinear_mass_conservation():
    loc = jnp.array([[[2.25, 3.5], [0.0, 0.0]]])
    idx, w = get_interpolation(loc, RES)
    img = interpolate(idx, w, RES)
    np.testing.assert_allclose(float(jnp.sum(img)), 2.0, atol=1e-5)
    img_np = np.asarray(img)[0, :, :, 0]
    np.testing.assert_allclose(img_np[2, 3], 0.75 * 0.5, atol=1e-6)
    np.testing.assert_allclose(img_np[3, 4], 0.25 * 0.5, atol=1e-6)


@requires_reference
def test_get_event_flow_parity(rng):
    import torch
    from utils import iwe as ref_iwe

    b, n = 2, 64
    flow = rng.normal(size=(b, RES[0], RES[1], 2)).astype(np.float32)
    loc = np.stack(
        [
            rng.uniform(0, RES[0] - 1, size=(b, n)),
            rng.uniform(0, RES[1] - 1, size=(b, n)),
        ],
        axis=-1,
    ).astype(np.float32)

    ours = np.asarray(get_event_flow(jnp.asarray(flow), jnp.asarray(loc)))

    tflow = flow_map_to_torch(flow)
    ref = ref_iwe.get_event_flow(
        tflow[:, 0, :, :], tflow[:, 1, :, :], torch_from(loc)
    )
    np.testing.assert_allclose(ours, to_np(ref), atol=1e-4, rtol=1e-4)


@requires_reference
def test_get_interpolation_and_interpolate_parity(rng):
    from utils import iwe as ref_iwe

    b, n = 2, 64
    loc = np.stack(
        [
            rng.uniform(-2, RES[0] + 1, size=(b, n)),
            rng.uniform(-2, RES[1] + 1, size=(b, n)),
        ],
        axis=-1,
    ).astype(np.float32)
    pm = rng.integers(0, 2, size=(b, 4 * n, 1)).astype(np.float32)

    idx, w = get_interpolation(jnp.asarray(loc), RES)
    ours = np.asarray(
        interpolate(idx, w, RES, polarity_mask=jnp.asarray(pm))
    )[..., 0]

    ridx, rw = ref_iwe.get_interpolation(torch_from(loc), RES)
    ref = ref_iwe.interpolate(ridx, rw, RES, polarity_mask=torch_from(pm))
    np.testing.assert_allclose(ours, to_np(ref)[:, 0], atol=1e-4, rtol=1e-4)


@requires_reference
@pytest.mark.parametrize("round_idx", [True, False])
@pytest.mark.parametrize("round_flow", [True, False])
def test_compute_pol_iwe_parity(rng, round_idx, round_flow):
    from utils import iwe as ref_iwe

    b, n = 1, 128
    ev, pm = random_events(rng, b, n)
    # integer original locations like real events
    ev[:, :, 1] = np.floor(ev[:, :, 1])
    ev[:, :, 2] = np.floor(ev[:, :, 2])
    flow = rng.normal(size=(b, RES[0], RES[1], 2)).astype(np.float32) * 2

    ours = np.asarray(
        compute_pol_iwe(
            jnp.asarray(flow), jnp.asarray(ev), RES, jnp.asarray(pm),
            round_idx=round_idx, round_flow=round_flow,
        )
    )
    ref = ref_iwe.compute_pol_iwe(
        flow_map_to_torch(flow), torch_from(ev), RES, torch_from(pm),
        round_idx=round_idx, round_flow=round_flow,
    )
    np.testing.assert_allclose(ours, iwe_to_np(ref), atol=1e-3, rtol=1e-3)


@requires_reference
def test_iwe_from_events_matches_reference_formatting(rng):
    """iwe_from_events == get_interpolation + per-polarity interpolate."""
    from utils import iwe as ref_iwe
    import torch

    b, n = 2, 96
    ev, pm = random_events(rng, b, n)
    loc = ev[:, :, 1:3] + rng.normal(size=(b, n, 2)).astype(np.float32)

    ours = np.asarray(iwe_from_events(jnp.asarray(loc), jnp.asarray(pm), RES))

    ridx, rw = ref_iwe.get_interpolation(torch_from(loc), RES)
    rpm = torch.cat([torch_from(pm)] * 4, dim=1)
    pos = ref_iwe.interpolate(ridx, rw, RES, polarity_mask=rpm[:, :, 0:1])
    neg = ref_iwe.interpolate(ridx, rw, RES, polarity_mask=rpm[:, :, 1:2])
    ref = torch.cat([pos, neg], dim=1)
    np.testing.assert_allclose(ours, iwe_to_np(ref), atol=1e-4, rtol=1e-4)


def test_padding_events_do_not_contribute(rng):
    """Zero-padded events (pol_mask = 0) leave the IWE untouched."""
    b, n = 1, 16
    ev, pm = random_events(rng, b, n)
    loc = ev[:, :, 1:3]
    base = np.asarray(iwe_from_events(jnp.asarray(loc), jnp.asarray(pm), RES))

    pad_loc = np.concatenate([loc, np.zeros((b, 8, 2), np.float32)], axis=1)
    pad_pm = np.concatenate([pm, np.zeros((b, 8, 2), np.float32)], axis=1)
    padded = np.asarray(
        iwe_from_events(jnp.asarray(pad_loc), jnp.asarray(pad_pm), RES)
    )
    np.testing.assert_allclose(base, padded, atol=1e-6)
