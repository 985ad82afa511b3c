"""Unit + reference-parity tests for event encodings."""

import numpy as np

import jax.numpy as jnp

from taming_event_flow_tpu.ops import (
    events_to_image,
    events_to_voxel,
    events_to_channels,
)

from .oracle import requires_reference, torch_from, to_np

SENSOR = (6, 8)


def test_events_to_image_golden():
    xs = jnp.array([0.0, 0.0, 3.0])
    ys = jnp.array([0.0, 0.0, 2.0])
    ps = jnp.array([1.0, 1.0, -1.0])
    img = np.asarray(events_to_image(xs, ys, ps, SENSOR))
    assert img[0, 0] == 2.0
    assert img[2, 3] == -1.0
    assert img.sum() == 1.0


def test_events_to_image_valid_mask():
    xs = jnp.array([1.0, 1.0])
    ys = jnp.array([1.0, 1.0])
    ps = jnp.array([1.0, 1.0])
    valid = jnp.array([1.0, 0.0])
    img = np.asarray(events_to_image(xs, ys, ps, SENSOR, valid=valid))
    assert img[1, 1] == 1.0


@requires_reference
def test_events_to_voxel_parity(rng):
    from dataloader import encodings as ref_enc

    n, bins = 200, 5
    xs = rng.integers(0, SENSOR[1], n).astype(np.float32)
    ys = rng.integers(0, SENSOR[0], n).astype(np.float32)
    ts = np.sort(rng.uniform(0, 1, n)).astype(np.float32)
    ps = rng.choice([-1.0, 1.0], n).astype(np.float32)

    ours = np.asarray(
        events_to_voxel(
            jnp.asarray(xs), jnp.asarray(ys), jnp.asarray(ts),
            jnp.asarray(ps), bins, SENSOR,
        )
    )
    ref = ref_enc.events_to_voxel(
        torch_from(xs), torch_from(ys), torch_from(ts), torch_from(ps),
        bins, sensor_size=SENSOR,
    )
    # ref layout [bins, H, W]; ours [H, W, bins]
    np.testing.assert_allclose(
        ours, np.moveaxis(to_np(ref), 0, -1), atol=1e-4, rtol=1e-4
    )


@requires_reference
def test_events_to_channels_parity(rng):
    from dataloader import encodings as ref_enc

    n = 300
    xs = rng.integers(0, SENSOR[1], n).astype(np.float32)
    ys = rng.integers(0, SENSOR[0], n).astype(np.float32)
    ps = rng.choice([-1.0, 1.0], n).astype(np.float32)

    ours = np.asarray(
        events_to_channels(jnp.asarray(xs), jnp.asarray(ys), jnp.asarray(ps), SENSOR)
    )
    ref = ref_enc.events_to_channels(
        torch_from(xs), torch_from(ys), torch_from(ps), sensor_size=SENSOR
    )
    np.testing.assert_allclose(
        ours, np.moveaxis(to_np(ref), 0, -1), atol=1e-5
    )
