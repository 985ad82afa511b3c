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


def test_derive_count_input_matches_host(rng):
    """Device-side count net-input derivation == the host loader's
    construction (``data/base.py``): bincount at truncated integer coords,
    per-polarity planes, padding rows (p=0) contributing nothing."""
    from taming_event_flow_tpu.data.base import events_to_channels_np
    from taming_event_flow_tpu.ops.encodings import derive_count_input

    h, w = SENSOR
    p_ct, b_ct, n = 3, 2, 50
    ev = np.zeros((p_ct, b_ct, n, 4), np.float32)
    ev[..., 0] = rng.uniform(0, 1, (p_ct, b_ct, n))
    ev[..., 1] = rng.uniform(0, h - 1e-3, (p_ct, b_ct, n))
    ev[..., 2] = rng.uniform(0, w - 1e-3, (p_ct, b_ct, n))
    ev[..., 3] = rng.choice([-1.0, 1.0], (p_ct, b_ct, n))
    ev[:, :, -7:] = 0.0  # padding rows

    host = np.stack([
        np.stack([
            events_to_channels_np(
                ev[p, b, :, 2], ev[p, b, :, 1], ev[p, b, :, 3], SENSOR
            )
            for b in range(b_ct)
        ])
        for p in range(p_ct)
    ])
    dev = np.asarray(derive_count_input(jnp.asarray(ev), SENSOR))
    np.testing.assert_array_equal(dev, host)


def test_derive_count_input_remap_and_raw_coords(rng):
    """With raw coords + a 1-based gather index the derivation reproduces
    host remap exactly, including out-of-source pixels (index 0 -> 0) and
    broadcasting one [B,H,W] index over the pass axis."""
    from taming_event_flow_tpu.data.base import events_to_channels_np
    from taming_event_flow_tpu.ops.encodings import derive_count_input

    h, w = SENSOR
    p_ct, b_ct, n = 2, 2, 40
    raw = np.zeros((p_ct, b_ct, n, 2), np.uint16)
    raw[..., 0] = rng.integers(0, h, (p_ct, b_ct, n))
    raw[..., 1] = rng.integers(0, w, (p_ct, b_ct, n))
    ev = np.zeros((p_ct, b_ct, n, 4), np.float32)
    # rectified (fractional) coords in the list — derivation must ignore
    # them in favor of the raw ones
    ev[..., 1] = raw[..., 0] + rng.uniform(-0.4, 0.4, (p_ct, b_ct, n))
    ev[..., 2] = raw[..., 1] + rng.uniform(-0.4, 0.4, (p_ct, b_ct, n))
    ev[..., 3] = rng.choice([-1.0, 1.0], (p_ct, b_ct, n))

    # random per-lane gather index with out-of-source holes (0)
    ridx = rng.integers(0, h * w + 1, (b_ct, h, w)).astype(np.int32)

    host = np.zeros((p_ct, b_ct, h, w, 2), np.float32)
    for p in range(p_ct):
        for b in range(b_ct):
            cnt = events_to_channels_np(
                raw[p, b, :, 1].astype(np.float32),
                raw[p, b, :, 0].astype(np.float32),
                ev[p, b, :, 3], SENSOR,
            ).reshape(h * w, 2)
            idx = ridx[b].reshape(-1)
            out = np.where(
                (idx > 0)[:, None], cnt[np.maximum(idx - 1, 0)], 0.0
            )
            host[p, b] = out.reshape(h, w, 2)

    dev = np.asarray(
        derive_count_input(
            jnp.asarray(ev), SENSOR,
            raw_xy=jnp.asarray(raw), remap_idx=jnp.asarray(ridx),
        )
    )
    np.testing.assert_array_equal(dev, host)


def test_event_wire_u32_roundtrip(rng):
    """pack_event_wire_np -> unpack_event_wire restores (y, x, p) exactly,
    including padding rows (p == 0 -> pcode 0 -> p 0), at the coordinate
    extremes of the supported range."""
    import jax.numpy as jnp

    from taming_event_flow_tpu.ops.encodings import (
        pack_event_wire_np,
        unpack_event_wire,
    )

    n = 512
    ys = rng.integers(0, 65536, n).astype(np.float32)
    xs = rng.integers(0, 16384, n).astype(np.float32)
    ps = rng.choice([-1.0, 0.0, 1.0], n).astype(np.float32)
    ys[:4], xs[:4] = [0, 65535, 0, 65535], [0, 16383, 16383, 0]
    ts = rng.uniform(0, 1, n).astype(np.float32)

    yxp = pack_event_wire_np(ys, xs, ps)
    assert yxp.dtype == np.uint32
    ev, raw = unpack_event_wire(jnp.asarray(ts), jnp.asarray(yxp))
    np.testing.assert_array_equal(np.asarray(ev[..., 0]), ts)
    np.testing.assert_array_equal(np.asarray(ev[..., 1]), ys)
    np.testing.assert_array_equal(np.asarray(ev[..., 2]), xs)
    np.testing.assert_array_equal(np.asarray(ev[..., 3]), ps)
    np.testing.assert_array_equal(np.asarray(raw),
                                  np.stack([ys, xs], -1))

    # rectified lookup: the gather reads the same f32 table the host does
    h, w = 32, 48
    ys = rng.integers(0, h, n).astype(np.float32)
    xs = rng.integers(0, w, n).astype(np.float32)
    rect = rng.normal(size=(h, w, 2)).astype(np.float32)
    yxp = pack_event_wire_np(ys, xs, ps)
    ev, raw = unpack_event_wire(jnp.asarray(ts), jnp.asarray(yxp),
                                jnp.asarray(rect))
    yi, xi = ys.astype(np.int64), xs.astype(np.int64)
    np.testing.assert_array_equal(np.asarray(ev[..., 1]), rect[yi, xi, 1])
    np.testing.assert_array_equal(np.asarray(ev[..., 2]), rect[yi, xi, 0])
    np.testing.assert_array_equal(np.asarray(raw),
                                  np.stack([ys, xs], -1))
