"""Event → image-like encodings (network-input representations).

Mask-aware, statically-shaped JAX re-design of the reference encodings
(reference ``dataloader/encodings.py:8-81``). Events are 1-D arrays with a
``valid`` mask so zero-padded windows encode identically to ragged ones.
These run on host or device; on device the scatter-add is a batched XLA
scatter, exactly like the IWE splat.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def events_to_image(xs, ys, ps, sensor_size: Tuple[int, int], valid=None):
    """Accumulate per-event values into an image (scatter-add).

    Reference semantics: ``index_put_(accumulate=True)``
    (``dataloader/encodings.py:8-29``).

    :param xs, ys: ``[N]`` integer-valued event coordinates (float ok).
    :param ps: ``[N]`` per-event values to accumulate.
    :param valid: optional ``[N]`` mask; invalid events contribute zero.
    :return: ``[H, W]`` accumulated image.
    """
    h, w = sensor_size
    xi = jnp.clip(xs.astype(jnp.int32), 0, w - 1)
    yi = jnp.clip(ys.astype(jnp.int32), 0, h - 1)
    vals = ps
    if valid is not None:
        vals = vals * valid.astype(ps.dtype)
    img = jnp.zeros((h * w,), dtype=vals.dtype)
    img = img.at[yi * w + xi].add(vals)
    return img.reshape(h, w)


def events_to_voxel(xs, ys, ts, ps, num_bins: int,
                    sensor_size: Tuple[int, int], valid=None):
    """Voxel grid via temporal bilinear interpolation.

    Bin weight ``max(0, 1 - |ts * (B - 1) - b|)`` per bin — reference
    ``dataloader/encodings.py:32-56``. Timestamps must be normalized to
    ``[0, 1]``. Returned layout is ``[H, W, num_bins]`` (NHWC, channels last).
    """
    tb = ts * (num_bins - 1)
    bins = []
    for b_idx in range(num_bins):
        weights = jnp.maximum(0.0, 1.0 - jnp.abs(tb - b_idx))
        bins.append(
            events_to_image(xs, ys, ps * weights, sensor_size, valid=valid)
        )
    return jnp.stack(bins, axis=-1)


def derive_count_input(event_list, res: Tuple[int, int],
                       raw_xy=None, remap_idx=None):
    """Device-side twin of the host loader's count net-input assembly
    (``data/base.py assemble_sample``: ``events_to_channels_np`` at the
    raw augmented coordinates, then the nearest-neighbor rectification
    ``remap``) — element-for-element the host values for integer counts,
    so the packed wire can skip shipping ``net_input`` entirely and
    rebuild it from the event lists it ships anyway.

    :param event_list: ``[..., N, 4]`` (ts, y, x, p) padded events; padding
        rows carry ``p == 0`` and contribute nothing.
    :param raw_xy: optional ``[..., N, 2]`` (y, x) RAW (pre-rectification,
        post-augmentation) integer coordinates — required when the event
        list carries rectified (fractional) coordinates; without it the
        list's own (y, x) columns are used.
    :param remap_idx: optional ``[B, H*W]``-reshapeable ``[B, H, W]``
        int32 backward-rectification gather index, **1-based** with ``0``
        marking out-of-source pixels (``data/h5.py remap_indices``) —
        the exact pixel lookup the host's ``cv2.remap(INTER_NEAREST)``
        performs, captured by remapping an index image. Broadcasts over
        leading (pass) axes when ``event_list`` is pass-stacked.
    :return: ``[..., H, W, 2]`` f32 per-polarity counts.
    """
    h, w = res
    coords = raw_xy.astype(jnp.float32) if raw_xy is not None \
        else event_list[..., 1:3]
    ys, xs = coords[..., 0], coords[..., 1]
    ps = event_list[..., 3]
    lead = event_list.shape[:-2]
    n = event_list.shape[-2]
    hw = h * w

    # one scatter over a polarity-offset flat index (exactly the numpy
    # twin's single bincount, ``data/base.py events_to_channels_np``):
    # positive events land in plane 0 with weight |p|, negative in plane
    # 1, padding (p == 0) contributes zero — half the scatter work of
    # two per-plane events_to_image calls
    xi = jnp.clip(xs.astype(jnp.int32), 0, w - 1)
    yi = jnp.clip(ys.astype(jnp.int32), 0, h - 1)
    idx = (yi * w + xi + jnp.where(ps < 0, hw, 0)).reshape((-1, n))
    vals = jnp.abs(ps).reshape((-1, n))
    img = jnp.zeros((idx.shape[0], 2 * hw), vals.dtype)
    img = jax.vmap(lambda im, ix, v: im.at[ix].add(v))(img, idx, vals)
    cnt = jnp.moveaxis(
        img.reshape((-1, 2, h, w)), 1, -1
    ).reshape(lead + (h, w, 2))

    if remap_idx is not None:
        idx = jnp.broadcast_to(
            remap_idx.reshape(remap_idx.shape[:-2] + (h, w)),
            lead + (h, w),
        ).reshape((-1, h * w))
        flat = cnt.reshape((-1, h * w, 2))
        safe = jnp.maximum(idx - 1, 0)
        g = jnp.take_along_axis(flat, safe[..., None], axis=1)
        cnt = jnp.where(idx[..., None] > 0, g, 0.0).reshape(
            lead + (h, w, 2)
        )
    return cnt


def pack_event_wire_np(ys, xs, ps):
    """Host-side u32 packing of integer event coordinates + polarity.

    Layout: ``y << 16 | x << 2 | pcode`` with ``pcode`` 1 for positive,
    2 for negative, 0 for padding rows (``p == 0``). Exact for any
    integer-valued ``y < 65536``, ``x < 16384`` — every supported sensor.
    One u32 element replaces three wire elements (y, x f32 + p), and on
    the tunneled-device stack upload cost is per-ELEMENT
    (BASELINE.md wire study: f32 84 ns/el, the endpoint serializes on the
    producer's core), so the event upload halves.

    :param ys, xs: integer-valued arrays (any float/int dtype).
    :param ps: polarity ±1 (0 for padding).
    :return: uint32 array of ``ys.shape``.
    """
    import numpy as np

    pcode = np.where(ps > 0, 1, 0) + np.where(ps < 0, 2, 0)
    return (
        (ys.astype(np.uint32) << 16)
        | (xs.astype(np.uint32) << 2)
        | pcode.astype(np.uint32)
    )


def unpack_event_wire(ts, yxp, rect=None):
    """Device twin of :func:`pack_event_wire_np`: rebuild the
    ``[..., N, 4]`` (ts, y, x, p) event list (+ raw integer coords).

    :param ts: ``[..., N]`` f32 window-normalized timestamps.
    :param yxp: ``[..., N]`` uint32 packed (y, x, pcode).
    :param rect: optional ``[H, W, 2]`` f32 forward rectification map in
        the FILE's layout — ``rect[y_raw, x_raw] = (x_rect, y_rect)``
        (reference ``dataloader/base.py:173-188``; note x first). When
        given, the event list carries the rectified fractional
        coordinates — bitwise the host lookup's values, since the gather
        reads the same f32 table.
    :return: ``(event_list [..., N, 4], raw_yx [..., N, 2] f32)`` —
        ``raw_yx`` is the (y, x) integer pair
        (:func:`derive_count_input`'s ``raw_xy`` contract).
    """
    yi = (yxp >> 16).astype(jnp.int32)
    xi = ((yxp >> 2) & 0x3FFF).astype(jnp.int32)
    pcode = yxp & 3
    p = (pcode == 1).astype(jnp.float32) - (pcode == 2).astype(jnp.float32)
    y = yi.astype(jnp.float32)
    x = xi.astype(jnp.float32)
    raw_yx = jnp.stack([y, x], axis=-1)
    if rect is not None:
        w = rect.shape[1]
        flat = (yi * w + xi).reshape(-1)
        looked = rect.reshape(-1, 2)[flat].reshape(yxp.shape + (2,))
        ly, lx = looked[..., 1], looked[..., 0]  # file layout is (x, y)
    else:
        ly, lx = y, x
    ev = jnp.stack([ts, ly, lx, p], axis=-1)
    return ev, raw_yx


def events_to_channels(xs, ys, ps, sensor_size: Tuple[int, int], valid=None):
    """Two-channel per-polarity event-count image.

    Positive events (``p > 0``) count into channel 0, negative (``p < 0``)
    into channel 1, both as positive counts — reference
    ``dataloader/encodings.py:59-81`` (there ``ps * mask`` with the ±1
    polarity convention yields the same non-negative counts).
    Returned layout is ``[H, W, 2]`` (channels last).
    """
    pos_vals = jnp.where(ps > 0, ps, 0.0)
    neg_vals = jnp.where(ps < 0, -ps, 0.0)
    pos_cnt = events_to_image(xs, ys, pos_vals, sensor_size, valid=valid)
    neg_cnt = events_to_image(xs, ys, neg_vals, sensor_size, valid=valid)
    return jnp.stack([pos_cnt, neg_cnt], axis=-1)
