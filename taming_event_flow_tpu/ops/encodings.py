"""Event → image-like encodings (network-input representations).

Mask-aware, statically-shaped JAX re-design of the reference encodings
(reference ``dataloader/encodings.py:8-81``). Events are 1-D arrays with a
``valid`` mask so zero-padded windows encode identically to ragged ones.
These run on host or device; on device the scatter-add is a batched XLA
scatter, exactly like the IWE splat.
"""

from __future__ import annotations

from typing import Optional, Tuple

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
