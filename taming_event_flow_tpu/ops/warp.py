"""Event-warping op library (the "IWE" kernel layer).

TPU-native re-design of the reference warping library
(reference ``utils/iwe.py:5-257``): pure functions over statically-shaped,
zero-padded event tensors. Ragged event windows are represented as
``[B, N, ...]`` arrays whose padding rows carry a zero polarity mask, so they
never contribute to any image of warped events (IWE) — the exact masking
contract the reference establishes in its collate fn
(reference ``dataloader/base.py:416-423``).

Shape/layout conventions:
  * ``event_loc``:  ``[B, N, 2]`` float ``(y, x)`` pixel coordinates.
  * ``event_ts``:   ``[B, N, 1]`` float timestamps.
  * ``pol_mask``:   ``[B, N, 2]`` float ``(positive, negative)`` indicator.
  * ``flow_map``:   ``[B, H, W, 2]`` float, last dim ``(x, y)`` (NHWC).
  * ``iwe``:        ``[B, H, W, C]`` float (NHWC).

All functions are jit-safe (static shapes, no data-dependent control flow).
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp


Res = Tuple[int, int]  # (H, W)


def event_propagation(event_ts, event_loc, event_flow, tref):
    """Linearly warp events to a reference time.

    ``loc' = loc + (tref - ts) * flow``  with ``flow`` given per-event in
    ``(y, x)`` order (reference ``utils/iwe.py:5-14``).

    :param event_ts: ``[B, N, 1]`` event timestamps.
    :param event_loc: ``[B, N, 2]`` event ``(y, x)`` locations.
    :param event_flow: ``[B, N, 2]`` per-event flow ``(y, x)``.
    :param tref: scalar (or broadcastable) reference time.
    :return: ``[B, N, 2]`` warped event locations.
    """
    return event_loc + (tref - event_ts) * event_flow


_LANE = 128


def gather_pixels(table, idx):
    """TPU-fast 1-D gather: ``out[b, n] = table[b, idx[b, n]]``.

    XLA's native TPU gather collapses to ~5 Mpts/s once the table exceeds a
    few tens of thousands of entries (measured: 68 ms for 327k samples from
    a 307k-entry table). This formulation gathers whole 128-lane *rows* —
    which stays on the fast vector-load path — and resolves the lane with a
    one-hot reduction on the VPU: two orders of magnitude faster at DSEC
    resolution, identical numerics.

    :param table: ``[B, T]`` values.
    :param idx: ``[B, N]`` int32 indices in ``[0, T)``.
    :return: ``[B, N]`` gathered values.
    """
    from .mxu_lookup import gather_mxu, _TILE

    b, t = table.shape
    if t <= _TILE:
        # single row-tile: the one-hot matmul gather rides the MXU. HIGHEST
        # precision: this is an EXACT lookup — under DEFAULT the MXU would
        # round the table values to bf16 on their way through the einsum
        return gather_mxu(table, idx, precision=jax.lax.Precision.HIGHEST)
    if t <= 2 * _TILE:
        return jnp.take_along_axis(table, idx, axis=1)
    rows = -(-t // _LANE)
    pad = rows * _LANE - t
    if pad:
        table = jnp.pad(table, ((0, 0), (0, pad)))
    tab = table.reshape(b, rows, _LANE)
    row = idx // _LANE
    lane = idx % _LANE
    gathered = jnp.take_along_axis(tab, row[:, :, None], axis=1)  # [B,N,128]
    onehot = (
        lane[:, :, None] == jax.lax.broadcasted_iota(jnp.int32, (1, 1, _LANE), 2)
    ).astype(table.dtype)
    return jnp.sum(gathered * onehot, axis=-1)


def gather_values(maps, loc):
    """Backend-dispatched multi-channel bilinear gather.

    Matches ``torch.nn.functional.grid_sample(mode="bilinear",
    align_corners=True, padding_mode="zeros")`` when the normalized grid is
    built as ``2 * loc / (size - 1) - 1`` — i.e. plain bilinear interpolation
    at pixel coordinates with out-of-frame taps contributing zero
    (reference ``utils/iwe.py:17-40``).

    Backends: separable MXU einsum for maps up to one 128x128 row-tile (the
    training scale), the packed-patch row gather for larger maps (measured
    3.8x the classic 4-tap path at DSEC scale — see
    :func:`_bilinear_sample_patch`), fused Pallas kernel when forced.

    :param maps: ``[B, H, W, C]`` image channels.
    :param loc: ``[B, M, 2]`` ``(y, x)`` sample locations.
    :return: ``[B, M, C]`` sampled values (map channel order).
    """
    from .backend import get_warp_backend, use_separable

    h, w = maps.shape[1], maps.shape[2]
    if get_warp_backend() == "pallas":
        from .pallas_warp import gather_grad

        return gather_grad(maps, loc)
    if use_separable(h * w):
        from .mxu_lookup import bilinear_gather_separable_multi

        return bilinear_gather_separable_multi(maps, loc)
    return _bilinear_sample_patch(maps, loc)


def bilinear_sample(img, loc):
    """Bilinearly sample a single-channel image at fractional locations
    (see :func:`gather_values`).

    :param img: ``[B, H, W]`` image.
    :param loc: ``[B, N, 2]`` ``(y, x)`` sample locations.
    :return: ``[B, N]`` sampled values.
    """
    return gather_values(img[..., None], loc)[..., 0]


def _tri(d):
    return jnp.maximum(0.0, 1.0 - jnp.abs(d))


def _dtri(d):
    """d/dd of ``_tri`` matching jax autodiff conventions (see
    ``pallas_warp._stencil``): -1 at 0, -+0.5 at the |d| = 1 ties."""
    a = jnp.abs(d)
    sign = jnp.where(d >= 0.0, 1.0, -1.0)
    mag = jnp.where(a < 1.0, 1.0, jnp.where(a == 1.0, 0.5, 0.0))
    return -sign * mag


def _patch_weights(loc, h, w, mode_y=0, mode_x=0):
    """Patch base index + per-tap weights for the packed-patch gather.

    The base is the CLAMPED floor; weights are (d)triangles referenced to
    the actual rows/cols the patch reads, so clamping is exact: a point with
    ``y in [-1, 0)`` reads rows (0, 1) and row 0 carries the full in-frame
    tap weight; the second row/col is masked when it leaves the frame (it
    wrapped around via the roll that built the patch table).
    """
    y = loc[..., 0]
    x = loc[..., 1]
    yi = jnp.clip(jnp.floor(y), 0, h - 1)
    xi = jnp.clip(jnp.floor(x), 0, w - 1)
    fy = _dtri if mode_y else _tri
    fx = _dtri if mode_x else _tri
    wy0 = fy(y - yi)
    wy1 = fy(y - (yi + 1)) * (yi + 1 <= h - 1)
    wx0 = fx(x - xi)
    wx1 = fx(x - (xi + 1)) * (xi + 1 <= w - 1)
    base = (yi * w + xi).astype(jnp.int32)
    ws = jnp.stack([wy0 * wx0, wy0 * wx1, wy1 * wx0, wy1 * wx1], -1)
    return base, ws  # [B, M], [B, M, 4]


def _patch_table(maps):
    """[B, H, W, C] -> [B, H*W, 4C] per-pixel 2x2 patch table (tap order
    tl, tr, bl, br). Built with 2-D pad+slice shifts — NOT flat rolls: a
    flat roll of an [B, H*W, C] array is lane-misaligned whenever H*W is
    not a multiple of 128 (260x346 = 89960 forced a slow relayout,
    measured), while padded slices stay contiguous; out-of-frame taps read
    the zero padding (and their weights are zero anyway)."""
    b, h, w, c = maps.shape
    right = jnp.pad(maps[:, :, 1:], ((0, 0), (0, 0), (0, 1), (0, 0)))
    down = jnp.pad(maps[:, 1:], ((0, 0), (0, 1), (0, 0), (0, 0)))
    downright = jnp.pad(
        maps[:, 1:, 1:], ((0, 0), (0, 1), (0, 1), (0, 0))
    )
    return jnp.concatenate(
        [maps, right, down, downright], axis=-1
    ).reshape(b, h * w, 4 * c)


def _gather_patch_fwd(maps, loc):
    b, h, w, c = maps.shape
    patch = _patch_table(maps)
    base, ws = _patch_weights(loc, h, w)
    got = jnp.take_along_axis(patch, base[:, :, None], axis=1)  # [B, M, 4C]
    g = got.reshape(b, loc.shape[1], 4, c)
    return jnp.einsum("bmtc,bmt->bmc", g, ws), got


@functools.lru_cache(maxsize=None)
def _gather_patch_vjp():
    @jax.custom_vjp
    def f(maps, loc):
        return _gather_patch_fwd(maps, loc)[0]

    def fwd(maps, loc):
        out, got = _gather_patch_fwd(maps, loc)
        return out, (maps.shape, loc, got)

    def bwd(resid, cot):
        # d_maps: the transpose of a bilinear gather is the bilinear splat
        # of the cotangent; d_loc: dual-stencil contraction of the SAME
        # gathered patch — no second gather pass needed.
        shape, loc, got = resid
        b, h, w, c = shape
        g = got.reshape(b, loc.shape[1], 4, c)
        _, dwy = _patch_weights(loc, h, w, mode_y=1, mode_x=0)
        _, dwx = _patch_weights(loc, h, w, mode_y=0, mode_x=1)
        gp = jnp.einsum("bmtc,bmc->bmt", g, cot)  # [B, M, 4]
        d_y = jnp.sum(gp * dwy, axis=-1)
        d_x = jnp.sum(gp * dwx, axis=-1)
        d_maps = splat_values(loc, cot, (h, w))
        return d_maps, jnp.stack([d_y, d_x], axis=-1)

    f.defvjp(fwd, bwd)
    return f


def _bilinear_sample_patch(maps, loc):
    """Packed-patch bilinear gather (large maps).

    One ``take_along_axis`` over a per-pixel ``[H*W, 4C]`` patch table
    fetches all 4 taps x C channels of every point at once. TPU's gather is
    ROW-RATE bound, not bandwidth bound (measured ~180-320 M rows/s at
    480x640 regardless of 8- vs 128-lane rows), so folding the 4 x C
    separate tap gathers of the classic formulation into one row fetch is a
    measured 3.8x (15.1 -> 4.0 ms at the DSEC eval shape, 635k pts x 2ch).
    Exact vs the 4-tap path to 2e-7; differentiable via a custom VJP whose
    location gradient reuses the gathered patch (zero extra gathers).
    """
    return _gather_patch_vjp()(maps, loc)


def get_event_flow(flow_map, event_loc):
    """Sample an optical-flow map at (fractional) event locations.

    :param flow_map: ``[B, H, W, 2]`` flow map, last dim ``(x, y)``.
    :param event_loc: ``[B, N, 2]`` event ``(y, x)`` locations.
    :return: ``[B, N, 2]`` per-event flow in ``(y, x)`` order
        (the reference returns ``(y, x)`` too, ``utils/iwe.py:38``).
    """
    return gather_values(flow_map, event_loc)[..., ::-1]


def inside_mask(loc, res: Res):
    """``[..., 1]`` float mask of locations inside ``[0, res-1]`` both axes
    — THE in-frame predicate (boundary rule ``<= res - 1``), shared by every
    purge/bounds site in the loss and validation layers."""
    inside = (
        (loc[..., 0:1] >= 0)
        & (loc[..., 0:1] <= res[0] - 1.0)
        & (loc[..., 1:2] >= 0)
        & (loc[..., 1:2] <= res[1] - 1.0)
    )
    return inside.astype(loc.dtype)


def purge_unfeasible(event_loc, pol_mask, res: Res):
    """Zero events warped outside the image space.

    Out-of-frame locations are set to ``(0, 0)`` and their polarity mask to
    zero — identical to the reference so subsequent warp iterations see the
    same values (reference ``utils/iwe.py:43-60``).

    :param event_loc: ``[..., N, 2]`` warped ``(y, x)`` locations.
    :param pol_mask: ``[..., N, 2]`` polarity mask.
    :return: masked ``(event_loc, pol_mask)``.
    """
    inside = inside_mask(event_loc, res)
    return event_loc * inside, pol_mask * inside


def get_interpolation(warped_loc, res: Res, round_idx: bool = False):
    """Bilinear splat indices/weights for warped events.

    Returns the four integer taps around each fractional location and the
    corresponding bilinear weights, flattened to row-major ``y * W + x``
    indices. Out-of-frame taps get index 0 and weight 0
    (reference ``utils/iwe.py:63-113``).

    :param warped_loc: ``[B, N, 2]`` fractional ``(y, x)`` locations.
    :param round_idx: nearest-pixel rounding instead of the 4-tap stencil.
    :return: ``(idx, weights)`` with ``idx`` ``[B, M]`` int32 and ``weights``
        ``[B, M, 1]``; ``M = N`` if ``round_idx`` else ``4 * N``. Tap order is
        (top-left, top-right, bottom-left, bottom-right) along the N axis,
        matching the reference's concat order.
    """
    if round_idx:
        idx_yx = jnp.round(warped_loc)
        weights = jnp.ones(warped_loc.shape[:2] + (1,), dtype=warped_loc.dtype)
    else:
        top_y = jnp.floor(warped_loc[:, :, 0:1])
        bot_y = jnp.floor(warped_loc[:, :, 0:1] + 1.0)
        left_x = jnp.floor(warped_loc[:, :, 1:2])
        right_x = jnp.floor(warped_loc[:, :, 1:2] + 1.0)

        top_left = jnp.concatenate([top_y, left_x], axis=2)
        top_right = jnp.concatenate([top_y, right_x], axis=2)
        bottom_left = jnp.concatenate([bot_y, left_x], axis=2)
        bottom_right = jnp.concatenate([bot_y, right_x], axis=2)
        idx_yx = jnp.concatenate(
            [top_left, top_right, bottom_left, bottom_right], axis=1
        )

        tiled = jnp.concatenate([warped_loc] * 4, axis=1)
        weights = jnp.maximum(0.0, 1.0 - jnp.abs(tiled - idx_yx))

    inside = (
        (idx_yx[:, :, 0:1] >= 0)
        & (idx_yx[:, :, 0:1] < res[0])
        & (idx_yx[:, :, 1:2] >= 0)
        & (idx_yx[:, :, 1:2] < res[1])
    )
    inside_f = inside.astype(warped_loc.dtype)
    idx_yx = idx_yx * inside_f

    if round_idx:
        weights = weights * inside_f
    else:
        weights = jnp.prod(weights, axis=-1, keepdims=True) * inside_f

    flat_idx = (idx_yx[:, :, 0] * res[1] + idx_yx[:, :, 1]).astype(jnp.int32)
    return flat_idx, weights


def splat_bilinear(flat_idx, weights, res: Res):
    """Scatter-add splat of weighted points into an image.

    The hot accumulation op of the whole framework (reference
    ``utils/iwe.py:116-136`` via ``Tensor.scatter_add_``). Lowers to XLA's
    batched scatter-add; grad w.r.t. ``weights`` is the matching gather, which
    XLA derives. A fused Pallas kernel backend can replace this transparently.

    :param flat_idx: ``[B, M]`` int32 row-major pixel indices.
    :param weights: ``[B, M, 1]`` splat weights (already masked).
    :return: ``[B, H, W, 1]`` accumulated image.
    """
    img = splat_channels(flat_idx, weights, res)
    return img.reshape(weights.shape[0], res[0], res[1], 1)


def splat_channels(flat_idx, weights, res: Res):
    """Backend-dispatched multi-channel scatter-add into ``[B, H*W, C]``.

    Single-row-tile images (≤ 16384 px — the training resolution) use the
    MXU one-hot matmul splat (~50x the throughput of XLA's scatter on TPU,
    honest-benchmarked); larger images fall back to XLA scatter.
    """
    from .mxu_lookup import splat_mxu, _TILE

    b, m = flat_idx.shape
    hw = res[0] * res[1]
    if hw <= _TILE:
        return splat_mxu(flat_idx, weights, hw)
    buf = jnp.zeros((b, hw, weights.shape[-1]), dtype=weights.dtype)
    return buf.at[jnp.arange(b)[:, None], flat_idx].add(weights, mode="drop")


def splat_values(loc, values, res: Res, round_idx: bool = False):
    """Backend-dispatched fused bilinear (or nearest) splat.

    ``out[h, w, c] = sum_e tri(y_e - h) tri(x_e - w) values[e, c]`` — the
    4-tap stencil of the reference accumulation (reference
    ``utils/iwe.py:63-136``) in factorized form, with out-of-frame taps
    contributing nothing. ``round_idx=True`` reproduces the nearest-pixel
    variant (locations rounded half-to-even like ``torch.round``; rounding
    carries no gradient, matching the integer-index reference path).

    Backends: fused Pallas kernel (TPU / forced), separable MXU einsum
    (maps <= one 128x128 row-tile), 4-tap expansion + XLA scatter otherwise.

    :param loc: ``[B, M, 2]`` fractional ``(y, x)`` (purged/masked upstream).
    :param values: ``[B, M, C]`` per-event channel values (masked).
    :return: ``[B, H, W, C]``.
    """
    from .backend import use_pallas, use_separable

    if round_idx:
        loc = jax.lax.stop_gradient(jnp.round(loc))
    hw = res[0] * res[1]
    if use_pallas(hw, n_channels=values.shape[-1]):
        from .pallas_warp import splat_grad

        return splat_grad(loc, values, res)
    if use_separable(hw):
        from .mxu_lookup import bilinear_splat_separable

        return bilinear_splat_separable(loc, values, res)
    idx, w = get_interpolation(loc, res, round_idx=round_idx)
    if round_idx:
        vals = values * w
    else:
        vals = jnp.concatenate([values] * 4, axis=1) * w
    b = values.shape[0]
    return splat_channels(idx, vals, res).reshape(
        b, res[0], res[1], values.shape[-1]
    )


def interpolate(flat_idx, weights, res: Res, polarity_mask=None):
    """Image of warped events from splat indices/weights.

    :param flat_idx: ``[B, M]`` int32 indices from :func:`get_interpolation`.
    :param weights: ``[B, M, 1]`` splat weights.
    :param polarity_mask: optional ``[B, M, 1]`` mask multiplied into weights
        (zero for padding events — reference ``utils/iwe.py:126-127``).
    :return: ``[B, H, W, 1]`` image of warped events.
    """
    if polarity_mask is not None:
        weights = weights * polarity_mask
    return splat_bilinear(flat_idx, weights, res)


def iwe_from_events(warped_loc, pol_mask, res: Res, round_idx: bool = False,
                    extra_weights=None):
    """One-call per-polarity IWE: interpolation + two splats.

    :param warped_loc: ``[B, N, 2]`` warped ``(y, x)`` locations.
    :param pol_mask: ``[B, N, 2]`` polarity mask.
    :param extra_weights: optional ``[B, N, 1]`` per-event weights (e.g.
        normalized timestamps) multiplied into the splat weights.
    :return: ``[B, H, W, 2]`` per-polarity image of warped events.
    """
    vals = pol_mask if extra_weights is None else pol_mask * extra_weights
    return splat_values(warped_loc, vals, res, round_idx=round_idx)


def deblur_events(flow_map, event_list, res: Res, round_idx: bool = True,
                  polarity_mask=None, round_flow: bool = True):
    """Compensate event motion ("deblur") with a flow map; single polarity.

    Per-event flow lookup at the *original* (integer or fractional) event
    location — nearest pixel if ``round_flow`` else bilinear — followed by a
    one-shot warp to ``tref=1`` and a splat
    (reference ``utils/iwe.py:139-224``).

    :param flow_map: ``[B, H, W, 2]`` flow map, last dim ``(x, y)``.
    :param event_list: ``[B, N, 4]`` events ``(ts, y, x, p)``; ``ts`` in
        ``[0, 1]``.
    :param polarity_mask: optional ``[B, N, 1]`` polarity mask.
    :return: ``[B, H, W, 1]`` image of warped events.
    """
    loc = event_list[:, :, 1:3]
    feas = (
        (loc[:, :, 0:1] >= 0)
        & (loc[:, :, 0:1] < res[0])
        & (loc[:, :, 1:2] >= 0)
        & (loc[:, :, 1:2] < res[1])
    ).astype(loc.dtype)
    loc = loc * feas

    if round_flow:
        # nearest-pixel flow lookup (reference uses the truncated index)
        flat = (loc[:, :, 0] * res[1] + loc[:, :, 1]).astype(jnp.int32)
        fmap = flow_map.reshape(flow_map.shape[0], -1, 2)
        event_fx = gather_pixels(fmap[..., 0], flat)
        event_fy = gather_pixels(fmap[..., 1], flat)
        event_flow = jnp.stack([event_fy, event_fx], axis=-1)
    else:
        event_flow = get_event_flow(flow_map, loc)

    fw = event_propagation(event_list[:, :, 0:1], loc, event_flow, 1.0)
    vals = feas if polarity_mask is None else feas * polarity_mask
    return splat_values(fw, vals, res, round_idx=round_idx)


def compute_pol_iwe(flow_map, event_list, res: Res, pol_mask,
                    round_idx: bool = True, round_flow: bool = True):
    """Per-polarity image of warped events (reference ``utils/iwe.py:227-257``).

    :param flow_map: ``[B, H, W, 2]`` flow map, last dim ``(x, y)``.
    :param event_list: ``[B, N, 4]`` events ``(ts, y, x, p)``.
    :param pol_mask: ``[B, N, 2]`` polarity mask.
    :return: ``[B, H, W, 2]`` image of warped events.
    """
    pos = deblur_events(
        flow_map, event_list, res,
        round_idx=round_idx, polarity_mask=pol_mask[:, :, 0:1],
        round_flow=round_flow,
    )
    neg = deblur_events(
        flow_map, event_list, res,
        round_idx=round_idx, polarity_mask=pol_mask[:, :, 1:2],
        round_flow=round_flow,
    )
    return jnp.concatenate([pos, neg], axis=-1)
