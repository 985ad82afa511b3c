"""Shared loss machinery: config, fused IWE+timestamp splat, focus loss,
flow smoothness priors.

Functional counterparts of the reference loss base class
(reference ``loss/flow.py:14-213``). All functions take explicit arrays —
flow-map sequences are ``[P, B, H, W, 2]`` stacks (last dim ``(x, y)``).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..ops import get_interpolation, get_event_flow, purge_unfeasible


class LossConfig(NamedTuple):
    """Static loss hyperparameters (reference ``configs/train_flow.yml:16-22``).

    ``passes_loss`` is the *effective* window length — callers must already
    have doubled it for ``iterative_mode == "four"``
    (reference ``loss/flow.py:422-423``).
    """

    res: Tuple[int, int]
    passes_loss: int = 10
    scales_loss: int = 1
    iterative_mode: str = "two"  # one / two / four
    round_ts: bool = False
    loss_scaling: bool = True
    border_compensation: bool = True
    flow_spat_smooth_weight: Optional[float] = None
    flow_temp_smooth_weight: Optional[float] = None
    # compile-time performance knobs (YAML ``loss`` section; see
    # ``configs/parser.py`` DEFAULTS)
    # rematerialize warp-scan steps: with the custom-VJP warp ops the saved
    # residuals are small (loc/maps, not factor tensors), so saving them
    # beats recompute at the reference config (276 vs 311 ms at B=8,
    # bit-identical loss — scripts/bench_b8_opt.py). Set True to trade
    # ~12% step time for memory at larger batches/windows.
    warp_remat: bool = False
    scan_unroll: int = 1  # unroll factor for the warp/model scans
    # run each (scale, window)'s deblurring sweep as ONE tref-batched IWE
    # splat instead of one splat per tref (same math — see
    # ``iterative._sweep_batched``). Measured at the reference train config
    # (B=8, TPU v5e): ~10% slower steady-state (the batched splat pays the
    # full window for edge trefs: +29% dense work) but compiles 7x faster
    # (30 s vs 218 s) — handy for development; loss/grad equivalence is
    # pinned by tests either way. Default: the faster steady state.
    batched_sweep: bool = False
    # build the warp table with per-step ragged static slices instead of the
    # full-width lax.scan: drops the ~45% of gather/factor traffic the scan
    # computes for inactive windows and then discards (see
    # ``iterative.warp_table_triangular``); numerically identical
    triangular_warp: bool = True

    @property
    def passes_list(self) -> Sequence[int]:
        # timescales: passes_loss / 2^s (reference ``loss/flow.py:41-44``)
        return [self.passes_loss // (2**s) for s in range(self.scales_loss)]

    @property
    def delta_passes(self) -> Sequence[int]:
        # deblurring-window radius per timescale (reference ``loss/flow.py:434-441``)
        div = {"one": 1, "two": 2, "four": 4}[self.iterative_mode]
        return [p // div for p in self.passes_list]


def global_ts(event_ts, pass_idx, round_ts: bool):
    """Window-local ts in [0, 1] -> global pass timeline ts in [t, t+1].

    ``round_ts`` collapses every event of a pass to ``min(ts) + 0.5``
    (reference ``loss/flow.py:461-463``; with the loader contract
    ``ts[0] = 0`` this is the window midpoint).

    :param event_ts: ``[P, B, N, 1]`` window-local timestamps.
    :param pass_idx: ``[P, 1, 1, 1]`` pass indices.
    """
    ts = event_ts + pass_idx
    if round_ts:
        # unmasked min is exact: the loader's ts normalization pins the
        # first real event of every non-empty window to exactly 0
        # (data/base.py:146-147), the same value the zero-padded rows carry
        mins = jnp.min(ts, axis=(1, 2, 3), keepdims=True)
        ts = jnp.broadcast_to(mins + 0.5, ts.shape)
    return ts


def iwe_with_ts(warped_loc, pol_mask, norm_ts, res, event_axis=None):
    """Fused per-polarity IWE + timestamp-IWE in ONE batched scatter.

    The reference runs four independent ``scatter_add_`` launches per
    deblurring point (reference ``loss/flow.py:98-108``); here the four
    accumulation channels (pos, neg, pos*ts, neg*ts) ride a single XLA
    scatter over a ``[B, H*W, 4]`` buffer — 4x fewer scatter passes over the
    index stream, which is what the TPU memory system sees.

    :param warped_loc: ``[B, N, 2]`` warped ``(y, x)`` locations.
    :param pol_mask: ``[B, N, 2]`` polarity mask (zero for padding).
    :param norm_ts: ``[B, N, 1]`` normalized timestamps.
    :param event_axis: optional mesh axis name (under ``shard_map``): the
        event dimension is sharded across it, so the per-shard partial IWE is
        ``psum``-merged into the global IWE before any normalization. The
        splat is a plain sum over events, so this is exact.
    :return: ``(iwe, iwe_ts)`` each ``[B, H, W, 2]``.
    """
    from ..ops import splat_values

    vals = jnp.concatenate(
        [
            pol_mask[:, :, 0:1],
            pol_mask[:, :, 1:2],
            pol_mask[:, :, 0:1] * norm_ts,
            pol_mask[:, :, 1:2] * norm_ts,
        ],
        axis=-1,
    )  # [B, N, 4]
    buf = splat_values(warped_loc, vals, res)
    if event_axis is not None:
        buf = jax.lax.psum(buf, event_axis)
    return buf[..., 0:2], buf[..., 2:4]


def focus_loss(iwe, iwe_ts_norm, loss_scaling: bool = True):
    """Squared average-timestamp focus objective (reference ``loss/flow.py:112-129``).

    :param iwe: ``[B, H, W, 2]`` image of warped events.
    :param iwe_ts_norm: ``[B, H, W, 2]`` per-pixel/per-polarity average ts.
    :return: scalar loss (summed over batch).
    """
    b = iwe.shape[0]
    ts_flat = iwe_ts_norm.reshape(b, -1, 2)
    loss = jnp.sum(ts_flat[..., 0] ** 2, axis=1) + jnp.sum(
        ts_flat[..., 1] ** 2, axis=1
    )
    if loss_scaling:
        nonzero_px = (jnp.sum(iwe, axis=-1) > 0).reshape(b, -1)
        loss = loss / (jnp.sum(nonzero_px, axis=1) + 1e-9)
    return jnp.sum(loss)


def flow_spatial_smoothing(flow_seq_per_scale, weight: float):
    """Charbonnier spatial smoothness over 4 directions
    (reference ``loss/flow.py:170-209``).

    :param flow_seq_per_scale: list over scales of ``[B, P, H, W, 2]``.
    :return: scalar.
    """
    total = 0.0
    for flow in flow_seq_per_scale:
        fx, fy = flow[..., 0], flow[..., 1]  # [B, P, H, W]

        def charb(a):
            return jnp.sqrt(a**2 + 1e-6)

        d_x = charb(fx[..., :, :-1] - fx[..., :, 1:]) + charb(
            fy[..., :, :-1] - fy[..., :, 1:]
        )
        d_y = charb(fx[..., :-1, :] - fx[..., 1:, :]) + charb(
            fy[..., :-1, :] - fy[..., 1:, :]
        )
        d_dr = charb(fx[..., :-1, :-1] - fx[..., 1:, 1:]) + charb(
            fy[..., :-1, :-1] - fy[..., 1:, 1:]
        )
        d_ur = charb(fx[..., 1:, :-1] - fx[..., :-1, 1:]) + charb(
            fy[..., 1:, :-1] - fy[..., :-1, 1:]
        )
        terms = [d_x, d_y, d_dr, d_ur]
        b = flow.shape[0]
        acc = 0.0
        for t in terms:
            acc = acc + t.reshape(b, flow.shape[1], -1).mean(axis=2).mean(axis=1)
        total = total + acc / 4.0
    total = total / len(flow_seq_per_scale)
    return weight * jnp.sum(total)


def flow_temporal_smoothing(flow_seq_per_scale, res, weight: float):
    """Charbonnier temporal consistency against the backward-warped next
    flow map (reference ``loss/flow.py:131-168``).

    :param flow_seq_per_scale: list over scales of ``[B, P, H, W, 2]``.
    """
    h, w = res
    # on-device iota grid — a jnp.arange/meshgrid here would embed a large
    # HLO constant, which is catastrophically slow on TPU (see
    # metrics/validation._grid)
    flat = jax.lax.broadcasted_iota(jnp.int32, (1, h * w), 1)
    grid = jnp.stack(
        [(flat // w).astype(jnp.float32), (flat % w).astype(jnp.float32)],
        axis=-1,
    )  # [1, HW, 2] (y, x)

    total = 0.0
    num_passes = flow_seq_per_scale[0].shape[1]
    for flow in flow_seq_per_scale:
        b = flow.shape[0]
        acc = 0.0
        for j in range(num_passes - 1):
            fj = flow[:, j]  # [B, H, W, 2] (x, y)
            flow_yx = jnp.stack(
                [fj[..., 1].reshape(b, -1), fj[..., 0].reshape(b, -1)], axis=-1
            )
            warped_idx = grid + flow_yx  # [B, HW, 2]
            inside = (
                (warped_idx[..., 0] >= 0)
                & (warped_idx[..., 0] <= h - 1.0)
                & (warped_idx[..., 1] >= 0)
                & (warped_idx[..., 1] <= w - 1.0)
            ).astype(flow.dtype)
            warped_flow = get_event_flow(flow[:, j + 1], warped_idx)  # [B,HW,2] (y,x)
            diff = jnp.sqrt((flow_yx - warped_flow) ** 2 + 1e-9)
            diff = jnp.sum(diff, axis=-1)
            acc = acc + jnp.sum(diff * inside, axis=1) / (
                jnp.sum(inside, axis=1) + 1e-9
            )
        total = total + acc
    total = total / len(flow_seq_per_scale)
    total = total / (num_passes - 1)
    return weight * jnp.sum(total)
