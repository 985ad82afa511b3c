"""Iterative multi-reference contrast-maximization loss — the paper's core.

Semantics of the reference ``Iterative`` loss (reference
``loss/flow.py:415-746``), re-architected for TPU/XLA:

*   The reference warps each of the P event windows pass-by-pass through the
    stored flow sequence — forward to ``t = P`` and backward to ``t = 0`` —
    in ~P² sequential python/CUDA launches per flow scale
    (reference ``loss/flow.py:521-654``). Here the same warp table is
    produced by exactly **two** ``lax.scan``s over the global pass timeline:
    at timeline step τ every event window with ``t ≤ τ`` (forward) or
    ``t ≥ τ`` (backward) samples flow map τ and propagates one step, as one
    batched bilinear gather over ``[B, P·N]`` events. O(P) kernel launches,
    O(P²·N) useful work, fully vectorized.

*   The reference duplicates the entire warp for a detached event subset
    under ``no_grad`` (reference ``loss/flow.py:625-654``). Here grad and
    detached events live in ONE tensor with a per-event ``grad_mask``; the
    recorded table entries pass through
    ``where(grad_mask, loc, stop_gradient(loc))``, which reproduces the
    reference's gradient structure exactly while halving the warp work.

*   Padding events carry a zero polarity mask and therefore contribute to no
    IWE, no focus normalization, and no gradient — the static-shape
    equivalent of the reference's ragged windows.

Inputs use the global convention: ``flows[p, s]`` is the scale-``s`` flow map
(already ``flow_scaling``-scaled, in px/pass) predicted at pass ``p``.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ..ops import get_event_flow, purge_unfeasible
from .base import (
    LossConfig,
    global_ts,
    iwe_with_ts,
    focus_loss,
    flow_spatial_smoothing,
    flow_temporal_smoothing,
)


def _sample_all(flow_map, loc):
    """Sample one flow map at the locations of all P event windows.

    :param flow_map: ``[B, H, W, 2]``.
    :param loc: ``[P, B, N, 2]``.
    :return: ``[P, B, N, 2]`` per-event flow ``(y, x)``.
    """
    p, b, n, _ = loc.shape
    loc_b = jnp.transpose(loc, (1, 0, 2, 3)).reshape(b, p * n, 2)
    flow = get_event_flow(flow_map, loc_b)
    return jnp.transpose(flow.reshape(b, p, n, 2), (1, 0, 2, 3))


# the shared in-frame purge (ops/warp.py) — one boundary rule everywhere
_purge = purge_unfeasible


def warp_table(flow_maps, event_loc, event_ts, pol_mask, res,
               grad_mask=None, remat: bool = True, unroll: int = 1):
    """Build the full (tref × window) iterative warp table with two scans.

    :param flow_maps: ``[P, B, H, W, 2]`` flow sequence for one scale.
    :param event_loc: ``[P, B, N, 2]`` per-window event ``(y, x)``.
    :param event_ts: ``[P, B, N, 1]`` global timeline ts (in ``[t, t+1]``).
    :param pol_mask: ``[P, B, N, 2]`` polarity masks.
    :param grad_mask: optional ``[P, B, N, 1]``; recorded locations of events
        with ``grad_mask == 0`` are stop-gradiented (the reference's detached
        event path).
    :return: ``(table_loc, table_mask)`` of shape ``[P+1, P, B, N, 2]``:
        entry ``[tref, t]`` holds window ``t``'s events warped to time
        ``tref`` and the polarity mask after cumulative purging.
    """
    p = flow_maps.shape[0]
    t_idx = jnp.arange(p).reshape(p, 1, 1, 1).astype(event_ts.dtype)

    def gate(loc):
        if grad_mask is None:
            return loc
        return jnp.where(grad_mask > 0, loc, jax.lax.stop_gradient(loc))

    # masks are products of comparisons with the (leaf) polarity mask —
    # their gradient w.r.t. anything trainable is structurally zero (torch's
    # autograd treats them as constants for the same reason), so
    # stop_gradient prunes their dead cotangent chains from the scan
    # backward without changing any gradient value
    def fw_step(carry, inp):
        tau, fmap = inp
        cur_loc, cur_ts, cur_mask = carry
        active = (t_idx <= tau).astype(cur_loc.dtype)
        flow = _sample_all(fmap, cur_loc)
        prop = cur_loc + (tau + 1.0 - cur_ts) * flow
        prop, purged_mask = _purge(prop, cur_mask, res)
        new_loc = jnp.where(active > 0, prop, cur_loc)
        new_mask = jax.lax.stop_gradient(
            jnp.where(active > 0, purged_mask, cur_mask)
        )
        new_ts = jnp.where(active > 0, tau + 1.0, cur_ts)
        return (new_loc, new_ts, new_mask), (gate(new_loc), new_mask)

    def bw_step(carry, inp):
        tau, fmap = inp
        cur_loc, cur_ts, cur_mask = carry
        active = (t_idx >= tau).astype(cur_loc.dtype)
        flow = _sample_all(fmap, cur_loc)
        prop = cur_loc + (tau - cur_ts) * flow
        prop, purged_mask = _purge(prop, cur_mask, res)
        new_loc = jnp.where(active > 0, prop, cur_loc)
        new_mask = jax.lax.stop_gradient(
            jnp.where(active > 0, purged_mask, cur_mask)
        )
        new_ts = jnp.where(active > 0, tau, cur_ts)
        return (new_loc, new_ts, new_mask), (gate(new_loc), new_mask)

    taus = jnp.arange(p, dtype=event_ts.dtype)
    init = (event_loc, event_ts, pol_mask)

    if remat:
        fw_step = jax.checkpoint(fw_step)
        bw_step = jax.checkpoint(bw_step)

    _, (fw_loc, fw_mask) = jax.lax.scan(
        fw_step, init, (taus, flow_maps), unroll=unroll
    )
    _, (bw_loc, bw_mask) = jax.lax.scan(
        bw_step, init, (taus, flow_maps), reverse=True, unroll=unroll
    )
    # fw_loc[τ] records tref = τ+1 (valid for t ≤ τ, i.e. t < tref);
    # bw_loc[τ] records tref = τ   (valid for t ≥ τ, i.e. t ≥ tref).
    tsel = jnp.arange(p).reshape(p, 1, 1, 1)
    table_loc = [bw_loc[0]]
    table_mask = [bw_mask[0]]
    for tref in range(1, p):
        sel = tsel < tref
        table_loc.append(jnp.where(sel, fw_loc[tref - 1], bw_loc[tref]))
        table_mask.append(jnp.where(sel, fw_mask[tref - 1], bw_mask[tref]))
    table_loc.append(fw_loc[p - 1])
    table_mask.append(fw_mask[p - 1])
    return jnp.stack(table_loc), jnp.stack(table_mask)


def _sweep_batched(tbl_loc, tbl_mask, ts, shared_mask, low_pass, high_pass,
                   low_tref, high_tref, delta, cfg, event_axis):
    """Deblurring-window sweep of one (scale, window) as ONE batched splat.

    The looped formulation runs one IWE splat per tref (11 per scale at the
    reference config — 44 per step); here all T trefs ride a single splat
    with the tref axis folded into the splat's batch-grid dimension. Windows
    outside a tref's deblurring extent ``[tref - delta, tref + delta)``
    (reference ``loss/flow.py:689-697``) are masked to zero polarity, which
    drops them from the IWE, the ts-IWE and the nonzero-pixel count exactly
    like the looped slicing does. Same math, T× fewer kernel launches and
    one transpose instead of T.
    """
    t_count = high_tref - low_tref
    kf = high_pass - low_pass
    b, n = tbl_loc.shape[2], tbl_loc.shape[3]

    wl = tbl_loc[low_tref:high_tref, low_pass:high_pass]  # [T, Kf, B, N, 2]
    if shared_mask is not None:
        wm = jnp.broadcast_to(
            shared_mask[low_pass:high_pass][None], wl.shape
        )
    else:
        wm = tbl_mask[low_tref:high_tref, low_pass:high_pass]

    trefs = jnp.arange(low_tref, high_tref, dtype=ts.dtype)
    wabs = jnp.arange(low_pass, high_pass, dtype=ts.dtype)
    # extent: window w feeds tref iff max(low, tref-delta) <= w <
    # min(high, tref+delta); the [low, high) part is the slice itself
    ext = (
        (wabs[None, :] >= trefs[:, None] - delta)
        & (wabs[None, :] < trefs[:, None] + delta)
    ).astype(wl.dtype)  # [T, Kf]
    wm = wm * ext[:, :, None, None, None]

    wts = jnp.broadcast_to(
        ts[low_pass:high_pass][None], (t_count, kf, b, n, 1)
    )
    norm_ts = 1.0 - jnp.abs(trefs[:, None, None, None, None] - wts) / delta

    def flat(x):
        return jnp.transpose(x, (0, 2, 1, 3, 4)).reshape(
            t_count * b, kf * n, x.shape[-1]
        )

    iwe, iwe_ts = iwe_with_ts(
        flat(wl), flat(wm), flat(norm_ts), cfg.res, event_axis=event_axis,
    )
    iwe_ts_norm = iwe_ts / (iwe + 1e-9)
    # focus_loss sums over its batch axis, so one call over [T*B, ...]
    # equals the looped sum of per-tref calls
    return focus_loss(iwe, iwe_ts_norm, cfg.loss_scaling)


def warp_table_triangular(flow_maps, event_loc, event_ts, pol_mask, res,
                          grad_mask=None, remat=False):
    """:func:`warp_table` with the wasted half of the work removed.

    The scan formulation warps ALL P windows at every timeline step and
    ``where``-discards the inactive ones — at step τ the forward direction
    only needs windows ``t <= τ`` and the backward one ``t >= τ``, so half
    of every gather (and its factor traffic, the measured step bottleneck)
    is thrown away. Here the timeline is a python loop with per-step STATIC
    ragged slices: the forward pass carries exactly the τ+1 joined windows,
    the backward pass exactly the P-τ remaining ones. The two directions'
    entries are complementary — ``table[tref] = concat(fw[: tref],
    bw[tref :])`` — so the stacked table assembles with no padding and is
    numerically identical to the scan version (pinned by tests).

    Same contract as :func:`warp_table`; ``remat`` rematerializes each
    timeline step's sample+propagate+purge on the backward pass (the
    ``LossConfig.warp_remat`` knob — off by default, since the saved
    custom-VJP residuals beat recompute on the measured configs).
    """
    p = flow_maps.shape[0]

    def gate(loc, gm):
        if gm is None:
            return loc
        return jnp.where(gm > 0, loc, jax.lax.stop_gradient(loc))

    def sg(x):
        return jax.lax.stop_gradient(x)

    def _step(flow_map, loc, ts, mask, tref):
        flow = _sample_all(flow_map, loc)
        prop = loc + (tref - ts) * flow
        return _purge(prop, mask, res)

    step = jax.checkpoint(_step, static_argnums=(4,)) if remat else _step

    # ---- forward: windows join at their own pass and ride to the end
    fw_tab = []  # fw_tab[τ] = (loc, mask) of windows [0 : τ+1] at tref τ+1
    cur_loc = event_loc[0:1]
    cur_ts = event_ts[0:1]
    cur_mask = pol_mask[0:1]
    for tau in range(p):
        if tau > 0:
            cur_loc = jnp.concatenate([cur_loc, event_loc[tau:tau + 1]])
            cur_ts = jnp.concatenate([cur_ts, event_ts[tau:tau + 1]])
            cur_mask = jnp.concatenate([cur_mask, pol_mask[tau:tau + 1]])
        prop, cur_mask = step(flow_maps[tau], cur_loc, cur_ts, cur_mask,
                              tau + 1.0)
        cur_mask = sg(cur_mask)
        gm = None if grad_mask is None else grad_mask[: tau + 1]
        fw_tab.append((gate(prop, gm), cur_mask))
        cur_loc = prop
        cur_ts = jnp.full_like(cur_ts, tau + 1.0)

    # ---- backward: windows join as the timeline walks back past them
    bw_tab = [None] * p  # bw_tab[τ] = (loc, mask) of windows [τ : P] at tref τ
    cur_loc = event_loc[p - 1:]
    cur_ts = event_ts[p - 1:]
    cur_mask = pol_mask[p - 1:]
    for tau in range(p - 1, -1, -1):
        if tau < p - 1:
            cur_loc = jnp.concatenate([event_loc[tau:tau + 1], cur_loc])
            cur_ts = jnp.concatenate([event_ts[tau:tau + 1], cur_ts])
            cur_mask = jnp.concatenate([pol_mask[tau:tau + 1], cur_mask])
        prop, cur_mask = step(flow_maps[tau], cur_loc, cur_ts, cur_mask,
                              float(tau))
        cur_mask = sg(cur_mask)
        gm = None if grad_mask is None else grad_mask[tau:]
        bw_tab[tau] = (gate(prop, gm), cur_mask)
        cur_loc = prop
        cur_ts = jnp.full_like(cur_ts, float(tau))

    # ---- assemble: the ragged pieces are exactly complementary
    table_loc = [bw_tab[0][0]]
    table_mask = [bw_tab[0][1]]
    for tref in range(1, p):
        table_loc.append(
            jnp.concatenate([fw_tab[tref - 1][0][:tref], bw_tab[tref][0]])
        )
        table_mask.append(
            jnp.concatenate([fw_tab[tref - 1][1][:tref], bw_tab[tref][1]])
        )
    table_loc.append(fw_tab[p - 1][0])
    table_mask.append(fw_tab[p - 1][1])
    return jnp.stack(table_loc), jnp.stack(table_mask)


def iterative_loss(flows, event_list, pol_mask, grad_mask, cfg: LossConfig,
                   event_axis=None):
    """Full Iterative contrast-max training loss
    (reference ``loss/flow.py:588-746``).

    :param flows: ``[P, S, B, H, W, 2]`` multi-scale flow sequence (already
        upsampled to full res and flow_scaling-scaled).
    :param event_list: ``[P, B, N, 4]`` events ``(ts, y, x, p)``, ts in
        ``[0, 1]`` per window; zero-padded.
    :param pol_mask: ``[P, B, N, 2]``.
    :param grad_mask: ``[P, B, N, 1]`` (1 = gradient-path event). The
        reference's grad/no-grad split (``dataloader/base.py:347-377``).
    :param event_axis: optional mesh axis name when running under
        ``shard_map`` with the event dimension N sharded across devices
        (see :mod:`..parallel.event`). Partial IWEs are ``psum``-merged
        before normalization; the returned loss is the exact global loss
        (``pmean`` over the axis keeps its per-device value — and therefore
        the gradient contract — identical to the unsharded program).
    :return: scalar loss.
    """
    p, s_scales = flows.shape[0], flows.shape[1]
    assert p == cfg.passes_loss, (p, cfg.passes_loss)

    pass_ids = jnp.arange(p, dtype=event_list.dtype).reshape(p, 1, 1, 1)
    ts = global_ts(event_list[..., 0:1], pass_ids, cfg.round_ts)
    loc = event_list[..., 1:3]

    # One scale's full contribution: warp table (two scans) + deblurring-
    # window IWE sweep. Deliberately a plain python loop over the S scales
    # (NOT vmapped): vmap-of-pallas_call lowers poorly (8-minute compiles,
    # 391 vs 311 ms steps, commit 4988588), and the 4x-smaller per-scale
    # live set is what lets warp_remat stay off (276 ms, README roofline).
    def scale_loss(flow_maps):
        if cfg.triangular_warp:
            tbl_loc, tbl_mask = warp_table_triangular(
                flow_maps, loc, ts, pol_mask, cfg.res, grad_mask=grad_mask,
                remat=cfg.warp_remat,
            )
        else:
            tbl_loc, tbl_mask = warp_table(
                flow_maps, loc, ts, pol_mask, cfg.res, grad_mask=grad_mask,
                remat=cfg.warp_remat, unroll=cfg.scan_unroll,
            )

        loss = 0.0
        for s, scale in enumerate(cfg.passes_list):
            delta = cfg.delta_passes[s]
            loss_update = 0.0
            for w in range(2**s):
                low_pass = w * scale
                high_pass = (w + 1) * scale
                low_tref = low_pass
                high_tref = high_pass + 1
                if cfg.iterative_mode == "four":
                    low_tref = low_pass + delta
                    high_tref = low_pass + 3 * delta + 1

                if cfg.border_compensation:
                    # events leaving the frame at ANY tref of the window are
                    # excluded everywhere (reference ``loss/flow.py:671-681``)
                    shared_mask = jnp.prod(
                        tbl_mask[low_tref:high_tref], axis=0
                    )  # [P, B, N, 2]

                if cfg.batched_sweep:
                    loss_update = loss_update + _sweep_batched(
                        tbl_loc, tbl_mask, ts,
                        shared_mask if cfg.border_compensation else None,
                        low_pass, high_pass, low_tref, high_tref, delta,
                        cfg, event_axis,
                    )
                    continue

                for tref in range(low_tref, high_tref):
                    low_ext = max(low_pass, tref - delta)
                    high_ext = min(high_pass, tref + delta)
                    k = high_ext - low_ext

                    wl = tbl_loc[tref, low_ext:high_ext]  # [K, B, N, 2]
                    if cfg.border_compensation:
                        wm = shared_mask[low_ext:high_ext]
                    else:
                        wm = tbl_mask[tref, low_ext:high_ext]
                    wts = ts[low_ext:high_ext]

                    b, n = wl.shape[1], wl.shape[2]

                    def flat(x):
                        return jnp.transpose(x, (1, 0, 2, 3)).reshape(
                            b, k * n, x.shape[-1]
                        )

                    norm_ts = 1.0 - jnp.abs(tref - flat(wts)) / delta
                    iwe, iwe_ts = iwe_with_ts(
                        flat(wl), flat(wm), norm_ts, cfg.res,
                        event_axis=event_axis,
                    )
                    iwe_ts_norm = iwe_ts / (iwe + 1e-9)
                    loss_update = loss_update + focus_loss(
                        iwe, iwe_ts_norm, cfg.loss_scaling
                    )

            loss_update = loss_update / (2**s)
            loss_update = loss_update / (2 * delta + 1)
            loss = loss + loss_update
        return loss

    loss = sum(scale_loss(flows[:, i]) for i in range(s_scales))
    loss = loss / cfg.scales_loss
    loss = loss / s_scales

    flow_seq = [jnp.transpose(flows[:, i], (1, 0, 2, 3, 4)) for i in range(s_scales)]
    if cfg.flow_spat_smooth_weight is not None:
        loss = loss + flow_spatial_smoothing(flow_seq, cfg.flow_spat_smooth_weight)
    if cfg.flow_temp_smooth_weight is not None and p > 1:
        loss = loss + flow_temporal_smoothing(
            flow_seq, cfg.res, cfg.flow_temp_smooth_weight
        )
    if event_axis is not None:
        # every event-shard device computed the identical global loss (the
        # focus terms ride psum'd IWEs; smoothness terms see replicated
        # flows) — pmean keeps the value AND routes exactly one unit of
        # cotangent through each shard's splat contributions under autodiff
        loss = jax.lax.pmean(loss, event_axis)
    return loss
