"""Linear (single-warp) contrast-maximization loss.

Functional counterpart of the reference ``Linear`` loss (NeurIPS'21 scheme,
reference ``loss/flow.py:216-412``): each event samples the flow map of its
*arrival* pass once, and the whole window is warped in a single shot to the
window extremes (forward to ``high_pass``, backward to ``low_pass``).

Grad/detached event sets are merged with a per-event stop-gradient mask like
in :mod:`.iterative`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops import get_event_flow, event_propagation
from .base import (
    LossConfig,
    global_ts,
    iwe_with_ts,
    focus_loss,
    flow_spatial_smoothing,
    flow_temporal_smoothing,
)
from .iterative import _purge


def linear_loss(flows, event_list, pol_mask, grad_mask, cfg: LossConfig,
                event_axis=None):
    """Linear contrast-max training loss (reference ``loss/flow.py:306-412``).

    :param flows: ``[P, S, B, H, W, 2]`` multi-scale flow sequence.
    :param event_list: ``[P, B, N, 4]`` events ``(ts, y, x, p)``; ts in [0,1].
    :param pol_mask: ``[P, B, N, 2]``.
    :param grad_mask: ``[P, B, N, 1]``.
    :param event_axis: optional mesh axis the event dim is sharded over
        (see :func:`..objectives.iterative.iterative_loss`).
    :return: scalar loss.
    """
    p, s_scales = flows.shape[0], flows.shape[1]
    assert p == cfg.passes_loss

    pass_ids = jnp.arange(p, dtype=event_list.dtype).reshape(p, 1, 1, 1)
    ts = global_ts(event_list[..., 0:1], pass_ids, cfg.round_ts)
    loc = event_list[..., 1:3]

    loss = 0.0
    for i in range(s_scales):
        # per-event flow from the arrival pass's map (reference flow.py:266-285)
        event_flow = jax.vmap(get_event_flow)(flows[:, i], loc)  # [P,B,N,2]

        for s, scale in enumerate(cfg.passes_list):
            loss_update = 0.0
            for w in range(2**s):
                low_pass = w * scale
                high_pass = (w + 1) * scale
                sl = slice(low_pass, high_pass)
                k = high_pass - low_pass
                b, n = loc.shape[1], loc.shape[2]

                def flat(x):
                    return jnp.transpose(x[sl], (1, 0, 2, 3)).reshape(
                        b, k * n, x.shape[-1]
                    )

                w_ts = flat(ts)
                w_loc = flat(loc)
                w_flow = flat(event_flow)
                w_mask = flat(pol_mask)

                fw = event_propagation(w_ts, w_loc, w_flow, float(high_pass))
                bw = event_propagation(w_ts, w_loc, w_flow, float(low_pass))
                if cfg.border_compensation:
                    # sequential purge: the mask accumulates both passes and
                    # is shared by both IWEs (reference flow.py:340-343)
                    fw, w_mask = _purge(fw, w_mask, cfg.res)
                    bw, w_mask = _purge(bw, w_mask, cfg.res)

                if grad_mask is not None:
                    gm = flat(grad_mask) > 0
                    fw = jnp.where(gm, fw, jax.lax.stop_gradient(fw))
                    bw = jnp.where(gm, bw, jax.lax.stop_gradient(bw))

                fw_ts = 1.0 - jnp.abs(high_pass - w_ts) / scale
                bw_ts = 1.0 - jnp.abs(low_pass - w_ts) / scale

                fw_iwe, fw_iwe_ts = iwe_with_ts(
                    fw, w_mask, fw_ts, cfg.res, event_axis=event_axis
                )
                bw_iwe, bw_iwe_ts = iwe_with_ts(
                    bw, w_mask, bw_ts, cfg.res, event_axis=event_axis
                )

                loss_update = loss_update + focus_loss(
                    fw_iwe, fw_iwe_ts / (fw_iwe + 1e-9), cfg.loss_scaling
                )
                loss_update = loss_update + focus_loss(
                    bw_iwe, bw_iwe_ts / (bw_iwe + 1e-9), cfg.loss_scaling
                )

            loss_update = loss_update / (2**s)
            loss_update = loss_update / 2  # fw + bw deblurring points
            loss = loss + loss_update

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
        loss = jax.lax.pmean(loss, event_axis)  # see iterative_loss
    return loss
