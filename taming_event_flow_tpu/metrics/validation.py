"""Validation metrics: FWL / RSAT / AEE and the incremental warp state.

Functional TPU-native counterpart of the reference validation classes
(reference ``loss/flow_val.py:12-694``). The reference accumulates
variable-length event/flow buffers by concatenation; here the state is a
fixed-shape pytree with one *slot per pass* (``[P, ...]`` leading axis) so
``update`` jits once and never recompiles. Empty slots carry zero polarity
masks / zero flow maps and therefore drop out of every splat and average
exactly like absent data.

All update math runs on device; metric reducers return scalars.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops import (
    event_propagation,
    get_event_flow,
    iwe_from_events,
    purge_unfeasible,
)
from ..ops.warp import inside_mask


class ValConfig(NamedTuple):
    res: Tuple[int, int]
    passes: int
    round_ts: bool = False
    # Forward-propagated flow maps (reference ``loss/flow_val.py:558-576``)
    # feed only the dynamic-visualization accessor ``window_flow("forward")``
    # — metrics (FWL/RSAT/AEE) and the DSEC submission never read them. At
    # DSEC scale they are ~P full-map self-splats per pass, so headless eval
    # turns them off.
    track_fw_prop: bool = True
    # The backward re-warp of each arriving window to t=0 (reference
    # ``loss/flow_val.py:519-556``) feeds only ``window_iwe("backward")``
    # visualizations — the DSEC ``flow_bw`` submission quantity comes from
    # the accumulated grid warp (``accum_flow``), and FWL/RSAT/AEE never
    # read it. A P-step gather scan per pass at DSEC scale; gate likewise.
    track_bw: bool = True


# the shared in-frame purge (ops/warp.py) — one boundary rule everywhere
_purge = purge_unfeasible


def _grid(res, dtype=jnp.float32):
    """[1, HW, 2] (y, x) pixel grid, generated on device via iota.

    NEVER build this with jnp.arange/meshgrid inside a jitted function: a
    307k-element HLO *constant* turned the whole eval update into a 750 ms
    program on TPU (measured); iota generation is free.
    """
    hw = res[0] * res[1]
    flat = jax.lax.broadcasted_iota(jnp.int32, (1, hw), 1)
    y = (flat // res[1]).astype(dtype)
    x = (flat % res[1]).astype(dtype)
    return jnp.stack([y, x], axis=-1)  # [1, HW, 2] (y, x)


def forward_prop_flow_once(flow_map, res, dt: float = 1.0):
    """Push a flow map ``dt`` steps forward along itself (bilinear splat).

    Reference ``loss/flow_val.py:43-74`` (one linear warp of the pixel grid
    by ``(tref - i) * flow`` followed by a weight-normalized splat). Two
    TPU-side simplifications with identical numerics: sampling the map at the
    exact integer grid is the map itself (the reference pays a full
    ``grid_sample``), and the three weight/flow splats ride ONE batched
    scatter with a 3-wide channel dim.

    :param flow_map: ``[B, H, W, 2]`` (x, y).
    :return: ``[B, H, W, 2]`` forward-propagated flow map.
    """
    b = flow_map.shape[0]
    hw = res[0] * res[1]
    grid = jnp.broadcast_to(_grid(res, flow_map.dtype), (b, hw, 2))

    fm = flow_map.reshape(b, hw, 2)
    flow_at = jnp.stack([fm[..., 1], fm[..., 0]], axis=-1)  # (y, x) per px
    warped = grid + dt * flow_at
    ones = jnp.ones((b, hw, 1), flow_map.dtype)
    warped, mask = _purge(warped, ones, res)

    from ..ops import splat_values

    vals = jnp.concatenate(
        [mask, mask * flow_at[..., 0:1], mask * flow_at[..., 1:2]], axis=-1
    )  # (weight, w*fy, w*fx)
    buf = splat_values(warped, vals, res)  # [B, H, W, 3]
    wsum = buf[..., 0:1]
    wy = buf[..., 1:2] / (wsum + 1e-9)
    wx = buf[..., 2:3] / (wsum + 1e-9)
    return jnp.concatenate([wx, wy], axis=-1)


class ValState(NamedTuple):
    """Slot-per-pass validation state (shapes static in P, B, N, H, W)."""

    pass_idx: jnp.ndarray  # int32 scalar
    event_ts: jnp.ndarray  # [P, B, N, 1] global-timeline ts
    event_loc: jnp.ndarray  # [P, B, N, 2] original (y, x)
    pol_mask: jnp.ndarray  # [P, B, N, 2]
    flow_maps: jnp.ndarray  # [P, B, H, W, 2] finest-scale flow per pass
    event_mask_maps: jnp.ndarray  # [P, B, H, W, 1]
    fw_loc: jnp.ndarray  # [P, B, N, 2] incrementally fw-warped events
    fw_ts: jnp.ndarray  # [P, B, N, 1]
    fw_mask: jnp.ndarray  # [P, B, N, 2]
    bw_loc: jnp.ndarray  # [P, B, N, 2] events bw-warped to t = 0
    bw_mask: jnp.ndarray  # [P, B, N, 2]
    fw_prop_flow: jnp.ndarray  # [P, B, H, W, 2]
    accum_flow: jnp.ndarray  # [B, H, W, 2] accumulated bw flow (x, y)
    warp_indices: jnp.ndarray  # [B, H, W, 2] iterated warp grid (y, x)
    out_mask: jnp.ndarray  # [B, H, W, 1] valid-pass counter


class IterativeValidation:
    """Iterative validation scheme (reference ``loss/flow_val.py:419-694``).

    Usage::

        val = IterativeValidation(cfg, batch, n_events)
        state = val.init()                      # == reference reset()
        state = val.update(state, flow, events, pol_mask, event_mask)
        rsat, fwl = val.rsat(state), val.fwl(state)

    ``update`` is a pure function — jit it once and reuse.
    """

    def __init__(self, cfg: ValConfig, batch: int, n_events: int):
        self.cfg = cfg
        self.batch = batch
        self.n_events = n_events

    def init(self) -> ValState:
        p, b, n = self.cfg.passes, self.batch, self.n_events
        h, w = self.cfg.res
        f32 = jnp.float32
        grid_map = _grid(self.cfg.res).reshape(1, h, w, 2)
        return ValState(
            pass_idx=jnp.zeros((), jnp.int32),
            event_ts=jnp.zeros((p, b, n, 1), f32),
            event_loc=jnp.zeros((p, b, n, 2), f32),
            pol_mask=jnp.zeros((p, b, n, 2), f32),
            flow_maps=jnp.zeros((p, b, h, w, 2), f32),
            event_mask_maps=jnp.zeros((p, b, h, w, 1), f32),
            fw_loc=jnp.zeros((p, b, n, 2), f32),
            fw_ts=jnp.zeros((p, b, n, 1), f32),
            fw_mask=jnp.zeros((p, b, n, 2), f32),
            bw_loc=jnp.zeros((p, b, n, 2), f32),
            bw_mask=jnp.zeros((p, b, n, 2), f32),
            fw_prop_flow=jnp.zeros((p, b, h, w, 2), f32),
            accum_flow=jnp.zeros((b, h, w, 2), f32),
            warp_indices=jnp.broadcast_to(grid_map, (b, h, w, 2)).astype(f32),
            out_mask=jnp.zeros((b, h, w, 1), f32),
        )

    def reset(self, state: ValState) -> ValState:
        """Window-boundary state reset from EXISTING buffers.

        Jit with ``donate_argnums=(0,)``: XLA then zeroes the slot buffers
        in place instead of freeing ~15 arrays and allocating fresh ones
        per window (``init()``'s allocator churn is measurable at DSEC
        scale). Semantically identical to :meth:`init`.
        """
        h, w = self.cfg.res
        grid_map = _grid(self.cfg.res).reshape(1, h, w, 2)
        zero = jax.tree.map(jnp.zeros_like, state)
        return zero._replace(
            warp_indices=jnp.broadcast_to(
                grid_map, state.warp_indices.shape
            ).astype(jnp.float32),
        )

    def update(self, state: ValState, flow, event_list, pol_mask,
               event_mask, n_active: Optional[int] = None) -> ValState:
        """Ingest one pass (reference ``loss/flow_val.py:477-607``).

        :param flow: ``[B, H, W, 2]`` finest-scale flow (flow_scaling'd).
        :param event_list: ``[B, N, 4]`` events ``(ts, y, x, p)``, ts in [0,1].
        :param pol_mask: ``[B, N, 2]``.
        :param event_mask: ``[B, H, W, 1]`` binary event-presence mask.
        :param n_active: optional STATIC pass count (``pass_idx + 1``,
            python int). When given, the incremental forward warp runs only
            on the occupied slot slice instead of masking all P slots —
            identical results, ~P/2x less gather work on average. Callers
            jit one specialization per count (the eval CLIs track the pass
            index host-side anyway); ``None`` keeps the single-program
            masked form.
        """
        cfg = self.cfg
        res = cfg.res
        p_cur = state.pass_idx
        pf = p_cur.astype(jnp.float32)

        ts = event_list[..., 0:1] + pf
        if cfg.round_ts:
            # unmasked min is exact: the loader normalizes ts so the first
            # real event is exactly 0 (data/base.py:146-147, mirroring the
            # reference), which equals the padding rows' ts — and unlike a
            # masked min it stays finite on empty windows
            ts = jnp.broadcast_to(jnp.min(ts) + 0.5, ts.shape)
        loc = event_list[..., 1:3]

        def put(buf, val):
            return jax.lax.dynamic_update_index_in_dim(buf, val, p_cur, 0)

        state = state._replace(
            event_ts=put(state.event_ts, ts),
            event_loc=put(state.event_loc, loc),
            pol_mask=put(state.pol_mask, pol_mask),
            flow_maps=put(state.flow_maps, flow),
            event_mask_maps=put(state.event_mask_maps, event_mask),
            fw_loc=put(state.fw_loc, loc),
            fw_ts=put(state.fw_ts, ts),
            fw_mask=put(state.fw_mask, pol_mask),
        )

        p_ax = jnp.arange(cfg.passes).reshape(-1, 1, 1, 1)

        # --- incremental forward warping of every stored window to p+1
        # (reference flow_val.py:489-517), fused with the accumulated-grid
        # lookup below: both sample THIS pass's flow map, so one combined
        # gather covers [active*N events | H*W grid points]
        pp, bb, nn, _ = state.fw_loc.shape
        h, w = res
        k = pp if n_active is None else n_active
        fw_loc_k = state.fw_loc[:k]
        fw_flat = jnp.transpose(fw_loc_k, (1, 0, 2, 3)).reshape(bb, k * nn, 2)
        grid_pts = state.warp_indices.reshape(bb, h * w, 2)
        both = get_event_flow(flow, jnp.concatenate([fw_flat, grid_pts], 1))
        fw_flow, grid_flow = both[:, : k * nn], both[:, k * nn :]
        fw_flow = jnp.transpose(fw_flow.reshape(bb, k, nn, 2), (1, 0, 2, 3))
        prop = fw_loc_k + (pf + 1.0 - state.fw_ts[:k]) * fw_flow
        prop, purged = _purge(prop, state.fw_mask[:k], res)
        if n_active is None:
            # single-program form: mask the not-yet-occupied slots
            active = (p_ax <= p_cur).astype(jnp.float32)
            state = state._replace(
                fw_loc=jnp.where(active > 0, prop, state.fw_loc),
                fw_mask=jnp.where(active > 0, purged, state.fw_mask),
                fw_ts=jnp.where(active > 0, pf + 1.0, state.fw_ts),
            )
        else:
            # static slice: all k slots are occupied by construction
            state = state._replace(
                fw_loc=state.fw_loc.at[:k].set(prop),
                fw_mask=state.fw_mask.at[:k].set(purged),
                fw_ts=state.fw_ts.at[:k].set(pf + 1.0),
            )

        # --- backward warping of THIS window to t=0 through all stored maps
        # (reference flow_val.py:519-556)
        if cfg.track_bw:
            state = self._update_bw(state, loc, pol_mask, ts, p_cur, res,
                                    put, n_active)

        # --- forward-propagated flow maps: every older slot advances one
        # step along itself (reference flow_val.py:558-576)
        if cfg.track_fw_prop:
            fw_prop = put(state.fw_prop_flow, flow)
            if n_active is None:
                prop_maps = jax.vmap(
                    lambda m: forward_prop_flow_once(m, res)
                )(fw_prop)
                sel = (p_ax < p_cur).reshape(-1, 1, 1, 1, 1) > 0
                fw_prop = jnp.where(sel, prop_maps, fw_prop)
            elif n_active > 1:
                prop_maps = jax.vmap(
                    lambda m: forward_prop_flow_once(m, res)
                )(fw_prop[: n_active - 1])
                fw_prop = fw_prop.at[: n_active - 1].set(prop_maps)
            state = state._replace(fw_prop_flow=fw_prop)

        # --- accumulated backward flow via iterated grid warping
        # (reference flow_val.py:578-604); grid_flow came from the fused
        # gather above
        b = flow.shape[0]
        indices = state.warp_indices  # [B, H, W, 2] (y, x)
        mask_valid = inside_mask(indices, (h, w))
        out_mask = state.out_mask + mask_valid

        curr = grid_flow.reshape(b, h, w, 2)  # (y, x) per px
        warped_idx = indices + curr * mask_valid
        grid_map = _grid(res).reshape(1, h, w, 2)
        accum = jnp.stack(
            [
                warped_idx[..., 1] - grid_map[..., 1],  # x displacement
                warped_idx[..., 0] - grid_map[..., 0],  # y displacement
            ],
            axis=-1,
        )
        state = state._replace(
            accum_flow=accum,
            warp_indices=warped_idx,
            out_mask=out_mask,
            pass_idx=p_cur + 1,
        )
        return state

    def _update_bw(self, state, loc, pol_mask, ts, p_cur, res, put,
                   n_active=None):
        k = self.cfg.passes if n_active is None else n_active

        def bw_step(carry, tau):
            bl, bts = carry
            act = (tau <= p_cur).astype(jnp.float32)
            fmap = state.flow_maps[tau]
            bflow = get_event_flow(fmap, bl[0])
            tau_f = tau.astype(jnp.float32)
            nl = bl[0] + (tau_f - bts[0]) * bflow
            nl, nm = _purge(nl, bl[1], res)
            new_loc = jnp.where(act > 0, nl, bl[0])
            new_mask = jnp.where(act > 0, nm, bl[1])
            new_ts = jnp.where(act > 0, tau_f, bts[0])
            return ((new_loc, new_mask), (new_ts,)), None

        (bw_final, _), _ = jax.lax.scan(
            lambda c, t: bw_step(c, t),
            ((loc, pol_mask), (ts,)),
            jnp.arange(k, dtype=jnp.int32),
            reverse=True,
        )
        bw_loc_new, bw_mask_new = bw_final
        return state._replace(
            bw_loc=put(state.bw_loc, bw_loc_new),
            bw_mask=put(state.bw_mask, bw_mask_new),
        )

    # ---------------- window accessors (reference flow_val.py:630-678) ----

    def _flat_events(self, loc, mask):
        p, b, n, _ = loc.shape
        return (
            jnp.transpose(loc, (1, 0, 2, 3)).reshape(b, p * n, 2),
            jnp.transpose(mask, (1, 0, 2, 3)).reshape(b, p * n, 2),
        )

    def window_events(self, state: ValState, round_idx: bool = False,
                      event_axis=None):
        loc, mask = self._flat_events(state.event_loc, state.pol_mask)
        iwe = iwe_from_events(loc, mask, self.cfg.res, round_idx=round_idx)
        if event_axis is not None:
            iwe = jax.lax.psum(iwe, event_axis)
        return iwe

    def window_iwe(self, state: ValState, mode: str = "forward",
                   round_idx: bool = False, event_axis=None):
        if mode == "forward":
            loc, mask = self._flat_events(state.fw_loc, state.fw_mask)
        elif mode == "backward":
            if not self.cfg.track_bw:
                raise ValueError(
                    "window_iwe('backward') needs ValConfig.track_bw=True"
                )
            loc, mask = self._flat_events(state.bw_loc, state.bw_mask)
        else:
            raise ValueError(f"Invalid IWE mode: {mode}")
        iwe = iwe_from_events(loc, mask, self.cfg.res, round_idx=round_idx)
        if event_axis is not None:
            iwe = jax.lax.psum(iwe, event_axis)
        return iwe

    def window_flow(self, state: ValState, mode: Optional[str] = None,
                    mask: bool = False):
        """Per-pixel average flow over the window
        (reference ``loss/flow_val.py:145-169, 638-653``)."""
        if mode == "forward":
            if not self.cfg.track_fw_prop:
                raise ValueError(
                    "window_flow('forward') needs ValConfig.track_fw_prop"
                    "=True"
                )
            maps = state.fw_prop_flow
        elif mode == "backward":
            maps = (state.accum_flow / (state.out_mask + 1e-9))[None]
        else:
            maps = state.flow_maps

        nonzero = ((maps[..., 0:1] != 0) | (maps[..., 1:2] != 0)).astype(
            maps.dtype
        )
        avg = jnp.sum(maps, axis=0)
        cnt = jnp.sum(nonzero, axis=0)
        out = avg / (cnt + 1e-9)
        if mask:
            m = (jnp.sum(state.event_mask_maps, axis=0) > 0).astype(out.dtype)
            out = out * m
        return out

    # ---------------- metrics ------------------------------------------

    def rsat(self, state: ValState, event_axis=None):
        num_passes = jnp.maximum(state.pass_idx.astype(jnp.float32), 1.0)
        return compute_rsat(
            self._flat_events(state.fw_loc, state.fw_mask)[0],
            self._flat_events(state.event_loc, state.pol_mask)[0],
            self._flat_events(state.fw_loc, state.fw_mask)[1],
            self._flat_events(state.event_loc, state.pol_mask)[1],
            jnp.transpose(state.event_ts, (1, 0, 2, 3)).reshape(
                state.event_ts.shape[1], -1, 1
            ),
            num_passes,
            self.cfg.res,
            event_axis=event_axis,
        )

    def fwl(self, state: ValState, event_axis=None):
        return compute_fwl(
            self._flat_events(state.fw_loc, state.fw_mask)[0],
            self._flat_events(state.event_loc, state.pol_mask)[0],
            self._flat_events(state.fw_loc, state.fw_mask)[1],
            self._flat_events(state.event_loc, state.pol_mask)[1],
            self.cfg.res,
            event_axis=event_axis,
        )

    def rsat_fwl(self, state: ValState, event_axis=None):
        """Both window metrics from TWO shared splats
        (:func:`compute_rsat_fwl`) — RSAT identical, FWL bitwise equal,
        and the two 1-channel FWL splats of the separate path (each a
        full window-event sweep) disappear."""
        num_passes = jnp.maximum(state.pass_idx.astype(jnp.float32), 1.0)
        return compute_rsat_fwl(
            self._flat_events(state.fw_loc, state.fw_mask)[0],
            self._flat_events(state.event_loc, state.pol_mask)[0],
            self._flat_events(state.fw_loc, state.fw_mask)[1],
            self._flat_events(state.event_loc, state.pol_mask)[1],
            jnp.transpose(state.event_ts, (1, 0, 2, 3)).reshape(
                state.event_ts.shape[1], -1, 1
            ),
            num_passes,
            self.cfg.res,
            event_axis=event_axis,
        )


class LinearValidation(IterativeValidation):
    """Linear validation scheme (reference ``loss/flow_val.py:317-416``).

    Events sample their arrival pass's flow once; the forward warp to
    ``t = P`` happens lazily in the metric reducers. Reuses the slot state;
    ``fw_loc`` stores per-event *flow* instead of warped locations.
    """

    def update(self, state: ValState, flow, event_list, pol_mask,
               event_mask, n_active: Optional[int] = None) -> ValState:
        # n_active accepted for interface parity; the Linear update touches
        # only the new slot, so there is nothing to specialize
        cfg = self.cfg
        p_cur = state.pass_idx
        pf = p_cur.astype(jnp.float32)
        ts = event_list[..., 0:1] + pf
        if cfg.round_ts:
            # unmasked min exact under the loader's ts[0] = 0 contract
            # (see IterativeValidation.update)
            ts = jnp.broadcast_to(jnp.min(ts) + 0.5, ts.shape)
        loc = event_list[..., 1:3]

        def put(buf, val):
            return jax.lax.dynamic_update_index_in_dim(buf, val, p_cur, 0)

        event_flow = get_event_flow(flow, loc)
        return state._replace(
            event_ts=put(state.event_ts, ts),
            event_loc=put(state.event_loc, loc),
            pol_mask=put(state.pol_mask, pol_mask),
            flow_maps=put(state.flow_maps, flow),
            event_mask_maps=put(state.event_mask_maps, event_mask),
            fw_loc=put(state.fw_loc, event_flow),  # per-event flow
            pass_idx=p_cur + 1,
        )

    def _fw_events(self, state):
        ts, _ = (
            jnp.transpose(state.event_ts, (1, 0, 2, 3)).reshape(
                state.event_ts.shape[1], -1, 1
            ),
            None,
        )
        loc, mask = self._flat_events(state.event_loc, state.pol_mask)
        flow, _ = self._flat_events(state.fw_loc, state.fw_mask)
        tref = state.pass_idx.astype(jnp.float32)
        return event_propagation(ts, loc, flow, tref), loc, mask

    def window_iwe(self, state: ValState, mode: str = "forward",
                   round_idx: bool = False, event_axis=None):
        # ``mode`` is accepted and ignored, exactly like the reference's
        # Linear ``window_iwe(mode=None, ...)`` (``flow_val.py:393-400``):
        # the Linear protocol keeps no backward buffers, so the
        # 'iwe_bw_*' vis slots render the forward IWE there too
        fw, _, mask = self._fw_events(state)
        iwe = iwe_from_events(fw, mask, self.cfg.res, round_idx=round_idx)
        if event_axis is not None:
            iwe = jax.lax.psum(iwe, event_axis)
        return iwe

    def window_flow(self, state: ValState, mode: Optional[str] = None,
                    mask: bool = False):
        # forward-propagate every older map to the latest pass with ONE
        # long-range warp of dt = (latest - t) (reference flow_val.py:369-391)
        p = self.cfg.passes
        latest = (state.pass_idx - 1).astype(jnp.float32)

        def prop_to_latest(m, t):
            dt = jnp.maximum(latest - t, 0.0)
            warped = forward_prop_flow_once(m, self.cfg.res, dt)
            return jnp.where(t < latest, warped, m)

        maps = jnp.stack(
            [prop_to_latest(state.flow_maps[t], float(t)) for t in range(p)],
            axis=0,
        )
        nonzero = ((maps[..., 0:1] != 0) | (maps[..., 1:2] != 0)).astype(
            maps.dtype
        )
        out = jnp.sum(maps, axis=0) / (jnp.sum(nonzero, axis=0) + 1e-9)
        if mask:
            m = (jnp.sum(state.event_mask_maps, axis=0) > 0).astype(out.dtype)
            out = out * m
        return out

    def rsat(self, state: ValState, event_axis=None):
        fw, loc, mask = self._fw_events(state)
        ts = jnp.transpose(state.event_ts, (1, 0, 2, 3)).reshape(
            state.event_ts.shape[1], -1, 1
        )
        num_passes = jnp.maximum(state.pass_idx.astype(jnp.float32), 1.0)
        _, pol = self._flat_events(state.event_loc, state.pol_mask)
        return compute_rsat(fw, loc, pol, pol, ts, num_passes, self.cfg.res,
                            event_axis=event_axis)

    def fwl(self, state: ValState, event_axis=None):
        fw, loc, mask = self._fw_events(state)
        _, pol = self._flat_events(state.event_loc, state.pol_mask)
        return compute_fwl(fw, loc, pol, pol, self.cfg.res,
                           event_axis=event_axis)

    def rsat_fwl(self, state: ValState, event_axis=None):
        fw, loc, mask = self._fw_events(state)
        ts = jnp.transpose(state.event_ts, (1, 0, 2, 3)).reshape(
            state.event_ts.shape[1], -1, 1
        )
        num_passes = jnp.maximum(state.pass_idx.astype(jnp.float32), 1.0)
        _, pol = self._flat_events(state.event_loc, state.pol_mask)
        return compute_rsat_fwl(fw, loc, pol, pol, ts, num_passes,
                                self.cfg.res, event_axis=event_axis)


def _ts_image_sums(events, pol_mask, ts, res):
    """Per-polarity count + avg-ts images for RSAT (round_idx=True splat)."""
    from ..ops import splat_values

    vals = jnp.concatenate(
        [
            pol_mask[:, :, 0:1],
            pol_mask[:, :, 1:2],
            pol_mask[:, :, 0:1] * ts,
            pol_mask[:, :, 1:2] * ts,
        ],
        axis=-1,
    )
    buf = splat_values(events, vals, res, round_idx=True)
    return buf[..., 0:1], buf[..., 1:2], buf[..., 2:3], buf[..., 3:4]


def compute_fwl(fw_events, zero_events, fw_pol, zero_pol, res,
                event_axis=None):
    """Flow Warp Loss: var(IWE) / var(zero-warp IWE)
    (reference ``loss/flow_val.py:189-212``).

    :param event_axis: optional mesh axis name when running under
        ``shard_map`` with the event dimension sharded — the per-shard
        partial IWEs are ``psum``-merged before the variances (exact; the
        splat is a plain sum over events).
    """
    from ..ops import splat_values

    fw_iwe = splat_values(
        fw_events, jnp.sum(fw_pol, axis=-1, keepdims=True), res,
        round_idx=True,
    )
    z_iwe = splat_values(
        zero_events, jnp.sum(zero_pol, axis=-1, keepdims=True), res,
        round_idx=True,
    )
    if event_axis is not None:
        fw_iwe = jax.lax.psum(fw_iwe, event_axis)
        z_iwe = jax.lax.psum(z_iwe, event_axis)
    return jnp.var(fw_iwe) / jnp.var(z_iwe)


def compute_rsat(fw_events, zero_events, fw_pol, zero_pol, ts, num_passes,
                 res, event_axis=None):
    """Ratio of Squared Averaged Timestamps
    (reference ``loss/flow_val.py:214-274``).

    :param event_axis: see :func:`compute_fwl` — partial count/ts images
        are ``psum``-merged before any normalization.
    """

    def ts_sum(events, pol):
        pos, neg, pos_ts, neg_ts = _ts_image_sums(events, pol, ts, res)
        if event_axis is not None:
            pos, neg, pos_ts, neg_ts = jax.lax.psum(
                (pos, neg, pos_ts, neg_ts), event_axis
            )
        pos_ts = pos_ts / (pos + 1e-9) / num_passes
        neg_ts = neg_ts / (neg + 1e-9) / num_passes
        b = pos_ts.shape[0]
        s = jnp.sum(pos_ts.reshape(b, -1) ** 2, axis=1) + jnp.sum(
            neg_ts.reshape(b, -1) ** 2, axis=1
        )
        nonzero = ((pos + neg) > 0).reshape(b, -1)
        return s / jnp.sum(nonzero, axis=1)

    return ts_sum(fw_events, fw_pol) / ts_sum(zero_events, zero_pol)


def compute_rsat_fwl(fw_events, zero_events, fw_pol, zero_pol, ts,
                     num_passes, res, event_axis=None):
    """RSAT and FWL together from TWO shared 4-channel splats.

    The separate reducers sweep the window events four times (RSAT's two
    4-channel count/ts splats + FWL's two 1-channel count splats); but
    FWL's count image is exactly the sum of RSAT's per-polarity count
    planes — splatting ``pos`` and ``neg`` separately and adding the
    images is bitwise equal to splatting ``pos + neg``, because the
    per-polarity masks are 0/1-valued and every accumulation is exact
    small-integer f32 arithmetic. So both metrics come out of RSAT's
    splats alone: identical RSAT, bitwise-identical FWL
    (``tests/test_metrics.py`` pins both with assert_array_equal), half
    the splat sweeps (the dominant extras cost at DSEC scale).

    Caveat on "bitwise": it holds for this function against the separate
    reducers on the same inputs. Embedded in a LARGER jitted program
    (the eval window step), swapping reducers changes XLA's fusion
    choices and hence the variance reduction order — observed FWL shifts
    of ~3e-6 relative at the CLI level, far inside the pipeline-parity
    tolerance (2e-3).

    Returns ``(rsat [B], fwl scalar)`` — the same values as
    :func:`compute_rsat` / :func:`compute_fwl` on the same inputs.
    """

    def images(events, pol):
        pos, neg, pos_ts, neg_ts = _ts_image_sums(events, pol, ts, res)
        if event_axis is not None:
            pos, neg, pos_ts, neg_ts = jax.lax.psum(
                (pos, neg, pos_ts, neg_ts), event_axis
            )
        return pos, neg, pos_ts, neg_ts

    fw = images(fw_events, fw_pol)
    zz = images(zero_events, zero_pol)

    def rsat_term(pos, neg, pos_ts, neg_ts):
        pos_ts = pos_ts / (pos + 1e-9) / num_passes
        neg_ts = neg_ts / (neg + 1e-9) / num_passes
        b = pos_ts.shape[0]
        s = jnp.sum(pos_ts.reshape(b, -1) ** 2, axis=1) + jnp.sum(
            neg_ts.reshape(b, -1) ** 2, axis=1
        )
        nonzero = ((pos + neg) > 0).reshape(b, -1)
        return s / jnp.sum(nonzero, axis=1)

    rsat = rsat_term(*fw) / rsat_term(*zz)
    fwl = jnp.var(fw[0] + fw[1]) / jnp.var(zz[0] + zz[1])
    return rsat, fwl


def compute_aee(pred, gt, event_mask=None, res_aee=None,
                vertical_crop_aee=None):
    """Average endpoint error with the reference's masking protocol
    (reference ``loss/flow_val.py:276-314``).

    :param pred: ``[B, H, W, 2]`` predicted displacement (x, y).
    :param gt: ``[B, H, W, 2]`` ground-truth displacement.
    :param event_mask: optional ``[B, H, W, C]``; pixels without events are
        excluded (MVSEC protocol).
    :param res_aee: optional (h, w) center-crop.
    :param vertical_crop_aee: optional row cutoff.
    :return: scalar AEE over valid pixels.

    Reference quirk kept for parity: the crops apply ONLY when
    ``event_mask`` is given — the reference nests its ``res_aee`` /
    ``vertical_crop_aee`` handling inside ``if mask is not None``
    (``flow_val.py:290-306``), so a config that sets the crops without
    ``mask_aee`` gets full-frame AEE there too.
    """
    error = jnp.sqrt(jnp.sum((pred - gt) ** 2, axis=-1))  # [B, H, W]
    valid = ~((gt[..., 0] == 0.0) & (gt[..., 1] == 0.0))

    if event_mask is not None:
        m = jnp.sum(event_mask, axis=-1) > 0
        h, w = pred.shape[1], pred.shape[2]
        if res_aee is not None:
            yoff = (h - res_aee[0]) // 2
            xoff = (w - res_aee[1]) // 2
            m = m[:, yoff : h - yoff, xoff : w - xoff]
            error = error[:, yoff : h - yoff, xoff : w - xoff]
            valid = valid[:, yoff : h - yoff, xoff : w - xoff]
        if vertical_crop_aee is not None:
            m = m[:, :vertical_crop_aee, :]
            error = error[:, :vertical_crop_aee, :]
            valid = valid[:, :vertical_crop_aee, :]
        valid = valid & m

    vf = valid.astype(error.dtype)
    return jnp.sum(error * vf) / (jnp.sum(vf) + 1e-9)


METRIC_REGISTRY = {
    "Iterative": IterativeValidation,
    "Linear": LinearValidation,
}
