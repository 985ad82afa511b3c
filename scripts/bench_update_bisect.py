"""Bisect IterativeValidation.update: cumulative stages, one TPU session."""

import time

import numpy as np

import jax
import jax.numpy as jnp

from taming_event_flow_tpu.metrics import IterativeValidation, ValConfig
from taming_event_flow_tpu.metrics.validation import (
    forward_prop_flow_once,
    _grid,
    _purge,
)
from taming_event_flow_tpu.ops import get_event_flow

RES = (480, 640)
P, N = 10, 32768


def timeit(fn, *args, iters=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def make_update(stage: int, val):
    cfg = val.cfg
    res = cfg.res

    def update(state, flow, event_list, pol_mask, event_mask):
        p_cur = state.pass_idx
        pf = p_cur.astype(jnp.float32)
        ts = event_list[..., 0:1] + pf
        loc = event_list[..., 1:3]

        def put(buf, val_):
            return jax.lax.dynamic_update_index_in_dim(buf, val_, p_cur, 0)

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
        if stage >= 1:
            p_ax = jnp.arange(cfg.passes).reshape(-1, 1, 1, 1)
            active = (p_ax <= p_cur).astype(jnp.float32)
            pp, bb, nn, _ = state.fw_loc.shape
            fw_flat = jnp.transpose(state.fw_loc, (1, 0, 2, 3)).reshape(
                bb, pp * nn, 2
            )
            fw_flow = get_event_flow(flow, fw_flat)
            fw_flow = jnp.transpose(
                fw_flow.reshape(bb, pp, nn, 2), (1, 0, 2, 3)
            )
            prop = state.fw_loc + (pf + 1.0 - state.fw_ts) * fw_flow
            prop, purged = _purge(prop, state.fw_mask, res)
            state = state._replace(
                fw_loc=jnp.where(active > 0, prop, state.fw_loc),
                fw_mask=jnp.where(active > 0, purged, state.fw_mask),
                fw_ts=jnp.where(active > 0, pf + 1.0, state.fw_ts),
            )
        if stage >= 2:
            def bw_step(carry, tau):
                bl, bm, bts = carry
                act = (tau <= p_cur).astype(jnp.float32)
                bflow = get_event_flow(state.flow_maps[tau], bl)
                tau_f = tau.astype(jnp.float32)
                nl = bl + (tau_f - bts) * bflow
                nl, nm = _purge(nl, bm, res)
                return (
                    jnp.where(act > 0, nl, bl),
                    jnp.where(act > 0, nm, bm),
                    jnp.where(act > 0, jnp.full_like(bts, tau_f), bts),
                ), None

            (bl, bm, _), _ = jax.lax.scan(
                bw_step, (loc, pol_mask, ts),
                jnp.arange(cfg.passes, dtype=jnp.int32), reverse=True,
            )
            state = state._replace(
                bw_loc=put(state.bw_loc, bl), bw_mask=put(state.bw_mask, bm)
            )
        if stage >= 3:
            fw_prop = put(state.fw_prop_flow, flow)
            prop_maps = jax.vmap(
                lambda m: forward_prop_flow_once(m, res)
            )(fw_prop)
            p_ax2 = jnp.arange(cfg.passes).reshape(-1, 1, 1, 1, 1)
            sel = (p_ax2 < p_cur.reshape(1, 1, 1, 1, 1)) if False else (
                jnp.arange(cfg.passes).reshape(-1, 1, 1, 1, 1) < p_cur
            )
            fw_prop = jnp.where(sel, prop_maps, fw_prop)
            state = state._replace(fw_prop_flow=fw_prop)
        if stage >= 4:
            b = flow.shape[0]
            h, w = res
            indices = state.warp_indices
            mask_valid = (
                (indices[..., 0:1] >= 0) & (indices[..., 0:1] <= h - 1.0)
                & (indices[..., 1:2] >= 0) & (indices[..., 1:2] <= w - 1.0)
            ).astype(jnp.float32)
            out_mask = state.out_mask + mask_valid
            curr = get_event_flow(flow, indices.reshape(b, -1, 2)).reshape(
                b, h, w, 2
            )
            warped_idx = indices + curr * mask_valid
            grid_map = _grid(res).reshape(1, h, w, 2)
            accum = jnp.stack(
                [warped_idx[..., 1] - grid_map[..., 1],
                 warped_idx[..., 0] - grid_map[..., 0]], axis=-1,
            )
            state = state._replace(
                accum_flow=accum, warp_indices=warped_idx, out_mask=out_mask
            )
        return state._replace(pass_idx=p_cur + 1)

    return update


def main():
    rng = np.random.default_rng(0)
    print("device:", jax.devices()[0])
    val = IterativeValidation(ValConfig(res=RES, passes=P), 1, N)
    flow = jnp.asarray(rng.normal(size=(1, RES[0], RES[1], 2)), jnp.float32)
    ev = np.zeros((1, N, 4), np.float32)
    ev[..., 0] = rng.uniform(0, 1, (1, N))
    ev[..., 1] = rng.integers(0, RES[0], (1, N))
    ev[..., 2] = rng.integers(0, RES[1], (1, N))
    ev[..., 3] = rng.choice([-1.0, 1.0], (1, N))
    ev = jnp.asarray(ev)
    pol = jnp.asarray(
        np.stack([(np.asarray(ev)[..., 3] > 0),
                  (np.asarray(ev)[..., 3] < 0)], -1), jnp.float32)
    emask = jnp.ones((1, RES[0], RES[1], 1), jnp.float32)

    names = ["puts only", "+fw warp", "+bw scan", "+fw_prop", "+accum(full)"]
    for stage in range(5):
        upd = jax.jit(make_update(stage, val))
        t = timeit(upd, val.init(), flow, ev, pol, emask)
        print(f"stage {stage} ({names[stage]}): {t*1e3:.2f} ms")


if __name__ == "__main__":
    main()
