"""Event-sharded evaluation (GSPMD over the validation slot state).

The update must be collective-free and bit-consistent with the unsharded
program; the metric reducers (splat-based FWL/RSAT) must come out equal
with XLA's auto-inserted collectives. 8-virtual-CPU platform from conftest.
"""

import numpy as np

import jax
import jax.numpy as jnp

from taming_event_flow_tpu.metrics import IterativeValidation, ValConfig
from taming_event_flow_tpu.parallel.eval import (
    make_eval_mesh,
    shard_eval_batch,
    shard_val_state,
)

RES = (24, 30)
PASSES = 3
N = 64  # divisible by 8


def _inputs(rng, p):
    ev = np.zeros((1, N, 4), np.float32)
    ev[..., 0] = rng.uniform(0, 1, (1, N))
    ev[..., 1] = rng.uniform(0, RES[0] - 1, (1, N))
    ev[..., 2] = rng.uniform(0, RES[1] - 1, (1, N))
    ev[..., 3] = rng.choice([-1.0, 1.0], (1, N))
    pol = np.stack([(ev[..., 3] > 0), (ev[..., 3] < 0)], -1).astype(
        np.float32
    )
    flow = rng.normal(size=(1, RES[0], RES[1], 2)).astype(np.float32) * 2.0
    emask = np.ones((1, RES[0], RES[1], 1), np.float32)
    return (jnp.asarray(flow), jnp.asarray(ev), jnp.asarray(pol),
            jnp.asarray(emask))


def test_event_sharded_eval_matches_single_device(rng):
    val = IterativeValidation(ValConfig(res=RES, passes=PASSES), 1, N)
    update = jax.jit(val.update)

    ref = val.init()
    mesh = make_eval_mesh(8)
    sh = shard_val_state(val.init(), mesh)

    for p in range(PASSES):
        flow, ev, pol, emask = _inputs(rng, p)
        ref = update(ref, flow, ev, pol, emask)
        ev_s, pol_s = shard_eval_batch(ev, pol, mesh)
        sh = update(sh, flow, ev_s, pol_s, emask)

    for name in ref._fields:
        a = np.asarray(getattr(ref, name))
        b = np.asarray(getattr(sh, name))
        np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-6, err_msg=name)

    # window-level reducers: splats cross shards; XLA inserts the collectives
    np.testing.assert_allclose(
        float(jax.jit(val.fwl)(sh)), float(jax.jit(val.fwl)(ref)), rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(jax.jit(val.rsat)(sh)),
        np.asarray(jax.jit(val.rsat)(ref)), rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(val.window_flow(sh, mode="backward")),
        np.asarray(val.window_flow(ref, mode="backward")),
        rtol=1e-6, atol=1e-6,
    )


def test_sharded_reducers_match_unsharded_all_backends(rng):
    """The shard_map-wrapped reducers (local splats + psum) equal the
    unsharded ones under BOTH warp backends — the Pallas kernels run on
    local shards, so the sharded eval path no longer needs the xla
    override."""
    from taming_event_flow_tpu.ops import set_warp_backend
    from taming_event_flow_tpu.parallel.eval import make_sharded_reducers

    val = IterativeValidation(ValConfig(res=RES, passes=PASSES), 1, N)
    update = jax.jit(val.update)
    ref = val.init()
    mesh = make_eval_mesh(8)
    sh = shard_val_state(val.init(), mesh)
    for p in range(PASSES):
        flow, ev, pol, emask = _inputs(rng, p)
        ref = update(ref, flow, ev, pol, emask)
        ev_s, pol_s = shard_eval_batch(ev, pol, mesh)
        sh = update(sh, flow, ev_s, pol_s, emask)

    try:
        for backend in ("xla", "pallas"):
            set_warp_backend(backend)
            red = make_sharded_reducers(val, mesh, sh)
            np.testing.assert_allclose(
                float(red["fwl"](sh)), float(jax.jit(val.fwl)(ref)),
                rtol=1e-5, err_msg=f"fwl {backend}",
            )
            np.testing.assert_allclose(
                np.asarray(red["rsat"](sh)),
                np.asarray(jax.jit(val.rsat)(ref)),
                rtol=1e-5, err_msg=f"rsat {backend}",
            )
            np.testing.assert_allclose(
                np.asarray(red["window_events"](sh)),
                np.asarray(jax.jit(val.window_events)(ref)),
                rtol=1e-5, atol=1e-6, err_msg=f"window_events {backend}",
            )
            # vis-facing accessors (they splat the sharded event buffers,
            # so eval_flow routes them through the shard_map reducers too)
            for key, mode in (("window_iwe_fw", "forward"),
                              ("window_iwe_bw", "backward")):
                np.testing.assert_allclose(
                    np.asarray(red[key](sh)),
                    np.asarray(jax.jit(
                        lambda s, m=mode: val.window_iwe(s, mode=m)
                    )(ref)),
                    rtol=1e-5, atol=1e-6, err_msg=f"{key} {backend}",
                )
    finally:
        set_warp_backend("auto")
