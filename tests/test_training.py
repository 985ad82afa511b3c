"""Training-step tests: overfitting, carry reset, data-parallel mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from taming_event_flow_tpu.models import RecEVFlowNet
from taming_event_flow_tpu.objectives import LossConfig
from taming_event_flow_tpu.training import (
    build_optimizer,
    make_train_step,
    reset_carry,
)
from taming_event_flow_tpu.training.step import init_train_state
from taming_event_flow_tpu.parallel import (
    make_mesh,
    shard_window,
    shard_state,
)

RES = (16, 16)
P_PASSES = 3
N = 64


def tiny_model():
    return RecEVFlowNet(
        num_bins=2, base_channels=8, num_encoders=2, num_residual_blocks=1,
        min_size=4, final_w_scale=0.01,
    )


def make_window(rng, batch):
    """Synthetic window: a cloud of events drifting with constant flow."""
    ev = np.zeros((P_PASSES, batch, N, 4), np.float32)
    base_y = rng.uniform(2, RES[0] - 5, (batch, N))
    base_x = rng.uniform(2, RES[1] - 5, (batch, N))
    for p in range(P_PASSES):
        ev[p, ..., 0] = rng.uniform(0, 1, (batch, N))
        ev[p, ..., 1] = np.clip(base_y + p + ev[p, ..., 0], 0, RES[0] - 1)
        ev[p, ..., 2] = np.clip(base_x + p + ev[p, ..., 0], 0, RES[1] - 1)
        ev[p, ..., 3] = rng.choice([-1.0, 1.0], (batch, N))
    pol = np.stack([(ev[..., 3] > 0), (ev[..., 3] < 0)], -1).astype(np.float32)
    grad = np.ones((P_PASSES, batch, N, 1), np.float32)

    net = np.zeros((P_PASSES, batch, RES[0], RES[1], 2), np.float32)
    for p in range(P_PASSES):
        for b in range(batch):
            np.add.at(
                net[p, b, :, :, 0],
                (ev[p, b, :, 1].astype(int), ev[p, b, :, 2].astype(int)),
                (ev[p, b, :, 3] > 0).astype(np.float32),
            )
            np.add.at(
                net[p, b, :, :, 1],
                (ev[p, b, :, 1].astype(int), ev[p, b, :, 2].astype(int)),
                (ev[p, b, :, 3] < 0).astype(np.float32),
            )
    return {
        "net_input": net,
        "event_list": ev,
        "pol_mask": pol,
        "grad_mask": grad,
    }


@pytest.fixture(scope="module")
def setup():
    model = tiny_model()
    cfg = LossConfig(res=RES, passes_loss=P_PASSES, scales_loss=1,
                     iterative_mode="two")
    opt = build_optimizer({"name": "Adam", "lr": 1e-3}, clip_grad=100.0)
    state = init_train_state(model, opt, 1, RES[0], RES[1], 2)
    step = make_train_step(model, opt, cfg, "Iterative", flow_scaling=4.0,
                           donate=False, res=RES)
    return model, cfg, opt, state, step


def test_train_step_overfits(setup, rng):
    model, cfg, opt, state, step = setup
    window = {k: jnp.asarray(v) for k, v in make_window(rng, 1).items()}
    losses = []
    for _ in range(25):
        state, loss = step(state, window)
        losses.append(float(loss))
    assert np.all(np.isfinite(losses))
    assert losses[-1] < losses[0] * 0.99, losses


def test_carry_detaches_and_resets(setup, rng):
    model, cfg, opt, state, step = setup
    window = {k: jnp.asarray(v) for k, v in make_window(rng, 1).items()}
    state1, _ = step(state, window)
    # carry is a concrete array (TBPTT truncation by construction)
    assert all(isinstance(c, jax.Array) for c in state1.carry)
    carry0 = reset_carry(state1.carry, jnp.array([True]))
    assert all(float(jnp.abs(c).sum()) == 0.0 for c in carry0)
    keep = reset_carry(state1.carry, jnp.array([False]))
    for a, b in zip(keep, state1.carry):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize("full_vis,dtype", [
    (True, None),
    (False, None),
    (False, jnp.bfloat16),
])
def test_eval_window_step_matches_sequential(rng, full_vis, dtype):
    """One whole-window dispatch == P sequential fused eval steps, leaf for
    leaf (same unrolled pass bodies, same static slot slicing)."""
    from taming_event_flow_tpu.metrics import IterativeValidation, ValConfig
    from taming_event_flow_tpu.training import (
        make_eval_step,
        make_eval_window_step,
    )

    model = tiny_model()
    val = IterativeValidation(
        ValConfig(res=RES, passes=P_PASSES, track_fw_prop=full_vis,
                  track_bw=full_vis),
        1, N)
    x0 = jnp.zeros((1, RES[0], RES[1], 2))
    carry0 = model.init_state(1, RES[0], RES[1])
    params = model.init(jax.random.PRNGKey(0), x0, carry0)["params"]

    w = make_window(rng, 1)
    xs = jnp.asarray(w["net_input"])
    evs = jnp.asarray(w["event_list"])
    pols = jnp.asarray(w["pol_mask"])
    emasks = jnp.asarray(
        (np.asarray(w["net_input"]).sum(-1, keepdims=True) > 0)
        .astype(np.float32)
    )

    step = make_eval_step(model, val, flow_scaling=4.0,
                          inference_dtype=dtype)
    vs_seq = jax.jit(val.init)()
    carry_seq = model.init_state(1, RES[0], RES[1])
    for k in range(P_PASSES):
        vs_seq, carry_seq, flow_seq = step(
            vs_seq, carry_seq, params, xs[k], evs[k], pols[k], emasks[k],
            n_active=k + 1,
        )

    window_step = make_eval_window_step(model, val, flow_scaling=4.0,
                                        inference_dtype=dtype)
    vs_win, carry_win, flow_win = window_step(
        jax.jit(val.init)(), model.init_state(1, RES[0], RES[1]), params,
        xs, evs, pols, emasks,
    )

    for a, b in zip(jax.tree.leaves(vs_seq), jax.tree.leaves(vs_win)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(carry_seq), jax.tree.leaves(carry_win)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(np.asarray(flow_seq), np.asarray(flow_win))

    # reset_first: dispatching the SAME window on the previous window's
    # STALE state (in-program reset) must reproduce the fresh-state result
    window_step_rf = make_eval_window_step(model, val, flow_scaling=4.0,
                                           inference_dtype=dtype,
                                           reset_first=True)
    vs_rf, carry_rf, flow_rf = window_step_rf(
        vs_win, model.init_state(1, RES[0], RES[1]), params,
        xs, evs, pols, emasks,
    )
    for a, b in zip(jax.tree.leaves(vs_seq), jax.tree.leaves(vs_rf)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(carry_seq), jax.tree.leaves(carry_rf)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(np.asarray(flow_seq), np.asarray(flow_rf))


def test_eval_steps_packed_wire_equivalence(rng):
    """The packed eval wire (uint16 count input, pol/event masks derived
    on device from the event list / count encoding) is bit-identical to
    the plain f32 wire, on both the per-pass and whole-window programs."""
    from taming_event_flow_tpu.metrics import IterativeValidation, ValConfig
    from taming_event_flow_tpu.training import (
        make_eval_step,
        make_eval_window_step,
    )

    model = tiny_model()
    val = IterativeValidation(ValConfig(res=RES, passes=P_PASSES), 1, N)
    x0 = jnp.zeros((1, RES[0], RES[1], 2))
    carry0 = model.init_state(1, RES[0], RES[1])
    params = model.init(jax.random.PRNGKey(0), x0, carry0)["params"]

    w = make_window(rng, 1)
    xs = jnp.asarray(w["net_input"])
    xs_u16 = jnp.asarray(w["net_input"].astype(np.uint16))
    evs = jnp.asarray(w["event_list"])
    pols = jnp.asarray(w["pol_mask"])
    emasks = jnp.asarray(
        (w["net_input"].sum(-1, keepdims=True) > 0).astype(np.float32)
    )

    def trees_equal(a, b):
        for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))

    step = make_eval_step(model, val, flow_scaling=4.0)
    plain = jax.jit(val.init)(), model.init_state(1, RES[0], RES[1])
    packed = jax.jit(val.init)(), model.init_state(1, RES[0], RES[1])
    for k in range(P_PASSES):
        plain = step(plain[0], plain[1], params, xs[k], evs[k], pols[k],
                     emasks[k], n_active=k + 1)
        packed = step(packed[0], packed[1], params, xs_u16[k], evs[k],
                      None, None, n_active=k + 1)
        trees_equal(plain, packed)

    wstep = make_eval_window_step(model, val, flow_scaling=4.0)
    out_plain = wstep(jax.jit(val.init)(),
                      model.init_state(1, RES[0], RES[1]), params,
                      xs, evs, pols, emasks)
    out_packed = wstep(jax.jit(val.init)(),
                       model.init_state(1, RES[0], RES[1]), params,
                       xs_u16, evs, None, None)
    trees_equal(out_plain, out_packed)


def test_data_parallel_mesh_matches_single_device(rng):
    """B=8 window on an 8-device mesh == single-device result (fp tolerance)."""
    batch = 8
    model = tiny_model()
    cfg = LossConfig(res=RES, passes_loss=P_PASSES)
    opt = build_optimizer({"name": "Adam", "lr": 1e-3}, clip_grad=100.0)
    state = init_train_state(model, opt, batch, RES[0], RES[1], 2)
    step = make_train_step(model, opt, cfg, "Iterative", flow_scaling=4.0,
                           donate=False)
    window = {k: jnp.asarray(v) for k, v in make_window(rng, batch).items()}

    _, loss_single = step(state, window)

    mesh = make_mesh(8)
    state_sh = shard_state(state, mesh)
    window_sh = shard_window(window, mesh)
    new_state, loss_dp = step(state_sh, window_sh)

    np.testing.assert_allclose(
        float(loss_dp), float(loss_single), rtol=1e-4
    )
    # params stay replicated & finite after the distributed update
    leaf = jax.tree.leaves(new_state.params)[0]
    assert np.all(np.isfinite(np.asarray(leaf)))


def test_mesh_grad_allreduce_param_equivalence(rng):
    """The distributed update (XLA psum over the data axis) produces the
    same new parameters and per-lane carries as the single-device step."""
    batch = 8
    model = tiny_model()
    cfg = LossConfig(res=RES, passes_loss=P_PASSES)
    opt = build_optimizer({"name": "Adam", "lr": 1e-3}, clip_grad=100.0)
    state = init_train_state(model, opt, batch, RES[0], RES[1], 2)
    step = make_train_step(model, opt, cfg, "Iterative", flow_scaling=4.0,
                           donate=False)
    window = {k: jnp.asarray(v) for k, v in make_window(rng, batch).items()}

    ref_state, _ = step(state, window)

    mesh = make_mesh(8)
    dp_state, _ = step(shard_state(state, mesh), shard_window(window, mesh))

    for a, b in zip(jax.tree.leaves(dp_state.params),
                    jax.tree.leaves(ref_state.params)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-3, atol=1e-6
        )
    for a, b in zip(jax.tree.leaves(dp_state.carry),
                    jax.tree.leaves(ref_state.carry)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-5
        )


def test_mesh_per_lane_carry_isolation(rng):
    """Perturbing one lane's window changes only that lane's carry: lanes
    stay independent event streams across the device mesh."""
    batch = 8
    model = tiny_model()
    cfg = LossConfig(res=RES, passes_loss=P_PASSES)
    opt = build_optimizer({"name": "Adam", "lr": 1e-3}, clip_grad=100.0)
    state = init_train_state(model, opt, batch, RES[0], RES[1], 2)
    step = make_train_step(model, opt, cfg, "Iterative", flow_scaling=4.0,
                           donate=False)
    mesh = make_mesh(8)
    window = {k: jnp.asarray(v) for k, v in make_window(rng, batch).items()}

    base_state, _ = step(shard_state(state, mesh), shard_window(window, mesh))

    lane = 3
    perturbed = dict(window)
    net = np.asarray(window["net_input"]).copy()
    net[:, lane] = net[:, lane] + 1.0
    perturbed["net_input"] = jnp.asarray(net)
    pert_state, _ = step(
        shard_state(state, mesh), shard_window(perturbed, mesh)
    )

    for a, b in zip(jax.tree.leaves(base_state.carry),
                    jax.tree.leaves(pert_state.carry)):
        a, b = np.asarray(a), np.asarray(b)
        # the perturbed lane's recurrent state moved...
        assert np.abs(a[lane] - b[lane]).max() > 1e-6
        # ...every other lane's is bit-identical
        others = [i for i in range(batch) if i != lane]
        np.testing.assert_array_equal(a[others], b[others])


def test_packed_wire_roundtrip_and_step_equivalence(setup, rng):
    """The packed wire format (stack_window(packed=True) -> device
    unpack_window) restores the plain window bit-exactly, and the train
    step produces an identical loss and parameters from either form."""
    from taming_event_flow_tpu.training.window import stack_window
    from taming_event_flow_tpu.training.step import unpack_window

    from taming_event_flow_tpu.data.base import events_to_channels_np

    model, cfg, opt, state, step = setup
    w = make_window(rng, 1)
    # per-pass collated batches, one of them ragged (a shorter window:
    # fewer events, and a host count image counting exactly those — the
    # loader's invariant)
    batches = []
    for p in range(P_PASSES):
        k = N - 7 if p == 1 else N
        ev = w["event_list"][p][:, :k]
        net = np.stack([
            events_to_channels_np(
                ev[b, :, 2], ev[b, :, 1], ev[b, :, 3], RES
            )
            for b in range(ev.shape[0])
        ])
        batches.append({
            "net_input": net,
            "event_list": ev,
            "event_list_pol_mask": w["pol_mask"][p][:, :k],
            "grad_mask": w["grad_mask"][p][:, :k],
        })

    plain = stack_window(batches)
    packed = stack_window(batches, packed=True, net_compact=True)
    assert packed["net_input"].dtype == np.uint8  # counts fit the byte
    assert packed["event_p"].dtype == np.int8
    assert packed["grad_mask"].dtype == bool
    assert "pol_mask" not in packed and "event_list" not in packed

    unpacked = jax.jit(unpack_window)(
        {k: jnp.asarray(v) for k, v in packed.items()}
    )
    for key in plain:
        np.testing.assert_array_equal(
            np.asarray(unpacked[key]), plain[key], err_msg=key
        )

    s_plain, loss_plain = step(
        state, {k: jnp.asarray(v) for k, v in plain.items()}
    )
    s_packed, loss_packed = step(
        state, {k: jnp.asarray(v) for k, v in packed.items()}
    )
    assert float(loss_plain) == float(loss_packed)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b)
        ),
        s_plain.params, s_packed.params,
    )

    # derive_net drops net_input from the wire entirely; the device
    # rebuild (ops/encodings.derive_count_input via unpack_window) and
    # the whole train step stay bit-identical
    derived = stack_window(batches, packed=True, derive_net=True)
    assert "net_input" not in derived
    unpacked_d = jax.jit(lambda w: unpack_window(w, res=RES))(
        {k: jnp.asarray(v) for k, v in derived.items()}
    )
    for key in plain:
        np.testing.assert_array_equal(
            np.asarray(unpacked_d[key]), plain[key], err_msg=key
        )
    s_derived, loss_derived = step(
        state, {k: jnp.asarray(v) for k, v in derived.items()}
    )
    assert float(loss_plain) == float(loss_derived)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b)
        ),
        s_plain.params, s_derived.params,
    )


def test_stack_window_packed_net_dtype_ladder():
    """Count packing picks the narrowest exact dtype: uint8 -> uint16 ->
    f32 fallback when a count cannot fit the 16-bit lattice."""
    from taming_event_flow_tpu.training.window import stack_window

    def packed_net(peak):
        net = np.zeros((1, 4, 4, 2), np.float32)
        net[0, 0, 0, 0] = peak
        batch = {
            "net_input": net,
            "event_list": np.zeros((1, 8, 4), np.float32),
            "event_list_pol_mask": np.zeros((1, 8, 2), np.float32),
            "grad_mask": np.ones((1, 8, 1), np.float32),
        }
        w = stack_window([batch], packed=True, net_compact=True)
        return w["net_input"]

    assert packed_net(200.0).dtype == np.uint8
    assert packed_net(300.0).dtype == np.uint16
    assert float(packed_net(300.0).max()) == 300.0
    assert packed_net(70000.0).dtype == np.float32


def test_window_grouper_mirrors_consumer():
    """The staging producer's WindowGrouper must stage exactly the windows
    the eval consumer dispatches via run_window — same boundaries, same
    contents — under any interleaving of new_seq / ts_jump flags.
    Includes the regression case: a second jump during per-pass recovery
    (the mirror's counter must accumulate, not reset)."""
    import numpy as np

    from taming_event_flow_tpu.training.window import WindowGrouper

    def consumer_windows(events, passes):
        """Independent transcription of eval_flow.test()'s loop state:
        wbuf/passes_done transitions around run_window/run_pass."""
        wbuf, passes_done, out = [], 0, []
        for i, (b, new_seq, jump) in enumerate(events):
            if new_seq:
                passes_done = 0
                wbuf.clear()
            if jump:
                passes_done += len(wbuf)  # flushed per-pass
                wbuf.clear()
            if passes_done == 0:
                wbuf.append(b)
                if len(wbuf) == passes:
                    out.append((i, list(wbuf)))
                    wbuf.clear()
                    passes_done = passes
            else:
                passes_done += 1
            if passes_done == passes:
                passes_done = 0  # metric-boundary reset
        return out

    def producer_windows(events, passes):
        g = WindowGrouper(passes)
        out = []
        for i, (b, new_seq, jump) in enumerate(events):
            full = g.feed(b, new_seq, jump)
            if full is not None:
                out.append((i, full))
        return out

    rng = np.random.default_rng(0)
    for passes in (2, 3, 10):
        for trial in range(40):
            n = int(rng.integers(3 * passes, 12 * passes))
            events = [
                (k, bool(rng.random() < 0.05), bool(rng.random() < 0.12))
                for k in range(n)
            ]
            assert (producer_windows(events, passes)
                    == consumer_windows(events, passes)), (passes, trial)

    # regression: two jumps inside one per-pass recovery span (passes=4):
    # jump after 2 buffered -> recovery; second jump mid-recovery must not
    # resync staging off the true boundary
    events = [(k, False, k in (2, 4)) for k in range(16)]
    assert producer_windows(events, 4) == consumer_windows(events, 4)
