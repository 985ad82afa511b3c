"""Unit tests for the extracted eval pipeline seam
(``taming_event_flow_tpu/pipeline/eval.py``) — the units the eval CLI wires
together: vis policy, protocol-flag derivation, window staging, and metric
consumption. The full CLI surface stays covered by ``tests/test_e2e.py``;
these pin the units directly (VERDICT r4 item 5)."""

import numpy as np
import pytest

from taming_event_flow_tpu.pipeline import VisPolicy, consume_mets
from taming_event_flow_tpu.utils.visualization import flow_to_u16


def _config(vis=None, metrics=None, voxel=None, runtime=None,
            n_events_pad=64, passes=4):
    return {
        "data": {"mode": "gtflow", "passes_loss": passes, "voxel": voxel,
                 "window": 1},
        "loader": {"resolution": [32, 48], "n_events_pad": n_events_pad},
        "loss": {"flow_scaling": 8, "round_ts": False},
        "metrics": metrics if metrics is not None else {
            "warping": "Iterative", "name": ["FWL", "RSAT", "AEE"]},
        "vis": vis if vis is not None else {},
        "runtime": runtime or {},
    }


# ------------------------------------------------------------- VisPolicy


def test_vis_policy_off_by_default():
    p = VisPolicy(_config())
    assert not p.on
    assert not p.want("flow_bw")


def test_vis_policy_show_filter_and_error_flow_dependency():
    p = VisPolicy(_config(vis={"store": True, "show": ["error_flow"]}))
    assert p.on and not p.enabled
    # flow_bw is an input of the error panel -> implicitly wanted
    assert p.want("error_flow") and p.want("flow_bw")
    assert not p.want("flow") and not p.want("events")


def test_vis_policy_no_show_means_everything():
    p = VisPolicy(_config(vis={"enabled": True}))
    for key in ("flow", "events", "flow_bw", "iwe_bw_window"):
        assert p.want(key)


# ----------------------------------------------------------- consume_mets


def test_consume_mets_accumulates_and_decodes_packed_flow():
    rng = np.random.default_rng(0)
    flow = rng.normal(size=(1, 4, 5, 2)).astype(np.float32) * 3
    host = {
        "flow_bw": np.asarray(flow_to_u16(flow)),
        "aee": np.float32(1.5),
        "rsat": np.float32(0.9),
        "fwl": np.float32(1.2),
    }
    vr = {"seq": {m: {"metric": 0.0, "it": 0}
                  for m in ("FWL", "RSAT", "AEE")}}
    fb = consume_mets(host, vr, "seq", ["FWL", "RSAT", "AEE"])
    np.testing.assert_allclose(fb, flow, atol=1.0 / 128)  # u16 lattice
    assert vr["seq"]["AEE"] == {"metric": 1.5, "it": 1}
    assert vr["seq"]["RSAT"]["it"] == 1 and vr["seq"]["FWL"]["it"] == 1
    # metrics not in metric_names are ignored
    fb2 = consume_mets({"rsat": np.float32(1.0)}, vr, "seq", ["FWL"])
    assert fb2 is None and vr["seq"]["RSAT"]["it"] == 1


# ------------------------------------------------- pipeline construction


@pytest.fixture(scope="module")
def pipe_factory():
    import jax
    import jax.numpy as jnp

    from taming_event_flow_tpu.models import RecEVFlowNet
    from taming_event_flow_tpu.pipeline import EvalPipeline

    def make(config, auto_shard=False):
        # auto_shard off by default: these tests pin the SINGLE-device
        # protocol flags; the suite's 8 virtual CPU devices would
        # otherwise auto-create the event mesh (its own coverage lives in
        # tests/test_parallel_eval.py)
        model = RecEVFlowNet(num_bins=2, base_channels=8, num_encoders=2)
        res = tuple(config["loader"]["resolution"])
        carry = model.init_state(1, res[0], res[1])
        x0 = jnp.zeros((1, res[0], res[1], 2))
        params = model.init(jax.random.PRNGKey(0), x0, carry)["params"]
        return EvalPipeline(config, model, params, auto_shard=auto_shard)

    return make


def test_flags_dsec_submission_protocol(pipe_factory):
    """The DSEC submission configuration (store-only flow_bw) must derive
    the windowed fast path with in-program metrics and packed wire."""
    pipe = pipe_factory(_config(vis={"store": True, "show": ["flow_bw"]}))
    assert pipe.windowed and pipe.use_extras and pipe.aee_in_program
    assert pipe.packed_wire
    assert not pipe.val_cfg.track_fw_prop and not pipe.val_cfg.track_bw


def test_flags_live_display_forces_per_pass(pipe_factory):
    pipe = pipe_factory(_config(vis={"enabled": True}))
    assert not pipe.windowed
    assert pipe.val_cfg.track_fw_prop and pipe.val_cfg.track_bw


def test_flags_eval_time_gate_disables_window_extras(pipe_factory):
    pipe = pipe_factory(_config(metrics={
        "warping": "Iterative", "name": ["AEE"], "eval_time": [1.0, 2.0]}))
    assert pipe.windowed and not pipe.use_extras
    assert not pipe.in_eval_time(0.5) and pipe.in_eval_time(1.5)


# --------------------------------------------------------- window staging


def _batches(passes, n_events, res, b=1, raw=False, seed=0):
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(passes):
        ev = np.zeros((b, n_events, 4), np.float32)
        ev[..., 0] = rng.uniform(0, 1, (b, n_events))
        ev[..., 1] = rng.integers(0, res[0], (b, n_events))
        ev[..., 2] = rng.integers(0, res[1], (b, n_events))
        ev[..., 3] = rng.choice([-1.0, 1.0], (b, n_events))
        pol = np.stack([ev[..., 3] > 0, ev[..., 3] < 0], -1)
        batch = {
            "event_list": ev,
            "event_list_pol_mask": pol.astype(np.float32),
            "net_input": rng.normal(
                size=(b, res[0], res[1], 2)).astype(np.float32),
            "event_mask": np.ones((b, res[0], res[1], 1), np.float32),
            "gtflow": rng.normal(size=(b, res[0], res[1], 2)).astype(
                np.float32),
        }
        if raw:
            batch["event_raw_xy"] = ev[..., 1:3].astype(np.float32)
        out.append(batch)
    return out


def test_stage_window_packed_count_mode(pipe_factory):
    """Packed wire, count mode: integral coords take the u32 event wire
    (one u32 element per event); net input, masks and pol masks derive on
    device, and the unpacked list equals the loader's exactly."""
    from taming_event_flow_tpu.ops.encodings import unpack_event_wire

    cfg = _config(vis={"store": True, "show": ["flow_bw"]})
    pipe = pipe_factory(cfg)
    assert pipe.u32_wire
    bufs = _batches(pipe.passes, 64, pipe.res)
    xs, evs, pols, emasks, aux, raw, ridx = pipe.stage_window(bufs)
    assert xs is None and pols is None and emasks is None and raw is None
    assert isinstance(evs, dict) and "rect" not in evs
    assert evs["yxp"].dtype == np.uint32
    assert evs["yxp"].shape == (pipe.passes, 1, 64)
    unpacked, raw_yx = unpack_event_wire(evs["ts"], evs["yxp"])
    np.testing.assert_array_equal(
        np.asarray(unpacked), np.stack([b["event_list"] for b in bufs]))
    np.testing.assert_array_equal(
        np.asarray(raw_yx),
        np.stack([b["event_list"][..., 1:3] for b in bufs]))
    # aux is the boundary GT (use_extras + aee_in_program)
    np.testing.assert_array_equal(np.asarray(aux), bufs[-1]["gtflow"])


def test_stage_window_u32_fractional_coords_fall_back(pipe_factory):
    """Fractional (non-loader) coordinates must disable the u32 wire via
    the first-window integrality probe — packing would truncate them."""
    cfg = _config(vis={"store": True, "show": ["flow_bw"]})
    pipe = pipe_factory(cfg)
    bufs = _batches(pipe.passes, 64, pipe.res)
    for b in bufs:
        b["event_list"][..., 1:3] += 0.25
    xs, evs, pols, emasks, aux, raw, ridx = pipe.stage_window(bufs)
    assert not isinstance(evs, dict)
    assert pipe._u32_ok is False
    np.testing.assert_array_equal(
        np.asarray(evs), np.stack([b["event_list"] for b in bufs]))


def test_stage_window_u32_wire_off_ships_plain(pipe_factory):
    cfg = _config(vis={"store": True, "show": ["flow_bw"]},
                  runtime={"u32_wire": False})
    pipe = pipe_factory(cfg)
    assert pipe.packed_wire and not pipe.u32_wire
    bufs = _batches(pipe.passes, 64, pipe.res)
    xs, evs, pols, emasks, aux, raw, ridx = pipe.stage_window(bufs)
    assert not isinstance(evs, dict)
    np.testing.assert_array_equal(
        np.asarray(evs), np.stack([b["event_list"] for b in bufs]))


def test_stage_window_rectified_u32_device_lookup(pipe_factory):
    """Rectified + forward map: the wire ships raw u32 coords and the
    device lookup reproduces the host's rectified event list bitwise."""
    import jax.numpy as jnp

    from taming_event_flow_tpu.ops.encodings import unpack_event_wire

    cfg = _config(vis={"store": True, "show": ["flow_bw"]})
    pipe = pipe_factory(cfg)
    h, w = pipe.res
    rng = np.random.default_rng(3)
    # file-layout forward map: map[y_raw, x_raw] = (x_rect, y_rect)
    rect = rng.uniform(-1, max(h, w), (h, w, 2)).astype(np.float32)
    bufs = _batches(pipe.passes, 64, pipe.res, raw=True, seed=4)
    for b in bufs:
        yr = b["event_raw_xy"][..., 0].astype(np.int64)
        xr = b["event_raw_xy"][..., 1].astype(np.int64)
        b["event_list"][..., 1] = rect[yr, xr, 1]  # y_rect
        b["event_list"][..., 2] = rect[yr, xr, 0]  # x_rect
    xs, evs, pols, emasks, aux, raw, ridx = pipe.stage_window(
        bufs, ridx="RIDX", rect=jnp.asarray(rect))
    assert isinstance(evs, dict) and evs["rect"] is not None
    assert raw is None and ridx == "RIDX"
    unpacked, raw_yx = unpack_event_wire(evs["ts"], evs["yxp"],
                                         evs["rect"])
    np.testing.assert_array_equal(
        np.asarray(unpacked), np.stack([b["event_list"] for b in bufs]))
    np.testing.assert_array_equal(
        np.asarray(raw_yx), np.stack([b["event_raw_xy"] for b in bufs]))


def test_stage_window_rectified_ships_raw_coords(pipe_factory):
    cfg = _config(vis={"store": True, "show": ["flow_bw"]})
    pipe = pipe_factory(cfg)
    bufs = _batches(pipe.passes, 64, pipe.res, raw=True)
    xs, evs, pols, emasks, aux, raw, ridx = pipe.stage_window(
        bufs, ridx="RIDX")
    assert xs is None and raw is not None
    assert raw.shape == (pipe.passes, 1, 64, 2)
    assert ridx == "RIDX"


def test_stage_window_voxel_ships_net_input(pipe_factory):
    cfg = _config(vis={"store": True, "show": ["flow_bw"]}, voxel=2)
    pipe = pipe_factory(cfg)
    bufs = _batches(pipe.passes, 64, pipe.res)
    xs, evs, pols, emasks, aux, raw, ridx = pipe.stage_window(
        bufs, ridx="RIDX")
    assert xs is not None and emasks is not None and pols is None
    assert ridx is None  # count derivation is off in voxel mode


def test_stage_window_unpacked_ships_everything(pipe_factory):
    cfg = _config(vis={"store": True, "show": ["flow_bw"]},
                  runtime={"packed_wire": False})
    pipe = pipe_factory(cfg)
    assert not pipe.packed_wire
    bufs = _batches(pipe.passes, 64, pipe.res)
    xs, evs, pols, emasks, aux, raw, ridx = pipe.stage_window(bufs)
    assert xs is not None and pols is not None and emasks is not None
    assert pols.dtype == bool and ridx is None


def test_run_window_u32_wire_matches_plain(pipe_factory):
    """The windowed dispatch fed the u32 wire must produce the same
    boundary metrics as the plain packed wire (the unpacked event list is
    bitwise the shipped one; only program structure differs)."""
    results = {}
    for u32 in (True, False):
        cfg = _config(vis={"store": True, "show": ["flow_bw"]},
                      runtime={"u32_wire": u32})
        pipe = pipe_factory(cfg)
        bufs = _batches(pipe.passes, pipe.criteria.n_events, pipe.res,
                        seed=11)
        staged = pipe.stage_window(bufs)
        assert isinstance(staged[1], dict) == u32
        pipe.vstate_stale = False
        pipe.run_window(staged)
        results[u32] = {k: np.asarray(v)
                        for k, v in pipe.window_mets.items()}
    assert set(results[True]) == set(results[False])
    for k in results[True]:
        np.testing.assert_allclose(
            results[True][k].astype(np.float64),
            results[False][k].astype(np.float64),
            rtol=1e-5, atol=1e-5, err_msg=k,
        )


# ------------------------------------------------------- bucket handling


def test_ensure_bucket_pads_short_batches(pipe_factory):
    pipe = pipe_factory(_config(vis={"store": True, "show": ["flow_bw"]}))
    (short,) = _batches(1, 16, pipe.res)
    out = pipe.ensure_bucket(short)
    assert out["event_list"].shape[1] == pipe.criteria.n_events
    # padding rows are zero (-> zero pol mask, the masking contract)
    assert np.all(out["event_list"][:, 16:] == 0)


def test_ensure_bucket_grows_and_rejits(pipe_factory):
    pipe = pipe_factory(_config(vis={"store": True, "show": ["flow_bw"]},
                                n_events_pad=32))
    old_step = pipe._eval_step
    (big,) = _batches(1, 96, pipe.res)
    with pytest.warns(UserWarning, match="event bucket grew"):
        out = pipe.ensure_bucket(big)
    assert pipe.criteria.n_events == 96
    assert out["event_list"].shape[1] == 96
    assert pipe.vstate.event_ts.shape[2] == 96
    assert pipe._eval_step is not old_step  # programs were rebuilt


def test_auto_shard_creates_event_mesh(pipe_factory):
    """On a multi-device host the pipeline event-shards automatically
    (deeper numerics coverage in tests/test_parallel_eval.py)."""
    import jax

    if len(jax.devices()) < 2:
        pytest.skip("needs multiple devices")
    pipe = pipe_factory(_config(vis={"store": True, "show": ["flow_bw"]}),
                        auto_shard=True)
    assert pipe.eval_mesh is not None
    assert not pipe.use_extras  # extras are off on the sharded path


# --------------------------------------------------------- MetricsConsumer


def test_metrics_consumer_matches_sync_consumption():
    """The reader thread's accumulated results are identical to folding
    the same boundary dicts synchronously (FIFO, same arithmetic)."""
    from taming_event_flow_tpu.pipeline import MetricsConsumer
    from taming_event_flow_tpu.tracking.loggers import (
        initialize_quant_results,
    )

    names = ["FWL", "RSAT", "AEE"]
    rng = np.random.default_rng(7)
    windows = [
        ({"aee": np.float32(rng.uniform(0.1, 3)),
          "rsat": np.float32(rng.uniform(0.5, 1.5)),
          "fwl": np.float32(rng.uniform(0.8, 1.4))},
         f"seq{i % 2}")
        for i in range(12)
    ]

    sync_results = {}
    for mets, seq in windows:
        sync_results = initialize_quant_results(sync_results, seq, names)
        consume_mets(mets, sync_results, seq, names)

    consumer = MetricsConsumer(names, depth=2)
    for mets, seq in windows:
        consumer.put(dict(mets), seq)
    async_results = consumer.close()

    assert set(async_results) == set(sync_results)
    for seq in sync_results:
        for m in names:
            assert async_results[seq][m]["it"] == sync_results[seq][m]["it"]
            np.testing.assert_allclose(async_results[seq][m]["metric"],
                                       sync_results[seq][m]["metric"])


def test_metrics_consumer_reraises_worker_error():
    """A reader-thread failure surfaces at close() (or an early put) —
    never a silent hang or dropped error."""
    from taming_event_flow_tpu.pipeline import MetricsConsumer

    consumer = MetricsConsumer(["FWL"], depth=2)
    # a non-numeric leaf makes consume_mets raise inside the thread
    consumer.put({"fwl": "not-a-number"}, "seq0")
    with pytest.raises(Exception):
        consumer.close()


def test_metrics_consumer_close_idempotent_and_empty():
    from taming_event_flow_tpu.pipeline import MetricsConsumer

    consumer = MetricsConsumer(["FWL"])
    assert consumer.close() == {}


def test_bf16_carry_single_trace(pipe_factory):
    """With ``inference_dtype: bfloat16`` the init carry is created in the
    compute dtype, so the first window and every later window hit ONE
    trace of the window program (an f32-initialized carry would compile a
    second full variant just for the first window — measured ~100 s of
    extra cold compile at DSEC scale)."""
    import jax.numpy as jnp

    cfg = _config(
        vis={"store": True, "show": ["flow_bw"]},
        metrics={"warping": "Iterative", "name": ["FWL", "RSAT", "AEE"],
                 "inference_dtype": "bfloat16"},
    )
    pipe = pipe_factory(cfg)
    assert pipe.windowed and pipe.use_extras
    assert all(t.dtype == jnp.bfloat16
               for t in __import__("jax").tree.leaves(pipe.carry))

    rng = np.random.default_rng(0)
    h, w = pipe.res
    n = pipe.criteria.n_events

    def bufs(seed):
        r = np.random.default_rng(seed)
        out = []
        for _ in range(pipe.passes):
            ts = np.sort(r.uniform(0, 1, (1, n, 1)), axis=1)
            y = r.uniform(0, h - 1, (1, n, 1))
            x = r.uniform(0, w - 1, (1, n, 1))
            p = r.choice([-1.0, 1.0], (1, n, 1))
            out.append({
                "event_list": np.concatenate(
                    [ts, y, x, p], -1).astype(np.float32),
                "gtflow": r.normal(size=(1, h, w, 2)).astype(np.float32),
            })
        return out

    for seed in (1, 2, 3):
        staged = pipe.stage_window(bufs(seed))
        pipe.vstate_stale = False
        pipe.run_window(staged)
    assert pipe._window_step._cache_size() == 1
    assert all(t.dtype == jnp.bfloat16
               for t in __import__("jax").tree.leaves(pipe.carry))
