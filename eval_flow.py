"""Evaluation entry point: deblurring metrics (FWL/RSAT) + supervised AEE.

Same CLI surface as the reference evaluator (reference
``eval_flow.py:210-227``)::

    python eval_flow.py <runid> [--config configs/eval_flow.yml]
                        [--path_mlflow DIR] [--path_results DIR]

Pipeline (reference ``eval_flow.py:16-207``): reconstruct the train config
from the tracked run, stream GT-aligned windows at batch 1, run the
recurrent model, feed the Iterative/Linear validation state machine, and at
every ``passes_loss`` boundary compute AEE (on the accumulated backward flow
map — the DSEC submission quantity), RSAT and FWL; store per-sequence
averages as ``metrics_<id>.yml`` plus rendered/encoded imagery.
"""

import argparse
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from taming_event_flow_tpu.configs import YAMLParser
from taming_event_flow_tpu.data import H5Loader
from taming_event_flow_tpu.metrics import METRIC_REGISTRY, ValConfig, compute_aee
from taming_event_flow_tpu.models import build_model
from taming_event_flow_tpu.ops import compute_pol_iwe
from taming_event_flow_tpu import tracking
from taming_event_flow_tpu.tracking import load_checkpoint
from taming_event_flow_tpu.tracking.loggers import (
    create_model_dir,
    initialize_quant_results,
    log_config,
    log_results,
)
from taming_event_flow_tpu.training import (
    make_eval_step,
    make_eval_window_step,
)
from taming_event_flow_tpu.training.window import (
    WindowGrouper,
    pad_batch_events,
)
from taming_event_flow_tpu.utils import Visualization
from taming_event_flow_tpu.utils.visualization import flow_to_u16, u16_to_flow


def grow_val_state(state, n_new: int):
    """Widen the event axis of the slot state (zero padding) so a larger
    window bucket can be ingested without losing accumulated passes."""
    def widen(leaf):
        if leaf.ndim >= 3 and leaf.shape[2] < n_new and leaf.ndim == 4:
            pad = [(0, 0)] * leaf.ndim
            pad[2] = (0, n_new - leaf.shape[2])
            return jnp.pad(leaf, pad)
        return leaf

    return state._replace(
        event_ts=widen(state.event_ts),
        event_loc=widen(state.event_loc),
        pol_mask=widen(state.pol_mask),
        fw_loc=widen(state.fw_loc),
        fw_ts=widen(state.fw_ts),
        fw_mask=widen(state.fw_mask),
        bw_loc=widen(state.bw_loc),
        bw_mask=widen(state.bw_mask),
    )


def test(args, config_parser: YAMLParser):
    tracking.set_tracking_uri(args.path_mlflow)
    run = tracking.get_run(args.runid)
    config = config_parser.merge_configs(run.data.params)
    config = config_parser.combine_entries(config)
    config_parser.apply_runtime(config)

    from taming_event_flow_tpu.ops.precision import set_matmul_precision

    set_matmul_precision(config["loss"].get("matmul_precision", "default"))
    from taming_event_flow_tpu.ops import set_warp_backend

    set_warp_backend(config["loss"].get("warp_backend", "auto"))

    config["loader"]["batch_size"] = 1
    res = tuple(config["loader"]["resolution"])
    passes = config["data"]["passes_loss"]
    num_bins = 2 if config["data"]["voxel"] is None else config["data"]["voxel"]
    flow_scaling = config["loss"].get("flow_scaling", 32)
    metrics_cfg = config.get("metrics", {})
    metric_names = metrics_cfg.get("name", ["FWL", "RSAT"])

    path_results = create_model_dir(args.path_results, args.runid)
    eval_id = log_config(path_results, args.runid, config)

    vis = Visualization(config, eval_id=eval_id, path_results=path_results)

    data = H5Loader(config, shuffle=True)

    model = build_model(dict(config["model"]), num_bins=num_bins)
    carry = model.init_state(1, res[0], res[1])
    x0 = jnp.zeros((1, res[0], res[1], num_bins))
    params = model.init(jax.random.PRNGKey(0), x0, carry)["params"]
    template = {"params": params, "opt_state": None,
                "step": np.int64(0), "epoch": np.int64(0)}
    restored, _ = load_checkpoint(args.runid, template)
    if restored is not None:
        # commit the restored (numpy) tree to the device ONCE: numpy leaves
        # passed to jit force the slow python dispatch path and a full
        # param re-upload on EVERY call (measured: +2.3 s/window at DSEC
        # 480x640 through the tunneled TPU plugin)
        params = jax.device_put(restored["params"])
    else:
        print("WARNING: no checkpoint found for run; evaluating random init")

    # fused forward+update step (one jitted program per pass position,
    # carry and slot state donated — see training.make_eval_step)

    vis_on = bool(config["vis"].get("enabled") or config["vis"].get("store"))

    def want_vis(key: str) -> bool:
        """Is this visualization quantity actually displayed/stored?"""
        if not vis_on:
            return False
        show = config["vis"].get("show")
        if show is None or key in show:
            return True
        # error_flow is derived from flow_bw + GT (utils/visualization.py)
        return key == "flow_bw" and "error_flow" in show

    val_cls = METRIC_REGISTRY[metrics_cfg.get("warping", "Iterative")]
    val_cfg = ValConfig(
        res=res, passes=passes, round_ts=config["loss"].get("round_ts", False),
        # forward-propagated flow maps feed only the "forward"-mode flow
        # visualization; metrics and the DSEC flow_bw path never read them
        track_fw_prop=want_vis("flow_dynamic") or want_vis("flow_window"),
        # the per-pass backward re-warp feeds only the backward-IWE
        # visualizations (flow_bw itself comes from the accumulated grid
        # warp)
        track_bw=want_vis("iwe_bw_dynamic") or want_vis("iwe_bw_window"),
    )
    n_slots = config["loader"].get("n_events_pad") or 4096
    criteria = val_cls(val_cfg, 1, n_slots)

    # multi-chip inference: shard the slot state's event axis (GSPMD; the
    # per-event warp math needs no collectives — parallel/eval.py)
    eval_mesh = None
    n_dev = len(jax.devices())
    if n_dev > 1 and n_slots % n_dev == 0 and not val_cfg.round_ts:
        from taming_event_flow_tpu.parallel.eval import (
            make_eval_mesh,
            shard_eval_batch,
            shard_eval_window,
            shard_val_state,
        )

        eval_mesh = make_eval_mesh()
        print(f"Event-sharded eval over {n_dev} devices")

    # jitted state reset: eager init() is ~15 separate device dispatches
    # (one per buffer) and runs at every window boundary. The boundary path
    # donates the old state so XLA zeroes the buffers in place (no
    # allocator churn). Holders so the grow-bucket path can swap them
    # together with `criteria`.
    _init_jit = [jax.jit(criteria.init)]
    _reset_jit = [jax.jit(criteria.reset, donate_argnums=(0,))]

    def fresh_state(old=None):
        if old is not None:
            # donating reset preserves the old state's placement
            return _reset_jit[0](old)
        s = _init_jit[0]()
        if eval_mesh:
            return shard_val_state(s, eval_mesh, round_ts=val_cfg.round_ts)
        return s

    vstate = fresh_state()
    # optional reduced-precision model forward (metrics.inference_dtype:
    # bfloat16) — the warp/metric pipeline stays f32; see
    # scripts/study_bf16_eval.py for the metric-impact study
    inference_dtype = None
    if metrics_cfg.get("inference_dtype") in ("bfloat16", "bf16"):
        inference_dtype = jnp.bfloat16

    def _make_step():
        return make_eval_step(
            model, criteria, flow_scaling,
            inference_dtype=inference_dtype,
            extras=_window_metrics if _pass_extras else None,
        )

    # ---- windowed fast path: recorded protocols whose displayed/stored
    # quantities are all window-level (e.g. the DSEC submission config,
    # flow_bw only) run ONE jitted program per GT window — P fused pass
    # bodies unrolled, bit-identical to the per-pass chain, with P x fewer
    # host dispatches (training.make_eval_window_step). Any per-pass
    # quantity (live display, per-pass flow/iwe/events images, dynamic
    # window vis) keeps the per-pass path.
    _dyn_keys = ("events_dynamic", "iwe_fw_dynamic", "iwe_bw_dynamic",
                 "flow_dynamic")
    per_pass_vis = (
        want_vis("events") or want_vis("flow") or want_vis("iwe")
        or (passes > 1 and bool(config["vis"].get("dynamic"))
            and any(want_vis(k) for k in _dyn_keys))
    )
    windowed = (passes > 1 and not per_pass_vis
                and not config["vis"].get("enabled"))

    # window-boundary metrics INSIDE the window program: one dispatch and
    # scalar readbacks replace 3 separate post-window reducer dispatches
    # (flow_bw / RSAT / FWL) that each block the host. Disabled when the
    # protocol gates metrics on eval_time (mostly-skipped windows would
    # compute them for nothing), and on the event-sharded path (reducers
    # run shard_map'd there).
    _aee_in_program = (
        config["data"]["mode"] == "gtflow" and "AEE" in metric_names
    )
    _use_extras = (
        windowed and eval_mesh is None and "eval_time" not in metrics_cfg
    )
    # per-pass path: the host knows the batch timestamp before dispatch,
    # so eval_time-gated protocols pick the fused-metrics program only on
    # in-window boundary passes (zero waste on gated-out passes)
    _pass_extras = eval_mesh is None
    # packed wire: pol/event masks AND the count net input derive on
    # device from the event lists (+ raw coords / rectification gather
    # index for rectified sequences) — exact either way;
    # runtime.packed_wire: false = A/B escape hatch
    _packed_wire = bool(
        (config.get("runtime") or {}).get("packed_wire", True)
    )

    def _in_eval_time(ts) -> bool:
        if "eval_time" not in metrics_cfg:
            return True
        lo, hi = metrics_cfg["eval_time"]
        return lo <= ts <= hi

    def _window_metrics(vstate, gtflow):
        out = {}
        if "RSAT" in metric_names:
            out["rsat"] = criteria.rsat(vstate)[0]
        if "FWL" in metric_names:
            out["fwl"] = criteria.fwl(vstate)
        if _aee_in_program:
            flow_bw = (
                criteria.window_flow(vstate, mode="backward", mask=False)
                * passes
            )
            if want_vis("flow_bw"):
                # the map transfer (~40 ms D2H for 260x346) only pays off
                # when the vis path consumes it; AEE reads it on-device.
                # packed wire: ship the DSEC PNG lattice (half the bytes;
                # the store re-encodes to these exact values)
                out["flow_bw"] = (
                    flow_to_u16(flow_bw) if _packed_wire else flow_bw
                )
            mask = None
            if metrics_cfg.get("mask_aee"):
                mask = criteria.window_events(vstate)
            out["aee"] = compute_aee(
                flow_bw, gtflow, event_mask=mask,
                res_aee=metrics_cfg.get("res_aee"),
                vertical_crop_aee=metrics_cfg.get("vertical_crop_aee"),
            )
        return out

    _eval_step = [_make_step()]

    def _make_window_step():
        if not windowed:
            return None
        # reset_first: the boundary reset folds into the window program
        # (stale state in, fresh window out — one dispatch per window total)
        return make_eval_window_step(
            model, criteria, flow_scaling,
            inference_dtype=inference_dtype, reset_first=True,
            extras=_window_metrics if _use_extras else None,
        )

    _window_step = [_make_window_step()]
    wbuf = []  # buffered batches of the in-flight window (windowed mode)
    window_mets = None  # in-program metrics of the last dispatched window
    vstate_stale = False  # True: last window's state awaits its in-program reset

    if windowed:
        print(f"Windowed eval: 1 dispatch per {passes}-pass GT window")

    # window-boundary metric reducers: jitted; under the event-sharded mesh
    # they run per shard via shard_map (local splats — Pallas included —
    # with exact psum merges; parallel/eval.make_sharded_reducers)
    def _make_reducers():
        if eval_mesh is not None:
            from taming_event_flow_tpu.parallel.eval import (
                make_sharded_reducers,
            )

            d = make_sharded_reducers(criteria, eval_mesh, vstate)
        else:
            d = {
                "fwl": jax.jit(criteria.fwl),
                "rsat": jax.jit(criteria.rsat),
                "window_events": jax.jit(criteria.window_events),
                "window_iwe_fw": jax.jit(
                    partial(criteria.window_iwe, mode="forward")
                ),
                "window_iwe_bw": jax.jit(
                    partial(criteria.window_iwe, mode="backward")
                ),
            }
        # pixel-space reducers (replicated accumulators — safe under the
        # event mesh too). Jitted: the eager forms cost 21 + 31 ms/call on
        # the per-pass path (MVSEC protocol) vs 8 + 8 jitted.
        d["window_flow_bw"] = jax.jit(
            partial(criteria.window_flow, mode="backward", mask=False)
        )
        # packed wire for the vis readback (jitted: eager elementwise ops
        # cost 20+ ms dispatches on the per-pass path)
        d["flow_bw_u16"] = jax.jit(flow_to_u16)
        d["aee"] = jax.jit(
            partial(
                compute_aee,
                res_aee=metrics_cfg.get("res_aee"),
                vertical_crop_aee=metrics_cfg.get("vertical_crop_aee"),
            )
        )
        return d

    _reducers = [_make_reducers()]

    passes_done = 0  # host-side mirror of vstate.pass_idx (avoids syncs)

    def _consume_mets(host_mets):
        """Fold one window boundary's (host) metric values into the vis
        slots and per-sequence accumulators — the single consumer for both
        the in-program and reducer metric paths."""
        if "flow_bw" in host_mets:
            fb = host_mets["flow_bw"]
            if fb.dtype == np.uint16:  # packed wire: DSEC PNG lattice
                fb = u16_to_flow(fb)
            vis.data["flow_bw"] = fb
        if "aee" in host_mets:
            val_results[sequence]["AEE"]["metric"] += float(host_mets["aee"])
            val_results[sequence]["AEE"]["it"] += 1
        for metric in metric_names:
            if metric == "RSAT" and "rsat" in host_mets:
                val_results[sequence][metric]["metric"] += float(
                    host_mets["rsat"])
                val_results[sequence][metric]["it"] += 1
            elif metric == "FWL" and "fwl" in host_mets:
                val_results[sequence][metric]["metric"] += float(
                    host_mets["fwl"])
                val_results[sequence][metric]["it"] += 1

    # wall-clock attribution of the consumer loop (printed with
    # vis.verbose; negligible overhead otherwise)
    from taming_event_flow_tpu.utils.diagnostics import SectionTimer

    tm = SectionTimer()

    # the current sequence's device-resident rectification gather index
    # (producer-uploaded; consumed by the packed count-derivation paths —
    # held here so buffered-pass flushes see it without touching ``data``)
    _cur_ridx = [None]

    def run_pass(b, meta=None):
        """One fused forward+update dispatch (the per-pass path).

        On an in-``eval_time`` boundary pass (known host-side from the
        batch metadata) the fused-metrics specialization runs instead,
        returning the window quantities with the same dispatch."""
        nonlocal vstate, carry, passes_done, vstate_stale, window_mets
        if vstate_stale:
            vstate = fresh_state(vstate)
            vstate_stale = False
        ev_in = jnp.asarray(b["event_list"])
        raw_in = ridx_in = None
        if eval_mesh is not None or not _packed_wire:
            pol_in = jnp.asarray(b["event_list_pol_mask"])
            if eval_mesh is not None:
                ev_in, pol_in = shard_eval_batch(ev_in, pol_in, eval_mesh)
            x_in, emask_in = jnp.asarray(b["net_input"]), jnp.asarray(
                b["event_mask"])
        else:
            # packed per-pass wire (step body derives / casts; exact):
            # pol masks and — in count mode — the event mask AND the
            # count net input stay home (the step derives all three from
            # the event list + optional raw coords / rectification
            # gather index)
            pol_in = None
            if config["data"]["voxel"] is not None:
                x_in = jnp.asarray(b["net_input"])
                emask_in = jnp.asarray(b["event_mask"])
            else:
                x_in = emask_in = None
                if "event_raw_xy" in b:
                    raw_in = jnp.asarray(b["event_raw_xy"])
                ridx_in = _cur_ridx[0]
        want = (
            _pass_extras
            and meta is not None
            and passes_done + 1 == passes
            and _in_eval_time(meta["ts"])
        )
        aux = (jnp.asarray(b["gtflow"])
               if (want and _aee_in_program) else 0.0)
        out = _eval_step[0](
            vstate, carry, params, x_in,
            ev_in, pol_in, emask_in,
            n_active=passes_done + 1, aux=aux, with_extras=want,
            raw=raw_in, ridx=ridx_in,
        )
        if want:
            vstate, carry, flow_fine, window_mets = out
        else:
            vstate, carry, flow_fine = out
        passes_done += 1
        return flow_fine

    def run_window(staged=None):
        """Dispatch the buffered GT window as one jitted program (the
        program resets the stale slot state itself — ``reset_first``).

        ``staged``: optional pre-stacked, pre-transferred device inputs
        from the producer thread (overlaps the stack + H2D wire time with
        the previous window's device compute); ignored unless its event
        width still matches the live bucket."""
        nonlocal vstate, carry, passes_done, vstate_stale, window_mets
        vstate_stale = False
        raw = ridx = None
        if staged is not None and staged[1].shape[2] == criteria.n_events:
            xs, evs, pols, emasks, aux, raw, ridx = staged
        elif eval_mesh is None:
            with tm("window_assemble"):
                xs, evs, pols, emasks, aux, raw, ridx = _stage_window(
                    wbuf, ridx=_cur_ridx[0])
        else:
            with tm("window_assemble"):
                xs = jnp.asarray(np.stack([b["net_input"] for b in wbuf]))
                emasks = jnp.asarray(
                    np.stack([b["event_mask"] for b in wbuf]))
                evs = np.stack([b["event_list"] for b in wbuf])
                pols = np.stack([b["event_list_pol_mask"] for b in wbuf])
                evs, pols = shard_eval_window(evs, pols, eval_mesh)
                aux = 0.0  # extras are off on the sharded path
        with tm("window_call"):
            if _use_extras:
                vstate, carry, flow_fine, window_mets = _window_step[0](
                    vstate, carry, params, xs, evs, pols, emasks, aux,
                    raw, ridx
                )
            else:
                vstate, carry, flow_fine = _window_step[0](
                    vstate, carry, params, xs, evs, pols, emasks,
                    raw=raw, ridx=ridx
                )
        passes_done = passes
        wbuf.clear()
        return flow_fine

    from taming_event_flow_tpu.utils import ProgressBar
    from taming_event_flow_tpu.data.prefetch import Prefetcher

    def _stage_window(bufs, ridx=None):
        """Stack a clean P-pass window and start its H2D transfers (from
        the producer thread — ``jnp.asarray`` is async, so the wire time
        overlaps the consumer's device dispatches).

        Packed wire formats (the window program unpacks; exact by
        construction): polarity masks aren't shipped at all (the program
        derives ``[p>0, p<0]`` from the event lists — the loader's own
        construction, data/base.py), count net inputs and event masks
        aren't shipped either (the program rebuilds the count encoding
        from the event lists + optional raw coords / the sequence's
        rectification gather index ``ridx`` —
        ops/encodings.derive_count_input, again the loader's own
        construction; 24.6 -> ~6 MB/window at DSEC scale)."""
        aux = (jnp.asarray(bufs[-1]["gtflow"])
               if (_use_extras and _aee_in_program) else 0.0)
        emasks = pols = raw = None
        xs = None
        if not _packed_wire:
            xs = jnp.asarray(np.stack([b["net_input"] for b in bufs]))
            emasks = jnp.asarray(
                np.stack([b["event_mask"] for b in bufs]))
            pols = jnp.asarray(np.stack(
                [b["event_list_pol_mask"] for b in bufs]).astype(bool))
            ridx = None
        elif config["data"]["voxel"] is not None:
            # voxel net input: fractional values (not exactly derivable
            # in f32) and the mask is not count-derived — ship both as-is
            xs = jnp.asarray(np.stack([b["net_input"] for b in bufs]))
            emasks = jnp.asarray(
                np.stack([b["event_mask"] for b in bufs]))
            ridx = None
        elif "event_raw_xy" in bufs[0]:
            # rectified sequence: the event lists carry fractional
            # rectified coords; the count encoding derives from the raw
            # integer coords + the gather index instead
            raw = jnp.asarray(
                np.stack([b["event_raw_xy"] for b in bufs]))
        return (
            xs,
            jnp.asarray(np.stack([b["event_list"] for b in bufs])),
            pols,
            emasks,
            aux,
            raw,
            ridx,
        )

    def batch_stream():
        """Produce (batch, metadata) with all loader state snapshotted at
        production time, so a prefetch thread can run the stateful loader
        ahead of the device (the loop body below never touches ``data``).

        ``ts_jump_reset`` is sticky on the lane until cleared; clearing it
        right here makes the flag batch-scoped — exactly the consumer-side
        ``clear_ts_jump()`` timing of the synchronous loop (the reference
        evaluator's global-flag protocol, reference ``eval_flow.py:75-88``).

        On the windowed fast path (static event bucket, no event mesh) the
        producer additionally mirrors the consumer's window-grouping state
        machine: every P-th clean batch carries ``meta["staged"]`` — the
        stacked window, already in flight to the device.
        """
        stage = bool(
            windowed and eval_mesh is None
            and config["loader"].get("n_events_pad")
        )
        grouper = WindowGrouper(passes)
        ridx_dev = "unset"  # device-cached rectification gather index
        while True:
            b = data.next_batch()
            if b["ts_jump_reset"].any():
                data.clear_ts_jump()
            if ridx_dev == "unset" or b["new_seq"].any():
                # the lane's rectification mapping (and so its gather
                # index) changes only on sequence rollover; upload once
                # per sequence from the producer thread
                r = data.remap_indices()
                ridx_dev = jnp.asarray(r) if r is not None else None
            meta = {
                "sequence": data.seq_name,
                "ts": data.last_proc_timestamp,
                "end_test": data.seq_num >= len(data.files),
                "bar_iters": data.get_iters(data.lanes[0]),
                "remap_idx": ridx_dev,
            }
            if stage and not meta["end_test"]:
                full = grouper.feed(
                    b, bool(b["new_seq"].any()),
                    bool(config["data"]["mode"] == "gtflow"
                         and b["ts_jump_reset"].any()),
                )
                if full is not None:
                    meta["staged"] = _stage_window(full, ridx=ridx_dev)
            yield b, meta
            if meta["end_test"]:
                return

    bar = None
    bar_name = None


    val_results = {}
    prefetcher = Prefetcher(batch_stream(), depth=3)
    try:
        for batch, meta in tm.wrap(prefetcher, "wait_batch"):
            sequence = meta["sequence"]
            _cur_ridx[0] = meta.get("remap_idx")

            if config["vis"].get("bars"):
                if bar is None:
                    bar_name = sequence
                    bar = ProgressBar(bar_name, max=meta["bar_iters"])
                bar.next()

            if batch["new_seq"].any():
                if bar is not None:
                    bar.finish()
                    bar_name = sequence
                    bar = ProgressBar(bar_name, max=meta["bar_iters"])
                carry = model.init_state(1, res[0], res[1])
                if windowed:
                    vstate_stale = True  # next window's program resets it
                else:
                    vstate = fresh_state(vstate)
                passes_done = 0
                # buffered passes of the old sequence never reached a window
                # boundary: the per-pass path would discard their updates at
                # this same reset, so drop them unprocessed
                wbuf.clear()

            if config["data"]["mode"] == "gtflow" and batch["ts_jump_reset"].any():
                # mid-window ts jump: buffered passes must land BEFORE the
                # carry reset (the validation window continues across the
                # jump); the window's remaining passes then run per-pass
                for b in list(wbuf):
                    run_pass(b)
                wbuf.clear()
                carry = model.init_state(1, res[0], res[1])

            if meta["end_test"]:
                break

            n_batch = batch["event_list"].shape[1]
            if n_batch > criteria.n_events:
                # only reachable without a loader.n_events_pad cap: growing the
                # event axis re-jits the whole update program (minutes on a cold
                # TPU) — set a per-dataset cap (configs/eval_*.yml) to avoid it
                import warnings

                warnings.warn(
                    f"event bucket grew {criteria.n_events} -> {n_batch}; "
                    "recompiling the validation update. Set loader.n_events_pad "
                    "to a static per-dataset cap to compile once.",
                    stacklevel=2,
                )
                criteria = val_cls(val_cfg, 1, n_batch)
                vstate = grow_val_state(vstate, n_batch)
                _eval_step[0] = _make_step()
                _window_step[0] = _make_window_step()
                _reducers[0] = _make_reducers()
                _init_jit[0] = jax.jit(criteria.init)
                _reset_jit[0] = jax.jit(criteria.reset, donate_argnums=(0,))
                wbuf[:] = [pad_batch_events(b, n_batch) for b in wbuf]
            elif n_batch < criteria.n_events:
                batch = pad_batch_events(batch, criteria.n_events)

            if windowed and passes_done == 0:
                # buffer until the GT window is complete, then dispatch once
                wbuf.append(batch)
                flow_fine = None
                if len(wbuf) == passes:
                    with tm("window_dispatch"):
                        flow_fine = run_window(meta.get("staged"))
            else:
                with tm("pass_dispatch"):
                    flow_fine = run_pass(batch, meta)

            flow_vis = None
            if want_vis("flow") or want_vis("iwe"):
                flow_vis = np.asarray(flow_fine)
                if config["vis"].get("mask_output"):
                    flow_vis = flow_vis * np.asarray(batch["event_mask"])

            if want_vis("iwe"):
                vis.data["iwe"] = np.asarray(
                    compute_pol_iwe(
                        jnp.asarray(flow_vis), jnp.asarray(batch["event_list"]),
                        res, jnp.asarray(batch["event_list_pol_mask"]),
                        round_idx=False, round_flow=False,
                    )
                )

            if vis_on:
                num = passes_done
                # event-dim accessors go through _reducers (shard_map on the
                # sharded path — raw criteria calls would splat sharded
                # buffers); window_flow reads only replicated pixel-space
                # accumulators and is safe raw
                if passes > 1 and config["vis"].get("dynamic"):
                    if want_vis("events_dynamic"):
                        vis.data["events_dynamic"] = np.asarray(
                            _reducers[0]["window_events"](vstate))
                    if want_vis("iwe_fw_dynamic"):
                        vis.data["iwe_fw_dynamic"] = np.asarray(
                            _reducers[0]["window_iwe_fw"](vstate))
                    if want_vis("iwe_bw_dynamic"):
                        vis.data["iwe_bw_dynamic"] = np.asarray(
                            _reducers[0]["window_iwe_bw"](vstate))
                    if want_vis("flow_dynamic"):
                        vis.data["flow_dynamic"] = np.asarray(
                            criteria.window_flow(vstate, mode="forward"))
                if num > 1 and num == passes:
                    if want_vis("events_window"):
                        vis.data["events_window"] = np.asarray(
                            _reducers[0]["window_events"](vstate))
                    if want_vis("iwe_fw_window"):
                        vis.data["iwe_fw_window"] = np.asarray(
                            _reducers[0]["window_iwe_fw"](vstate))
                    if want_vis("iwe_bw_window"):
                        vis.data["iwe_bw_window"] = np.asarray(
                            _reducers[0]["window_iwe_bw"](vstate))
                    if want_vis("flow_window"):
                        vis.data["flow_window"] = np.asarray(
                            criteria.window_flow(vstate, mode="forward"))

            vis.data["flow_bw"] = None
            val_results = initialize_quant_results(
                val_results, sequence, metric_names
            )
            if passes_done == passes:
                compute = _in_eval_time(meta["ts"])

                if compute and window_mets is not None:
                    # metrics were computed inside the window program — ONE
                    # batched readback (each separate np.asarray/float costs
                    # a full ~26 ms D2H round trip on the tunneled plugin)
                    with tm("mets_readback"):
                        host_mets = jax.device_get(window_mets)
                    _consume_mets(host_mets)
                elif compute:
                    # reducer path (event-sharded or growing buckets):
                    # dispatch every reducer first, then read ALL results
                    # back in one batched device_get (separate float()s
                    # each cost a ~26 ms D2H round trip)
                    with tm("mets_dispatch"):
                        dev_mets = {}
                        if (
                            config["data"]["mode"] == "gtflow"
                            and "AEE" in metric_names
                            and "gtflow" in batch
                        ):
                            mask_aee = None
                            if metrics_cfg.get("mask_aee"):
                                mask_aee = _reducers[0]["window_events"](
                                    vstate)
                            flow_bw = (
                                _reducers[0]["window_flow_bw"](vstate)
                                * passes
                            )
                            if want_vis("flow_bw"):
                                dev_mets["flow_bw"] = (
                                    _reducers[0]["flow_bw_u16"](flow_bw)
                                    if _packed_wire else flow_bw
                                )
                            dev_mets["aee"] = _reducers[0]["aee"](
                                flow_bw, jnp.asarray(batch["gtflow"]),
                                event_mask=mask_aee,
                            )
                        for metric in metric_names:
                            if metric == "RSAT":
                                dev_mets["rsat"] = _reducers[0]["rsat"](
                                    vstate)[0]
                            elif metric == "FWL":
                                dev_mets["fwl"] = _reducers[0]["fwl"](vstate)
                    with tm("mets_readback"):
                        host_mets = jax.device_get(dev_mets)
                    _consume_mets(host_mets)

                window_mets = None
                if windowed:
                    vstate_stale = True  # next window's program resets it
                else:
                    vstate = fresh_state(vstate)
                passes_done = 0

            if config["vis"].get("enabled") or config["vis"].get("store"):
                with tm("vis_step"):
                    vis.data["flow"] = flow_vis
                    vis.step(
                        batch, sequence=sequence, ts=meta["ts"],
                        show=config["vis"].get("show"),
                    )
    finally:
        prefetcher.close()
        # flush the PNG writeback thread (and surface any worker error)
        # BEFORE results are logged — the submission formatter reads the
        # store trees right after this returns
        vis.close()

    if config["vis"].get("verbose"):
        print(tm.report())

    results = {}
    for metric in metric_names:
        results[metric] = {}
        for key in val_results:
            if val_results[key][metric]["it"] > 0:
                results[metric][key] = str(
                    val_results[key][metric]["metric"]
                    / val_results[key][metric]["it"]
                )
        log_results(args.runid, results, path_results, eval_id)
    print(results)
    return results


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("runid", help="tracked run id")
    parser.add_argument(
        "--config", default="configs/eval_flow.yml",
        help="config file, overwrites tracked settings",
    )
    parser.add_argument("--path_mlflow", default="",
                        help="tracking-store location")
    parser.add_argument("--path_results", default="results_inference/")
    args = parser.parse_args()
    test(args, YAMLParser(args.config))
