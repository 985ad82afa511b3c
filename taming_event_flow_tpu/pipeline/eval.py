"""The eval pipeline as importable, unit-testable units.

Everything between the CLI's argparse wiring and the device: vis policy,
protocol-flag derivation, the three jitted step builders (per-pass, fused
window, reducers), window staging, the batch-stream producer, and the
metric-consumption logic. ``eval_flow.py`` keeps only tracking/config/
checkpoint wiring plus the consumer loop.

Pipeline semantics mirror the reference evaluator (reference
``eval_flow.py:16-207``): stream GT-aligned windows at batch 1, run the
recurrent model, feed the Iterative/Linear validation state machine, and at
every ``passes_loss`` boundary compute AEE (on the accumulated backward
flow map — the DSEC submission quantity), RSAT and FWL.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Optional

import numpy as np

import jax
import jax.numpy as jnp

from ..metrics import METRIC_REGISTRY, ValConfig, compute_aee
from ..training import make_eval_step, make_eval_window_step
from ..training.window import WindowGrouper, pad_batch_events
from ..utils.diagnostics import SectionTimer
from ..utils.visualization import flow_to_u16, u16_to_flow


class VisPolicy:
    """Which visualization quantities the protocol actually consumes.

    Pure policy (no rendering): gates the tracked-state knobs
    (``ValConfig.track_fw_prop``/``track_bw``), the windowed fast path, and
    every per-slot readback in the loop.
    """

    def __init__(self, config: Dict):
        vis = config.get("vis", {}) or {}
        self.enabled = bool(vis.get("enabled"))
        self.store = bool(vis.get("store"))
        self.show = vis.get("show")
        self.dynamic = bool(vis.get("dynamic"))
        self.mask_output = bool(vis.get("mask_output"))
        self.bars = bool(vis.get("bars"))
        self.verbose = bool(vis.get("verbose"))
        self.on = self.enabled or self.store

    def want(self, key: str) -> bool:
        """Is this visualization quantity actually displayed/stored?"""
        if not self.on:
            return False
        if self.show is None or key in self.show:
            return True
        # error_flow is derived from flow_bw + GT (utils/visualization.py)
        return key == "flow_bw" and "error_flow" in self.show


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


class MetricsConsumer:
    """Deferred boundary-metric consumption on a reader thread.

    The boundary readback (one batched ``jax.device_get``) blocks the
    dispatch loop for the window's device completion PLUS the wire — the
    single largest serialized slice of the eval CLI's end-to-end budget
    (63 ms/pass of 182 at DSEC scale, README round 4). Deferring it to a
    reader thread overlaps that wait with the NEXT window's staging and
    dispatch; the scalar arithmetic is unchanged and ordering is FIFO, so
    the accumulated per-sequence results are identical (A/B'd by
    ``scripts/bench_eval_cli.py --sync-metrics``).

    The thread owns ``val_results`` exclusively; ``close()`` drains the
    queue, re-raises any worker error, and hands the dict back.
    """

    def __init__(self, metric_names, depth: int = 4):
        import queue
        import threading

        from ..tracking.loggers import initialize_quant_results

        self._init_results = initialize_quant_results
        self.metric_names = metric_names
        self.val_results: Dict = {}
        # depth-bounded: each queued item pins one window's metric buffers
        self._q = queue.Queue(maxsize=depth)
        self._err: Optional[BaseException] = None
        self._thread = threading.Thread(
            target=self._drain, name="metrics-reader", daemon=True
        )
        self._thread.start()

    def put(self, dev_mets: Dict, sequence: str) -> None:
        if self._err is not None:
            self.close()  # re-raises
        self._q.put((dev_mets, sequence))

    def _drain(self):
        while True:
            item = self._q.get()
            if item is None:
                return
            if self._err is not None:
                continue  # keep consuming so the producer never blocks
            dev_mets, sequence = item
            try:
                host = jax.device_get(dev_mets)
                self.val_results = self._init_results(
                    self.val_results, sequence, self.metric_names)
                consume_mets(host, self.val_results, sequence,
                             self.metric_names)
            except BaseException as e:
                self._err = e

    def close(self) -> Dict:
        if self._thread is not None:
            self._q.put(None)
            self._thread.join()
            self._thread = None
        if self._err is not None:
            err, self._err = self._err, None
            raise err
        return self.val_results


def consume_mets(host_mets: Dict, val_results: Dict, sequence: str,
                 metric_names) -> Optional[np.ndarray]:
    """Fold one window boundary's (host) metric values into the
    per-sequence accumulators — the single consumer for both the
    in-program and reducer metric paths. Returns the decoded ``flow_bw``
    map (for the vis slot) when the metrics carried one."""
    flow_bw = None
    if "flow_bw" in host_mets:
        fb = host_mets["flow_bw"]
        if fb.dtype == np.uint16:  # packed wire: DSEC PNG lattice
            fb = u16_to_flow(fb)
        flow_bw = fb
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
    return flow_bw


def _drain_one(tree) -> None:
    """Block until the first device leaf of ``tree`` is computed (one
    1-element readback; ``block_until_ready`` returns at dispatch on the
    tunneled-TPU stack — CLAUDE.md)."""
    leaves = [l for l in jax.tree.leaves(tree) if hasattr(l, "dtype")]
    if leaves:
        np.asarray(jax.device_get(leaves[0].ravel()[:1]))


class EvalPipeline:
    """Owns the jitted eval programs and the loop's mutable device state.

    Construction derives every protocol flag the reference evaluator's
    loop hardcodes (reference ``eval_flow.py:70-193``) from the merged
    config: the windowed fast path, in-program boundary metrics, packed
    wire formats, and the event-sharded multi-chip mesh.
    """

    def __init__(self, config: Dict, model, params,
                 auto_shard: bool = True):
        self.config = config
        self.model = model
        self.params = params
        self.vis = VisPolicy(config)

        self.res = tuple(config["loader"]["resolution"])
        self.passes = config["data"]["passes_loss"]
        self.flow_scaling = config["loss"].get("flow_scaling", 32)
        self.metrics_cfg = config.get("metrics", {})
        self.metric_names = self.metrics_cfg.get("name", ["FWL", "RSAT"])
        self.voxel = config["data"]["voxel"]
        self.gtflow_mode = config["data"]["mode"] == "gtflow"

        want = self.vis.want
        self.val_cls = METRIC_REGISTRY[
            self.metrics_cfg.get("warping", "Iterative")]
        self.val_cfg = ValConfig(
            res=self.res, passes=self.passes,
            round_ts=config["loss"].get("round_ts", False),
            # forward-propagated flow maps feed only the "forward"-mode
            # flow visualization; metrics and the DSEC flow_bw path never
            # read them
            track_fw_prop=want("flow_dynamic") or want("flow_window"),
            # the per-pass backward re-warp feeds only the backward-IWE
            # visualizations (flow_bw itself comes from the accumulated
            # grid warp)
            track_bw=want("iwe_bw_dynamic") or want("iwe_bw_window"),
        )
        n_slots = config["loader"].get("n_events_pad") or 4096
        self.criteria = self.val_cls(self.val_cfg, 1, n_slots)

        # multi-chip inference: shard the slot state's event axis (GSPMD;
        # the per-event warp math needs no collectives — parallel/eval.py).
        # ``auto_shard=False`` pins the single-device programs regardless
        # of visible devices (unit tests; single-chip A/B runs).
        self.eval_mesh = None
        n_dev = len(jax.devices())
        if (auto_shard and n_dev > 1 and n_slots % n_dev == 0
                and not self.val_cfg.round_ts):
            from ..parallel.eval import make_eval_mesh

            self.eval_mesh = make_eval_mesh()
            print(f"Event-sharded eval over {n_dev} devices")

        # optional reduced-precision model forward
        # (metrics.inference_dtype: bfloat16) — the warp/metric pipeline
        # stays f32; see scripts/study_bf16_eval.py for the impact study
        self.inference_dtype = None
        if self.metrics_cfg.get("inference_dtype") in ("bfloat16", "bf16"):
            self.inference_dtype = jnp.bfloat16

        # ---- windowed fast path: recorded protocols whose displayed/
        # stored quantities are all window-level (e.g. the DSEC submission
        # config, flow_bw only) run ONE jitted program per GT window — P
        # fused pass bodies unrolled, bit-identical to the per-pass chain,
        # with P x fewer host dispatches (training.make_eval_window_step).
        # Any per-pass quantity (live display, per-pass flow/iwe/events
        # images, dynamic window vis) keeps the per-pass path.
        _dyn_keys = ("events_dynamic", "iwe_fw_dynamic", "iwe_bw_dynamic",
                     "flow_dynamic")
        per_pass_vis = (
            want("events") or want("flow") or want("iwe")
            or (self.passes > 1 and self.vis.dynamic
                and any(want(k) for k in _dyn_keys))
        )
        self.windowed = (self.passes > 1 and not per_pass_vis
                         and not self.vis.enabled)

        # window-boundary metrics INSIDE the window program: one dispatch
        # and scalar readbacks replace 3 separate post-window reducer
        # dispatches (flow_bw / RSAT / FWL) that each block the host.
        # Disabled when the protocol gates metrics on eval_time
        # (mostly-skipped windows would compute them for nothing), and on
        # the event-sharded path (reducers run shard_map'd there).
        self.aee_in_program = (
            self.gtflow_mode and "AEE" in self.metric_names
        )
        self.use_extras = (
            self.windowed and self.eval_mesh is None
            and "eval_time" not in self.metrics_cfg
        )
        # per-pass path: the host knows the batch timestamp before
        # dispatch, so eval_time-gated protocols pick the fused-metrics
        # program only on in-window boundary passes (zero waste on
        # gated-out passes)
        self.pass_extras = self.eval_mesh is None
        # packed wire: pol/event masks AND the count net input derive on
        # device from the event lists (+ raw coords / rectification gather
        # index for rectified sequences) — exact either way;
        # runtime.packed_wire: false = A/B escape hatch
        self.packed_wire = bool(
            (config.get("runtime") or {}).get("packed_wire", True)
        )
        # bench-only wire probe: adds two 1-element drains before each
        # window dispatch to attribute the dispatch stall (see run_window)
        self.probe_wire = bool(
            (config.get("runtime") or {}).get("probe_wire", False)
        )
        # u32 event wire (windowed count path): one u32 element carries
        # (y, x, polarity) — halves the event upload's per-element cost
        # (ops/encodings.pack_event_wire_np). Exactness gates: rectified
        # sequences use the device-side forward-map lookup (not valid
        # under coordinate flips — the host flips AFTER the lookup);
        # unrectified coords must be integral (verified once on the
        # first staged window; the loader's construction guarantees it,
        # synthetic callers may not). runtime.u32_wire: false = A/B.
        aug = set(config["loader"].get("augment") or [])
        self.coord_flips = bool({"Horizontal", "Vertical"} & aug)
        self.u32_wire = self.packed_wire and bool(
            (config.get("runtime") or {}).get("u32_wire", True)
        )
        self._u32_ok = None  # first-window integrality probe result

        # jitted state reset: eager init() is ~15 separate device
        # dispatches (one per buffer) and runs at every window boundary.
        # The boundary path donates the old state so XLA zeroes the
        # buffers in place (no allocator churn). Holders so the
        # grow-bucket path can swap them together with `criteria`.
        self._init_jit = jax.jit(self.criteria.init)
        self._reset_jit = jax.jit(self.criteria.reset, donate_argnums=(0,))
        self._eval_step = self._make_step()
        self._window_step = self._make_window_step()
        self._reducers = self._make_reducers()

        # mutable loop state
        self.reset_carry()
        self.vstate = self.fresh_state()
        self.passes_done = 0  # host mirror of vstate.pass_idx (no syncs)
        self.vstate_stale = False  # last window's state awaits its reset
        self.window_mets = None  # in-program metrics of the last window
        self.wbuf = []  # buffered batches of the in-flight window
        self.cur_ridx = None  # device-resident rectification gather index
        self.cur_rect = None  # device-resident forward rectification map

        # wall-clock attribution of the consumer loop (printed with
        # vis.verbose; negligible overhead otherwise)
        self.tm = SectionTimer()

        if self.windowed:
            print(
                f"Windowed eval: 1 dispatch per {self.passes}-pass GT window"
            )

    # --------------------------------------------------------- programs

    def _make_step(self):
        return make_eval_step(
            self.model, self.criteria, self.flow_scaling,
            inference_dtype=self.inference_dtype,
            extras=self.window_metrics if self.pass_extras else None,
        )

    def _make_window_step(self):
        if not self.windowed:
            return None
        # reset_first: the boundary reset folds into the window program
        # (stale state in, fresh window out — one dispatch per window)
        return make_eval_window_step(
            self.model, self.criteria, self.flow_scaling,
            inference_dtype=self.inference_dtype, reset_first=True,
            extras=self.window_metrics if self.use_extras else None,
        )

    def _make_reducers(self):
        """Window-boundary metric reducers: jitted; under the
        event-sharded mesh they run per shard via shard_map (local splats
        — Pallas included — with exact psum merges;
        parallel/eval.make_sharded_reducers)."""
        if self.eval_mesh is not None:
            from ..parallel.eval import make_sharded_reducers

            d = make_sharded_reducers(self.criteria, self.eval_mesh,
                                      self.vstate_template())
        else:
            d = {
                "fwl": jax.jit(self.criteria.fwl),
                "rsat": jax.jit(self.criteria.rsat),
                "rsat_fwl": jax.jit(self.criteria.rsat_fwl),
                "window_events": jax.jit(self.criteria.window_events),
                "window_iwe_fw": jax.jit(
                    partial(self.criteria.window_iwe, mode="forward")
                ),
                "window_iwe_bw": jax.jit(
                    partial(self.criteria.window_iwe, mode="backward")
                ),
            }
        # pixel-space reducers (replicated accumulators — safe under the
        # event mesh too). Jitted: the eager forms cost 21 + 31 ms/call
        # on the per-pass path (MVSEC protocol) vs 8 + 8 jitted.
        d["window_flow_bw"] = jax.jit(
            partial(self.criteria.window_flow, mode="backward", mask=False)
        )
        # packed wire for the vis readback (jitted: eager elementwise ops
        # cost 20+ ms dispatches on the per-pass path)
        d["flow_bw_u16"] = jax.jit(flow_to_u16)
        d["aee"] = jax.jit(
            partial(
                compute_aee,
                res_aee=self.metrics_cfg.get("res_aee"),
                vertical_crop_aee=self.metrics_cfg.get("vertical_crop_aee"),
            )
        )
        return d

    def vstate_template(self):
        """The live slot state if initialized, else a fresh one (reducer
        construction needs a sharding template before the loop starts)."""
        return getattr(self, "vstate", None) or self.fresh_state()

    def reducer(self, name: str):
        return self._reducers[name]

    # ------------------------------------------------------------ state

    def fresh_state(self, old=None):
        if old is not None:
            # donating reset preserves the old state's placement
            return self._reset_jit(old)
        s = self._init_jit()
        if self.eval_mesh:
            from ..parallel.eval import shard_val_state

            return shard_val_state(s, self.eval_mesh,
                                   round_ts=self.val_cfg.round_ts)
        return s

    def reset_carry(self):
        carry = self.model.init_state(1, self.res[0], self.res[1])
        if self.inference_dtype is not None:
            # the programs return their carry in the compute dtype; an
            # f32-initialized carry would compile a SECOND full variant of
            # every step/window program just for the first pass after a
            # reset (measured: one extra ~100 s cold compile at DSEC
            # scale). Zeros are exact in either dtype.
            carry = jax.tree.map(
                lambda t: t.astype(self.inference_dtype), carry)
        self.carry = carry

    def start_sequence(self):
        """Sequence rollover: fresh carry + slot state, buffered passes of
        the old sequence dropped (they never reached a window boundary —
        the per-pass path would discard their updates at this same
        reset)."""
        self.reset_carry()
        if self.windowed:
            self.vstate_stale = True  # next window's program resets it
        else:
            self.vstate = self.fresh_state(self.vstate)
        self.passes_done = 0
        self.wbuf.clear()

    def ts_jump_flush(self):
        """Mid-window ts jump: buffered passes must land BEFORE the carry
        reset (the validation window continues across the jump); the
        window's remaining passes then run per-pass."""
        for b in list(self.wbuf):
            self.run_pass(b)
        self.wbuf.clear()
        self.reset_carry()

    def in_eval_time(self, ts) -> bool:
        if "eval_time" not in self.metrics_cfg:
            return True
        lo, hi = self.metrics_cfg["eval_time"]
        return lo <= ts <= hi

    # ------------------------------------------------------ bucket size

    def ensure_bucket(self, batch):
        """Fit a batch to the static event bucket: pad short batches; grow
        the bucket (re-jitting every program) when a batch overflows it."""
        n_batch = batch["event_list"].shape[1]
        if n_batch > self.criteria.n_events:
            # only reachable without a loader.n_events_pad cap: growing
            # the event axis re-jits the whole update program (minutes on
            # a cold TPU) — set a per-dataset cap (configs/eval_*.yml)
            import warnings

            warnings.warn(
                f"event bucket grew {self.criteria.n_events} -> {n_batch};"
                " recompiling the validation update. Set"
                " loader.n_events_pad to a static per-dataset cap to"
                " compile once.",
                stacklevel=2,
            )
            self.criteria = self.val_cls(self.val_cfg, 1, n_batch)
            self.vstate = grow_val_state(self.vstate, n_batch)
            self._init_jit = jax.jit(self.criteria.init)
            self._reset_jit = jax.jit(self.criteria.reset,
                                      donate_argnums=(0,))
            self._eval_step = self._make_step()
            self._window_step = self._make_window_step()
            self._reducers = self._make_reducers()
            self.wbuf[:] = [pad_batch_events(b, n_batch) for b in self.wbuf]
            return batch
        if n_batch < self.criteria.n_events:
            return pad_batch_events(batch, self.criteria.n_events)
        return batch

    # -------------------------------------------------------- dispatch

    def window_metrics(self, vstate, gtflow):
        """Window-boundary quantities computed INSIDE a jitted program
        (the ``extras`` hook of the step builders)."""
        out = {}
        if "RSAT" in self.metric_names and "FWL" in self.metric_names:
            # fused: both metrics from RSAT's two splats (RSAT identical,
            # FWL bitwise equal — metrics.compute_rsat_fwl); drops the two
            # 1-channel FWL window-event sweeps from the window program
            rsat, fwl = self.criteria.rsat_fwl(vstate)
            out["rsat"] = rsat[0]
            out["fwl"] = fwl
        elif "RSAT" in self.metric_names:
            out["rsat"] = self.criteria.rsat(vstate)[0]
        elif "FWL" in self.metric_names:
            out["fwl"] = self.criteria.fwl(vstate)
        if self.aee_in_program:
            flow_bw = (
                self.criteria.window_flow(vstate, mode="backward",
                                          mask=False)
                * self.passes
            )
            if self.vis.want("flow_bw"):
                # the map transfer (~40 ms D2H for 260x346) only pays off
                # when the vis path consumes it; AEE reads it on-device.
                # packed wire: ship the DSEC PNG lattice (half the bytes;
                # the store re-encodes to these exact values)
                out["flow_bw"] = (
                    flow_to_u16(flow_bw) if self.packed_wire else flow_bw
                )
            mask = None
            if self.metrics_cfg.get("mask_aee"):
                mask = self.criteria.window_events(vstate)
            out["aee"] = compute_aee(
                flow_bw, gtflow, event_mask=mask,
                res_aee=self.metrics_cfg.get("res_aee"),
                vertical_crop_aee=self.metrics_cfg.get("vertical_crop_aee"),
            )
        return out

    def run_pass(self, b, meta=None):
        """One fused forward+update dispatch (the per-pass path).

        On an in-``eval_time`` boundary pass (known host-side from the
        batch metadata) the fused-metrics specialization runs instead,
        returning the window quantities with the same dispatch."""
        if self.vstate_stale:
            self.vstate = self.fresh_state(self.vstate)
            self.vstate_stale = False
        ev_in = jnp.asarray(b["event_list"])
        raw_in = ridx_in = None
        if self.eval_mesh is not None or not self.packed_wire:
            pol_in = jnp.asarray(b["event_list_pol_mask"])
            if self.eval_mesh is not None:
                from ..parallel.eval import shard_eval_batch

                ev_in, pol_in = shard_eval_batch(ev_in, pol_in,
                                                 self.eval_mesh)
            x_in = jnp.asarray(b["net_input"])
            emask_in = jnp.asarray(b["event_mask"])
        else:
            # packed per-pass wire (step body derives / casts; exact):
            # pol masks and — in count mode — the event mask AND the
            # count net input stay home (the step derives all three from
            # the event list + optional raw coords / rectification
            # gather index)
            pol_in = None
            if self.voxel is not None:
                x_in = jnp.asarray(b["net_input"])
                emask_in = jnp.asarray(b["event_mask"])
            else:
                x_in = emask_in = None
                if "event_raw_xy" in b:
                    raw_in = jnp.asarray(b["event_raw_xy"])
                ridx_in = self.cur_ridx
        want = (
            self.pass_extras
            and meta is not None
            and self.passes_done + 1 == self.passes
            and self.in_eval_time(meta["ts"])
        )
        aux = (jnp.asarray(b["gtflow"])
               if (want and self.aee_in_program) else 0.0)
        out = self._eval_step(
            self.vstate, self.carry, self.params, x_in,
            ev_in, pol_in, emask_in,
            n_active=self.passes_done + 1, aux=aux, with_extras=want,
            raw=raw_in, ridx=ridx_in,
        )
        if want:
            self.vstate, self.carry, flow_fine, self.window_mets = out
        else:
            self.vstate, self.carry, flow_fine = out
        self.passes_done += 1
        return flow_fine

    def run_window(self, staged=None):
        """Dispatch the buffered GT window as one jitted program (the
        program resets the stale slot state itself — ``reset_first``).

        ``staged``: optional pre-stacked, pre-transferred device inputs
        from the producer thread (overlaps the stack + H2D wire time with
        the previous window's device compute); ignored unless its event
        width still matches the live bucket."""
        self.vstate_stale = False
        tm = self.tm
        raw = ridx = None
        if staged is not None and (
            (staged[1]["yxp"] if isinstance(staged[1], dict)
             else staged[1]).shape[2] == self.criteria.n_events
        ):
            xs, evs, pols, emasks, aux, raw, ridx = staged
        elif self.eval_mesh is None:
            with tm("window_assemble"):
                xs, evs, pols, emasks, aux, raw, ridx = self.stage_window(
                    self.wbuf, ridx=self.cur_ridx, rect=self.cur_rect)
        else:
            from ..parallel.eval import shard_eval_window

            with tm("window_assemble"):
                xs = jnp.asarray(
                    np.stack([b["net_input"] for b in self.wbuf]))
                emasks = jnp.asarray(
                    np.stack([b["event_mask"] for b in self.wbuf]))
                evs = np.stack([b["event_list"] for b in self.wbuf])
                pols = np.stack(
                    [b["event_list_pol_mask"] for b in self.wbuf])
                evs, pols = shard_eval_window(evs, pols, self.eval_mesh)
                aux = 0.0  # extras are off on the sharded path
        if self.probe_wire:
            # wire probe (runtime.probe_wire): decompose the dispatch
            # stall — is it the PREVIOUS window still executing, or this
            # window's staged H2D still in flight? Each drain is a
            # 1-element readback (one tunnel round trip, ~26 ms) that
            # blocks until its producer completes; bench-only.
            with tm("probe_prev_state_drain"):
                _drain_one(self.vstate)
            with tm("probe_staged_input_drain"):
                _drain_one(evs)
        with tm("window_call"):
            if self.use_extras:
                (self.vstate, self.carry, flow_fine,
                 self.window_mets) = self._window_step(
                    self.vstate, self.carry, self.params, xs, evs, pols,
                    emasks, aux, raw, ridx
                )
            else:
                self.vstate, self.carry, flow_fine = self._window_step(
                    self.vstate, self.carry, self.params, xs, evs, pols,
                    emasks, raw=raw, ridx=ridx
                )
        self.passes_done = self.passes
        self.wbuf.clear()
        return flow_fine

    def ingest(self, batch, meta) -> Optional[jax.Array]:
        """Feed one loader batch: window buffering on the fast path, a
        fused per-pass dispatch otherwise. Returns the finest-scale flow
        of the dispatched pass/window, or ``None`` while buffering."""
        if self.windowed and self.passes_done == 0:
            # buffer until the GT window is complete, then dispatch once
            self.wbuf.append(batch)
            if len(self.wbuf) == self.passes:
                with self.tm("window_dispatch"):
                    return self.run_window(meta.get("staged"))
            return None
        with self.tm("pass_dispatch"):
            return self.run_pass(batch, meta)

    # --------------------------------------------------------- staging

    def stage_window(self, bufs, ridx=None, rect=None):
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
        construction; 24.6 -> ~6 MB/window at DSEC scale). On top, the
        u32 event wire (``self.u32_wire``) replaces the ``[P,B,N,4]``
        f32 event list (+ raw coords) with f32 ts + ONE u32 per event;
        ``rect`` is the sequence's device-resident forward rectification
        map (``data.rectify_values``), which the program reads instead
        of shipping the host's lookups."""
        aux = (jnp.asarray(bufs[-1]["gtflow"])
               if (self.use_extras and self.aee_in_program) else 0.0)
        emasks = pols = raw = None
        xs = None
        if not self.packed_wire:
            xs = jnp.asarray(np.stack([b["net_input"] for b in bufs]))
            emasks = jnp.asarray(
                np.stack([b["event_mask"] for b in bufs]))
            pols = jnp.asarray(np.stack(
                [b["event_list_pol_mask"] for b in bufs]).astype(bool))
            return (xs, jnp.asarray(
                np.stack([b["event_list"] for b in bufs])),
                pols, emasks, aux, None, None)
        if self.voxel is not None:
            # voxel net input: fractional values (not exactly derivable
            # in f32) and the mask is not count-derived — ship both as-is
            xs = jnp.asarray(np.stack([b["net_input"] for b in bufs]))
            emasks = jnp.asarray(
                np.stack([b["event_mask"] for b in bufs]))
            ridx = None
        evs, raw = self._stage_events(bufs, rect)
        return (xs, evs, pols, emasks, aux, raw, ridx)

    def _stage_events(self, bufs, rect):
        """The staged window's event wire: u32-packed when exact, plain
        otherwise. Returns ``(evs_or_wire_dict, raw_or_None)``."""
        rectified = "event_raw_xy" in bufs[0]
        if self.u32_wire and self.voxel is None:
            from ..ops.encodings import pack_event_wire_np

            if rectified and rect is not None and not self.coord_flips:
                raw_np = np.stack([b["event_raw_xy"] for b in bufs])
                ts = np.stack([b["event_list"][..., 0] for b in bufs])
                p = np.stack([b["event_list"][..., 3] for b in bufs])
                yxp = pack_event_wire_np(raw_np[..., 0], raw_np[..., 1], p)
                return {"ts": jnp.asarray(ts), "yxp": jnp.asarray(yxp),
                        "rect": rect}, None
            if not rectified:
                ev = np.stack([b["event_list"] for b in bufs])
                if self._u32_ok is None:
                    c = ev[..., 1:3]
                    self._u32_ok = bool(
                        np.all(c == np.floor(c))
                        and c.min(initial=0.0) >= 0.0
                        and c[..., 1].max(initial=0.0) < 16384
                        and c[..., 0].max(initial=0.0) < 65536
                    )
                if self._u32_ok:
                    yxp = pack_event_wire_np(ev[..., 1], ev[..., 2],
                                             ev[..., 3])
                    return {"ts": jnp.asarray(ev[..., 0]),
                            "yxp": jnp.asarray(yxp)}, None
        evs = jnp.asarray(np.stack([b["event_list"] for b in bufs]))
        raw = None
        if rectified and self.voxel is None:
            # rectified fallback: fractional rectified coords in the
            # list; the count encoding derives from the raw integers
            raw = jnp.asarray(np.stack([b["event_raw_xy"] for b in bufs]))
        return evs, raw

    # ------------------------------------------------- boundary metrics

    def boundary_outputs(self, batch, meta):
        """At a window boundary (``passes_done == passes``): collect this
        window's metric outputs as DEVICE arrays (the in-program values
        when the dispatch fused them, the jitted reducers otherwise), then
        mark the slot state for reset.

        Returns ``(dev_mets, flow_bw)`` — both device-resident, both
        ``None`` when the protocol's ``eval_time`` gate skips the window.
        ``flow_bw`` (the vis map, packed u16 on the default wire) is split
        out so the caller can hand it straight to the vis writeback thread
        (whose worker performs the D2H) and defer/batch the scalar
        readbacks (``MetricsConsumer``) — nothing here blocks on the
        device."""
        tm = self.tm
        compute = self.in_eval_time(meta["ts"])
        dev_mets = None

        if compute and self.window_mets is not None:
            # metrics were computed inside the window program
            dev_mets = dict(self.window_mets)
        elif compute:
            # reducer path (event-sharded or growing buckets)
            with tm("mets_dispatch"):
                dev_mets = {}
                if (
                    self.gtflow_mode
                    and "AEE" in self.metric_names
                    and "gtflow" in batch
                ):
                    mask_aee = None
                    if self.metrics_cfg.get("mask_aee"):
                        mask_aee = self._reducers["window_events"](
                            self.vstate)
                    flow_bw = (
                        self._reducers["window_flow_bw"](self.vstate)
                        * self.passes
                    )
                    if self.vis.want("flow_bw"):
                        dev_mets["flow_bw"] = (
                            self._reducers["flow_bw_u16"](flow_bw)
                            if self.packed_wire else flow_bw
                        )
                    dev_mets["aee"] = self._reducers["aee"](
                        flow_bw, jnp.asarray(batch["gtflow"]),
                        event_mask=mask_aee,
                    )
                if ("RSAT" in self.metric_names
                        and "FWL" in self.metric_names):
                    # one fused dispatch (see window_metrics)
                    rsat, fwl = self._reducers["rsat_fwl"](self.vstate)
                    dev_mets["rsat"] = rsat[0]
                    dev_mets["fwl"] = fwl
                elif "RSAT" in self.metric_names:
                    dev_mets["rsat"] = self._reducers["rsat"](
                        self.vstate)[0]
                elif "FWL" in self.metric_names:
                    dev_mets["fwl"] = self._reducers["fwl"](self.vstate)

        self.window_mets = None
        if self.windowed:
            self.vstate_stale = True  # next window's program resets it
        else:
            self.vstate = self.fresh_state(self.vstate)
        self.passes_done = 0
        flow_bw = dev_mets.pop("flow_bw", None) if dev_mets else None
        return dev_mets, flow_bw

    def boundary_metrics(self, batch, meta) -> Optional[Dict]:
        """Synchronous form of :meth:`boundary_outputs`: one batched
        host readback of the window's metrics (each separate
        np.asarray/float would cost a full ~26 ms D2H round trip on the
        tunneled plugin). The returned dict includes ``flow_bw`` when the
        vis path wants it."""
        dev_mets, flow_bw = self.boundary_outputs(batch, meta)
        if dev_mets is None:
            return None
        if flow_bw is not None:
            dev_mets["flow_bw"] = flow_bw
        with self.tm("mets_readback"):
            return jax.device_get(dev_mets)

    # ----------------------------------------------------- vis readouts

    def vis_window_images(self) -> Dict[str, np.ndarray]:
        """Window/dynamic visualization slots the protocol asked for, as
        host arrays. Event-dim accessors go through the reducers
        (shard_map on the sharded path — raw criteria calls would splat
        sharded buffers); window_flow reads only replicated pixel-space
        accumulators and is safe raw."""
        out = {}
        if not self.vis.on:
            return out
        want, red = self.vis.want, self._reducers
        num = self.passes_done
        if self.passes > 1 and self.vis.dynamic:
            if want("events_dynamic"):
                out["events_dynamic"] = np.asarray(
                    red["window_events"](self.vstate))
            if want("iwe_fw_dynamic"):
                out["iwe_fw_dynamic"] = np.asarray(
                    red["window_iwe_fw"](self.vstate))
            if want("iwe_bw_dynamic"):
                out["iwe_bw_dynamic"] = np.asarray(
                    red["window_iwe_bw"](self.vstate))
            if want("flow_dynamic"):
                out["flow_dynamic"] = np.asarray(
                    self.criteria.window_flow(self.vstate, mode="forward"))
        if num > 1 and num == self.passes:
            if want("events_window"):
                out["events_window"] = np.asarray(
                    red["window_events"](self.vstate))
            if want("iwe_fw_window"):
                out["iwe_fw_window"] = np.asarray(
                    red["window_iwe_fw"](self.vstate))
            if want("iwe_bw_window"):
                out["iwe_bw_window"] = np.asarray(
                    red["window_iwe_bw"](self.vstate))
            if want("flow_window"):
                out["flow_window"] = np.asarray(
                    self.criteria.window_flow(self.vstate, mode="forward"))
        return out


def batch_stream(data, pipe: EvalPipeline):
    """Produce (batch, metadata) with all loader state snapshotted at
    production time, so a prefetch thread can run the stateful loader
    ahead of the device (the consumer loop never touches ``data``).

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
        pipe.windowed and pipe.eval_mesh is None
        and pipe.config["loader"].get("n_events_pad")
    )
    grouper = WindowGrouper(pipe.passes)
    ridx_dev = "unset"  # device-cached rectification gather index
    rect_dev = None  # device-cached forward rectification map (u32 wire)
    while True:
        b = data.next_batch()
        if b["ts_jump_reset"].any():
            data.clear_ts_jump()
        if ridx_dev == "unset" or b["new_seq"].any():
            # the lane's rectification mapping (and so its gather index
            # and forward map) changes only on sequence rollover; upload
            # once per sequence from the producer thread
            r = data.remap_indices()
            ridx_dev = jnp.asarray(r) if r is not None else None
            rect_dev = None
            if pipe.u32_wire and not pipe.coord_flips:
                rv = data.rectify_values()
                # batch-1 eval: the window program reads ONE map
                rect_dev = (jnp.asarray(rv[0])
                            if rv is not None and rv.shape[0] == 1
                            else None)
        meta = {
            "sequence": data.seq_name,
            "ts": data.last_proc_timestamp,
            "end_test": data.seq_num >= len(data.files),
            "bar_iters": data.get_iters(data.lanes[0]),
            "remap_idx": ridx_dev,
            "rect_map": rect_dev,
        }
        if stage and not meta["end_test"]:
            full = grouper.feed(
                b, bool(b["new_seq"].any()),
                bool(pipe.gtflow_mode and b["ts_jump_reset"].any()),
            )
            if full is not None:
                meta["staged"] = pipe.stage_window(full, ridx=ridx_dev,
                                                   rect=rect_dev)
        yield b, meta
        if meta["end_test"]:
            return
