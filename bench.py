"""Benchmark: event-warping throughput of the iterative contrast-max core.

Headline: the full jitted TBPTT window step (RecEVFlowNet scan + iterative
warp table + fused IWE splats + grad + Adam) at the reference's TRAINING
configuration — batch 8, 128x128, P=10 passes (reference ``README.md:147``:
batch size 8 was used for the paper experiments) — reported as warped-events
throughput in Mevents/s.

Secondary details cover every BASELINE.json config:
  * batch-1 train step (round-1 comparison point)
  * DSEC-Flow benchmark inference, 480x640 / gtflow window=0.1 / 10 passes
  * MVSEC eval protocol, 260x346 / gtflow window=1 / 1 pass

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

``vs_baseline`` is value / 100 Mevents/s — the north-star throughput target
from BASELINE.json (the reference publishes no numbers of its own;
BASELINE.md documents that gap).
"""

import json
import time

import numpy as np


def _code_state_digest() -> str:
    """12-hex digest of the COMPUTE-RELEVANT code state.

    Used to key the persistent XLA cache dir so two code versions can
    never share serialized executables (see main()). Content-hashes the
    package sources plus this file — the inputs that determine every
    traced program — rather than git HEAD, so doc/test/script commits
    don't force a cold recompile while any model/op/bench change does.
    The jax/jaxlib versions are folded in too: a library upgrade changes
    the compiler, and reusing the old dir would cross the same trust
    boundary the round-4 stale-executable incident proved unreliable."""
    import hashlib
    import pathlib

    import jax
    import jaxlib

    root = pathlib.Path(__file__).resolve().parent
    h = hashlib.sha256()
    h.update(f"jax={jax.__version__} jaxlib={jaxlib.__version__}".encode())
    files = sorted(root.glob("taming_event_flow_tpu/**/*.py"))
    files.append(root / "bench.py")
    for p in files:
        h.update(str(p.relative_to(root)).encode())
        h.update(p.read_bytes())
    return h.hexdigest()[:12]


def _sync(out):
    """True device-completion sync: host readback of one element.

    block_until_ready returns at dispatch on this remote-TPU stack (verified
    by profiler trace), so all timing uses an explicit readback barrier.
    """
    import jax

    leaves = [l for l in jax.tree.leaves(out) if hasattr(l, "dtype")]
    np.asarray(jax.device_get(leaves[0].ravel()[:1]))


def _synthetic_events(rng, shape, res):
    """[..., N, 4] (ts, y, x, p) event tensor + [..., N, 2] polarity mask."""
    import jax.numpy as jnp

    ev = np.zeros(shape + (4,), np.float32)
    ev[..., 0] = rng.uniform(0, 1, shape)
    ev[..., 1] = rng.integers(0, res[0], shape)
    ev[..., 2] = rng.integers(0, res[1], shape)
    ev[..., 3] = rng.choice([-1.0, 1.0], shape)
    pol = np.stack([(ev[..., 3] > 0), (ev[..., 3] < 0)], -1)
    return jnp.asarray(ev), jnp.asarray(pol, jnp.float32)


# TPU v5e (1 chip) hardware ceilings, the denominators for ``mfu`` /
# ``bandwidth_util``: 197 TFLOP/s bf16 MXU peak, 819 GB/s HBM bandwidth.
V5E_PEAK_BF16_FLOPS = 197e12
V5E_HBM_BYTES_PER_S = 819e9


def bench_eval_protocol(res, passes, n_events, iters=30, full_vis=True,
                        inference_dtype=None, with_metrics=False):
    """Model forward + Iterative validation update at an eval protocol's
    shapes, one jitted program per GT WINDOW (``make_eval_window_step`` —
    the eval CLI's recorded-protocol path: all P pass bodies unrolled in a
    single dispatch, window-boundary reset folded into the program via
    ``reset_first`` — one dispatch per window TOTAL). Covers both DSEC
    (480x640, 10 passes) and MVSEC (260x346, 1 pass). Reports per-pass
    latency and GT-frames/s.

    ``full_vis=False`` is the DSEC submission configuration
    (``configs/eval_dsec.yml`` shows only ``flow_bw``; the fw-propagated
    maps and the per-pass backward re-warp feed nothing on that path — see
    ``ValConfig.track_fw_prop`` / ``track_bw``).

    ``inference_dtype`` mirrors ``metrics.inference_dtype`` — the DSEC
    submission config defaults to bfloat16 (model forward only; warping and
    metrics stay f32 — bounded-delta study in README).

    ``with_metrics=True`` measures the protocol's FULL device window — the
    window program with the in-program boundary metrics the eval CLI fuses
    (accumulated flow_bw + DSEC u16 pack + AEE + fused RSAT/FWL,
    ``pipeline.eval.EvalPipeline.window_metrics``) — the honest device cost
    per GT window, not just the forward+update chain."""
    import jax
    import jax.numpy as jnp

    from taming_event_flow_tpu.models import RecEVFlowNet
    from taming_event_flow_tpu.metrics import (
        IterativeValidation, ValConfig, compute_aee)
    from taming_event_flow_tpu.training import make_eval_window_step
    from taming_event_flow_tpu.utils.visualization import flow_to_u16

    model = RecEVFlowNet(num_bins=2)
    carry = model.init_state(1, res[0], res[1])
    x = jnp.zeros((1, res[0], res[1], 2), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x, carry)["params"]

    val = IterativeValidation(
        ValConfig(res=res, passes=passes, track_fw_prop=full_vis,
                  track_bw=full_vis),
        1, n_events)

    extras = None
    if with_metrics:
        def extras(vstate, gtflow):
            rsat, fwl = val.rsat_fwl(vstate)
            flow_bw = val.window_flow(
                vstate, mode="backward", mask=False) * passes
            return {"rsat": rsat[0], "fwl": fwl,
                    "flow_bw": flow_to_u16(flow_bw),
                    "aee": compute_aee(flow_bw, gtflow)}

    step = make_eval_window_step(model, val, reset_first=True,
                                 inference_dtype=inference_dtype,
                                 extras=extras)
    init = jax.jit(val.init)
    vstate = init()

    rng = np.random.default_rng(0)
    ev, pol = _synthetic_events(rng, (passes, 1, n_events), res)
    xs = jnp.zeros((passes, 1, res[0], res[1], 2), jnp.float32)
    emasks = jnp.ones((passes, 1, res[0], res[1], 1), jnp.float32)
    gt = jnp.asarray(rng.normal(size=(1, res[0], res[1], 2)), jnp.float32)

    def run(vstate, carry):
        if with_metrics:
            vstate, carry, _, mets = step(vstate, carry, params, xs, ev,
                                          pol, emasks, gt)
        else:
            vstate, carry, _ = step(vstate, carry, params, xs, ev, pol,
                                    emasks)
            mets = None
        return vstate, carry, mets

    # warmup / compile one full window
    vstate, carry, mets = run(vstate, carry)
    _sync(vstate.fw_loc)

    # best-of-3 timing loops: host dispatch cost still leaks into the
    # number under host CPU contention (1-core host); the min reflects the
    # device's actual streaming capability
    n_windows = max(1, iters // passes)
    per_pass = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n_windows):
            # window boundary: the program resets the stale state itself
            vstate, carry, mets = run(vstate, carry)
        if mets is not None:
            _sync(mets["aee"])
        _sync(vstate.fw_loc)
        per_pass = min(
            per_pass,
            (time.perf_counter() - t0) / (n_windows * passes),
        )
    out = {
        "pass_ms": round(per_pass * 1e3, 2),
        "gt_frames_per_s": round(1.0 / (passes * per_pass), 2),
        "model_passes_per_s": round(1.0 / per_pass, 1),
        "events_per_pass": n_events,
    }
    if with_metrics:
        out["window_ms"] = round(per_pass * passes * 1e3, 2)
        out["in_program_metrics"] = ["AEE", "RSAT", "FWL", "flow_bw_u16"]
    if inference_dtype is not None:
        out["inference_dtype"] = str(np.dtype(inference_dtype).name)
    return out


def _cost_analysis(lowered):
    ca = lowered.compile().cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    return float(ca.get("flops", 0.0)), float(ca.get("bytes accessed", 0.0))


def bench_train(batch, res=(128, 128), passes=10, n_events=8192, iters=10,
                unrolled_twin=False):
    """Full jitted TBPTT window step at the training configuration.

    ``unrolled_twin=True`` additionally compiles and times the SAME step with
    every pass scan fully unrolled (``LossConfig.scan_unroll = passes`` —
    identical math, no ``while`` ops). Two reasons:

    * XLA's ``HloCostAnalysis`` counts while-loop bodies ONCE, with no
      trip-count multiplication, so the scan executable's own cost analysis
      underreports the step's work by ~(P-1) scan bodies. The unrolled twin's
      flop count IS the step's true executed-flop count (flops are invariant
      to unrolling; remat recomputation included either way) — the honest
      numerator for ``mfu`` at the scan step's measured wall time.
    * The twin's bytes/s at its OWN wall time locates the step against the
      HBM roofline: measured ~93% of peak (r4). The shipped scan formulation
      beats that roofline-saturated executable's wall clock by moving fewer
      bytes (loop-invariant operands stay resident instead of being
      re-materialized per unrolled pass), which is the quantified form of
      "the remaining headroom is structural, not unclaimed".
    """
    import jax.numpy as jnp

    from taming_event_flow_tpu.models import RecEVFlowNet
    from taming_event_flow_tpu.objectives import LossConfig
    from taming_event_flow_tpu.training import build_optimizer, make_train_step
    from taming_event_flow_tpu.training.step import init_train_state

    model = RecEVFlowNet(num_bins=2, final_w_scale=0.01)
    cfg = LossConfig(res=res, passes_loss=passes, scales_loss=1,
                     iterative_mode="two")
    opt = build_optimizer({"name": "Adam", "lr": 1e-5}, clip_grad=100.0)
    state = init_train_state(model, opt, batch, res[0], res[1], 2)
    step = make_train_step(model, opt, cfg, "Iterative", flow_scaling=32.0)

    rng = np.random.default_rng(0)
    ev, pol = _synthetic_events(rng, (passes, batch, n_events), res)
    window = {
        "net_input": jnp.asarray(
            rng.normal(size=(passes, batch, res[0], res[1], 2)),
            jnp.float32,
        ),
        "event_list": ev,
        "pol_mask": pol,
        "grad_mask": jnp.ones((passes, batch, n_events, 1), jnp.float32),
    }

    # compiled-program cost analysis of the executable the timing loop runs
    # (known undercount for scans — see ``unrolled_twin``)
    flops, bytes_accessed = _cost_analysis(step.lower(state, window))

    twin = None
    if unrolled_twin:
        cfg_u = cfg._replace(scan_unroll=passes)
        step_u = make_train_step(model, opt, cfg_u, "Iterative",
                                 flow_scaling=32.0, donate=False)
        flops_u, bytes_u = _cost_analysis(step_u.lower(state, window))
        _, loss_u = step_u(state, window)
        _sync(loss_u)
        best_u = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(3):
                _, loss_u = step_u(state, window)
            _sync(loss_u)
            best_u = min(best_u, (time.perf_counter() - t0) / 3)
        twin = {"flops": flops_u, "bytes": bytes_u, "dt": best_u}

    # warmup / compile
    state, loss = step(state, window)
    _sync(loss)

    t0 = time.perf_counter()
    for _ in range(iters):
        state, loss = step(state, window)
    _sync(loss)
    dt = (time.perf_counter() - t0) / iters

    # events warped per optimizer step: P windows x N events, each warped
    # through ~P flow maps (fw+bw), across 4 flow scales
    warps_per_step = passes * n_events * batch * passes * 4
    return dt, warps_per_step / dt / 1e6, flops, bytes_accessed, twin


def pallas_correctness_check():
    """Compile + run every Pallas kernel shape class ON THE CHIP and compare
    against the XLA formulations (interpret mode is NOT a lowering check —
    Mosaic rejects programs it accepts; this gates the round's bench on the
    real lowering). Returns "ok" or the failure string."""
    import jax
    import jax.numpy as jnp

    from taming_event_flow_tpu.ops import (
        gather_values,
        set_warp_backend,
        splat_values,
    )
    from taming_event_flow_tpu.ops.precision import set_matmul_precision

    try:
        set_matmul_precision("highest")
        rng = np.random.default_rng(1)
        outs = {}
        # (res, m, c): small-map C=4 (train IWE), large-map C=2 (eval),
        # non-tile-aligned odd shape
        cases = [((128, 128), 4096, 4), ((480, 640), 4096, 2),
                 ((200, 300), 1000, 2)]
        for backend in ("xla", "pallas"):
            set_warp_backend(backend)
            acc = []
            for res, m, c in cases:
                # strictly fractional coordinates: at EXACT integer coords
                # (reachable via f32 rounding of the uniform) the dense
                # stencil's |d| = 1 ties carry ±0.5 subgradients from
                # neighbor rows the 4-tap formulation does not touch — a
                # measure-zero convention difference that never reaches a
                # real gradient (event inputs are leaves; warped positions
                # are a.s. fractional)
                base_y = rng.integers(-2, res[0], (2, m))
                base_x = rng.integers(-2, res[1], (2, m))
                fy = rng.uniform(0.05, 0.95, (2, m))
                fx = rng.uniform(0.05, 0.95, (2, m))
                loc = jnp.asarray(
                    np.stack([base_y + fy, base_x + fx], -1), jnp.float32)
                vals = jnp.asarray(rng.normal(size=(2, m, c)), jnp.float32)
                maps = jnp.asarray(
                    rng.normal(size=(2, res[0], res[1], c)), jnp.float32)

                def f(l, v, mp, res=res):
                    s = splat_values(l, v, res)
                    g = gather_values(mp, l)
                    return jnp.sum(s * s) + jnp.sum(g * g)

                val, grads = jax.jit(
                    jax.value_and_grad(f, argnums=(0, 1, 2))
                )(loc, vals, maps)
                acc.append((np.asarray(val),
                            [np.asarray(g) for g in grads]))
            outs[backend] = acc
            # fresh inputs per backend loop would break comparison; rewind
            rng = np.random.default_rng(1)
        for (vx, gx), (vp, gp) in zip(outs["xla"], outs["pallas"]):
            dv = abs(vx - vp) / (abs(vx) + 1e-9)
            dg = max(
                np.max(np.abs(a - b)) / (np.max(np.abs(a)) + 1e-9)
                for a, b in zip(gx, gp)
            )
            if dv > 1e-4 or dg > 1e-4:
                return f"numerical divergence dv={dv:.2e} dg={dg:.2e}"
        return "ok"
    except Exception as e:  # lowering/compile failures must fail LOUDLY
        return f"{type(e).__name__}: {e}"
    finally:
        set_matmul_precision("default")
        set_warp_backend("auto")


def sharded_lowering_check():
    """Compile + run the sharded programs ON THE CHIP with a 1-device mesh.

    All ``shard_map``/GSPMD programs are numerics-validated on the virtual
    8-CPU mesh (tests/, dryrun) — but CPU passing says nothing about the
    TPU lowering (Mosaic has rejected programs interpret/CPU accepted —
    CLAUDE.md), and Pallas kernels inside a shard_map partition are exactly
    the risky class. A (data=1, event=1) mesh keeps the program structure
    (shard_map, collectives, partitioned Pallas calls) while fitting one
    chip. Returns "ok" or the failure string."""
    import jax
    import jax.numpy as jnp

    try:
        from taming_event_flow_tpu.metrics import (
            IterativeValidation,
            ValConfig,
        )
        from taming_event_flow_tpu.models import RecEVFlowNet
        from taming_event_flow_tpu.objectives import LossConfig
        from taming_event_flow_tpu.parallel import (
            make_event_mesh,
            make_event_parallel_train_step,
            shard_state_2d,
            shard_window_2d,
        )
        from taming_event_flow_tpu.parallel.eval import (
            make_eval_mesh,
            make_sharded_reducers,
            shard_eval_batch,
            shard_val_state,
        )
        from taming_event_flow_tpu.training import build_optimizer
        from taming_event_flow_tpu.training.step import init_train_state

        rng = np.random.default_rng(0)

        # 2-D-mesh shard_map train step (tiny shapes; structure == dryrun's)
        res, passes, n_ev, batch = (32, 32), 2, 256, 1
        model = RecEVFlowNet(num_bins=2, base_channels=8, num_encoders=2)
        cfg = LossConfig(res=res, passes_loss=passes, scales_loss=1,
                         iterative_mode="two")
        opt = build_optimizer({"name": "Adam", "lr": 1e-5}, clip_grad=100.0)
        state = init_train_state(model, opt, batch, res[0], res[1], 2)
        ev, pol = _synthetic_events(rng, (passes, batch, n_ev), res)
        window = {
            "net_input": jnp.asarray(
                rng.normal(size=(passes, batch, res[0], res[1], 2)),
                jnp.float32),
            "event_list": ev,
            "pol_mask": pol,
            "grad_mask": jnp.ones((passes, batch, n_ev, 1), jnp.float32),
        }
        mesh = make_event_mesh(1, 1)
        step = make_event_parallel_train_step(model, opt, cfg, mesh,
                                              "Iterative", flow_scaling=32.0)
        st, loss = step(shard_state_2d(state, mesh),
                        shard_window_2d(window, mesh))
        if not np.isfinite(float(loss)):
            return f"train step loss not finite: {float(loss)}"

        # event-sharded eval update + shard_map reducers
        vres, vpasses, n = (48, 64), 2, 128
        val = IterativeValidation(ValConfig(res=vres, passes=vpasses), 1, n)
        emesh = make_eval_mesh(1)
        vstate = shard_val_state(val.init(), emesh)
        update = jax.jit(val.update)
        evv, polv = _synthetic_events(rng, (1, n), vres)
        flow = jnp.asarray(
            rng.normal(size=(1, *vres, 2)), jnp.float32) * 2.0
        emask = jnp.ones((1, *vres, 1), jnp.float32)
        for _ in range(vpasses):
            ev_s, pol_s = shard_eval_batch(evv, polv, emesh)
            vstate = update(vstate, flow, ev_s, pol_s, emask)
        red = make_sharded_reducers(val, emesh, vstate)
        fwl = float(red["fwl"](vstate))
        rsat = float(np.asarray(red["rsat"](vstate))[0])
        if not (np.isfinite(fwl) and np.isfinite(rsat)):
            return f"eval reducers not finite: fwl={fwl} rsat={rsat}"
        return "ok"
    except Exception as e:  # lowering/compile failures must fail LOUDLY
        return f"{type(e).__name__}: {e}"


# Previous round's recorded headline (BENCH_r04.json): the regression guard
# fails the bench (nonzero exit) on a silent >5% throughput drop.
PREV_ROUND_MEVENTS = 117.74


def main():
    import sys

    import jax

    # persistent compilation cache: bench wall time is dominated by the
    # 4-5 big program compiles (~25 min first run on this host); repeat
    # runs — including the next round's driver invocation on the same
    # machine — deserialize instead. Timed regions are unaffected (every
    # bench warms up before its timing loop).
    #
    # The dir is keyed on the CODE STATE (a content hash of the package
    # sources + bench.py + the jax/jaxlib versions — NOT git state): a
    # shared dir was observed (round 4) to deserialize a STALE executable
    # for a freshly-traced program after a model change — metadata citing
    # deleted source files — silently timing the wrong program. A fresh
    # dir per code state makes that class of corruption impossible at the
    # cost of one cold compile after each code change.
    jax.config.update("jax_compilation_cache_dir",
                      f"/tmp/bench_xla_cache_{_code_state_digest()}")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    # gates: every Pallas kernel must still lower + run on the real chip,
    # and the shard_map/GSPMD programs must lower for TPU (1-device mesh)
    pallas_ok = pallas_correctness_check()
    sharded_ok = sharded_lowering_check()

    # eval protocols FIRST: running them after the train benches in the
    # same process measures ~1.5-2 ms/pass slower at DSEC scale (allocator
    # state from the donated train buffers), which is not what the eval
    # CLIs experience
    # DSEC-Flow benchmark inference = the submission path (flow_bw only,
    # bf16 model forward per configs/eval_dsec.yml)
    import jax.numpy as jnp

    dsec = bench_eval_protocol((480, 640), passes=10, n_events=32768,
                               full_vis=False, inference_dtype=jnp.bfloat16)
    # the submission protocol's FULL device window (in-program AEE/RSAT/FWL
    # + u16-packed flow_bw — what the eval CLI actually dispatches)
    dsec_proto = bench_eval_protocol(
        (480, 640), passes=10, n_events=32768, full_vis=False,
        inference_dtype=jnp.bfloat16, with_metrics=True)
    mvsec = bench_eval_protocol((260, 346), passes=1, n_events=16384)

    # headline: the reference's training config (batch 8 per README.md:147)
    dt8, mev8, flops8, bytes8, twin = bench_train(batch=8,
                                                  unrolled_twin=True)
    dt1, mev1, _, _, _ = bench_train(batch=1)

    # hardware-ceiling utilization of the headline step (one-hot warp
    # matmuls count as FLOPs — XLA's accounting of the executable as built):
    #   mfu            — TRUE executed flops (the unrolled twin's count;
    #                    flops are unroll-invariant) over the measured scan
    #                    step time, vs the v5e bf16 MXU peak
    #   bandwidth_util — the scan executable's own cost analysis (while
    #                    bodies counted once -> a LOWER bound on traffic)
    #   unrolled_twin  — same math, no whiles, at its own wall time: where
    #                    this step's byte budget sits against the HBM
    #                    roofline (~93% measured; the scan formulation wins
    #                    wall-clock by moving fewer bytes)
    mfu = twin["flops"] / dt8 / V5E_PEAK_BF16_FLOPS
    bandwidth_util = bytes8 / dt8 / V5E_HBM_BYTES_PER_S

    # regression guard (VERDICT r4 item 7): a silent perf regression or a
    # broken kernel/sharding lowering must not ride a green rc 0
    guard = {
        "prev_round_mevents": PREV_ROUND_MEVENTS,
        "min_allowed": round(0.95 * PREV_ROUND_MEVENTS, 2),
        "throughput_ok": mev8 >= 0.95 * PREV_ROUND_MEVENTS,
        "pallas_ok": pallas_ok == "ok",
        "sharded_lowering_ok": sharded_ok == "ok",
    }
    guard["ok"] = all(
        guard[k] for k in ("throughput_ok", "pallas_ok",
                           "sharded_lowering_ok")
    )

    print(json.dumps({
        "metric": "iterative_cm_train_warp_throughput",
        "value": round(mev8, 2),
        "unit": "Mevents/s",
        "vs_baseline": round(mev8 / 100.0, 3),
        "detail": {
            "pallas_correctness": pallas_ok,
            "sharded_lowering": sharded_ok,
            "regression_guard": guard,
            "train_step_ms": round(dt8 * 1e3, 2),
            "mfu": round(mfu, 4),
            "bandwidth_util": round(bandwidth_util, 4),
            "achieved_tflops": round(twin["flops"] / dt8 / 1e12, 2),
            "achieved_gbps": round(bytes8 / dt8 / 1e9, 1),
            "hw_peaks": {"bf16_tflops": V5E_PEAK_BF16_FLOPS / 1e12,
                         "hbm_gbps": V5E_HBM_BYTES_PER_S / 1e9},
            "unrolled_twin": {
                "step_ms": round(twin["dt"] * 1e3, 2),
                "flops": twin["flops"],
                "bytes": twin["bytes"],
                "hbm_util_at_own_time": round(
                    twin["bytes"] / twin["dt"] / V5E_HBM_BYTES_PER_S, 4),
            },
            "res": [128, 128],
            "passes": 10,
            "batch": 8,
            "events_per_window": 8192,
            "samples_per_s": round(8.0 / dt8, 2),
            "train_b1": {
                "train_step_ms": round(dt1 * 1e3, 2),
                "mevents_per_s": round(mev1, 2),
            },
            "device": str(jax.devices()[0]),
            "dsec_480x640_inference": dsec,
            "dsec_480x640_protocol": dsec_proto,
            "mvsec_260x346_eval": mvsec,
        },
    }))
    if not guard["ok"]:
        sys.exit(1)


if __name__ == "__main__":
    main()
