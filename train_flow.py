"""Training entry point for self-supervised event-based optical flow.

Same CLI surface as the reference trainer (reference
``train_flow.py:161-186``)::

    python train_flow.py [--config configs/train_flow.yml]
                         [--path_mlflow DIR] [--path_cache DIR]
                         [--prev_runid RUNID]

Pipeline (reference ``train_flow.py:16-158``, re-architected): the loader
streams per-lane windows on the host; every ``passes_loss`` windows are
stacked and shipped to the device once, where ONE jitted program runs the
recurrent model over all passes, evaluates the iterative contrast-max loss,
backprops, clips, and applies Adam. Sequence changes zero the affected
lanes' recurrent carry and restart the loss window (the reference resets all
state globally, ``train_flow.py:83-87``).
"""

import argparse

import numpy as np

import jax
import jax.numpy as jnp

from taming_event_flow_tpu.configs import YAMLParser
from taming_event_flow_tpu.data import H5Loader
from taming_event_flow_tpu.models import build_model
from taming_event_flow_tpu.objectives import LossConfig
from taming_event_flow_tpu import tracking
from taming_event_flow_tpu.tracking import save_checkpoint, load_checkpoint
from taming_event_flow_tpu.training import (
    build_optimizer,
    make_train_step,
    reset_carry,
)
from taming_event_flow_tpu.training.step import TrainState, init_train_state
from taming_event_flow_tpu.training.window import stack_window
from taming_event_flow_tpu.parallel import make_mesh, shard_state, shard_window


def effective_passes(config) -> int:
    """Mode "four" doubles the loss window (the reference mutates the config
    inside the loss ctor, ``loss/flow.py:422-423``; we do it explicitly)."""
    p = config["data"]["passes_loss"]
    if (
        config["loss"].get("warping") == "Iterative"
        and config["loss"].get("iterative_mode") == "four"
    ):
        p *= 2
    return p


def train(args, config_parser: YAMLParser):
    config = config_parser.config

    # multi-host runtime (SURVEY §5 distributed-backend plan): must precede
    # any jax backend touch; no-op without a ``parallel`` coordinator config
    from taming_event_flow_tpu.parallel import init_distributed

    par_cfg = config.get("parallel", {}) or {}
    multihost = init_distributed(par_cfg)
    is_main = (not multihost) or jax.process_index() == 0

    tracking.set_tracking_uri(args.path_mlflow)
    tracking.set_experiment(config["experiment"])
    if is_main:
        run = tracking.start_run()
        runid = run.info.run_id
        tracking.log_params({k: str(v) for k, v in config.items()})
        tracking.log_params({"prev_runid": args.prev_runid})
    else:
        # non-main hosts stream data and compute; all tracking/checkpoint
        # writes stay on process 0 (its store is the canonical run)
        runid = f"proc{jax.process_index()}"
    config = config_parser.combine_entries(config)
    config_parser.apply_runtime(config)
    print("Run id:", runid)

    # observability: git-diff snapshot + TensorBoard mirror (reference
    # ``train_flow.py:36-37``)
    from taming_event_flow_tpu.utils import StepMeter, save_diff
    from taming_event_flow_tpu.tracking.tensorboard import TensorBoardMirror

    meter = StepMeter()
    tb = None
    if is_main:
        save_diff("train_diff.txt")
        tb = TensorBoardMirror(runid)

    res = tuple(config["loader"]["resolution"])
    batch_size = config["loader"]["batch_size"]
    passes = effective_passes(config)
    num_bins = 2 if config["data"]["voxel"] is None else config["data"]["voxel"]

    # multi-host: every process streams only its own slice of the global
    # batch lanes AND its own round-robin shard of the (identically
    # permuted) file list — host-local rollover/epoch accounting with
    # disjoint coverage (data/h5.py H5Loader docstring)
    local_batch = batch_size
    lane_lo = 0
    file_shard = None
    if multihost:
        from taming_event_flow_tpu.parallel import local_lane_range

        if config["loader"].get("seed") is None:
            raise ValueError(
                "multi-host training needs loader.seed so every host sees "
                "the same file permutation"
            )
        if not config["loader"].get("n_events_pad"):
            raise ValueError(
                "multi-host training needs loader.n_events_pad: without a "
                "static event cap each host buckets its windows to its own "
                "local max (data/base.py collate), the per-host program "
                "shapes diverge, and the cross-host gradient psum deadlocks"
            )
        lane_lo, lane_hi = local_lane_range(batch_size)
        local_batch = lane_hi - lane_lo
        config["loader"] = dict(config["loader"], batch_size=local_batch)
        file_shard = (jax.process_index(), jax.process_count())

    data = H5Loader(config, shuffle=True, path_cache=args.path_cache,
                    lane_offset=lane_lo, file_shard=file_shard)

    from taming_event_flow_tpu.ops.precision import set_matmul_precision

    set_matmul_precision(config["loss"].get("matmul_precision", "default"))
    from taming_event_flow_tpu.ops import set_warp_backend

    set_warp_backend(config["loss"].get("warp_backend", "auto"))

    model = build_model(dict(config["model"]), num_bins=num_bins)
    loss_cfg = LossConfig(
        res=res,
        passes_loss=passes,
        scales_loss=config["data"]["scales_loss"],
        iterative_mode=config["loss"].get("iterative_mode", "two"),
        round_ts=config["loss"].get("round_ts", False),
        flow_spat_smooth_weight=config["loss"].get("flow_spat_smooth_weight"),
        flow_temp_smooth_weight=config["loss"].get("flow_temp_smooth_weight"),
        warp_remat=bool(config["loss"].get("warp_remat", False)),
        scan_unroll=int(config["loss"].get("scan_unroll", 1)),
        batched_sweep=bool(config["loss"].get("batched_sweep", False)),
        triangular_warp=bool(config["loss"].get("triangular_warp", True)),
    )
    optimizer = build_optimizer(
        config["optimizer"], clip_grad=config["loss"].get("clip_grad")
    )
    state = init_train_state(
        model, optimizer, local_batch, res[0], res[1], num_bins,
        rng_key=jax.random.PRNGKey(config["loader"].get("seed") or 0),
    )

    # warm start (reference ``train_flow.py:63``; we also restore Adam moments)
    epoch = 0
    if args.prev_runid:
        template = {
            "params": state.params, "opt_state": state.opt_state,
            "step": np.int64(0), "epoch": np.int64(0),
        }
        restored, epoch = load_checkpoint(args.prev_runid, template)
        if restored is not None:
            # commit the restored (numpy) trees to the device ONCE: numpy
            # leaves passed to jit force the slow python dispatch path and
            # re-upload params + Adam moments on EVERY step (the mesh paths
            # below re-place the state with their own shardings anyway)
            state = TrainState(
                jax.device_put(restored["params"]),
                jax.device_put(restored["opt_state"]), state.carry,
                jnp.asarray(restored["step"]),
            )
            # replay prior loss history into the new run
            # (reference ``utils/utils.py:33-44``)
            if is_main:
                from taming_event_flow_tpu.tracking.store import default_store

                for _, v, s in default_store().read_metric(
                    args.prev_runid, "loss"
                ):
                    tracking.log_metric("loss", v, step=s)
                    tb.add_scalar("loss", v, s)
    data.epoch = epoch

    # device mesh: config-driven 2-D (data x event) shape, else auto-DP
    n_dev = len(jax.devices())
    n_event = int(par_cfg.get("event") or 1)
    mesh = None
    event_mesh = None
    if multihost:
        from taming_event_flow_tpu.parallel import (
            globalize_state,
            make_event_parallel_train_step,
            make_multihost_event_mesh,
        )

        # DCN-aware global mesh: the event axis stays host-internal so its
        # per-window IWE psums ride ICI; only the gradient reduction spans
        # hosts. n_event = 1 degenerates to pure multi-host data parallel.
        event_mesh = make_multihost_event_mesh(n_event)
        n_data = n_dev // n_event
        if batch_size % n_data:
            raise ValueError(
                f"batch_size {batch_size} not divisible by data axis {n_data}"
            )
        n_pad = config["loader"]["n_events_pad"]  # required above
        if n_event > 1 and n_pad % n_event:
            raise ValueError(
                f"n_events_pad {n_pad} not divisible by event axis {n_event}"
            )
        state = globalize_state(state, event_mesh, batch_size)
        print(
            f"Multi-host (data={n_data}, event={n_event}) mesh over "
            f"{jax.process_count()} hosts x {jax.local_device_count()} "
            "devices"
        )
    elif n_event > 1:
        from taming_event_flow_tpu.parallel import (
            make_event_mesh,
            make_event_parallel_train_step,
            shard_state_2d,
            shard_window_2d,
        )

        n_data = int(par_cfg.get("data") or (n_dev // n_event))
        if batch_size % n_data:
            raise ValueError(
                f"batch_size {batch_size} not divisible by data axis {n_data}"
            )
        # event buckets are powers of two (data/base.py); a non-power-of-two
        # event axis would fail inside shard_map mid-training instead
        n_pad = config["loader"].get("n_events_pad")
        if n_pad:
            if n_pad % n_event:
                raise ValueError(
                    f"n_events_pad {n_pad} not divisible by event axis "
                    f"{n_event}"
                )
        elif n_event & (n_event - 1):
            raise ValueError(
                f"event axis {n_event} must be a power of two when "
                "loader.n_events_pad is unset (windows pad to power-of-two "
                "buckets)"
            )
        event_mesh = make_event_mesh(n_data, n_event)
        state = shard_state_2d(state, event_mesh)
        print(f"(data={n_data}, event={n_event}) mesh over "
              f"{n_data * n_event} devices")
    elif n_dev > 1 and batch_size % n_dev == 0:
        mesh = make_mesh()
        state = shard_state(state, mesh)
        print(f"Data-parallel mesh over {n_dev} devices")

    if event_mesh is not None:
        step_fn = make_event_parallel_train_step(
            model, optimizer, loss_cfg, event_mesh,
            warping=config["loss"].get("warping", "Iterative"),
            flow_scaling=config["loss"].get("flow_scaling", 32),
        )
    else:
        step_fn = make_train_step(
            model, optimizer, loss_cfg,
            warping=config["loss"].get("warping", "Iterative"),
            flow_scaling=config["loss"].get("flow_scaling", 32),
            res=tuple(res),
        )

    n_epochs = config["loader"]["n_epochs"]

    def window_stream():
        """Producer: owns ALL loader state; yields ordered stream events.

        ("reset", mask)      — lanes changed sequence; zero their carry and
                               drop the partial loss window (the reference
                               resets globally, ``train_flow.py:83-87``)
        ("epoch_end", e, n)  — epoch ``e`` finished after ``n`` stepped
                               loss windows (the reference increments
                               ``data.samples`` once per optimizer step,
                               inside the ``num_passes >= passes_loss``
                               guard — ``train_flow.py:119-121``)
        ("window", w, meta)  — a full pass-stacked window. On the
                               single-device path the producer also starts
                               the window's H2D transfers (async
                               ``jnp.asarray`` from the prefetch thread),
                               so the wire time overlaps the in-flight
                               train step; mesh/multihost paths place
                               windows with their own shardings and stay
                               host-side here.
        """
        device_stage = not multihost and mesh is None and event_mesh is None
        # packed wire format on the staged path (stack_window docstring):
        # halves the H2D bytes — which are host-CPU-bound on the tunneled
        # stack — and is exact by construction (unpacked on device by
        # training.step.unpack_window). runtime.packed_wire: false opts
        # out (A/B escape hatch; numerics are identical either way).
        packed = device_stage and bool(
            (config.get("runtime") or {}).get("packed_wire", True)
        )
        net_compact = config["data"]["voxel"] is None
        window_batches = []
        windows_in_epoch = 0
        while True:
            batch = data.next_batch()

            new_seq = batch["new_seq"]
            epoch_done = data.seq_num >= len(data.files)
            if multihost:
                # lanes roll over at different local steps on each host;
                # one tiny allgather per batch makes the control decisions
                # global so every process stays in collective lockstep
                # (hosts already done keep streaming until ALL are)
                from taming_event_flow_tpu.parallel import exchange_flags

                new_seq, epoch_done = exchange_flags(new_seq, epoch_done)

            if new_seq.any():
                window_batches = []
                yield ("reset", new_seq.copy())

            if epoch_done:  # epoch rollover (global barrier on multihost)
                yield ("epoch_end", data.epoch, windows_in_epoch)
                windows_in_epoch = 0
                data.epoch += 1
                data.samples = 0
                data.seq_num = data.seq_num % len(data.files)
                if data.epoch == n_epochs:
                    return

            window_batches.append(batch)
            if len(window_batches) < passes:
                continue

            # count-mode net inputs derive on device when no lane is
            # rectified (re-checked per window: a rectified file opening
            # mid-stream flips data.rectify and later windows ship the
            # remapped host encoding instead — stack_window docstring)
            window = stack_window(
                window_batches, packed=packed, net_compact=net_compact,
                derive_net=packed and net_compact and not data.rectify,
            )
            if device_stage:
                window = {k: jnp.asarray(v) for k, v in window.items()}
            window_batches = []
            windows_in_epoch += 1
            yield ("window", window, (data.epoch, data.seq_num))

    from taming_event_flow_tpu.data.prefetch import Prefetcher

    # wall-clock attribution of the consumer loop (printed with
    # vis.verbose; negligible overhead otherwise)
    from taming_event_flow_tpu.utils.diagnostics import SectionTimer

    tm = SectionTimer()

    train_loss, best_loss = 0.0, 1.0e6
    windows_done = 0
    # async dispatch: device losses are read back one step LATE so the host
    # never stalls on the in-flight step (float() is a device sync)
    pending = []

    def drain(limit):
        nonlocal train_loss, windows_done
        with tm("loss_readback"):
            while len(pending) > limit:
                train_loss += float(pending.pop(0))
                windows_done += 1

    # multihost: the producer issues the flag-exchange collective, so it
    # must run inline on the main thread — a prefetch thread would
    # interleave its collectives nondeterministically with the train step's
    prefetcher = (
        window_stream() if multihost
        else Prefetcher(window_stream(), depth=3)
    )
    try:
        for event in tm.wrap(prefetcher, "wait_window"):
            if event[0] == "reset":
                drain(1)
                state = state._replace(
                    carry=reset_carry(state.carry, jnp.asarray(event[1]))
                )
            elif event[0] == "epoch_end":
                _, epoch_num, n_windows = event
                drain(0)
                # reference semantics: one batch_size increment per optimizer
                # step (train_flow.py:119-121)
                avg = train_loss / max(n_windows * batch_size, 1)
                if is_main:
                    tracking.log_metric("loss", avg, step=epoch_num)
                    tb.add_scalar("loss", avg, epoch_num)
                if avg < best_loss:
                    if is_main:
                        save_checkpoint(
                            runid, jax.device_get(state.params),
                            jax.device_get(state.opt_state),
                            step=int(state.step), epoch=epoch_num,
                        )
                    best_loss = avg
                train_loss = 0.0
                windows_done = 0
            else:
                _, window, (epoch_num, seq_num) = event
                with tm("window_place"):
                    if multihost:
                        from taming_event_flow_tpu.parallel import (
                            globalize_window,
                        )

                        window = globalize_window(
                            window, event_mesh, batch_size)
                    else:
                        window = {k: jnp.asarray(v)
                                  for k, v in window.items()}
                        if event_mesh is not None:
                            window = shard_window_2d(window, event_mesh)
                        elif mesh is not None:
                            window = shard_window(window, mesh)

                with tm("step_dispatch"):
                    state, loss = step_fn(state, window)
                pending.append(loss)
                drain(1)
                meter.tick()

                if config["vis"].get("verbose"):
                    ev = window.get("event_list", window.get("event_txy"))
                    ev_per_step = float(
                        ev.shape[0] * ev.shape[1] * ev.shape[2])
                    print(
                        f"Train Epoch: {epoch_num:04d} "
                        f"[{seq_num:03d}/{len(data.files):03d}] "
                        f"Loss: {train_loss / max(windows_done * batch_size, 1):.6f} "
                        f"({meter.steps_per_s:.2f} step/s, "
                        f"{meter.mevents_per_s(ev_per_step):.1f} Mev/s)",
                        end="\r",
                    )

        drain(0)
    finally:
        if hasattr(prefetcher, "close"):
            prefetcher.close()
    if config["vis"].get("verbose"):
        print("\n" + tm.report())
    if tb is not None:
        tb.close()
    if is_main:
        tracking.end_run()
    return runid


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument(
        "--config", default="configs/train_flow.yml",
        help="training configuration",
    )
    parser.add_argument(
        "--path_mlflow", default="", help="tracking-store location"
    )
    parser.add_argument(
        "--path_cache", default="",
        help="location of the cached formatted dataset",
    )
    parser.add_argument(
        "--prev_runid", default="",
        help="pre-trained model to use as starting point",
    )
    args = parser.parse_args()
    train(args, YAMLParser(args.config))
