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

    tracking.set_tracking_uri(args.path_mlflow)
    tracking.set_experiment(config["experiment"])
    run = tracking.start_run()
    runid = run.info.run_id
    tracking.log_params({k: str(v) for k, v in config.items()})
    tracking.log_params({"prev_runid": args.prev_runid})
    config = config_parser.combine_entries(config)
    print("Run id:", runid)

    # observability: git-diff snapshot + TensorBoard mirror (reference
    # ``train_flow.py:36-37``)
    from taming_event_flow_tpu.utils import StepMeter, save_diff
    from taming_event_flow_tpu.tracking.tensorboard import TensorBoardMirror

    save_diff("train_diff.txt")
    meter = StepMeter()
    tb = TensorBoardMirror(runid)

    res = tuple(config["loader"]["resolution"])
    batch_size = config["loader"]["batch_size"]
    passes = effective_passes(config)
    num_bins = 2 if config["data"]["voxel"] is None else config["data"]["voxel"]

    data = H5Loader(config, shuffle=True, path_cache=args.path_cache)

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
        warp_remat=bool(config["loss"].get("warp_remat", True)),
        scan_unroll=int(config["loss"].get("scan_unroll", 1)),
    )
    optimizer = build_optimizer(
        config["optimizer"], clip_grad=config["loss"].get("clip_grad")
    )
    state = init_train_state(
        model, optimizer, batch_size, res[0], res[1], num_bins,
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
            state = TrainState(
                restored["params"], restored["opt_state"], state.carry,
                jnp.asarray(restored["step"]),
            )
            # replay prior loss history into the new run
            # (reference ``utils/utils.py:33-44``)
            from taming_event_flow_tpu.tracking.store import default_store

            for _, v, s in default_store().read_metric(
                args.prev_runid, "loss"
            ):
                tracking.log_metric("loss", v, step=s)
                tb.add_scalar("loss", v, s)
    data.epoch = epoch

    step_fn = make_train_step(
        model, optimizer, loss_cfg,
        warping=config["loss"].get("warping", "Iterative"),
        flow_scaling=config["loss"].get("flow_scaling", 32),
    )

    mesh = None
    if len(jax.devices()) > 1 and batch_size % len(jax.devices()) == 0:
        mesh = make_mesh()
        state = shard_state(state, mesh)
        print(f"Data-parallel mesh over {len(jax.devices())} devices")

    train_loss, best_loss = 0.0, 1.0e6
    window_batches = []
    end_train = False

    while not end_train:
        batch = data.next_batch()

        if batch["new_seq"].any():
            # zero affected lanes' carry; restart the loss window
            state = state._replace(
                carry=reset_carry(
                    state.carry, jnp.asarray(batch["new_seq"])
                )
            )
            window_batches = []

        if data.seq_num >= len(data.files):  # epoch rollover
            avg = train_loss / max(data.samples, 1)
            tracking.log_metric("loss", avg, step=data.epoch)
            tb.add_scalar("loss", avg, data.epoch)
            if avg < best_loss:
                save_checkpoint(
                    runid, jax.device_get(state.params),
                    jax.device_get(state.opt_state),
                    step=int(state.step), epoch=data.epoch,
                )
                best_loss = avg
            data.epoch += 1
            data.samples = 0
            train_loss = 0.0
            data.seq_num = data.seq_num % len(data.files)
            if data.epoch == config["loader"]["n_epochs"]:
                end_train = True
                break

        window_batches.append(batch)
        if len(window_batches) < passes:
            continue

        window = stack_window(window_batches)
        window_batches = []
        window = {k: jnp.asarray(v) for k, v in window.items()}
        if mesh is not None:
            window = shard_window(window, mesh)

        state, loss = step_fn(state, window)
        loss_val = float(loss)
        train_loss += loss_val
        data.samples += batch_size
        meter.tick()

        if config["vis"].get("verbose"):
            ev_per_step = float(window["event_list"].shape[0]
                                * window["event_list"].shape[1]
                                * window["event_list"].shape[2])
            print(
                f"Train Epoch: {data.epoch:04d} "
                f"[{data.seq_num:03d}/{len(data.files):03d}] "
                f"Loss: {train_loss / max(data.samples, 1):.6f} "
                f"({meter.steps_per_s:.2f} step/s, "
                f"{meter.mevents_per_s(ev_per_step):.1f} Mev/s)",
                end="\r",
            )

    tb.close()
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
