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

All pipeline logic lives in ``taming_event_flow_tpu/pipeline/eval.py``
(importable, unit-testable); this file is argparse + tracking/checkpoint
wiring + the consumer loop.
"""

import argparse

import numpy as np

import jax
import jax.numpy as jnp

from taming_event_flow_tpu.configs import YAMLParser
from taming_event_flow_tpu.data import H5Loader
from taming_event_flow_tpu.data.prefetch import Prefetcher
from taming_event_flow_tpu.models import build_model
from taming_event_flow_tpu.ops import compute_pol_iwe
from taming_event_flow_tpu.pipeline import (
    EvalPipeline,
    MetricsConsumer,
    batch_stream,
    consume_mets,
)
from taming_event_flow_tpu import tracking
from taming_event_flow_tpu.tracking import load_checkpoint
from taming_event_flow_tpu.tracking.loggers import (
    create_model_dir,
    initialize_quant_results,
    log_config,
    log_results,
)
from taming_event_flow_tpu.utils import ProgressBar, Visualization


def test(args, config_parser: YAMLParser):
    tracking.set_tracking_uri(args.path_mlflow)
    run = tracking.get_run(args.runid)
    config = config_parser.merge_configs(run.data.params)
    config = config_parser.combine_entries(config)
    config_parser.apply_runtime(config)

    from taming_event_flow_tpu.ops import set_warp_backend
    from taming_event_flow_tpu.ops.precision import set_matmul_precision

    set_matmul_precision(config["loss"].get("matmul_precision", "default"))
    set_warp_backend(config["loss"].get("warp_backend", "auto"))

    config["loader"]["batch_size"] = 1
    res = tuple(config["loader"]["resolution"])
    num_bins = 2 if config["data"]["voxel"] is None else config["data"]["voxel"]

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

    pipe = EvalPipeline(config, model, params)
    want_vis, tm = pipe.vis.want, pipe.tm
    metric_names = pipe.metric_names

    # deferred boundary readbacks: the metrics-reader thread performs the
    # (window-completion + wire)-blocking device_get off the dispatch
    # loop's critical path; runtime.async_metrics: false = A/B hatch
    consumer = None
    if (config.get("runtime") or {}).get("async_metrics", True):
        consumer = MetricsConsumer(metric_names)

    bar = None
    val_results = {}
    prefetcher = Prefetcher(batch_stream(data, pipe), depth=3)
    try:
        for batch, meta in tm.wrap(prefetcher, "wait_batch"):
            sequence = meta["sequence"]
            pipe.cur_ridx = meta.get("remap_idx")
            pipe.cur_rect = meta.get("rect_map")

            if pipe.vis.bars:
                if bar is None:
                    bar = ProgressBar(sequence, max=meta["bar_iters"])
                bar.next()

            if batch["new_seq"].any():
                if bar is not None:
                    bar.finish()
                    bar = ProgressBar(sequence, max=meta["bar_iters"])
                pipe.start_sequence()

            if pipe.gtflow_mode and batch["ts_jump_reset"].any():
                pipe.ts_jump_flush()

            if meta["end_test"]:
                break

            batch = pipe.ensure_bucket(batch)
            flow_fine = pipe.ingest(batch, meta)

            flow_vis = None
            if want_vis("flow") or want_vis("iwe"):
                flow_vis = np.asarray(flow_fine)
                if pipe.vis.mask_output:
                    flow_vis = flow_vis * np.asarray(batch["event_mask"])

            if want_vis("iwe"):
                vis.data["iwe"] = np.asarray(
                    compute_pol_iwe(
                        jnp.asarray(flow_vis),
                        jnp.asarray(batch["event_list"]),
                        res, jnp.asarray(batch["event_list_pol_mask"]),
                        round_idx=False, round_flow=False,
                    )
                )

            vis.data.update(pipe.vis_window_images())

            vis.data["flow_bw"] = None
            if pipe.passes_done == pipe.passes:
                dev_mets, flow_bw = pipe.boundary_outputs(batch, meta)
                if flow_bw is not None:
                    # DEVICE array (packed u16 wire): the vis writeback
                    # thread performs the D2H + decode off the hot loop
                    vis.data["flow_bw"] = flow_bw
                if dev_mets is not None:
                    if consumer is not None:
                        consumer.put(dev_mets, sequence)
                    else:
                        with tm("mets_readback"):
                            host_mets = jax.device_get(dev_mets)
                        val_results = initialize_quant_results(
                            val_results, sequence, metric_names)
                        consume_mets(host_mets, val_results, sequence,
                                     metric_names)

            if pipe.vis.on:
                with tm("vis_step"):
                    vis.data["flow"] = flow_vis
                    vis.step(
                        batch, sequence=sequence, ts=meta["ts"],
                        show=pipe.vis.show,
                    )
    finally:
        prefetcher.close()
        # drain the deferred metric readbacks and take ownership of the
        # accumulated results (re-raises any reader error)
        if consumer is not None:
            val_results = consumer.close()
        # flush the PNG writeback thread (and surface any worker error)
        # BEFORE results are logged — the submission formatter reads the
        # store trees right after this returns
        vis.close()

    if pipe.vis.verbose:
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
