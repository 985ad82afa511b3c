"""Capstone full-pipeline parity: reference eval CLI loop vs our eval_flow.

Every component is parity-tested in isolation (ops, losses+grads, metrics,
loader batches, model forward via ported weights); this test closes the loop
at the PIPELINE level: the same synthetic H5 + the same (ported) weights are
driven through

  * the reference's ``eval_flow.py`` inference loop semantics
    (reference ``eval_flow.py:70-193``: H5Loader -> model -> flow_val
    ``Iterative.update`` -> metric assembly at the ``passes_loss`` boundary,
    reference ``eval_flow.py:141-179``), executed here with the reference's
    own modules, and
  * OUR real eval surface — ``eval_flow.test()`` loading a checkpoint from
    the tracking store —

and the produced per-sequence FWL / RSAT / AEE must agree.
"""

import argparse
import os

import numpy as np
import pytest
import yaml

from taming_event_flow_tpu.data.synthetic import write_synthetic_h5

from .oracle import requires_reference, shim_reference_deps

RES = (32, 32)
PASSES = 2
FLOW_SCALING = 8
MODEL_CFG = {
    "name": "RecEVFlowNet",
    "base_channels": 8,
    "num_encoders": 2,
    "num_residual_blocks": 1,
}


def _reference_eval(ds_path: str, state_dict_holder: dict):
    """The reference inference loop (reference ``eval_flow.py:70-193``),
    driven with the reference's own loader/model/criteria. Returns
    ``{metric: {sequence: value}}`` with the same averaging as
    ``eval_flow.py:199-206`` and stores the torch state_dict for porting."""
    import torch

    shim_reference_deps()
    from dataloader.h5 import H5Loader as RefLoader
    from loss.flow_val import Iterative as RefIterative
    from models.model import RecEVFlowNet as RefModel

    config = {
        "data": {"path": ds_path, "mode": "gtflow", "window": 1,
                 "passes_loss": PASSES, "voxel": None, "cache": False},
        "model": dict(MODEL_CFG),
        "loss": {"round_ts": False, "flow_scaling": FLOW_SCALING},
        "loader": {"resolution": list(RES), "batch_size": 1, "augment": [],
                   "augment_prob": [], "max_num_grad_events": None,
                   "device": torch.device("cpu")},
        "metrics": {"warping": "Iterative", "name": ["FWL", "RSAT", "AEE"]},
        "vis": {"bars": False, "mask_output": False},
    }

    torch.manual_seed(7)
    model = RefModel(dict(MODEL_CFG), num_bins=2, min_size=4).eval()
    state_dict_holder["state_dict"] = {
        k: v.detach().numpy().copy() for k, v in model.state_dict().items()
    }

    data = RefLoader(config, shuffle=True)
    dataloader = torch.utils.data.DataLoader(
        data, drop_last=True, batch_size=1, collate_fn=data.custom_collate,
        num_workers=0,
    )
    criteria = RefIterative(config, torch.device("cpu"))

    val_results = {}
    end_test = False
    with torch.no_grad():
        while not end_test:
            for inputs in dataloader:
                sequence = (
                    data.files[data.batch_idx[0] % len(data.files)]
                    .split("/")[-1].split(".")[0]
                )
                if data.new_seq:
                    data.new_seq = False
                    model.reset_states()
                    criteria.reset()
                if data.ts_jump_reset:
                    data.ts_jump_reset = False
                    model.reset_states()
                if data.seq_num >= len(data.files):
                    end_test = True
                    break

                x = model(inputs["net_input"])
                flow = [f * FLOW_SCALING for f in x["flow"]]
                criteria.update(
                    flow, inputs["event_list"],
                    inputs["event_list_pol_mask"], inputs["event_mask"],
                )

                val_results.setdefault(
                    sequence,
                    {m: {"metric": 0.0, "it": 0}
                     for m in ("FWL", "RSAT", "AEE")},
                )
                if criteria.num_passes == PASSES:
                    flow_bw = (
                        criteria.window_flow(mode="backward", mask=False)
                        * PASSES
                    )
                    aee = criteria.compute_aee(flow_bw, inputs["gtflow"])
                    val_results[sequence]["AEE"]["metric"] += float(aee)
                    val_results[sequence]["AEE"]["it"] += 1
                    rsat = criteria.rsat()
                    val_results[sequence]["RSAT"]["metric"] += float(rsat[0])
                    val_results[sequence]["RSAT"]["it"] += 1
                    fwl = criteria.fwl()
                    val_results[sequence]["FWL"]["metric"] += float(fwl)
                    val_results[sequence]["FWL"]["it"] += 1
                    criteria.reset()

    out = {}
    for metric in ("FWL", "RSAT", "AEE"):
        out[metric] = {
            seq: r[metric]["metric"] / r[metric]["it"]
            for seq, r in val_results.items() if r[metric]["it"] > 0
        }
    return out


@requires_reference
def test_full_pipeline_eval_parity(tmp_path):
    ds = tmp_path / "data"
    ds.mkdir()
    write_synthetic_h5(
        str(ds / "seq0.h5"), n_events=2500, res=RES, n_flow_frames=8, seed=3
    )

    holder = {}
    ref_results = _reference_eval(str(ds), holder)
    assert ref_results["AEE"], "reference produced no AEE windows"

    # ---- our side: port the SAME weights, store a run, run the real CLI fn
    os.chdir(tmp_path)
    from taming_event_flow_tpu import tracking
    from taming_event_flow_tpu.configs import YAMLParser
    from taming_event_flow_tpu.models.port import torch_state_dict_to_flax
    from taming_event_flow_tpu.tracking import save_checkpoint
    import eval_flow

    params = torch_state_dict_to_flax(holder["state_dict"])

    tracking.set_tracking_uri(str(tmp_path))
    tracking.set_experiment("pipeline_parity")
    run = tracking.start_run()
    runid = run.info.run_id
    train_cfg = {
        "data": {"mode": "gtflow", "window": 1, "passes_loss": PASSES,
                 "voxel": None, "cache": False},
        "model": dict(MODEL_CFG) | {"min_size": 4},
        "loss": {"warping": "Iterative", "round_ts": False,
                 "flow_scaling": FLOW_SCALING},
    }
    tracking.log_params({k: str(v) for k, v in train_cfg.items()})
    tracking.end_run()
    save_checkpoint(runid, params)

    eval_cfg = {
        "data": {"path": str(ds), "mode": "gtflow", "window": 1,
                 "passes_loss": PASSES, "cache": False},
        "loader": {"resolution": list(RES), "augment": [],
                   "max_num_grad_events": None, "seed": 11},
        "metrics": {"warping": "Iterative", "name": ["FWL", "RSAT", "AEE"]},
        "vis": {"enabled": False, "store": False, "bars": False,
                "mask_output": False, "dynamic": False},
    }
    cfg_path = str(tmp_path / "eval.yml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(eval_cfg, f)

    args = argparse.Namespace(
        runid=runid, config=cfg_path, path_mlflow=str(tmp_path),
        path_results=str(tmp_path / "results_inference") + "/",
    )
    ours = eval_flow.test(args, YAMLParser(cfg_path))

    for metric in ("FWL", "RSAT", "AEE"):
        assert set(ours[metric]) == set(ref_results[metric]), metric
        for seq, ref_v in ref_results[metric].items():
            our_v = float(ours[metric][seq])
            np.testing.assert_allclose(
                our_v, ref_v, rtol=2e-3, atol=2e-4,
                err_msg=f"{metric}/{seq}: ours={our_v} ref={ref_v}",
            )
