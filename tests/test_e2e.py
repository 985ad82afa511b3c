"""End-to-end smoke: train on synthetic data -> checkpoint -> eval produces
metrics + DSEC-encodable flow; submission formatter round-trips."""

import argparse
import os

import numpy as np
import pytest
import yaml

from taming_event_flow_tpu.data.synthetic import write_synthetic_h5
from taming_event_flow_tpu.utils import encode_dsec_flow, decode_dsec_flow

RES = (32, 32)


def write_cfg(path, d):
    with open(path, "w") as f:
        yaml.safe_dump(d, f)
    return str(path)


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    root = tmp_path_factory.mktemp("e2e")
    ds = root / "data"
    ds.mkdir()
    write_synthetic_h5(
        str(ds / "seq0.h5"), n_events=3000, res=RES, n_flow_frames=8, seed=1
    )
    return root, str(ds)


def make_train_cfg(root, ds):
    cfg = {
        "experiment": "e2e",
        "data": {"path": ds, "mode": "time", "window": 0.2,
                 "passes_loss": 2, "scales_loss": 1, "voxel": None,
                 "cache": False},
        "model": {"name": "RecEVFlowNet", "base_channels": 8,
                  "num_encoders": 2, "num_residual_blocks": 1,
                  "min_size": 4, "final_w_scale": 0.01},
        "loss": {"warping": "Iterative", "iterative_mode": "two",
                 "round_ts": False, "flow_scaling": 8,
                 "flow_spat_smooth_weight": None,
                 "flow_temp_smooth_weight": None, "clip_grad": 100.0},
        "optimizer": {"name": "Adam", "lr": 0.0001},
        "loader": {"n_epochs": 2, "batch_size": 1, "resolution": list(RES),
                   "augment": [], "augment_prob": [],
                   "max_num_grad_events": None, "seed": 11},
        "vis": {"verbose": False, "enabled": False, "store": False},
    }
    return write_cfg(root / "train.yml", cfg)


def make_eval_cfg(root, ds, store=False):
    cfg = {
        "data": {"path": ds, "mode": "gtflow", "window": 1,
                 "passes_loss": 2, "cache": False},
        "loader": {"resolution": list(RES), "augment": [],
                   "max_num_grad_events": None, "seed": 11},
        "metrics": {"warping": "Iterative",
                    "name": ["FWL", "RSAT", "AEE"]},
        "vis": {"enabled": False, "store": store, "bars": False,
                "mask_output": False, "dynamic": False,
                "show": ["flow_bw"] if store else None},
    }
    return write_cfg(root / "eval.yml", cfg)


@pytest.fixture(scope="module")
def trained_run(workspace, monkeypatch_module=None):
    root, ds = workspace
    os.chdir(root)  # tracking store writes ./mlruns
    from taming_event_flow_tpu.configs import YAMLParser
    import train_flow

    cfg_path = make_train_cfg(root, ds)
    args = argparse.Namespace(
        config=cfg_path, path_mlflow=str(root), path_cache="", prev_runid=""
    )
    runid = train_flow.train(args, YAMLParser(cfg_path))
    return root, ds, runid


def test_train_produces_checkpoint_and_metrics(trained_run):
    root, ds, runid = trained_run
    run_dir = os.path.join(str(root), "mlruns", "0", runid)
    assert os.path.isfile(
        os.path.join(run_dir, "artifacts", "model", "checkpoint.msgpack")
    )
    with open(os.path.join(run_dir, "metrics", "loss")) as f:
        losses = [float(l.split()[1]) for l in f]
    assert len(losses) >= 1 and np.all(np.isfinite(losses))


def test_eval_produces_metrics(trained_run):
    root, ds, runid = trained_run
    from taming_event_flow_tpu.configs import YAMLParser
    import eval_flow

    cfg_path = make_eval_cfg(root, ds, store=True)
    args = argparse.Namespace(
        runid=runid, config=cfg_path, path_mlflow=str(root),
        path_results=str(root / "results_inference") + "/",
    )
    results = eval_flow.test(args, YAMLParser(cfg_path))
    assert "FWL" in results and "RSAT" in results and "AEE" in results
    assert len(results["AEE"]) >= 1
    for metric in results.values():
        for v in metric.values():
            assert np.isfinite(float(v))

    res_dir = os.path.join(str(root), "results_inference", runid)
    ymls = [f for f in os.listdir(res_dir) if f.startswith("metrics_")]
    assert ymls
    # stored flow_bw PNGs decode back to flow within 1/128 px
    seq_dir = os.path.join(res_dir, "results", "eval_0", "seq0", "flow_bw")
    pngs = sorted(os.listdir(seq_dir))
    assert pngs
    import cv2

    img = cv2.imread(os.path.join(seq_dir, pngs[0]), cv2.IMREAD_UNCHANGED)
    flow = decode_dsec_flow(img)
    assert flow.shape == (RES[0], RES[1], 2)
    assert np.abs(flow).max() < 1000


def test_dsec_submission_formatter(trained_run, tmp_path):
    root, ds, runid = trained_run
    import prepare_dsec_submission as prep

    # build a fake benchmark metadata dir wrapping the eval output
    sub_root = tmp_path / "dsec_submissions"
    sub_root.mkdir()
    eval_src = os.path.join(
        str(root), "results_inference", runid, "results", "eval_0"
    )
    dst = sub_root / runid / "eval_0"
    import shutil

    shutil.copytree(eval_src, dst)
    n = len(os.listdir(dst / "seq0" / "flow_bw"))
    flags = np.ones(n, np.int64)
    np.save(sub_root / "seq0_flag.npy", flags)
    with open(sub_root / "seq0.txt", "w") as f:
        f.write("# from_timestamp_us, to_timestamp_us, file_index\n")
        for i in range(n):
            f.write(f"{i * 100000}, {(i + 1) * 100000}, {i + 1:06d}\n")

    args = argparse.Namespace(runid=runid, path=str(sub_root) + "/", eval_id=0)
    prep.prepare(args)

    out = dst / "submission" / "seq0"
    assert out.is_dir()
    assert len(os.listdir(out)) == n


def test_warm_start_resume(trained_run):
    root, ds, runid = trained_run
    from taming_event_flow_tpu.configs import YAMLParser
    import train_flow

    cfg_path = make_train_cfg(root, ds)
    args = argparse.Namespace(
        config=cfg_path, path_mlflow=str(root), path_cache="",
        prev_runid=runid,
    )
    runid2 = train_flow.train(args, YAMLParser(cfg_path))
    assert runid2 != runid
    run_dir = os.path.join(str(root), "mlruns", "0", runid2)
    with open(os.path.join(run_dir, "metrics", "loss")) as f:
        lines = f.readlines()
    assert len(lines) >= 2  # replayed history + new epochs


@pytest.mark.parametrize(
    "variant",
    ["voxel", "fire", "linear"],
)
def test_train_eval_registry_variants(workspace, tmp_path, variant):
    """CLI-level smoke across the registry axes the default e2e run does
    not touch: voxel net input, the FireFlowNet family, and the Linear
    loss + Linear validation scheme. Each trains 1 epoch and evals;
    metrics must be finite."""
    root, ds = workspace
    os.chdir(root)
    from taming_event_flow_tpu.configs import YAMLParser
    import train_flow
    import eval_flow

    tcfg = yaml.safe_load(open(make_train_cfg(tmp_path, ds)))
    tcfg["loader"]["n_epochs"] = 1
    ecfg = yaml.safe_load(open(make_eval_cfg(tmp_path, ds)))
    if variant == "voxel":
        tcfg["data"]["voxel"] = 4
    elif variant == "fire":
        tcfg["model"] = {"name": "FireFlowNet", "base_channels": 8,
                         "final_w_scale": 0.01}
    elif variant == "linear":
        tcfg["loss"]["warping"] = "Linear"
        ecfg["metrics"]["warping"] = "Linear"

    tpath = write_cfg(tmp_path / f"train_{variant}.yml", tcfg)
    args = argparse.Namespace(
        config=tpath, path_mlflow=str(root), path_cache="", prev_runid=""
    )
    runid = train_flow.train(args, YAMLParser(tpath))

    epath = write_cfg(tmp_path / f"eval_{variant}.yml", ecfg)
    args = argparse.Namespace(
        runid=runid, config=epath, path_mlflow=str(root),
        path_results=str(tmp_path / f"results_{variant}") + "/",
    )
    results = eval_flow.test(args, YAMLParser(epath))
    assert results["AEE"], results
    for metric in results.values():
        for v in metric.values():
            assert np.isfinite(float(v))


def test_eval_time_mode_deblurring_metrics(trained_run, tmp_path):
    """Eval in time-windowing mode (no GT flow in the batches): the
    deblurring metrics FWL/RSAT compute without AEE — the reference
    supports gtflow-less evaluation, and the in-program metrics path must
    skip the AEE/flow_bw block cleanly (aux is a dummy scalar)."""
    root, ds, runid = trained_run
    from taming_event_flow_tpu.configs import YAMLParser
    import eval_flow

    cfg = {
        "data": {"path": ds, "mode": "time", "window": 0.2,
                 "passes_loss": 2, "cache": False},
        "loader": {"resolution": list(RES), "augment": [],
                   "max_num_grad_events": None, "seed": 11,
                   "n_events_pad": 1001},  # no mesh -> extras path
        "metrics": {"warping": "Iterative", "name": ["FWL", "RSAT"]},
        "vis": {"enabled": False, "store": False, "bars": False},
    }
    cfg_path = write_cfg(tmp_path / "eval_time.yml", cfg)
    args = argparse.Namespace(
        runid=runid, config=cfg_path, path_mlflow=str(root),
        path_results=str(tmp_path / "results_time") + "/",
    )
    results = eval_flow.test(args, YAMLParser(cfg_path))
    assert "AEE" not in results or not results["AEE"]
    assert results["FWL"] and results["RSAT"]
    for metric in ("FWL", "RSAT"):
        for v in results[metric].values():
            assert np.isfinite(float(v))


def test_eval_in_program_metrics_matches_sharded(trained_run, tmp_path):
    """The windowed fast path folds RSAT/FWL/AEE + flow_bw into the window
    program (``make_eval_window_step(extras=...)``) on single-device runs;
    the 8-device conftest mesh instead takes the event-sharded reducer
    path. Force the single-device path (event cap not divisible by the
    device count -> no mesh) and assert both paths produce the same
    metrics."""
    root, ds, runid = trained_run
    from taming_event_flow_tpu.configs import YAMLParser
    import eval_flow

    def run(cfg_path, tag):
        args = argparse.Namespace(
            runid=runid, config=cfg_path, path_mlflow=str(root),
            path_results=str(tmp_path / f"results_{tag}") + "/",
        )
        return eval_flow.test(args, YAMLParser(cfg_path))

    base = yaml.safe_load(open(make_eval_cfg(tmp_path, ds)))
    # indivisible cap -> eval_mesh stays None -> extras path
    base["loader"]["n_events_pad"] = 1001
    ref = run(write_cfg(tmp_path / "eval_extras.yml", base), "extras")
    base["loader"]["n_events_pad"] = 1024  # divisible by 8 -> sharded path
    shd = run(write_cfg(tmp_path / "eval_sharded.yml", base), "sharded")

    for metric in ("FWL", "RSAT", "AEE"):
        for seq in ref[metric]:
            a, b = float(ref[metric][seq]), float(shd[metric][seq])
            assert np.isfinite(a) and abs(a - b) < 5e-4, (metric, seq, a, b)


def test_eval_per_pass_fused_metrics_matches_sharded(trained_run, tmp_path):
    """MVSEC-style protocol (passes_loss=1, eval_time gate, masked/cropped
    AEE) runs the per-pass path, where in-window boundary passes use the
    fused-metrics step specialization on single-device runs. Assert it
    matches the event-sharded reducer path."""
    root, ds, runid = trained_run
    from taming_event_flow_tpu.configs import YAMLParser
    import eval_flow

    base = yaml.safe_load(open(make_eval_cfg(tmp_path, ds)))
    base["data"]["passes_loss"] = 1
    base["metrics"]["eval_time"] = [0.2, 1.6]
    base["metrics"]["mask_aee"] = True
    base["metrics"]["res_aee"] = [24, 24]
    base["vis"] = {"enabled": False, "store": False, "bars": False}

    def run(n_pad, tag):
        base["loader"]["n_events_pad"] = n_pad
        cfg_path = write_cfg(tmp_path / f"eval_pp_{tag}.yml", base)
        args = argparse.Namespace(
            runid=runid, config=cfg_path, path_mlflow=str(root),
            path_results=str(tmp_path / f"results_pp_{tag}") + "/",
        )
        return eval_flow.test(args, YAMLParser(cfg_path))

    ref = run(1001, "extras")   # indivisible cap -> no mesh -> fused path
    shd = run(1024, "sharded")  # divisible by 8 -> sharded reducers

    counted = 0
    for metric in ("FWL", "RSAT", "AEE"):
        for seq in ref[metric]:
            a, b = float(ref[metric][seq]), float(shd[metric][seq])
            assert np.isfinite(a) and abs(a - b) < 5e-4, (metric, seq, a, b)
            counted += 1
    assert counted >= 3  # the gate must admit at least one boundary


def test_eval_handles_ts_jump(trained_run, tmp_path):
    """Eval CLI on a sequence with a GT temporal discontinuity: the loader
    flags ts_jump_reset, the (prefetched) eval loop flushes buffered passes
    and resets the model carry mid-window, and the run still produces
    finite metrics (reference protocol: eval_flow.py:75-88)."""
    root, ds, runid = trained_run
    ds_jump = tmp_path / "data_jump"
    ds_jump.mkdir()
    write_synthetic_h5(
        str(ds_jump / "seq0.h5"), n_events=3000, res=RES, n_flow_frames=8,
        seed=5, gt_gap_after=0.5,
    )

    # the discontinuity must actually fire the loader flag for this file
    from taming_event_flow_tpu.configs import YAMLParser
    from taming_event_flow_tpu.data import H5Loader
    import yaml as _yaml

    probe_cfg_path = write_cfg(tmp_path / "probe.yml", {
        "data": {"path": str(ds_jump), "mode": "gtflow", "window": 1,
                 "passes_loss": 2, "cache": False},
        "loader": {"resolution": list(RES), "batch_size": 1, "augment": [],
                   "max_num_grad_events": None, "seed": 11},
        "vis": {"enabled": False},
    })
    probe = H5Loader(YAMLParser(probe_cfg_path).config, shuffle=False)
    fired = False
    for _ in range(40):
        b = probe.next_batch()
        if b["ts_jump_reset"].any():
            fired = True
            probe.clear_ts_jump()
        if probe.seq_num >= len(probe.files):
            break
    assert fired, "synthetic gap did not trigger ts_jump detection"

    import eval_flow

    cfg_path = make_eval_cfg(tmp_path, str(ds_jump))
    args = argparse.Namespace(
        runid=runid, config=cfg_path, path_mlflow=str(root),
        path_results=str(tmp_path / "results_jump") + "/",
    )
    results = eval_flow.test(args, YAMLParser(cfg_path))
    for metric in results.values():
        for v in metric.values():
            assert np.isfinite(float(v))


def test_dsec_submission_formatter_real_metadata(tmp_path):
    """Formatter against the benchmark metadata shipped in-repo
    (``dsec_submissions/``, carried over from the reference's
    ``dsec_submissions/*.{txt,npy}``): real flags + file_index tables,
    synthetic PNGs."""
    import shutil

    import prepare_dsec_submission as prep

    repo_meta = os.path.join(os.path.dirname(prep.__file__),
                             "dsec_submissions")
    seq = "thun_01_a"
    flags = np.load(os.path.join(repo_meta, seq + "_flag.npy"))
    table = np.genfromtxt(os.path.join(repo_meta, seq + ".txt"),
                          skip_header=1, delimiter=",")
    assert int(flags.sum()) == table.shape[0]

    sub_root = tmp_path / "dsec_submissions"
    sub_root.mkdir()
    for name in (seq + ".txt", seq + "_flag.npy"):
        shutil.copy(os.path.join(repo_meta, name), sub_root / name)

    flow_dir = sub_root / "runX" / "eval_0" / seq / "flow_bw"
    flow_dir.mkdir(parents=True)
    png = encode_dsec_flow(np.zeros((4, 4, 2), np.float32))
    import cv2

    for i in range(len(flags)):
        cv2.imwrite(str(flow_dir / f"{i:09d}.png"), png)

    args = argparse.Namespace(runid="runX", path=str(sub_root) + "/",
                              eval_id=0)
    prep.prepare(args)

    out = sub_root / "runX" / "eval_0" / "submission" / seq
    produced = sorted(os.listdir(out))
    expected = sorted(f"{int(fi):06d}.png" for fi in table[:, -1])
    assert produced == expected


def test_eval_packed_wire_ab_identical_outputs(trained_run, tmp_path):
    """The packed H2D/D2H wire (runtime.packed_wire, default on) must be
    invisible in the outputs: metrics and stored flow_bw PNG bytes are
    identical to the plain-f32 wire through the REAL eval CLI."""
    import pathlib

    root, ds, runid = trained_run
    from taming_event_flow_tpu.configs import YAMLParser
    import eval_flow

    def run(packed, tag):
        with open(make_eval_cfg(root, ds, store=True)) as f:
            cfg = yaml.safe_load(f)
        cfg["runtime"] = {"packed_wire": packed}
        # odd cap -> no event mesh on the 8-device test platform: the A/B
        # must exercise the packed single-device paths (windowed staging
        # + device-side derivation), not the sharded plain wire
        cfg["loader"]["n_events_pad"] = 1001
        cfg_path = write_cfg(tmp_path / f"eval_{tag}.yml", cfg)
        args = argparse.Namespace(
            runid=runid, config=cfg_path, path_mlflow=str(root),
            path_results=str(tmp_path / f"res_{tag}") + "/",
        )
        results = eval_flow.test(args, YAMLParser(cfg_path))
        base = pathlib.Path(tmp_path / f"res_{tag}" / runid / "results")
        pngs = {
            str(p.relative_to(base)): p.read_bytes()
            for p in sorted(base.rglob("*.png"))
        }
        return results, pngs

    r_on, png_on = run(True, "on")
    r_off, png_off = run(False, "off")
    assert png_on and sorted(png_on) == sorted(png_off)
    for k in png_on:
        assert png_on[k] == png_off[k], f"PNG bytes differ: {k}"
    for metric in r_off:
        for seq in r_off[metric]:
            assert float(r_on[metric][seq]) == float(r_off[metric][seq]), (
                metric, seq)


def test_train_packed_wire_ab_identical_loss(workspace, tmp_path):
    """Training through the REAL CLI with the packed wire on vs off logs
    an identical loss history (the device unpack restores the plain
    window bit-exactly)."""
    root, ds = workspace
    from taming_event_flow_tpu.configs import YAMLParser
    import train_flow

    def run(packed, tag):
        with open(make_train_cfg(root, ds)) as f:
            cfg = yaml.safe_load(f)
        cfg["loader"]["n_epochs"] = 1
        cfg["runtime"] = {"packed_wire": packed}
        cfg_path = write_cfg(tmp_path / f"train_{tag}.yml", cfg)
        args = argparse.Namespace(
            config=cfg_path, path_mlflow=str(root), path_cache="",
            prev_runid="",
        )
        runid = train_flow.train(args, YAMLParser(cfg_path))
        with open(os.path.join(str(root), "mlruns", "0", runid,
                               "metrics", "loss")) as f:
            return [float(l.split()[1]) for l in f]

    losses_on = run(True, "on")
    losses_off = run(False, "off")
    assert losses_on and losses_on == losses_off


def test_eval_packed_wire_ab_rectified(workspace, tmp_path):
    """Packed-wire A/B on a RECTIFIED synthetic sequence: the device-side
    count derivation must route through raw coords + the rectification
    gather index (event lists carry fractional rectified coords there) and
    still produce identical metrics and PNG bytes through the real CLIs."""
    import pathlib

    pytest.importorskip("cv2")
    root, _ = workspace
    from taming_event_flow_tpu.configs import YAMLParser
    import train_flow
    import eval_flow

    ds = tmp_path / "rect_data"
    ds.mkdir()
    write_synthetic_h5(
        str(ds / "seq0.h5"), n_events=3000, res=RES, n_flow_frames=8,
        seed=5, rectify=True,
    )

    with open(make_train_cfg(root, str(ds))) as f:
        tcfg = yaml.safe_load(f)
    tcfg["loader"]["n_epochs"] = 1
    tcfg_path = write_cfg(tmp_path / "train_rect.yml", tcfg)
    args = argparse.Namespace(
        config=tcfg_path, path_mlflow=str(root), path_cache="",
        prev_runid="",
    )
    runid = train_flow.train(args, YAMLParser(tcfg_path))

    def run(packed, tag):
        with open(make_eval_cfg(root, str(ds), store=True)) as f:
            cfg = yaml.safe_load(f)
        cfg["runtime"] = {"packed_wire": packed}
        cfg["loader"]["n_events_pad"] = 1001  # single-device packed path
        cfg_path = write_cfg(tmp_path / f"eval_rect_{tag}.yml", cfg)
        eargs = argparse.Namespace(
            runid=runid, config=cfg_path, path_mlflow=str(root),
            path_results=str(tmp_path / f"res_rect_{tag}") + "/",
        )
        results = eval_flow.test(eargs, YAMLParser(cfg_path))
        base = pathlib.Path(tmp_path / f"res_rect_{tag}" / runid / "results")
        pngs = {
            str(p.relative_to(base)): p.read_bytes()
            for p in sorted(base.rglob("*.png"))
        }
        return results, pngs

    r_on, png_on = run(True, "on")
    r_off, png_off = run(False, "off")
    assert png_on and sorted(png_on) == sorted(png_off)
    for k in png_on:
        assert png_on[k] == png_off[k], f"PNG bytes differ: {k}"
    for metric in r_off:
        for seq in r_off[metric]:
            assert float(r_on[metric][seq]) == float(r_off[metric][seq]), (
                metric, seq)


def test_b16_throughput_preset_smokes(workspace):
    """The shipped B=16 throughput preset (configs/train_flow_b16.yml,
    VERDICT r4 item 8) parses through YAMLParser and trains end-to-end at
    its batch size — shrunk to toy model/window sizes so 16 lanes fit a
    CPU test, with loader.batch_size kept at the preset's 16."""
    root, ds = workspace
    os.chdir(root)
    from taming_event_flow_tpu.configs import YAMLParser
    import train_flow

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(repo, "configs", "train_flow_b16.yml")) as f:
        cfg = yaml.safe_load(f)
    assert cfg["loader"]["batch_size"] == 16
    assert cfg["loader"]["n_events_pad"] == 8192
    # shrink everything EXCEPT the batch size to test scale
    cfg["data"].update({"path": ds, "window": 0.2, "passes_loss": 2})
    cfg["model"].update({"base_channels": 8, "num_encoders": 2,
                         "num_residual_blocks": 1, "min_size": 4})
    cfg["loader"].update({"n_epochs": 1, "resolution": list(RES),
                          "augment": [], "augment_prob": [],
                          "n_events_pad": 512, "seed": 7,
                          "max_num_grad_events": None})
    cfg["loss"]["flow_scaling"] = 8
    cfg["vis"]["verbose"] = False
    cfg_path = write_cfg(root / "train_b16.yml", cfg)
    args = argparse.Namespace(
        config=cfg_path, path_mlflow=str(root), path_cache="", prev_runid=""
    )
    runid = train_flow.train(args, YAMLParser(cfg_path))
    run_dir = os.path.join(str(root), "mlruns", "0", runid)
    with open(os.path.join(run_dir, "metrics", "loss")) as f:
        losses = [float(l.split()[1]) for l in f]
    assert len(losses) >= 1 and np.all(np.isfinite(losses))
