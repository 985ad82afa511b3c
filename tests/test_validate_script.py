"""Smoke test for ``scripts/validate_against_reference.py`` — the
one-command external validation path (real data + reference checkpoint →
both pipelines, side-by-side metrics + PNG byte-diff). Here it runs against
the oracle shims on synthetic data; the entry point is identical for real
DSEC/MVSEC h5 trees (schema pinned by ``tests/test_schema.py``)."""

import importlib.util
import os
import sys

import yaml

from taming_event_flow_tpu.data.synthetic import write_synthetic_h5

from .oracle import requires_reference, shim_reference_deps

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

MODEL_CFG = {
    "name": "RecEVFlowNet",
    "base_channels": 8,
    "num_encoders": 2,
    "num_residual_blocks": 1,
    "min_size": 4,
}


def _load_script():
    spec = importlib.util.spec_from_file_location(
        "validate_against_reference",
        os.path.join(REPO, "scripts", "validate_against_reference.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@requires_reference
def test_validate_script_smoke(tmp_path):
    import torch

    ds = tmp_path / "data"
    ds.mkdir()
    write_synthetic_h5(
        str(ds / "seq0.h5"), n_events=2500, res=(32, 32), n_flow_frames=6,
        seed=3,
    )

    # a "reference checkpoint": the reference's own model class, saved the
    # way the published model.pth stores weights
    shim_reference_deps()
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    from models.model import RecEVFlowNet as RefModel

    torch.manual_seed(7)
    cfg = {k: v for k, v in MODEL_CFG.items() if k != "min_size"}
    model = RefModel(dict(cfg), num_bins=2, min_size=4).eval()
    ckpt = str(tmp_path / "model.pth")
    torch.save(model.state_dict(), ckpt)

    mc_path = str(tmp_path / "model.yml")
    with open(mc_path, "w") as f:
        yaml.safe_dump({"model": MODEL_CFG}, f)

    mod = _load_script()
    rc = mod.main([
        "--data", str(ds), "--checkpoint", ckpt,
        "--mode", "gtflow", "--window", "1", "--passes", "2",
        "--resolution", "32", "32", "--flow_scaling", "8",
        "--model-config", mc_path, "--store",
        "--workdir", str(tmp_path / "val"),
    ])
    assert rc == 0


@requires_reference
def test_validate_script_synthetic_mode(tmp_path):
    """`--synthetic` is self-contained: generates the DSEC-schema tree +
    reference checkpoint itself, runs both pipelines, and passes only on a
    ZERO byte-wise PNG diff (VERDICT r4 item 6)."""
    mod = _load_script()
    rc = mod.main(["--synthetic", "--workdir", str(tmp_path / "val")])
    assert rc == 0
    # the self-test wrote its own inputs
    assert os.path.isfile(str(tmp_path / "val" / "model.pth"))
    assert os.listdir(str(tmp_path / "val" / "synthetic_data"))


def test_validate_script_requires_inputs_without_synthetic(tmp_path):
    import pytest

    mod = _load_script()
    with pytest.raises(SystemExit):
        mod.main(["--workdir", str(tmp_path / "val")])
