"""Tracking store extras: TensorBoard mirror (scalar log + history replay)."""

import os

import pytest

from taming_event_flow_tpu import tracking
from taming_event_flow_tpu.tracking import TensorBoardMirror
from taming_event_flow_tpu.tracking.store import default_store


@pytest.fixture
def run(tmp_path):
    tracking.set_tracking_uri(str(tmp_path))
    tracking.set_experiment("tbtest")
    r = tracking.start_run()
    yield r
    tracking.end_run()


def test_tensorboard_mirror_writes_events(run):
    tb = TensorBoardMirror(run.info.run_id)
    if not tb.enabled:
        pytest.skip("no tensorboard writer available")
    tb.add_scalar("loss", 0.5, 0)
    tb.add_scalar("loss", 0.25, 1)
    tb.flush()
    logdir = default_store().artifact_dir(run.info.run_id, "tensorboard")
    events = [f for f in os.listdir(logdir) if "tfevents" in f]
    assert events, os.listdir(logdir)
    tb.close()


def test_tensorboard_replay_from_prior_run(run, tmp_path):
    prev_id = run.info.run_id
    for step, v in enumerate([1.0, 0.5, 0.3]):
        tracking.log_metric("loss", v, step=step)
    tracking.end_run()

    new = tracking.start_run()
    tb = TensorBoardMirror(new.info.run_id)
    if not tb.enabled:
        pytest.skip("no tensorboard writer available")
    assert tb.replay(prev_id, "loss") == 3
    tb.close()
    logdir = default_store().artifact_dir(new.info.run_id, "tensorboard")
    assert any("tfevents" in f for f in os.listdir(logdir))
