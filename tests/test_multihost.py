"""Multi-host (DCN) surface: a REAL 2-process jax.distributed CPU cluster
must reproduce the single-process training step exactly.

This is the multi-process analog of the virtual 8-CPU mesh tests
(``tests/test_parallel_event.py``): two OS processes, each owning 2 CPU
devices, form a global 4-device ``(data, event)`` mesh; each process streams
only its own batch lanes (``local_lane_range``), assembles global arrays via
``globalize_window``, and runs the unmodified event-parallel train step.
The parent then runs the SAME global batch single-process and compares
losses and updated parameters.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import json, os, sys
port, pid, nproc = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
sys.path.insert(0, os.environ["REPO"])
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(f"127.0.0.1:{port}", num_processes=nproc,
                           process_id=pid)
import jax.numpy as jnp
import numpy as np
from taming_event_flow_tpu.models import RecEVFlowNet
from taming_event_flow_tpu.objectives import LossConfig
from taming_event_flow_tpu.parallel import (
    globalize_state, globalize_window, local_lane_range,
    make_multihost_event_mesh, make_event_parallel_train_step,
)
from taming_event_flow_tpu.training import build_optimizer
from taming_event_flow_tpu.training.step import init_train_state

RES = (16, 16); PASSES = 2; N = 128; B_GLOBAL = 2; N_EVENT = 2

mesh = make_multihost_event_mesh(n_event=N_EVENT)
assert mesh.devices.shape == (2, 2), mesh.devices.shape
lo, hi = local_lane_range(B_GLOBAL)
b_local = hi - lo

model = RecEVFlowNet(num_bins=2, base_channels=8, num_encoders=2,
                     num_residual_blocks=1, min_size=4)
cfg = LossConfig(res=RES, passes_loss=PASSES, scales_loss=1,
                 iterative_mode="two")
opt = build_optimizer({"name": "Adam", "lr": 1e-4}, clip_grad=100.0)
state = init_train_state(model, opt, b_local, RES[0], RES[1], 2,
                         rng_key=jax.random.PRNGKey(0))
state = globalize_state(state, mesh, B_GLOBAL)
step = make_event_parallel_train_step(model, opt, cfg, mesh, "Iterative",
                                      flow_scaling=8.0)

# deterministic global window; each process materializes ONLY its lanes
rng = np.random.default_rng(42)
ev = np.zeros((PASSES, B_GLOBAL, N, 4), np.float32)
ev[..., 0] = rng.uniform(0, 1, ev.shape[:-1])
ev[..., 1] = rng.integers(0, RES[0], ev.shape[:-1])
ev[..., 2] = rng.integers(0, RES[1], ev.shape[:-1])
ev[..., 3] = rng.choice([-1.0, 1.0], ev.shape[:-1])
net = rng.normal(size=(PASSES, B_GLOBAL, RES[0], RES[1], 2)).astype(
    np.float32)
pol = np.stack([ev[..., 3] > 0, ev[..., 3] < 0], -1).astype(np.float32)
gm = np.ones((PASSES, B_GLOBAL, N, 1), np.float32)

local = {
    "net_input": net[:, lo:hi], "event_list": ev[:, lo:hi],
    "pol_mask": pol[:, lo:hi], "grad_mask": gm[:, lo:hi],
}
window = globalize_window(local, mesh, B_GLOBAL)

losses = []
for _ in range(2):
    state, loss = step(state, window)
    losses.append(float(loss))

leaves = jax.tree.leaves(state.params)
psum = float(sum(jnp.sum(jnp.abs(l)).item() for l in leaves))
print("RESULT" + json.dumps({"pid": pid, "losses": losses, "psum": psum}),
      flush=True)
"""


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_cluster_matches_single_process(tmp_path):
    port = _free_port()
    env = dict(os.environ, REPO=REPO)
    env.pop("PYTEST_CURRENT_TEST", None)
    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(port), str(pid), "2"],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        )
        for pid in range(2)
    ]
    outs = [p.communicate(timeout=600)[0] for p in procs]
    results = {}
    for out, p in zip(outs, procs):
        assert p.returncode == 0, out[-3000:]
        for line in out.splitlines():
            if line.startswith("RESULT"):
                r = json.loads(line[len("RESULT"):])
                results[r["pid"]] = r
    assert set(results) == {0, 1}, outs

    # both processes observe the identical replicated loss/params
    np.testing.assert_allclose(results[0]["losses"], results[1]["losses"],
                               rtol=0, atol=0)
    np.testing.assert_allclose(results[0]["psum"], results[1]["psum"],
                               rtol=0, atol=0)

    # single-process run of the same global batch (4 virtual devices, same
    # mesh shape) must agree bit-for-bit
    import jax
    import jax.numpy as jnp
    from taming_event_flow_tpu.models import RecEVFlowNet
    from taming_event_flow_tpu.objectives import LossConfig
    from taming_event_flow_tpu.parallel import (
        make_event_mesh, make_event_parallel_train_step, shard_state_2d,
        shard_window_2d,
    )
    from taming_event_flow_tpu.training import build_optimizer
    from taming_event_flow_tpu.training.step import init_train_state

    RES, PASSES, N, B = (16, 16), 2, 128, 2
    model = RecEVFlowNet(num_bins=2, base_channels=8, num_encoders=2,
                         num_residual_blocks=1, min_size=4)
    cfg = LossConfig(res=RES, passes_loss=PASSES, scales_loss=1,
                     iterative_mode="two")
    opt = build_optimizer({"name": "Adam", "lr": 1e-4}, clip_grad=100.0)
    state = init_train_state(model, opt, B, RES[0], RES[1], 2,
                             rng_key=jax.random.PRNGKey(0))
    mesh = make_event_mesh(2, 2, devices=jax.devices()[:4])
    step = make_event_parallel_train_step(model, opt, cfg, mesh, "Iterative",
                                          flow_scaling=8.0)
    rng = np.random.default_rng(42)
    ev = np.zeros((PASSES, B, N, 4), np.float32)
    ev[..., 0] = rng.uniform(0, 1, ev.shape[:-1])
    ev[..., 1] = rng.integers(0, RES[0], ev.shape[:-1])
    ev[..., 2] = rng.integers(0, RES[1], ev.shape[:-1])
    ev[..., 3] = rng.choice([-1.0, 1.0], ev.shape[:-1])
    window = {
        "net_input": jnp.asarray(rng.normal(
            size=(PASSES, B, RES[0], RES[1], 2)), jnp.float32),
        "event_list": jnp.asarray(ev),
        "pol_mask": jnp.asarray(
            np.stack([ev[..., 3] > 0, ev[..., 3] < 0], -1), jnp.float32),
        "grad_mask": jnp.ones((PASSES, B, N, 1), jnp.float32),
    }
    state = shard_state_2d(state, mesh)
    window = shard_window_2d(window, mesh)
    losses = []
    for _ in range(2):
        state, loss = step(state, window)
        losses.append(float(loss))
    psum = float(sum(jnp.sum(jnp.abs(l)).item()
                     for l in jax.tree.leaves(state.params)))

    np.testing.assert_allclose(results[0]["losses"], losses, rtol=1e-6)
    np.testing.assert_allclose(results[0]["psum"], psum, rtol=1e-6)


@pytest.mark.slow
def test_train_cli_two_hosts_matches_single(tmp_path):
    """The real train_flow.py CLI over a 2-process cluster: same synthetic
    dataset, same seed — the distributed run's loss history must match the
    single-process run's TIGHTLY.

    Both runs are arranged to compile the SAME shard_map program — the
    2-host run as (data=2 hosts, event=2 local devices), the single-process
    run as (data=2, event=2) over 4 virtual devices — so reduction
    association is structurally identical and the comparison needs no
    drift allowance (the step-level analog,
    ``test_two_process_cluster_matches_single_process``, pins the same
    correspondence at rtol 1e-6)."""
    import yaml

    from taming_event_flow_tpu.data.synthetic import write_synthetic_h5

    ds = tmp_path / "data"
    ds.mkdir()
    write_synthetic_h5(str(ds / "a.h5"), n_events=2000, res=(16, 16), seed=1)
    write_synthetic_h5(str(ds / "b.h5"), n_events=1800, res=(16, 16), seed=2)

    cfg = {
        "experiment": "mh",
        "data": {"path": str(ds), "mode": "time", "window": 0.25,
                 "passes_loss": 2, "scales_loss": 1, "voxel": None,
                 "cache": False},
        "model": {"name": "RecEVFlowNet", "base_channels": 8,
                  "num_encoders": 2, "num_residual_blocks": 1,
                  "min_size": 4, "final_w_scale": 0.01},
        "loss": {"warping": "Iterative", "iterative_mode": "two",
                 "round_ts": False, "flow_scaling": 8, "clip_grad": 100.0},
        "optimizer": {"name": "Adam", "lr": 0.0001},
        "loader": {"n_epochs": 1, "batch_size": 2, "resolution": [16, 16],
                   "augment": [], "augment_prob": [],
                   "max_num_grad_events": None, "seed": 7,
                   # required in multihost mode: static event buckets keep
                   # the per-host program shapes identical (train_flow.py)
                   "n_events_pad": 1024},
        "vis": {"verbose": False, "enabled": False, "store": False},
        # event axis 2: together with XLA_FLAGS below this makes BOTH runs
        # compile the same (data=2, event=2) shard_map program
        "parallel": {"event": 2},
    }
    cfg_path = tmp_path / "train.yml"
    cfg_path.write_text(yaml.safe_dump(cfg))

    def spawn(pid, port, workdir):
        env = dict(
            os.environ,
            PYTHONPATH=REPO,
            JAX_PLATFORMS="cpu",
            XLA_FLAGS="--xla_force_host_platform_device_count=2",
            JAX_COORDINATOR_ADDRESS=f"127.0.0.1:{port}",
            JAX_NUM_PROCESSES="2",
            JAX_PROCESS_ID=str(pid),
        )
        return subprocess.Popen(
            [sys.executable, os.path.join(REPO, "train_flow.py"),
             "--config", str(cfg_path), "--path_mlflow", str(workdir)],
            env=env, cwd=str(workdir), stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True,
        )

    mh_dir = tmp_path / "mh"
    mh_dir.mkdir()
    port = _free_port()
    procs = [spawn(pid, port, mh_dir) for pid in range(2)]
    outs = [p.communicate(timeout=900)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-4000:]
    runid = next(
        line.split()[-1] for line in outs[0].splitlines()
        if line.startswith("Run id:")
    )

    # single-process reference run of the identical config
    sp_dir = tmp_path / "sp"
    sp_dir.mkdir()
    env = dict(os.environ, PYTHONPATH=REPO, JAX_PLATFORMS="cpu",
               XLA_FLAGS="--xla_force_host_platform_device_count=4")
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "train_flow.py"),
         "--config", str(cfg_path), "--path_mlflow", str(sp_dir)],
        env=env, cwd=str(sp_dir), capture_output=True, text=True,
        timeout=900,
    )
    assert out.returncode == 0, out.stdout[-4000:] + out.stderr[-2000:]
    sp_runid = next(
        line.split()[-1] for line in out.stdout.splitlines()
        if line.startswith("Run id:")
    )

    def losses(root, rid):
        with open(os.path.join(root, "mlruns", "0", rid, "metrics",
                               "loss")) as f:
            return [float(l.split()[1]) for l in f]

    mh = losses(str(mh_dir), runid)
    sp = losses(str(sp_dir), sp_runid)
    assert len(mh) == len(sp) >= 1
    # same shard_map program on both sides (see docstring): only
    # DCN-vs-local collective routing differs, which is associativity-
    # preserving — tight agreement over the whole epoch history
    np.testing.assert_allclose(mh, sp, rtol=1e-5)
    # checkpoint written by the main process only
    assert os.path.isfile(os.path.join(
        str(mh_dir), "mlruns", "0", runid, "artifacts", "model",
        "checkpoint.msgpack"))


def test_local_lane_range_single_process():
    from taming_event_flow_tpu.parallel import local_lane_range

    assert local_lane_range(8) == (0, 8)


def test_init_distributed_noop_without_config():
    from taming_event_flow_tpu.parallel import init_distributed

    assert init_distributed({}) is False
    assert init_distributed(None) is False
