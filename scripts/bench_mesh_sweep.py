"""Multi-chip data-parallel training sweep: (warping passes x window length)
over a (data x event) TPU mesh — BASELINE.json config 5.

The reference has nothing to mirror here (it is single-device by design,
``/root/reference/configs/parser.py:89-95``); this sweep exercises the TPU
build's own distributed surface (``parallel/event.py``) across the loss
axes that set the warp-table size: ``passes_loss`` (the triangular table is
O(P^2) warps) and events/window (the factor-traffic bandwidth axis).

Run modes:
  * default — virtual 8-CPU mesh (same trick as tests/conftest.py): a
    *functional* sweep proving every grid point compiles and executes under
    real (data x event) shard_map shardings. CPU timings are not TPU
    predictions; the per-config "ms/step" is printed for shape-trend
    inspection only.
  * ``--real`` — use whatever devices the process sees (a real TPU mesh on
    a SINGLE-HOST slice; shardings here are plain ``jax.device_put`` over
    ``jax.devices()``, so a multi-host slice needs the
    ``parallel/multihost.py`` helpers instead — see ``tests/test_multihost``
    for that path). There the numbers are honest (readback-synced, see
    bench_util.sync) and directly comparable to the single-chip
    ``scripts/bench_scaling.py`` grid.

Usage:
    python scripts/bench_mesh_sweep.py [--real] [--data N] [--event N]
"""

import argparse
import os
import re
import sys

import numpy as np


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--real", action="store_true",
                        help="use the process's real devices (no CPU pin)")
    parser.add_argument("--data", type=int, default=4,
                        help="mesh size along the data (batch) axis")
    parser.add_argument("--event", type=int, default=2,
                        help="mesh size along the event axis")
    parser.add_argument("--iters", type=int, default=3)
    parser.add_argument("--quick", action="store_true",
                        help="single grid point (smoke test)")
    args = parser.parse_args(argv)

    n_dev = args.data * args.event
    if not args.real:
        # mirror tests/conftest.py: the env-var route is NOT honored on
        # this stack (CLAUDE.md), pin via jax.config after import. Any
        # pre-existing device-count flag (e.g. from a wrapper) is replaced,
        # not duplicated.
        flags = re.sub(
            r"--xla_force_host_platform_device_count=\d+",
            "",
            os.environ.get("XLA_FLAGS", ""),
        )
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={n_dev}"
        ).strip()
        import jax

        jax.config.update("jax_platforms", "cpu")
    else:
        import jax

        if jax.process_count() > 1:
            parser.error(
                "--real on a multi-host slice is not supported: this sweep "
                "shards with plain device_put over jax.devices(); use the "
                "parallel/multihost.py helpers (globalize_window/"
                "globalize_state) for multi-process runs."
            )

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, os.path.join(repo, "scripts"))
    sys.path.insert(0, repo)
    from bench_util import synthetic_window, timeit

    from taming_event_flow_tpu.models import RecEVFlowNet
    from taming_event_flow_tpu.objectives import LossConfig
    from taming_event_flow_tpu.parallel import (
        make_event_mesh,
        make_event_parallel_train_step,
        shard_state_2d,
        shard_window_2d,
    )
    from taming_event_flow_tpu.training import build_optimizer
    from taming_event_flow_tpu.training.step import init_train_state

    devices = jax.devices()
    assert len(devices) >= n_dev, (len(devices), n_dev)
    mesh = make_event_mesh(args.data, args.event, devices[:n_dev])
    print(f"mesh: data={args.data} x event={args.event} on "
          f"{devices[0].platform}", flush=True)

    res = (128, 128) if args.real else (64, 64)
    # shard_map needs batch % data-axis == 0: round up to a multiple
    batch = max(8, args.data)
    batch += -batch % args.data
    rng = np.random.default_rng(0)

    # --quick: dryrun-scale shapes (a CPU-mesh compile of the full-size
    # step takes >10 min on the 1-core host; this is a wiring smoke only)
    if args.quick:
        res, batch = (32, 32), args.data
    grid_p = (3,) if args.quick else (5, 10, 20)
    grid_n = (512,) if args.quick else (4096, 8192, 16384)
    bad = [n for n in grid_n if n % args.event]
    if bad:
        parser.error(
            f"event-axis size {args.event} does not divide the event grid "
            f"{bad}; shard_map requires n_events % event == 0 — pick an "
            "--event from {1, 2, 4, 8, 16}."
        )
    for passes in grid_p:
        for n_events in grid_n:
            model = RecEVFlowNet(num_bins=2, final_w_scale=0.01)
            cfg = LossConfig(res=res, passes_loss=passes, scales_loss=1,
                             iterative_mode="two")
            opt = build_optimizer({"name": "Adam", "lr": 1e-5},
                                  clip_grad=100.0)
            state = shard_state_2d(
                init_train_state(model, opt, batch, res[0], res[1], 2),
                mesh,
            )
            step = make_event_parallel_train_step(model, opt, cfg, mesh)
            window = shard_window_2d(
                synthetic_window(rng, passes, batch, n_events, res), mesh)
            t = timeit(step, state, window, iters=args.iters)
            warps = passes * n_events * batch * passes * 4
            print(f"P={passes:>2} N={n_events:>5}: {t*1e3:8.1f} ms/step | "
                  f"{warps/t/1e6:7.1f} Mev/s warped | "
                  f"{batch/t:6.1f} samples/s", flush=True)


if __name__ == "__main__":
    main()
