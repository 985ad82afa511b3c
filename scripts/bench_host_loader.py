"""Host-side window-production throughput at the training configuration.

The jitted TBPTT step consumes one pass-stacked window (P=10 batches of
B lanes) per device dispatch; at the measured 222 ms/step (B=8) the host
must produce a collated batch every 22.2 ms to keep the chip fed (the
prefetcher overlaps production with device time, but only if the host can
sustain the rate). This measures `H5Loader.next_batch` on synthetic
sequences with a realistic event rate and reports ms/batch + the
utilization bound it implies for the device step.

Usage: python scripts/bench_host_loader.py [events_per_window]
"""

import cProfile
import io
import pstats
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

import numpy as np

from taming_event_flow_tpu.data.h5 import H5Loader
from taming_event_flow_tpu.data.synthetic import write_synthetic_h5


def main():
    ev_per_window = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    batch = 8
    window_s = 0.01
    duration = 20.0
    n_events = int(duration / window_s * ev_per_window)

    tmp = tempfile.mkdtemp(prefix="hostbench_")
    for i in range(batch):
        write_synthetic_h5(
            f"{tmp}/seq_{i}.h5", n_events=n_events, res=(128, 128),
            duration=duration, seed=i,
        )

    config = {
        "data": {"path": tmp, "mode": "time", "window": window_s,
                 "voxel": None, "cache": False},
        "loader": {
            "batch_size": batch, "resolution": [128, 128],
            "augment": ["Horizontal", "Vertical", "Polarity"],
            "augment_prob": [0.5, 0.5, 0.5],
            "max_num_grad_events": 10000,
            "n_events_pad": None, "seed": 7,
        },
    }
    loader = H5Loader(config, shuffle=False)

    # warm up: open files, build ts indexes, stabilize bucket sizes
    for _ in range(20):
        loader.next_batch()

    iters = 200
    t0 = time.perf_counter()
    for _ in range(iters):
        loader.next_batch()
    dt = (time.perf_counter() - t0) / iters
    samples_s = batch / dt
    print(f"events/window={ev_per_window}  batch={batch}")
    print(f"next_batch: {dt * 1e3:.2f} ms  ({samples_s:.0f} samples/s)")
    print(f"10-pass window production: {dt * 10 * 1e3:.1f} ms "
          f"(device step budget at B=8: 222 ms)")

    pr = cProfile.Profile()
    pr.enable()
    for _ in range(50):
        loader.next_batch()
    pr.disable()
    s = io.StringIO()
    pstats.Stats(pr, stream=s).sort_stats("cumulative").print_stats(18)
    print(s.getvalue())


if __name__ == "__main__":
    main()
