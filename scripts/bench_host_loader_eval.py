"""Host-side window production at the DSEC eval protocol scale.

The windowed eval step runs 8.5 ms/pass on-device (85 ms per 10-pass GT
window at 480x640); this measures whether the host loader can produce
gtflow windows at that rate. Synthetic sequences carry the DSEC event rate
(~200k events / 100 ms window) and GT flow frames; rectification is not
exercised (the rectify lookup is one fancy-index per window — measured
separately as ~2 ms at this rate).

Usage: python scripts/bench_host_loader_eval.py [events_per_window]
"""

import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

import numpy as np

from taming_event_flow_tpu.data.h5 import H5Loader
from taming_event_flow_tpu.data.synthetic import write_synthetic_h5


def main():
    ev_per_window = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    res = (480, 640)
    passes = 10
    window_frac = 1.0 / passes  # gtflow window=0.1 = 1/10 GT frame
    duration = 2.0
    n_frames = 20
    n_events = ev_per_window * passes * n_frames

    tmp = tempfile.mkdtemp(prefix="hostbench_eval_")
    t0 = time.perf_counter()
    write_synthetic_h5(
        f"{tmp}/seq.h5", n_events=n_events, res=res, duration=duration,
        n_flow_frames=n_frames, seed=0,
    )
    print(f"wrote {n_events / 1e6:.1f}M events in "
          f"{time.perf_counter() - t0:.1f}s")

    config = {
        "data": {"path": tmp, "mode": "gtflow", "window": window_frac,
                 "voxel": None, "cache": False},
        "loader": {
            "batch_size": 1, "resolution": list(res),
            "augment": [], "augment_prob": [],
            "max_num_grad_events": None,
            "n_events_pad": None, "seed": 7,
        },
    }
    loader = H5Loader(config, shuffle=False)

    for _ in range(10):
        loader.next_batch()

    iters = 60
    t0 = time.perf_counter()
    for _ in range(iters):
        loader.next_batch()
    dt = (time.perf_counter() - t0) / iters
    print(f"events/window={ev_per_window}  res={res}  gtflow 1/{passes}")
    print(f"next_batch: {dt * 1e3:.2f} ms/pass "
          f"(device eval step: 8.5 ms/pass at DSEC)")


if __name__ == "__main__":
    main()
