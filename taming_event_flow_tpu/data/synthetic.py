"""Synthetic HDF5 sequence writer (test fixture / smoke-train data).

Writes files with the reference's H5 schema (see ``data/h5.py`` module doc;
reference schema at ``dataloader/h5.py:127-162, 20-34``).
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import h5py
import numpy as np


def write_synthetic_h5(
    path: str,
    n_events: int = 4000,
    res: Tuple[int, int] = (32, 40),
    duration: float = 2.0,
    t_start: float = 100.0,
    n_flow_frames: int = 0,
    seed: int = 0,
    flow_magnitude: float = 2.0,
    gt_gap_after: Optional[int] = None,
    rectify: bool = False,
):
    """Create one synthetic event sequence.

    :param n_flow_frames: if > 0, adds ``flow/<i>`` GT maps with
        ``timestamp_from/to`` attrs evenly tiling the duration.
    :param gt_gap_after: if set, inserts a temporal gap in the events after
        this fraction of the duration (exercises ``ts_jump`` detection).
    :param rectify: if True, adds a DSEC-style ``rectification/rectify_map``
        + ``calibration/*`` (stringified dicts, reference
        ``dataloader/base.py:71-101``) for a mildly distorted camera, so
        the rectified loader/eval paths are exercisable without real DSEC
        data. Requires cv2.
    """
    rng = np.random.default_rng(seed)
    ts = np.sort(rng.uniform(0, duration, n_events)) + t_start
    if gt_gap_after is not None:
        gap_t = t_start + duration * gt_gap_after
        ts = np.where(ts > gap_t, ts + duration, ts)
    xs = rng.integers(0, res[1], n_events).astype(np.uint16)
    ys = rng.integers(0, res[0], n_events).astype(np.uint16)
    ps = rng.integers(0, 2, n_events).astype(np.uint8)

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with h5py.File(path, "w") as f:
        f.create_dataset("events/xs", data=xs)
        f.create_dataset("events/ys", data=ys)
        f.create_dataset("events/ts", data=ts.astype(np.float64))
        f.create_dataset("events/ps", data=ps)
        f.attrs["t0"] = ts[0]
        f.attrs["tk"] = ts[-1]
        f.attrs["duration"] = float(ts[-1] - ts[0])

        if rectify:
            import cv2

            h, w = res
            fx = fy = float(max(h, w))
            cx, cy = (w - 1) / 2.0, (h - 1) / 2.0
            dist = [0.05, -0.02, 0.001, 0.001]
            K = np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1.0]])
            # forward per-event map: undistort every integer pixel
            grid = np.stack(
                np.meshgrid(np.arange(w, dtype=np.float64),
                            np.arange(h, dtype=np.float64)),
                axis=-1,
            ).reshape(-1, 1, 2)
            rect = cv2.undistortPoints(
                grid, K, np.array(dist), R=np.eye(3), P=K
            ).reshape(h, w, 2)
            f.create_dataset(
                "rectification/rectify_map",
                data=rect.astype(np.float32),
            )
            cam = {
                "camera_matrix": [fx, fy, cx, cy],
                "distortion_coeffs": dist,
            }
            f.create_dataset(
                "calibration/intrinsics",
                data=str({"cam0": cam, "camRect0": cam}),
            )
            f.create_dataset(
                "calibration/extrinsics",
                data=str({"R_rect0": np.eye(3).tolist()}),
            )
            f.create_dataset(
                "calibration/disparity_to_depth",
                data=str({"cams_03": np.eye(4).tolist()}),
            )

        if n_flow_frames > 0:
            if gt_gap_after is None:
                edges = np.linspace(ts[0], ts[-1], n_flow_frames + 1)
            else:
                # a real recording discontinuity (e.g. a DSEC chunk
                # boundary): GT frames follow the data — no frame tiles the
                # event-free hole; the gap shows up as a timestamp jump
                # between consecutive frames (what ts_jump detection is for)
                edges = np.quantile(ts, np.linspace(0, 1, n_flow_frames + 1))
            for i in range(n_flow_frames):
                d = f.create_dataset(
                    f"flow/{i:06d}",
                    data=rng.normal(size=(res[0], res[1], 2)).astype(
                        np.float32
                    )
                    * flow_magnitude,
                )
                d.attrs["timestamp_from"] = edges[i]
                d.attrs["timestamp_to"] = edges[i + 1]
    return path
