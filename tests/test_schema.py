"""Schema fidelity: the synthetic H5 writer is locked, field for field, to
the layout the reference's published converters produce and its loader
consumes (reference ``dataloader/h5.py:268-431`` event/flow access,
``dataloader/base.py:60-127`` calibration strings). Real DSEC/MVSEC h5
trees and our synthetic fixtures are interchangeable at the schema level —
this is what lets ``scripts/validate_against_reference.py`` promise the
same entry point for both."""

import h5py
import numpy as np

from taming_event_flow_tpu.data.synthetic import write_synthetic_h5


def test_synthetic_schema_matches_reference_events(tmp_path):
    path = write_synthetic_h5(str(tmp_path / "s.h5"), n_events=500,
                              res=(24, 30), n_flow_frames=4, seed=2)
    with h5py.File(path, "r") as f:
        # event arrays: the reference reads exactly these four datasets by
        # slice (reference h5.py:139-142) and requires sorted timestamps
        # for its binary search (h5.py:203-212)
        xs, ys = f["events/xs"][:], f["events/ys"][:]
        ts, ps = f["events/ts"][:], f["events/ps"][:]
        assert xs.dtype == np.uint16 and ys.dtype == np.uint16
        assert ts.dtype == np.float64
        assert ps.dtype == np.uint8
        assert len(xs) == len(ys) == len(ts) == len(ps) == 500
        assert np.all(np.diff(ts) >= 0)
        assert xs.max() < 30 and ys.max() < 24
        assert set(np.unique(ps)) <= {0, 1}  # polarity stored 0/1

        # file attrs: t0/tk anchor window arithmetic (h5.py:143,194),
        # duration drives time-mode iteration (h5.py:118,326)
        assert f.attrs["t0"] == ts[0]
        assert f.attrs["tk"] == ts[-1]
        assert np.isclose(f.attrs["duration"], ts[-1] - ts[0])

        # GT flow maps: named children of "flow/" with from/to attrs
        # (FlowMaps visitor, reference h5.py:26-34), [H, W, 2] float32
        names = sorted(f["flow"].keys())
        assert len(names) == 4
        prev_to = None
        for n in names:
            d = f["flow"][n]
            assert d.shape == (24, 30, 2) and d.dtype == np.float32
            t_from, t_to = d.attrs["timestamp_from"], d.attrs["timestamp_to"]
            assert t_from < t_to
            if prev_to is not None:
                assert np.isclose(t_from, prev_to)  # frames tile the time
            prev_to = t_to
        # frame timestamps live inside the event record
        assert f["flow"][names[0]].attrs["timestamp_from"] >= ts[0] - 1e-9
        assert f["flow"][names[-1]].attrs["timestamp_to"] <= ts[-1] + 1e-9


def test_synthetic_schema_matches_reference_calibration(tmp_path):
    """The rectified variant must satisfy the reference's EXACT access
    idiom — stringified dicts pulled apart with ``eval`` and fixed keys
    (reference ``dataloader/base.py:71-101``)."""
    cv2 = __import__("pytest").importorskip("cv2")  # noqa: F841
    path = write_synthetic_h5(str(tmp_path / "r.h5"), n_events=300,
                              res=(24, 30), rectify=True, seed=5)
    with h5py.File(path, "r") as f:
        rect = f["rectification/rectify_map"][:]
        assert rect.shape == (24, 30, 2) and rect.dtype == np.float32

        # the reference's own parsing expressions, verbatim
        intr = eval(f["calibration/intrinsics"][()])
        K_dist = intr["cam0"]["camera_matrix"]
        K_rect = intr["camRect0"]["camera_matrix"]
        dist_coeffs = intr["cam0"]["distortion_coeffs"]
        assert len(K_dist) == 4 and len(K_rect) == 4
        assert len(dist_coeffs) == 4

        R_rect = eval(f["calibration/extrinsics"][()])["R_rect0"]
        assert np.asarray(R_rect).shape == (3, 3)

        Q = eval(f["calibration/disparity_to_depth"][()])["cams_03"]
        assert np.asarray(Q).shape == (4, 4)
