"""Streaming-loader tests: windowing modes, rollover, padding, playback,
grad-mask split, cache, and batch parity with the torch reference loader."""

import os

import numpy as np
import pytest

from taming_event_flow_tpu.data import H5Loader, bucket_size
from taming_event_flow_tpu.data.synthetic import write_synthetic_h5

from .oracle import requires_reference, shim_reference_deps

RES = (32, 40)


def make_config(path, mode="time", window=0.2, batch_size=1, augment=(),
                augment_prob=(), voxel=None, max_grad=None, cache=False,
                seed=7):
    return {
        "data": {
            "path": path, "mode": mode, "window": window,
            "voxel": voxel, "cache": cache,
        },
        "loader": {
            "resolution": list(RES),
            "batch_size": batch_size,
            "augment": list(augment),
            "augment_prob": list(augment_prob),
            "max_num_grad_events": max_grad,
            "seed": seed,
        },
        "vis": {"bars": False},
    }


@pytest.fixture
def dataset_dir(tmp_path):
    d = tmp_path / "ds"
    d.mkdir()
    write_synthetic_h5(str(d / "seq0.h5"), n_events=3000, res=RES, seed=1)
    write_synthetic_h5(str(d / "seq1.h5"), n_events=2500, res=RES, seed=2)
    return str(d)


def test_time_mode_windows(dataset_dir):
    loader = H5Loader(make_config(dataset_dir, mode="time", window=0.25))
    batch = loader.next_batch()
    ev = batch["event_list"]
    pm = batch["event_list_pol_mask"]
    assert ev.shape[0] == 1 and ev.shape[2] == 4
    assert ev.shape[1] == bucket_size(int(pm.sum()))
    n_real = int(pm.sum(-1).astype(bool).sum())
    # ts normalized to [0, 1]
    real_ts = ev[0, :n_real, 0]
    assert real_ts.min() >= 0 and real_ts.max() <= 1.0
    # padding rows are fully zero
    assert np.all(ev[0, n_real:] == 0)
    assert np.all(pm[0, n_real:] == 0)
    # net_input is the count encoding by default
    np.testing.assert_allclose(batch["net_input"], batch["event_cnt"])
    assert batch["event_mask"].shape == (1, RES[0], RES[1], 1)


def test_events_mode_exact_counts(dataset_dir):
    loader = H5Loader(make_config(dataset_dir, mode="events", window=500))
    batch = loader.next_batch()
    n_real = int(batch["event_list_pol_mask"][0].sum())
    assert n_real == 500


def test_sequence_rollover_and_new_seq(dataset_dir):
    loader = H5Loader(make_config(dataset_dir, mode="events", window=1400))
    seen_new = 0
    for _ in range(6):
        batch = loader.next_batch()
        seen_new += int(batch["new_seq"][0])
    assert seen_new >= 1
    assert loader.seq_num >= 1


def test_gtflow_windows(tmp_path):
    d = tmp_path / "gt"
    d.mkdir()
    write_synthetic_h5(
        str(d / "seq.h5"), n_events=4000, res=RES, n_flow_frames=10, seed=3
    )
    loader = H5Loader(make_config(str(d), mode="gtflow", window=1))
    batch = loader.next_batch()
    assert batch["gtflow"].shape == (1, RES[0], RES[1], 2)
    assert batch["gtflow_dt"].shape == (1,)
    assert batch["gtflow_dt"][0] > 0


def test_gtflow_ts_jump_skips_and_flags(tmp_path):
    d = tmp_path / "gtj"
    d.mkdir()
    write_synthetic_h5(
        str(d / "seq.h5"), n_events=4000, res=RES, n_flow_frames=10,
        seed=4, gt_gap_after=0.5,
    )
    loader = H5Loader(make_config(str(d), mode="gtflow", window=1))
    flagged = False
    for _ in range(12):
        batch = loader.next_batch()
        if batch["ts_jump_reset"][0]:
            flagged = True
            break
    assert flagged


def test_grad_mask_split(dataset_dir):
    loader = H5Loader(
        make_config(dataset_dir, mode="events", window=800, max_grad=100)
    )
    batch = loader.next_batch()
    gm = batch["grad_mask"][0]
    pm = batch["event_list_pol_mask"][0]
    assert int(gm.sum()) == 100
    # grad events are a subset of real events
    real = pm.sum(-1) > 0
    assert np.all(real[gm[:, 0] > 0])


def test_polarity_augmentation(dataset_dir):
    loader = H5Loader(
        make_config(
            dataset_dir, mode="events", window=500,
            augment=["Polarity"], augment_prob=[1.0],
        )
    )
    plain = H5Loader(make_config(dataset_dir, mode="events", window=500))
    b_aug = loader.next_batch()
    b_plain = plain.next_batch()
    n = 500
    np.testing.assert_allclose(
        b_aug["event_list"][0, :n, 3], -b_plain["event_list"][0, :n, 3]
    )


def test_playback_reverses_stream(dataset_dir):
    loader = H5Loader(
        make_config(
            dataset_dir, mode="events", window=400,
            augment=["Playback"], augment_prob=[1.0],
        )
    )
    plain = H5Loader(make_config(dataset_dir, mode="events", window=400))
    b_rev = loader.next_batch()
    b_fwd = plain.next_batch()
    n = 400
    # first reversed window = last forward events mirrored in x/y
    import h5py

    with h5py.File(os.path.join(dataset_dir, "seq0.h5"), "r") as f:
        xs = f["events/xs"][:]
    np.testing.assert_allclose(
        b_rev["event_list"][0, :n, 2], xs[-n:][::-1].astype(np.float32)
    )
    # reversed ts still normalized ascending [0, 1]
    ts = b_rev["event_list"][0, :n, 0]
    assert np.all(np.diff(ts) >= 0)


def test_cache_roundtrip(dataset_dir, tmp_path):
    cfg = make_config(dataset_dir, mode="events", window=600, cache=True)
    loader = H5Loader(cfg, path_cache=str(tmp_path / "cache"))
    b1 = loader.next_batch()
    loader2 = H5Loader(cfg, path_cache=str(tmp_path / "cache"))
    b2 = loader2.next_batch()
    np.testing.assert_allclose(b1["net_input"], b2["net_input"])
    np.testing.assert_allclose(b1["event_list"], b2["event_list"])


def test_multi_lane_batch(dataset_dir):
    loader = H5Loader(make_config(dataset_dir, mode="events", window=300,
                                  batch_size=2))
    batch = loader.next_batch()
    assert batch["net_input"].shape[0] == 2
    assert batch["event_list"].shape[0] == 2
    # lanes stream different files
    assert loader.lanes[0].path != loader.lanes[1].path


@requires_reference
def test_batch_parity_with_reference_loader(tmp_path):
    """Same file, no augmentation: our batch matches the reference loader's."""
    import torch
    shim_reference_deps()
    from dataloader.h5 import H5Loader as RefLoader

    d = tmp_path / "par"
    d.mkdir()
    write_synthetic_h5(str(d / "seq.h5"), n_events=3000, res=RES, seed=5)

    ours = H5Loader(make_config(str(d), mode="time", window=0.3))

    ref_cfg = {
        "data": {"path": str(d), "mode": "time", "window": 0.3,
                 "voxel": None, "cache": False},
        "loader": {"resolution": list(RES), "batch_size": 1, "augment": [],
                   "augment_prob": [], "max_num_grad_events": None,
                   "device": torch.device("cpu")},
        "vis": {"bars": False},
    }
    ref = RefLoader(ref_cfg)

    for step in range(3):
        b = ours.next_batch()
        r = ref[0]
        ref_ev = r["event_list"].numpy().T  # [N, 4]
        n = ref_ev.shape[0]
        np.testing.assert_allclose(
            b["event_list"][0, :n], ref_ev, atol=1e-5,
            err_msg=f"step {step} events",
        )
        assert np.all(b["event_list_pol_mask"][0, n:] == 0)
        np.testing.assert_allclose(
            b["event_cnt"][0],
            np.moveaxis(r["event_cnt"].numpy(), 0, -1),
            atol=1e-5, err_msg=f"step {step} cnt",
        )
        np.testing.assert_allclose(
            b["event_mask"][0],
            np.moveaxis(r["event_mask"].numpy(), 0, -1),
            atol=1e-5,
        )


@requires_reference
def test_voxel_parity_with_reference_loader(tmp_path):
    import torch
    shim_reference_deps()
    from dataloader.h5 import H5Loader as RefLoader

    d = tmp_path / "vox"
    d.mkdir()
    write_synthetic_h5(str(d / "seq.h5"), n_events=2000, res=RES, seed=6)

    ours = H5Loader(make_config(str(d), mode="events", window=700, voxel=5))
    ref_cfg = {
        "data": {"path": str(d), "mode": "events", "window": 700,
                 "voxel": 5, "cache": False},
        "loader": {"resolution": list(RES), "batch_size": 1, "augment": [],
                   "augment_prob": [], "max_num_grad_events": None,
                   "device": torch.device("cpu")},
        "vis": {"bars": False},
    }
    ref = RefLoader(ref_cfg)
    b = ours.next_batch()
    r = ref[0]
    np.testing.assert_allclose(
        b["net_input"][0],
        np.moveaxis(r["net_input"].numpy(), 0, -1),
        atol=1e-4,
    )


def test_fixed_event_cap_truncates_with_warning(dataset_dir):
    cfg = make_config(dataset_dir, mode="events", window=500)
    cfg["loader"]["n_events_pad"] = 128  # deliberately below the window size
    loader = H5Loader(cfg)
    with pytest.warns(UserWarning, match="n_events_pad"):
        batch = loader.next_batch()
    assert batch["event_list"].shape[1] == 128
    assert loader.truncated_events > 0

    # cap above the window size: static shape, no warning, no truncation
    cfg2 = make_config(dataset_dir, mode="events", window=500)
    cfg2["loader"]["n_events_pad"] = 1024
    loader2 = H5Loader(cfg2)
    import warnings as _w

    with _w.catch_warnings():
        _w.simplefilter("error")
        b2 = loader2.next_batch()
    assert b2["event_list"].shape[1] == 1024
    assert loader2.truncated_events == 0


def test_find_ts_index_matches_bisect_getter(dataset_dir):
    """The coarse-index timestamp search equals the exact per-element
    bisection for both raw and playback-virtual streams (incl. duplicate
    timestamps and out-of-range probes)."""
    from taming_event_flow_tpu.data.h5 import H5Loader, bisect_getter

    cfg = {
        "data": {"path": str(dataset_dir), "mode": "time", "window": 0.05,
                 "passes_loss": 2, "cache": False, "voxel": None,
                 "scales_loss": 1},
        "loader": {"resolution": [16, 16], "batch_size": 1, "augment": [],
                   "max_num_grad_events": None, "n_events_pad": None,
                   "seed": 3, "n_epochs": 1},
        "loss": {}, "vis": {},
    }
    data = H5Loader(cfg)
    lane = data.lanes[0]
    # force a tiny stride so the coarse path actually brackets
    lane.ts_coarse = None
    ts = np.asarray(lane.file["events/ts"])
    lane.ts_stride = 7
    lane.ts_coarse = ts[::7]

    t0, tk = float(ts[0]), float(ts[-1])
    probes = list(np.linspace(t0 - 0.1, tk + 0.1, 23)) + [
        t0, tk, float(ts[len(ts) // 2])
    ]
    for playback in (False, True):
        lane.playback = playback
        lane.t_min, lane.t_max = t0, tk
        get, n = data._virtual_ts(lane)
        for t in probes:
            assert data.find_ts_index(lane, t) == bisect_getter(get, n, t), (
                playback, t
            )


def test_prefetcher_order_and_exceptions():
    """Prefetcher preserves order exactly and re-raises producer errors."""
    from taming_event_flow_tpu.data.prefetch import Prefetcher

    assert list(Prefetcher(iter(range(100)), depth=3)) == list(range(100))

    def boom():
        yield 1
        yield 2
        raise RuntimeError("producer died")

    it = iter(Prefetcher(boom(), depth=2))
    assert next(it) == 1
    assert next(it) == 2
    try:
        next(it)
        raise AssertionError("expected RuntimeError")
    except RuntimeError as e:
        assert "producer died" in str(e)


def test_file_shard_partitions_disjointly(tmp_path):
    """Multi-host file sharding: the host shards are disjoint, cover the
    dataset, and sequence rollover stays INSIDE the host's shard (without
    sharding, each host's ``max(local file_idx) + 1`` rollover would
    collide with files other hosts already stream)."""
    d = tmp_path / "ds4"
    d.mkdir()
    for i in range(4):
        write_synthetic_h5(str(d / f"s{i}.h5"), n_events=1200, res=RES,
                           seed=10 + i)

    cfg = make_config(str(d), mode="events", window=400)
    host0 = H5Loader(cfg, shuffle=True, file_shard=(0, 2))
    host1 = H5Loader(cfg, shuffle=True, file_shard=(1, 2))

    f0, f1 = set(host0.files), set(host1.files)
    assert not (f0 & f1)
    assert len(f0 | f1) == 4
    # identical seeded permutation on both hosts -> complementary shards
    single = H5Loader(cfg, shuffle=True)
    assert sorted(f0 | f1) == sorted(single.files)

    # rollover walks only the local shard
    for _ in range(6):
        host0._restart_lane(0)
        assert host0.lanes[0].path in f0
    # epoch accounting is host-local: one epoch = one pass over the shard
    assert len(host0.files) == 2 and host0.seq_num == 6


def test_file_shard_requires_seed_and_enough_files(tmp_path):
    d = tmp_path / "ds1"
    d.mkdir()
    write_synthetic_h5(str(d / "only.h5"), n_events=1200, res=RES, seed=3)
    with pytest.raises(ValueError, match="seed"):
        H5Loader(make_config(str(d), seed=None), shuffle=True,
                 file_shard=(0, 2))
    with pytest.raises(ValueError, match="partitioned"):
        H5Loader(make_config(str(d)), shuffle=True, file_shard=(0, 2))


def test_section_timer_wrap_and_report():
    """SectionTimer attributes wall time to named sections, wraps
    iterables (attributing each next() wait), and prints a report."""
    from taming_event_flow_tpu.utils.diagnostics import SectionTimer

    tm = SectionTimer()
    with tm("a"):
        pass
    with tm("a"):
        pass
    assert tm.counts["a"] == 2 and tm.totals["a"] >= 0.0

    items = list(tm.wrap(iter(range(5)), "wait"))
    assert items == list(range(5))
    assert tm.counts["wait"] == 6  # 5 items + the terminating next()

    rep = tm.report()
    assert "a" in rep and "wait" in rep and "section breakdown" in rep

    # exceptions inside a section still record it
    try:
        with tm("b"):
            raise ValueError("x")
    except ValueError:
        pass
    assert tm.counts["b"] == 1


def test_remap_index_reproduces_remap(rng, monkeypatch):
    """``remap_index`` captures :meth:`BaseStreamLoader.remap`'s pixel
    lookup: gathering any image with the returned 1-based index equals
    remapping that image — through BOTH remap code paths (cv2 and the
    numpy fallback) and with out-of-source map coordinates."""
    from taming_event_flow_tpu.data import base as base_mod
    from taming_event_flow_tpu.data.base import BaseStreamLoader

    res = (9, 11)
    loader = BaseStreamLoader({
        "data": {"voxel": None},
        "loader": {"resolution": list(res), "batch_size": 1,
                   "augment": [], "augment_prob": [], "seed": 0},
    })

    mapping = np.zeros(res + (2,), np.float32)
    mapping[..., 0] = rng.uniform(-1.5, res[1] + 0.5, res)  # x (some oob)
    mapping[..., 1] = rng.uniform(-1.5, res[0] + 0.5, res)  # y

    img = rng.normal(size=res + (2,)).astype(np.float32)

    def gather(idx):
        flat = img.reshape(-1, 2)
        safe = np.maximum(idx - 1, 0).reshape(-1)
        out = np.where(
            (idx.reshape(-1) > 0)[:, None], flat[safe], 0.0
        )
        return out.reshape(res + (2,))

    for use_cv2 in (True, False):
        if not use_cv2:
            monkeypatch.setattr(base_mod, "cv2", None)
        elif base_mod.cv2 is None:
            continue
        idx = loader.remap_index(mapping)
        assert idx.dtype == np.int32 and idx.shape == res
        np.testing.assert_array_equal(
            gather(idx), loader.remap(img, mapping)
        )
    # identity mapping -> identity index (1-based)
    ident = np.stack(
        np.meshgrid(np.arange(res[1], dtype=np.float32),
                    np.arange(res[0], dtype=np.float32)),
        axis=-1,
    )
    idx = loader.remap_index(ident)
    np.testing.assert_array_equal(
        idx, np.arange(1, res[0] * res[1] + 1).reshape(res)
    )
