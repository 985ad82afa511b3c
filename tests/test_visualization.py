"""Visualization/codec tests (DSEC PNG encoding parity is benchmark-critical)."""

import numpy as np

from taming_event_flow_tpu.utils import (
    encode_dsec_flow,
    decode_dsec_flow,
    flow_to_image,
    events_to_image,
)
from taming_event_flow_tpu.utils.progress import ProgressBar, StepMeter


def test_dsec_flow_codec_roundtrip(rng):
    flow = rng.normal(size=(16, 20, 2)).astype(np.float32) * 10
    enc = encode_dsec_flow(flow)
    assert enc.dtype == np.uint16 and enc.shape == (16, 20, 3)
    dec = decode_dsec_flow(enc)
    # quantization step is 1/128 px
    np.testing.assert_allclose(dec, flow, atol=1.0 / 128)


def test_dsec_encoding_matches_reference_formula(rng):
    """uint16(flow*128 + 2^15), zero-padded 3rd channel, channel-flipped
    (reference visualization.py:146-149)."""
    flow = rng.normal(size=(4, 5, 2)).astype(np.float32)
    enc = encode_dsec_flow(flow)
    expect = (flow * 128 + 2**15).astype(np.uint16)
    np.testing.assert_array_equal(enc[..., 2], expect[..., 0])
    np.testing.assert_array_equal(enc[..., 1], expect[..., 1])
    assert np.all(enc[..., 0] == 0)


def test_flow_to_image_shapes(rng):
    img = flow_to_image(rng.normal(size=(8, 10, 2)).astype(np.float32))
    assert img.shape == (8, 10, 3) and img.dtype == np.uint8


def test_events_to_image_schemes(rng):
    cnt = rng.integers(0, 5, size=(8, 10, 2)).astype(np.float32)
    for scheme in ["green_red", "gray", "rpg", "prophesee"]:
        img = events_to_image(cnt, color_scheme=scheme)
        assert img.shape == (8, 10, 3) and img.dtype == np.uint8


def test_progress_meter(capsys):
    import io

    buf = io.StringIO()
    bar = ProgressBar("seq", max=4, stream=buf)
    for _ in range(4):
        bar.next()
    bar.finish()
    assert "4/4" in buf.getvalue()

    m = StepMeter()
    m.tick()
    m.tick()
    assert m.steps_per_s > 0
    assert m.mevents_per_s(1e6) > 0


def test_u16_flow_wire_matches_png_lattice(rng):
    """The packed flow_bw wire (device-side DSEC-lattice quantization,
    eval_flow.flow_to_u16) stores the SAME PNG bytes as shipping f32:
    the wire IS the PNG's own x/y channels, and decoding it on the host
    then re-encoding is idempotent on the lattice."""
    import jax
    import jax.numpy as jnp
    from taming_event_flow_tpu.utils.visualization import (
        encode_dsec_flow,
        flow_to_u16,
        u16_to_flow,
    )

    flow = rng.uniform(-200.0, 200.0, (6, 7, 2)).astype(np.float32)
    enc_dev = np.asarray(jax.jit(flow_to_u16)(jnp.asarray(flow)))

    png_direct = encode_dsec_flow(flow)
    png_via_wire = encode_dsec_flow(u16_to_flow(enc_dev))
    np.testing.assert_array_equal(png_direct, png_via_wire)
    # the wire itself is the PNG's x/y channels (pre flip/pad)
    np.testing.assert_array_equal(
        np.flip(png_direct, axis=-1)[..., :2], enc_dev
    )
    # out-of-lattice flows clamp on device (the host cast would wrap)
    big = np.array([[[300.0, -300.0]]], np.float32)
    clamped = np.asarray(flow_to_u16(jnp.asarray(big)))
    assert clamped[0, 0, 0] == 65535 and clamped[0, 0, 1] == 0


def _vis_config(store: bool, async_store=None):
    vis = {"enabled": False, "store": store, "bars": False}
    if async_store is not None:
        vis["async_store"] = async_store
    return {"vis": vis}


def test_async_store_matches_sync(tmp_path, rng):
    """The writeback-thread store path produces byte-identical PNG trees and
    timestamps to the synchronous path (same single-worker FIFO ordering)."""
    import os

    from taming_event_flow_tpu.utils.visualization import Visualization

    def run(async_store, root):
        vis = Visualization(_vis_config(True, async_store), eval_id=0,
                            path_results=str(root))
        r = np.random.default_rng(3)
        for i in range(6):
            seq = "seq_a" if i < 4 else "seq_b"
            batch = {
                "net_input": r.integers(0, 4, (1, 8, 10, 2)).astype(
                    np.float32),
                "gtflow": r.normal(size=(1, 8, 10, 2)).astype(np.float32),
            }
            vis.data["flow_bw"] = r.normal(size=(1, 8, 10, 2)).astype(
                np.float32) * 5
            vis.data["flow"] = r.normal(size=(1, 8, 10, 2)).astype(
                np.float32)
            vis.step(batch, sequence=seq, ts=0.1 * i,
                     show=["flow_bw", "events", "flow"])
        vis.close()
        return os.path.join(str(root), "results", "eval_0")

    sync_dir = run(False, tmp_path / "sync")
    async_dir = run(True, tmp_path / "async")

    import pathlib

    sync_files = sorted(
        p.relative_to(sync_dir) for p in pathlib.Path(sync_dir).rglob("*")
        if p.is_file()
    )
    async_files = sorted(
        p.relative_to(async_dir) for p in pathlib.Path(async_dir).rglob("*")
        if p.is_file()
    )
    assert sync_files == async_files and len(sync_files) > 0
    for rel in sync_files:
        a = (pathlib.Path(sync_dir) / rel).read_bytes()
        b = (pathlib.Path(async_dir) / rel).read_bytes()
        assert a == b, rel


def test_async_store_worker_error_surfaces(tmp_path):
    """An exception on the writeback thread re-raises on close()."""
    import pytest

    from taming_event_flow_tpu.utils.visualization import Visualization

    vis = Visualization(_vis_config(True), eval_id=0,
                        path_results=str(tmp_path))
    vis.data["flow_bw"] = "not an array"  # render() will throw in the worker
    vis.step({}, sequence="s", ts=0.0, show=["flow_bw"])
    with pytest.raises(Exception):
        vis.close()
    vis.close()  # idempotent after the error is consumed


def test_async_store_full_queue_after_worker_error_does_not_hang(tmp_path):
    """Regression (round-5 ADVICE): with the bounded queue full and the
    worker erroring, subsequent step()s and close() must unblock and
    re-raise instead of deadlocking on a blocking put."""
    import pytest

    from taming_event_flow_tpu.utils.visualization import Visualization

    vis = Visualization(_vis_config(True), eval_id=0,
                        path_results=str(tmp_path))
    # every queued item is poison: the worker records the first error and
    # then drains the rest, so >8 (maxsize) steps would deadlock without
    # the fix
    with pytest.raises(Exception):
        for _ in range(24):
            vis.data["flow_bw"] = "not an array"
            vis.step({}, sequence="s", ts=0.0, show=["flow_bw"])
        vis.close()
    vis.close()  # idempotent after the error is consumed


def test_async_store_snapshot_filtered_by_show(tmp_path):
    """A show=['flow_bw'] store (the DSEC submission config) must not
    snapshot/convert net_input or unrelated panels (dead D2H + pinned
    device arrays — round-5 ADVICE)."""
    from taming_event_flow_tpu.utils.visualization import Visualization

    class Explodes:
        """Stands in for a device array whose conversion would be a D2H."""

        def __array__(self, *a, **k):
            raise AssertionError("dead D2H: converted an unshown input")

    vis = Visualization(_vis_config(True), eval_id=0,
                        path_results=str(tmp_path))
    r = np.random.default_rng(0)
    for i in range(3):
        vis.data["flow_bw"] = r.normal(size=(1, 8, 10, 2)).astype(
            np.float32)
        vis.data["flow"] = Explodes()  # unshown slot: must not be rendered
        vis.step({"net_input": Explodes(), "gtflow": Explodes()},
                 sequence="s", ts=0.1 * i, show=["flow_bw"])
    vis.close()
    import os

    stored = os.listdir(os.path.join(
        str(tmp_path), "results", "eval_0", "s", "flow_bw"))
    assert len(stored) == 3
