"""Measure the tunneled host<->device wire: H2D/D2H bandwidth by size and
dtype, dispatch latency, and the projected win of a packed training-window
wire format.

Context: the end-to-end train CLI settles ~1 s/step against a 222 ms device
step (README round-3b). The host is 1 core shared with the tunnel endpoint,
so every wire byte costs host CPU — this script attributes that gap and
sizes the packed-wire lever before building it.

Run standalone (single TPU process, per CLAUDE.md):
    python scripts/bench_wire.py
"""

import time

import numpy as np


def _sync(arr):
    """True completion barrier: 1-element host readback (block_until_ready
    returns at dispatch on this stack — scripts/bench_util.py)."""
    import jax

    np.asarray(jax.device_get(arr.ravel()[:1]))


def bench_h2d(arr, iters=5):
    """Median seconds to place `arr` on device (fresh buffer each time)."""
    import jax.numpy as jnp

    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        d = jnp.asarray(arr)
        _sync(d)
        ts.append(time.perf_counter() - t0)
        del d
    return float(np.median(ts))


def bench_d2h(shape, dtype, iters=5):
    import jax.numpy as jnp

    d = jnp.ones(shape, dtype)
    _sync(d)
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        np.asarray(d)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    import jax
    import jax.numpy as jnp

    print("device:", jax.devices()[0])

    # --- scalar round trip + dispatch latency -----------------------------
    f = jax.jit(lambda x: x + 1.0)
    x = jnp.zeros(())
    _sync(f(x))
    t0 = time.perf_counter()
    for _ in range(20):
        y = f(x)
    dispatch = (time.perf_counter() - t0) / 20
    t0 = time.perf_counter()
    for _ in range(20):
        float(f(x))
    rtt = (time.perf_counter() - t0) / 20
    print(f"jit dispatch (async): {dispatch * 1e3:.2f} ms")
    print(f"scalar round trip   : {rtt * 1e3:.2f} ms")

    # --- bandwidth by size (f32) ------------------------------------------
    rng = np.random.default_rng(0)
    print("\nH2D by size (f32):")
    for mb in (1, 4, 16, 32):
        n = mb * (1 << 20) // 4
        a = rng.normal(size=n).astype(np.float32)
        dt = bench_h2d(a)
        print(f"  {mb:3d} MB: {dt * 1e3:8.1f} ms  ({mb / dt:7.1f} MB/s)")

    print("\nD2H by size (f32):")
    for mb in (1, 16):
        n = mb * (1 << 20) // 4
        dt = bench_d2h((n,), np.float32)
        print(f"  {mb:3d} MB: {dt * 1e3:8.1f} ms  ({mb / dt:7.1f} MB/s)")

    # --- dtype scaling: same element count, smaller words ------------------
    print("\nH2D 8M elements by dtype:")
    n = 8 << 20
    for dtype, bytes_per in ((np.float32, 4), (np.uint16, 2), (np.int8, 1),
                             (np.bool_, 1)):
        a = (rng.uniform(0, 2, n) > 1).astype(dtype) if dtype == np.bool_ \
            else rng.integers(0, 100, n).astype(dtype)
        dt = bench_h2d(a)
        mb = n * bytes_per / (1 << 20)
        print(f"  {np.dtype(dtype).name:8s}: {dt * 1e3:8.1f} ms "
              f"({mb:6.1f} MB, {mb / dt:7.1f} MB/s)")

    # --- the actual training window, current vs packed ---------------------
    P, B, N, H, W = 10, 8, 8192, 128, 128
    cur = {
        "net_input": rng.integers(0, 30, (P, B, H, W, 2)).astype(np.float32),
        "event_list": rng.normal(size=(P, B, N, 4)).astype(np.float32),
        "pol_mask": rng.integers(0, 2, (P, B, N, 2)).astype(np.float32),
        "grad_mask": rng.integers(0, 2, (P, B, N, 1)).astype(np.float32),
    }
    packed = {
        "net_input": cur["net_input"].astype(np.uint16),
        "event_txy": cur["event_list"][..., :3],
        "event_p": cur["event_list"][..., 3].astype(np.int8),
        "grad_mask": cur["grad_mask"].astype(bool),
    }

    def window_time(w, iters=5):
        ts = []
        for _ in range(iters):
            t0 = time.perf_counter()
            d = {k: jnp.asarray(v) for k, v in w.items()}
            for v in d.values():
                _sync(v)
            ts.append(time.perf_counter() - t0)
            del d
        return float(np.median(ts))

    derived = {k: v for k, v in packed.items() if k != "net_input"}
    mb_cur = sum(v.nbytes for v in cur.values()) / (1 << 20)
    mb_pk = sum(v.nbytes for v in packed.values()) / (1 << 20)
    mb_dv = sum(v.nbytes for v in derived.values()) / (1 << 20)
    t_cur = window_time(cur)
    t_pk = window_time(packed)
    t_dv = window_time(derived)
    print(f"\ntrain window  f32 wire: {mb_cur:6.1f} MB  {t_cur * 1e3:8.1f} ms")
    print(f"train window packed   : {mb_pk:6.1f} MB  {t_pk * 1e3:8.1f} ms "
          f"({t_cur / t_pk:.2f}x)")
    print(f"train window derived  : {mb_dv:6.1f} MB  {t_dv * 1e3:8.1f} ms "
          f"({t_cur / t_dv:.2f}x)")

    # DSEC eval window (480x640, 10 passes, 32k events)
    P, B, N, H, W = 10, 1, 32768, 480, 640
    cur = {
        "net_input": rng.integers(0, 30, (P, B, H, W, 2)).astype(np.float32),
        "event_list": rng.normal(size=(P, B, N, 4)).astype(np.float32),
        "pol_mask": rng.integers(0, 2, (P, B, N, 2)).astype(bool),
    }
    packed = {
        "net_input": cur["net_input"].astype(np.uint16),
        "event_txy": cur["event_list"][..., :3],
        "event_p": cur["event_list"][..., 3].astype(np.int8),
    }
    derived = {k: v for k, v in packed.items() if k != "net_input"}
    # rectified sequences additionally ship raw integer coords
    derived["event_raw_xy"] = rng.integers(
        0, 480, (P, B, N, 2)).astype(np.uint16)
    mb_cur = sum(v.nbytes for v in cur.values()) / (1 << 20)
    mb_pk = sum(v.nbytes for v in packed.values()) / (1 << 20)
    mb_dv = sum(v.nbytes for v in derived.values()) / (1 << 20)
    t_cur = window_time(cur)
    t_pk = window_time(packed)
    t_dv = window_time(derived)
    print(f"\ndsec window  cur wire : {mb_cur:6.1f} MB  {t_cur * 1e3:8.1f} ms")
    print(f"dsec window packed    : {mb_pk:6.1f} MB  {t_pk * 1e3:8.1f} ms "
          f"({t_cur / t_pk:.2f}x)")
    print(f"dsec window derived   : {mb_dv:6.1f} MB  {t_dv * 1e3:8.1f} ms "
          f"({t_cur / t_dv:.2f}x, incl. rectified raw coords)")

    # device-side cost of the count derivation the derived wire adds
    from taming_event_flow_tpu.ops.encodings import derive_count_input

    evs_d = jnp.asarray(cur["event_list"])
    raw_d = jnp.asarray(derived["event_raw_xy"])
    ridx_d = jnp.asarray(
        rng.permutation(480 * 640).reshape(1, 480, 640).astype(np.int32) + 1
    )
    fn = __import__("jax").jit(
        lambda e, r, i: derive_count_input(e, (480, 640), raw_xy=r,
                                           remap_idx=i)
    )
    import time as _t

    np.asarray(fn(evs_d, raw_d, ridx_d).ravel()[:1])  # compile
    ts = []
    for _ in range(5):
        t0 = _t.perf_counter()
        np.asarray(fn(evs_d, raw_d, ridx_d).ravel()[:1])
        ts.append(_t.perf_counter() - t0)
    print(f"derive_count_input on device (DSEC window, rect): "
          f"{float(np.median(ts)) * 1e3:.1f} ms")


if __name__ == "__main__":
    main()
